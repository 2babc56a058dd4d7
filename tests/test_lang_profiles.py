"""Per-language rule profiles (VERDICT r04 Missing #5): the
multilingual registry scores stopword_frac against each document's
PREDICTED language profile; restricted to EN it is byte-identical to
the frozen default registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luzzu_spark.fixtures import as_webpages, load_table
from luzzu_spark.pipeline import QualityPipeline
from luzzu_spark.rules.registry import (default_registry,
                                        multilingual_registry)

SF = "/root/testdata/sf0.001"


def _verdicts(spark, registry, pages):
    a = QualityPipeline(registry=registry).assess(pages)
    return {r["url"]: (r["keep"], tuple(r["drop_reasons"]),
                       r["text_scrubbed"])
            for r in a.select("url", "keep", "drop_reasons",
                              "text_scrubbed").collect()}


def test_en_only_multilingual_registry_is_default(spark):
    """multilingual_registry(("en",)) IS the default registry object —
    the frozen RULESPEC byte-identity contract holds trivially."""
    reg = multilingual_registry(("en",))
    d = default_registry()
    assert [r.name for r in reg.ordered()] == [r.name for r in
                                               d.ordered()]
    assert not any(r.late for r in reg.rules)


def test_multilingual_keeps_en_verdicts_identical(spark):
    """On documents the langid predicts as EN, the full multilingual
    registry produces byte-identical verdicts + scrubbed text to the
    default registry (only the profile SELECTION changed; the EN
    branch is the same expression)."""
    pages = as_webpages(
        load_table(spark, SF, "documents").where("doc_id < 120"),
        inject_pii=True)
    got_ml = _verdicts(spark, multilingual_registry(), pages)
    got_def = _verdicts(spark, default_registry(), pages)
    a = QualityPipeline().assess(pages)
    en_urls = {r["url"] for r in
               a.where("lang_pred = 'en'").select("url").collect()}
    assert en_urls, "fixture should predict some docs as EN"
    for u in en_urls:
        assert got_ml[u] == got_def[u], u


_FR_TEXT = (
    "le gouvernement annonce une nouvelle politique pour les "
    "transports dans la ville et il explique que nous devons "
    "construire des lignes nouvelles pour relier les quartiers "
    "avec le centre car la population augmente et les habitants "
    "demandent des solutions durables pour leurs trajets "
    "quotidiens vers le travail et les écoles de la région"
)


def test_french_doc_kept_by_fr_profile_dropped_by_en(spark):
    """The capability the profiles exist for: natural French prose has
    almost no EN stopwords (drops under the EN-only registry at
    stopword_frac) but plenty of FR ones (keeps under the FR
    profile)."""
    probe = spark.createDataFrame(
        [(9001, _FR_TEXT, "fr", "srcfr", len(_FR_TEXT))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    pages = as_webpages(probe)

    a_def = QualityPipeline().assess(pages).collect()[0]
    assert "stopword_frac" in list(a_def["drop_reasons"]), \
        (a_def["drop_reasons"], a_def["rule_scores"])

    a_ml = QualityPipeline(
        registry=multilingual_registry()).assess(pages).collect()[0]
    assert a_ml["lang_pred"] == "fr"
    assert a_ml["keep"], (list(a_ml["drop_reasons"]),
                          dict(a_ml["rule_scores"]))


def test_unknown_profile_language_raises(spark):
    with pytest.raises(ValueError, match="no rule profile"):
        multilingual_registry(("en", "xx"))


def test_lang_profile_rule_empty_doc_parity(spark):
    """Zero-token docs under the multilingual registry behave exactly
    like the default: stopword_frac does NOT fire (NULL ratio), the
    doc drops at min_chars/word_count (CLAUDE.md rule 15 class)."""
    probe = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")],
        "doc_id long, text string")
    pages = as_webpages(
        probe.withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("s"))
        .withColumn("n_chars",
                    F.coalesce(F.length("text"), F.lit(0)).cast("long")))
    rows = QualityPipeline(
        registry=multilingual_registry()).assess(pages).collect()
    for r in rows:
        dr = list(r["drop_reasons"])
        assert dr[:2] == ["min_chars", "word_count"], dr
        assert "stopword_frac" not in dr


def test_profile_rates_all_zero_token_group(spark, tmp_path):
    """review r05: a profile key whose docs are ALL zero-token must
    report n_fired = 0 (the oracle's CASE ... ELSE 0), not NULL (what
    an uncoalesced SUM over all-NULL fired flags returns)."""
    import os

    import pandas as pd

    from luzzu_spark.queries_web import docs_lang_profile_rates
    d = str(tmp_path / "sf_zero")
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["", "   ", None],
        "lang": ["en"] * 3,
        "source": ["s0"] * 3,
        "n_chars": [0, 3, 0],
    })
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(d, "documents.parquet"))
    rows = docs_lang_profile_rates(spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["n_fired"] == 0, rows
    assert rows[0]["n_docs"] == 3
