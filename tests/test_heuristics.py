"""Unit tests for heuristic rule expressions against hand-computed rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from luzzu_spark.rules import spec
from luzzu_spark.rules.heuristics import with_token_columns
from luzzu_spark.rules.registry import default_registry


def _assess(spark, texts):
    from luzzu_spark.rules.langid import with_langid
    from luzzu_spark.rules.perplexity import with_perplexity
    from luzzu_spark.rules.repetition import with_dup13
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    df = with_token_columns(df)
    reg = default_registry()
    df = reg.with_scores(df)
    df = with_langid(df)
    df = with_perplexity(df)
    df = with_dup13(df)
    return reg.with_verdict(df)


def test_token_columns(spark):
    df = with_token_columns(
        spark.createDataFrame([("  a bb  ccc ",)], ["text"]))
    row = df.first()
    assert row["tokens"] == ["a", "bb", "ccc"]
    assert row["n_tokens"] == 3
    assert row["n_chars"] == len("  a bb  ccc ")


def test_short_doc_fires_min_chars(spark):
    row = _assess(spark, ["tiny doc"]).first()
    assert "min_chars" in row["drop_reasons"]
    assert "word_count" in row["drop_reasons"]
    assert not row["keep"]


def test_long_clean_doc_keeps(spark):
    text = ("the quick brown fox jumps over the lazy dog and then "
            "walks back to the quiet house near the river bank today")
    row = _assess(spark, [text]).first()
    assert row["drop_reasons"] == []
    assert row["keep"]


def test_symbol_ratio_fires(spark):
    text = ("the data # @ $ % & # @ $ % & # @ $ % & value " * 3
            + "the end of the row is here with more words now")
    row = _assess(spark, [text]).first()
    assert row["score_symbol_ratio"] > spec.MAX_SYMBOL_WORD_RATIO
    assert "symbol_ratio" in row["drop_reasons"]


def test_repetition_fires(spark):
    text = ("the quick brown fox jumps over lazy dogs near rivers "
            "and banks today ") * 12
    row = _assess(spark, [text]).first()
    assert row["score_dup_ngram_frac"] > spec.MAX_DUP_NGRAM_FRAC
    assert "dup_ngram_frac" in row["drop_reasons"]


def test_mean_word_len_bounds(spark):
    long_words = " ".join(["exceptionallylongword"] * 30)
    row = _assess(spark, [long_words]).first()
    assert "mean_word_len" in row["drop_reasons"]


def test_rule_scores_map_complete(spark):
    row = _assess(spark, ["some ordinary document text here "
                          "with the usual words in it today"]).first()
    assert set(row["rule_scores"].keys()) == set(spec.RULE_ORDER)


def test_drop_reasons_order_frozen(spark):
    """drop_reasons must list fired rules in RULE_ORDER."""
    row = _assess(spark, ["x"]).first()
    reasons = row["drop_reasons"]
    idx = [spec.RULE_ORDER.index(r) for r in reasons]
    assert idx == sorted(idx)
