"""Planted-expectation tests for the line/word-level web-text ops.

`text_boilerplate_lines` and `text_top_word_dominance` also run under
the DuckDB parity suite over the real fixture (tests/test_oracle_parity
auto-parameterizes every oracle query); these tests instead plant tiny
corpora where the right answer is computed by hand, covering cases the
fixture can't express — a host below the 3-doc threshold, a line
repeated WITHIN one document (must not count as boilerplate: the rule
is distinct-doc frequency), and the exact 20% dominance boundary.
"""

from __future__ import annotations

import pandas as pd
import pytest

FOOTER1 = "copyright (c) {} - all rights reserved"
FOOTER2 = "home | about | contact"


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    d = tmp_path / "sf"
    d.mkdir()
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def boiler_dir(tmp_path_factory):
    # hosta: 4 docs — 3 share a body line (>=3 distinct docs -> fires),
    #   1 unique body (kept); footers appear in 4 docs (fire).
    # hostb: 2 docs — below the 3-doc threshold, nothing fires.
    # hostc: 1 doc whose body repeats one line 3 times — high raw
    #   frequency but ONE distinct doc, so nothing fires.
    rows = [
        (1, "dup body line", "en", "hosta"),
        (2, "dup body line", "en", "hosta"),
        (3, "dup body line", "en", "hosta"),
        (4, "unique text here", "en", "hosta"),
        (5, "bbb one", "en", "hostb"),
        (6, "bbb two", "en", "hostb"),
        (7, "rep\nrep\nrep", "en", "hostc"),
    ]
    return _write_docs(tmp_path_factory.mktemp("boiler"), rows)


def test_boilerplate_lines_planted(spark, boiler_dir):
    from luzzu_spark.queries_web import text_boilerplate_lines

    got = {r["source"]: r for r in
           text_boilerplate_lines(spark, boiler_dir).collect()}
    assert set(got) == {"hosta", "hostb", "hostc"}

    a = got["hosta"]
    assert a["n_lines"] == 4 * 3  # body + 2 footer lines per page
    # 3 dup-body instances + 4 docs x 2 footer lines
    assert a["n_boilerplate_lines"] == 3 + 8
    assert a["n_chars_kept"] == len("unique text here")

    b = got["hostb"]
    assert b["n_lines"] == 2 * 3
    assert b["n_boilerplate_lines"] == 0  # 2 docs < 3-doc threshold
    assert b["n_chars_kept"] == (
        len("bbb one") + len("bbb two")
        + 2 * (len(FOOTER1.format("hostb")) + len(FOOTER2)))

    c = got["hostc"]
    assert c["n_lines"] == 5  # 3 body lines + 2 footers
    # "rep" occurs 3x but in ONE distinct doc -> not boilerplate
    assert c["n_boilerplate_lines"] == 0
    assert c["n_chars_kept"] == (
        3 * len("rep")
        + len(FOOTER1.format("hostc")) + len(FOOTER2))


@pytest.fixture(scope="module")
def dominance_dir(tmp_path_factory):
    rows = [
        (1, "spam spam spam spam other", "en", "s"),   # 4/5 dominated
        (2, "a b c d e f", "en", "s"),                 # 1/6 not
        (3, "x x a b c d e f g h", "en", "s"),         # 2/10 == 20%: not
        (4, "ja ja ja nein", "de", "s"),               # 3/4 dominated
    ]
    return _write_docs(tmp_path_factory.mktemp("dom"), rows)


def test_top_word_dominance_planted(spark, dominance_dir):
    from luzzu_spark.queries_web import text_top_word_dominance

    got = {r["lang"]: r for r in
           text_top_word_dominance(spark, dominance_dir).collect()}
    assert set(got) == {"en", "de"}

    en = got["en"]
    assert en["n_docs"] == 3
    # strict >20%: the 2-of-10 doc sits exactly ON the boundary and
    # must NOT count (top_cnt * 5 > n_toks, integer-exact)
    assert en["n_dominated"] == 1
    assert en["micro_top_frac"] == round((4 + 1 + 2) / (5 + 6 + 10), 6)

    de = got["de"]
    assert de["n_docs"] == 1
    assert de["n_dominated"] == 1
    assert de["micro_top_frac"] == round(3 / 4, 6)


@pytest.fixture(scope="module")
def ngram_dir(tmp_path_factory):
    # A: 20 distinct words — every 2-/3-gram unique; coverage of a
    #    single occurrence (5/59, 8/59) sits under both thresholds.
    # B: "x y" repeated — both gram sizes fire.
    # C: one token — no grams at all, lang must vanish from output.
    # D: two tokens — a 2-gram row but NO 3-gram row.
    a_text = " ".join("a" + c for c in "abcdefghijklmnopqrst")
    rows = [
        (1, a_text, "en", "s"),
        (2, "x y x y x y", "en", "s"),
        (3, "solo", "de", "s"),
        (4, "uno dos", "fr", "s"),
    ]
    return _write_docs(tmp_path_factory.mktemp("ngram"), rows)


def test_top_ngram_coverage_planted(spark, ngram_dir):
    from luzzu_spark.queries_web import text_top_ngram_coverage

    got = {(r["lang"], r["n"]): r for r in
           text_top_ngram_coverage(spark, ngram_dir).collect()}
    # de has no grams; fr has no 3-gram row
    assert set(got) == {("en", 2), ("en", 3), ("fr", 2)}

    # doc A: cov2 = len("aa ab") = 5, cov3 = 8, n_chars = 59
    # doc B: cov2 = 3 * len("x y") = 9, cov3 = 2 * len("x y x") = 10,
    #        n_chars = 11 — flagged at both sizes (9*5 > 11, 10*50 > 99)
    en2 = got[("en", 2)]
    assert (en2["n_docs"], en2["n_flagged"]) == (2, 1)
    assert en2["micro_coverage"] == round((5 + 9) / (59 + 11), 6)
    en3 = got[("en", 3)]
    assert (en3["n_docs"], en3["n_flagged"]) == (2, 1)
    assert en3["micro_coverage"] == round((8 + 10) / (59 + 11), 6)

    # doc D: single 2-gram covers the whole doc (7/7) — flagged
    fr2 = got[("fr", 2)]
    assert (fr2["n_docs"], fr2["n_flagged"]) == (1, 1)
    assert fr2["micro_coverage"] == 1.0


def test_pack_token_sequences_matches_python_packer():
    """Property check (no JVM): the pack_token_sequences oracle SQL
    over random corpora must equal a direct python packer — n_seqs,
    straddler, and fill math validated independently of both engines.
    The Spark↔DuckDB twin is covered by the parity suites; this pins
    the SEMANTICS."""
    import random

    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from luzzu_spark.queries_web import PACK_BUDGET

    rng = random.Random(11)
    rows = []
    did = 0
    for s in range(4):
        for _ in range(rng.randint(1, 30)):
            n = rng.choice([0, 1, 5, 255, 256, 257, 300])
            rows.append((did, " ".join("w" * 1 for _ in range(n)),
                         "en", f"s{s}", 2 * n))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                      "source", "n_chars"])

    # python reference: contiguous fill in doc_id order per source
    want = {}
    for src, grp in pdf.groupby("source"):
        cum, straddle, total = 0, 0, 0
        for t in grp.sort_values("doc_id")["text"]:
            n = len([w for w in t.split(" ") if w])
            if n > 0 and (cum + n - 1) // PACK_BUDGET > cum // PACK_BUDGET:
                straddle += 1
            cum += n
            total += n
        n_seqs = (total + PACK_BUDGET - 1) // PACK_BUDGET
        fill = 0.0 if total == 0 else round(
            total / (n_seqs * PACK_BUDGET), 6)
        want[src] = (len(grp), total, n_seqs, straddle, fill)

    con = duckdb.connect()
    con.register("docs_pdf", pdf)
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pdf")
    got = {r[0]: tuple(r[1:]) for r in con.execute(
        entrymod.oracle_sql()["pack_token_sequences"]).fetchall()}
    assert got == want
