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
