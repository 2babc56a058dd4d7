"""Golden end-to-end test: Spark pipeline vs pure-pandas oracle.

The correctness heart (SURVEY.md §5 item 2, BASELINE.json:14): two
independent implementations of the frozen RULESPEC must agree —
keep/drop F1 ≥ 0.99 (expected: exact), identical drop_reasons, and
byte-identical scrubbed text per url.
"""

from __future__ import annotations

from luzzu_spark import oracle_pandas


def _spark_results(assessed):
    rows = assessed.select("doc_id", "keep", "drop_reasons",
                           "text_scrubbed").collect()
    return {r["doc_id"]: r for r in rows}


def _oracle_results(docs_pdf):
    out = oracle_pandas.assess_frame(docs_pdf, inject_pii=True)
    return out.set_index("doc_id")


def test_keep_labels_f1(assessed, docs_pdf):
    got = _spark_results(assessed)
    want = _oracle_results(docs_pdf)
    tp = fp = fn = tn = 0
    for doc_id, row in got.items():
        w = bool(want.loc[doc_id, "keep"])
        g = bool(row["keep"])
        tp += g and w
        fp += g and not w
        fn += (not g) and w
        tn += (not g) and not w
    assert tp + fp + fn + tn == len(want)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    assert f1 >= 0.99, (tp, fp, fn, tn)
    assert fp == 0 and fn == 0, "implementations must agree exactly"


def test_drop_reasons_identical(assessed, docs_pdf):
    got = _spark_results(assessed)
    want = _oracle_results(docs_pdf)
    for doc_id, row in got.items():
        assert list(row["drop_reasons"]) == list(
            want.loc[doc_id, "drop_reasons"]), doc_id


def test_scrubbed_text_byte_identical(assessed, docs_pdf):
    got = _spark_results(assessed)
    want = _oracle_results(docs_pdf)
    for doc_id, row in got.items():
        g = row["text_scrubbed"].encode()
        w = want.loc[doc_id, "text_scrubbed"].encode()
        assert g == w, doc_id


def test_some_rows_drop(assessed):
    """Thresholds must be non-trivial at fixture scale."""
    kept = assessed.filter("keep").count()
    total = assessed.count()
    assert 0 < kept < total
