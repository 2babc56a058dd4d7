"""Python UDTF surface: the lateral table function must reproduce the
production explode-based problem report row-for-row."""

from __future__ import annotations

from luzzu_spark.pipeline import QualityPipeline
from luzzu_spark.udtfs import problem_report_udtf


def test_udtf_problem_report_matches_explode(spark, pages):
    assessed = QualityPipeline().assess(pages)
    assessed = assessed.persist()
    try:
        want = QualityPipeline().problem_report(assessed) \
            .select("url", "rule", "score")
        got = problem_report_udtf(spark, assessed)
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    finally:
        assessed.unpersist()
