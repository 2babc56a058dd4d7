"""Python UDTF surface demo — the QPRO problem-report expansion.

SURVEY.md §2.9 chose `explode` over UDTFs for the production
problem-report path (pipeline.problem_report): a Python UDTF executes
row-at-a-time in Python, which is exactly the hot-path cost this engine
bans (CLAUDE.md: no per-row Python in the pipeline). This module keeps
that decision but DEMONSTRATES the Spark 4 UDTF API on the same
expansion so the capability surface is complete: a table function that
lateral-joins each assessed row into one row per fired rule.

The contract test (tests/test_udtf.py) pins that the UDTF output is
row-identical to the production explode path — same semantics, slower
engine — and the docstring here is the reason a user should prefer
`pipeline.problem_report` for anything bigger than a debugging sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="url string, rule string, score double")
class ProblemExpand:
    """One output row per (document, fired rule) — the QPRO expansion
    as a lateral table function."""

    def eval(self, url: str, drop_reasons, rule_scores):  # noqa: ANN001
        for rule in (drop_reasons or []):
            score = None
            if rule_scores is not None and rule in rule_scores:
                score = float(rule_scores[rule])
            yield url, rule, score


def problem_report_udtf(spark: SparkSession,
                        assessed: DataFrame) -> DataFrame:
    """The UDTF-based twin of pipeline.problem_report (demo path —
    row-at-a-time Python; use the explode form in production)."""
    spark.udtf.register("problem_expand", ProblemExpand)
    assessed.createOrReplaceTempView("_udtf_assessed")
    return spark.sql("""
        SELECT p.url, p.rule, p.score
        FROM _udtf_assessed a,
             LATERAL problem_expand(a.url, a.drop_reasons,
                                    a.rule_scores) p
    """)
