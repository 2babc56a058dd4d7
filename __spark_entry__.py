"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship quality-filter run on sf0.001.
``queries()``   — operator catalog (luzzu_spark/queries*.py).
``oracle_sql()``— matching DuckDB SQL for the driver's correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from luzzu_spark import queries as _q            # noqa: E402
from luzzu_spark import queries_text             # noqa: E402,F401  (registers)
from luzzu_spark import queries_ml               # noqa: E402,F401  (registers)
from luzzu_spark import queries_scale            # noqa: E402,F401  (registers)
from luzzu_spark import queries_web              # noqa: E402,F401  (registers)
from luzzu_spark.session import tune             # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-filter pipeline on sf0.001 documents →
    per-language keep/drop metric aggregates (the daQ observation
    table for one assessment run)."""
    from luzzu_spark.fixtures import as_webpages, load_table
    from luzzu_spark.pipeline import QualityPipeline

    tune(spark)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pages = as_webpages(docs, inject_pii=True)
    assessed = QualityPipeline().assess(pages)
    return (assessed.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_keep"),
                 F.round(F.avg("score_perplexity"), 4).alias("avg_ppl"),
                 F.round(F.avg("score_langid_conf"), 4)
                  .alias("avg_langid_conf"))
            .orderBy("lang"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
