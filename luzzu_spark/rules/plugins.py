"""Fused plugin-rule bundle — all model scores in one UDF call.

Luzzu fans each quad out to every registered metric's `compute()`
(/root/reference/README.md:7,13); the Spark recast fans each Arrow batch
out to every plugin rule's batch scorer INSIDE one pandas UDF: the text
column crosses the JVM↔Python boundary once, is tokenized once, and
feeds langid + repetition (token-based) and perplexity (char-based)
without re-splitting. The per-rule UDFs (langid_udf, perplexity_udf,
dup13_udf) remain the standalone/plugin ABI; this bundle is the hot
path the pipeline uses.

Values are identical to the individual UDFs by construction — the same
batch functions run with a shared token_lists argument.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

from luzzu_spark.rules.langid import _score_batch
from luzzu_spark.rules.perplexity import ppl_batch
from luzzu_spark.rules.repetition import dup_frac_batch

BUNDLE_TYPE = StructType([
    StructField("lang_pred", StringType()),
    StructField("lang_conf", DoubleType()),
    StructField("ppl", DoubleType()),
    StructField("dup13", DoubleType()),
])


@pandas_udf(BUNDLE_TYPE)
def plugin_bundle_udf(texts: pd.Series) -> pd.DataFrame:
    token_lists = texts.fillna("").str.split()
    lid = _score_batch(texts, token_lists)
    return pd.DataFrame({
        "lang_pred": lid["lang_pred"],
        "lang_conf": lid["lang_conf"],
        "ppl": ppl_batch(texts),
        "dup13": dup_frac_batch(texts, token_lists=token_lists),
    })


# The function IS deterministic; the flag only blocks Catalyst from
# substituting the call into pushed-down predicates. Without it,
# `assess(...).filter(col("keep"))` rewrites keep through every
# projection, duplicating the UDF into the Filter — the plan then
# carries TWO ArrowEvalPython nodes and re-scores every row (measured
# 4× slowdown on the filtered() path).
plugin_bundle_udf = plugin_bundle_udf.asNondeterministic()
