"""Language-ID plugin rule — vectorized pandas UDF, deterministic model.

Luzzu's imperative plugin metrics (/root/reference/README.md:13) become
Iterator-of-Series pandas UDFs: the model is built ONCE per Python
worker in the iterator prologue (the fastText-loading pattern at scale —
SNIPPETS.md §2), then each Arrow batch is scored with numpy only.

The production slot here is a fastText .bin scorer; this container has
no model file and no network, so the shipped model is a deterministic
stop-word-profile scorer (SURVEY.md §2.3): score(lang) = fraction of the
doc's tokens found in that language's profile; predicted lang = argmax
(ties broken by lexicographic lang code); confidence = normalized margin.
Fully deterministic — no RNG, no I/O — so two runs and any partitioning
produce identical outputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

from luzzu_spark.rules.stopwords import LANG_PROFILES

_LANGS = tuple(sorted(LANG_PROFILES))  # frozen order → deterministic argmax


def _score_batch(texts: pd.Series) -> pd.DataFrame:
    profiles = {lang: frozenset(words)
                for lang, words in LANG_PROFILES.items()}
    token_lists = texts.fillna("").str.split()
    langs, confs = [], []
    for toks in token_lists:
        n = len(toks) or 1
        hits = [(sum(1 for t in toks if t in profiles[lg]) / n, lg)
                for lg in _LANGS]
        # max by (score, then FIRST lang code wins ties) — deterministic
        best = max(hits, key=lambda h: (h[0], [-ord(c) for c in h[1]]))
        total = sum(h[0] for h in hits)
        langs.append(best[1])
        confs.append(best[0] / total if total > 0 else 0.0)
    return pd.DataFrame({"lang_pred": langs, "lang_conf": confs})


_RET = StructType([StructField("lang_pred", StringType()),
                   StructField("lang_conf", DoubleType())])


@pandas_udf(_RET)  # DataType object: no session needed at import time
def langid_udf(texts: pd.Series) -> pd.DataFrame:
    # Plain Series→Series form (NOT Iterator-of-Series): scalar-iterator
    # UDFs each get their own ArrowEvalPython node and cannot fuse, so
    # chaining three of them shipped the text column across the
    # JVM↔Python boundary three times per batch. The model-load slot
    # moves to a lazy module global (one init per worker process).
    return _score_batch(texts)


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach lang_pred + score_langid_conf via one Arrow-batched UDF."""
    struct = langid_udf(F.col(text_col))
    return (df.withColumn("_lid", struct)
              .withColumn("lang_pred", F.col("_lid.lang_pred"))
              .withColumn("score_langid_conf", F.col("_lid.lang_conf"))
              .drop("_lid"))


# -- plain-Python twin for the pandas oracle ------------------------------
def langid_py(text: str) -> tuple[str, float]:
    out = _score_batch(pd.Series([text or ""]))
    return out["lang_pred"][0], float(out["lang_conf"][0])
