"""Language-ID plugin rule — vectorized pandas UDF, deterministic model.

Luzzu's imperative plugin metrics (/root/reference/README.md:13) become
vectorized pandas UDFs: the model tables are built ONCE per Python
worker via a lazy module global (the fastText-loading pattern at scale —
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


import numpy as np

# token → per-language membership row, built once per worker process:
# vocabulary of all profile words × |langs| booleans
_VOCAB: dict[str, int] = {}
_MEMBERSHIP: "np.ndarray | None" = None


def _tables() -> tuple[dict[str, int], "np.ndarray"]:
    global _MEMBERSHIP
    if _MEMBERSHIP is None:
        words = sorted({w for ws in LANG_PROFILES.values() for w in ws})
        _VOCAB.update({w: i for i, w in enumerate(words)})
        m = np.zeros((len(words), len(_LANGS)), dtype=np.float64)
        for j, lg in enumerate(_LANGS):
            for w in LANG_PROFILES[lg]:
                m[_VOCAB[w], j] = 1.0
        _MEMBERSHIP = m
    return _VOCAB, _MEMBERSHIP


def _score_batch(texts: pd.Series,
                 token_lists: pd.Series | None = None) -> pd.DataFrame:
    """Vectorized across the whole Arrow batch: flatten every doc's
    tokens into one array, map tokens → vocab rows with ONE pd.Series
    .map over the (small) profile vocabulary, then accumulate per-doc
    per-language hit counts with one np.add.at scatter. Semantics are
    bit-identical to the per-doc loop it replaces: hits/n scores, argmax
    with ties → lexicographically smallest lang (np.argmax returns the
    FIRST max and _LANGS is sorted), confidence = best/total."""
    vocab, membership = _tables()
    if token_lists is None:
        token_lists = texts.fillna("").str.split()
    lens = token_lists.str.len().to_numpy(dtype=np.int64)
    n_docs = len(texts)
    hits = np.zeros((n_docs, len(_LANGS)), dtype=np.float64)
    if lens.sum() > 0:
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in token_lists.tolist()
             if t])
        idx = pd.Series(flat).map(vocab).to_numpy(dtype=np.float64)
        doc_idx = np.repeat(np.arange(n_docs), lens)
        known = ~np.isnan(idx)
        np.add.at(hits, doc_idx[known],
                  membership[idx[known].astype(np.int64)])
    n = np.maximum(lens, 1).astype(np.float64)
    scores = hits / n[:, None]
    best_j = np.argmax(scores, axis=1)          # first max = smallest lang
    best = scores[np.arange(n_docs), best_j]
    total = scores.sum(axis=1)
    conf = np.divide(best, total, out=np.zeros(n_docs),
                     where=total > 0)
    return pd.DataFrame({
        "lang_pred": [_LANGS[j] for j in best_j],
        "lang_conf": conf})


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
