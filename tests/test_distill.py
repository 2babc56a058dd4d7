"""Quality-classifier distillation contracts (luzzu_spark/distill.py):
the distributed Gram accumulation is EXACT (pinned against numpy on
the same vectors), the solve is partition-invariant, the driver
payload is bounded, and the student actually learns the teacher."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from luzzu_spark import distill

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_gram_matches_numpy_on_tiny_corpus(spark):
    """XᵀX from the self-join must equal numpy's outer-product sum over
    the same per-doc count vectors — exact, not approximate."""
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog ate the cat food"),
            (3, "rockets need staging to reach orbit")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = distill.doc_features(docs)

    # dense per-doc vectors from the same frame
    X = np.zeros((3, distill.N_BUCKETS))
    for r in feats.collect():
        X[r["doc_id"] - 1, int(r["bh"], 16)] = r["cnt"]
    want = X.T @ X

    got = np.zeros_like(want)
    for r in distill.gram_frame(feats).collect():
        got[int(r["bh_i"], 16), int(r["bh_j"], 16)] = r["g"]
    assert np.array_equal(got, want)
    assert np.array_equal(got, got.T)  # symmetric by construction


def test_solve_is_partition_invariant(spark):
    """Exact-integer aggregates make the ridge solve independent of
    storage order and parallelism."""
    feats = distill.doc_features(_docs(spark))
    w1 = distill.train_student(feats)
    w2 = distill.train_student(feats.repartition(7))
    assert np.array_equal(w1, w2)


def test_driver_payload_is_bounded(spark):
    """The only collected frames are the Gram (≤ 256² rows) and XtY
    (≤ 256 rows) — corpus size never reaches the driver."""
    feats = distill.doc_features(_docs(spark))
    assert distill.gram_frame(feats).count() <= distill.N_BUCKETS ** 2
    assert distill.xty_frame(feats).count() <= distill.N_BUCKETS


def test_student_learns_teacher(spark):
    """End-to-end distillation: thresholded student predictions agree
    with the teacher rule on ≥ 80% of docs (measured 0.86 at sf0.01),
    and the teacher is non-degenerate on the fixture (both classes)."""
    out = distill.distill(_docs(spark))
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("y") == F.col("y_hat")).cast("long")).alias("ok"),
        F.sum("y").alias("pos")).collect()[0]
    assert 0 < agg["pos"] < agg["n"], "degenerate teacher"
    assert agg["ok"] / agg["n"] >= 0.8, agg


def test_distill_keeps_zero_token_docs(spark):
    """Zero-token docs have no feature rows to explode; the per-doc
    contract must still return them (y=0, score=0.0, ŷ=0) instead of
    silently dropping rows (review r05)."""
    base = _docs(spark).limit(20)
    extra = spark.createDataFrame(
        [(990001, ""), (990002, "   "), (990003, None)],
        "doc_id long, text string")
    docs = base.select("doc_id", "text").unionByName(extra)
    out = distill.distill(docs)
    assert out.count() == docs.count()
    empt = {r["doc_id"]: (r["y"], r["score"], r["y_hat"])
            for r in out.where("doc_id >= 990000").collect()}
    assert empt == {990001: (0, 0.0, 0), 990002: (0, 0.0, 0),
                    990003: (0, 0.0, 0)}


def test_scoring_path_has_no_python(spark):
    """Scoring = broadcast weight join + hash agg: no Python eval node
    of any kind in the plan."""
    feats = distill.doc_features(_docs(spark))
    w = np.zeros(distill.N_BUCKETS)
    plan = (distill.student_scores(feats, w)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
