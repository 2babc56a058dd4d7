"""Multimodal plumbing: schemas, determinism, join-back, strict gate.

The codecs are deterministic fakes (no image/audio libs in this
container); what these tests pin down is the Spark-side contract —
batch shapes, schema, null/oversize guards, reproducibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luzzu_spark import multimodal
from luzzu_spark.fixtures import as_webpages, load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return as_webpages(load_table(spark, SF, "documents")).limit(50)


def test_image_metadata_schema_and_join(spark, pages):
    out = multimodal.with_image_metadata(pages)
    assert {"width", "height", "channels", "format"} <= set(out.columns)
    rows = out.select("width", "height", "channels").collect()
    assert len(rows) == 50
    assert all(64 <= r.width < 576 and r.channels == 3 for r in rows)


def test_image_metadata_duplicate_keys_no_blowup(spark, pages):
    """A pre-dedup crawl repeats urls; the metadata join must stay one
    output row per input row, not n×n per duplicated key
    (review r05)."""
    doubled = pages.unionByName(pages)
    out = multimodal.with_image_metadata(doubled)
    assert out.count() == doubled.count()
    assert out.where("width IS NULL").count() == 0


def test_video_frame_samples_invalid_n_frames(spark, pages):
    """n_frames < 1 fails on the driver with a clear message, not as a
    per-row ZeroDivisionError inside the Arrow worker (review r05)."""
    import pytest
    with pytest.raises(ValueError, match="n_frames"):
        multimodal.video_frame_samples(pages, n_frames=0)


def test_image_features_deterministic(spark, pages):
    f1 = multimodal.image_features(pages).orderBy("url").collect()
    f2 = multimodal.image_features(pages).orderBy("url").collect()
    assert [r.feature for r in f1] == [r.feature for r in f2]
    assert all(len(r.feature) == multimodal.IMAGE_FEATURE_DIM
               and r.ok for r in f1)
    # histogram features are probability masses
    assert all(abs(sum(r.feature) - 1.0) < 1e-3 for r in f1)


def test_video_frame_samples(spark, pages):
    out = multimodal.video_frame_samples(pages, n_frames=3)
    assert out.columns == ["url", "frame_idx", "frame_hash"]
    per_url = (out.groupBy("url")
               .agg(F.count(F.lit(1)).alias("n")).collect())
    assert all(1 <= r.n <= 3 for r in per_url)
    assert len(per_url) == 50


def test_null_payload_guard(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b"\x89PNG fake bytes")],
        "url string, html binary")
    feats = {r.url: r for r in multimodal.image_features(df).collect()}
    assert feats["u1"].ok is False
    assert feats["u2"].ok is True


def test_strict_mode_raises(spark, pages):
    with pytest.raises(Exception) as exc:
        multimodal.image_features(pages.limit(2), strict=True).collect()
    assert "NotImplementedError" in str(exc.value) \
        or isinstance(exc.value, NotImplementedError)


def test_image_features_feed_ann_search(spark, pages):
    """End-to-end multimodal→ANN: image_features' array<float> output
    is the embeddings contract, so it must flow straight into the
    similarity module's IVF search — decode features, build an index
    over them, query with a subset, get exact-cosine-scored neighbors.
    Proves the contract claim in image_features' docstring for real."""
    from luzzu_spark import ivf

    feats = (multimodal.image_features(pages)
             .where(F.col("ok"))
             .select(F.col("url").alias("vec_id"),
                     F.col("feature").cast("array<float>")
                     .alias("embedding")))
    n = feats.count()
    assert n >= 50
    q = feats.limit(3)
    got = ivf.ivf_topk(feats, q, k=3, nprobe=8, n_lists=8,
                       id_col="vec_id", vec_col="embedding").collect()
    qids = {r["query_id"] for r in got}
    assert len(qids) == 3
    for r in got:
        assert r["neighbor_id"] != r["query_id"]
        assert -1.0 - 1e-9 <= r["sim"] <= 1.0 + 1e-9
