"""Resume contract (SURVEY.md §5 item 4): kill after partial commit,
re-run, assert no reprocessing and identical final state."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from luzzu_spark.checkpoint import BatchManifest, ResumableRun, plan_batches
from luzzu_spark.fixtures import as_webpages, load_table
from luzzu_spark.pipeline import QualityPipeline


@pytest.fixture(scope="module")
def multi_file_input(spark, tmp_path_factory):
    """4-file parquet copy of sf0.001 documents (fixture ships 1 file;
    resume batching needs several)."""
    path = str(tmp_path_factory.mktemp("ckpt") / "docs_in")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(4).write.mode("overwrite").parquet(path)
    return path


def _run(batch_size=1):
    pipe = QualityPipeline()
    return ResumableRun(
        transform=lambda pages: pipe.filtered(
            as_webpages(pages, inject_pii=True)),
        batch_size=batch_size)


def test_batch_plan_deterministic(spark, multi_file_input):
    files = spark.read.parquet(multi_file_input).inputFiles()
    assert plan_batches(files, 1) == plan_batches(list(reversed(files)), 1)
    ids = [b for b, _ in plan_batches(files, 1)]
    assert len(ids) == len(set(ids)) == 4


def test_resume_skips_committed(spark, multi_file_input, tmp_path):
    out = str(tmp_path / "out")
    r = _run()
    first = r.run(spark, multi_file_input, out, max_batches=2)
    assert len(first["processed"]) == 2 and not first["complete"]

    second = r.run(spark, multi_file_input, out)
    assert sorted(second["skipped"]) == sorted(first["processed"])
    assert second["complete"]
    # every batch committed exactly once
    man = BatchManifest(os.path.join(out, "_manifest"))
    assert len(man.committed()) == 4

    third = r.run(spark, multi_file_input, out)
    assert third["processed"] == [] and third["complete"]


def test_resumed_equals_oneshot(spark, multi_file_input, tmp_path):
    resumed, oneshot = str(tmp_path / "resumed"), str(tmp_path / "oneshot")
    r = _run()
    r.run(spark, multi_file_input, resumed, max_batches=1)
    r.run(spark, multi_file_input, resumed)
    r2 = _run()
    assert r2.run(spark, multi_file_input, oneshot)["complete"]

    def digest(path):
        df = spark.read.parquet(ResumableRun.output_glob(path))
        return (df.select(F.md5(F.concat_ws("|", "url", "text")).alias("h"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.conv(F.substring("h", 1, 8), 16, 10)
                           .cast("long")).alias("s")).collect()[0])

    assert digest(resumed) == digest(oneshot)


def test_metrics_sidecar(spark, multi_file_input, tmp_path):
    from luzzu_spark.metrics import partition_lineage
    out = str(tmp_path / "with_metrics")
    pipe = QualityPipeline()
    r = ResumableRun(
        transform=lambda pages: pipe.filtered(
            as_webpages(pages, inject_pii=True)),
        metrics_fn=lambda pages: partition_lineage(
            pipe.assess(as_webpages(pages, inject_pii=True))),
        batch_size=2)
    summary = r.run(spark, multi_file_input, out)
    assert summary["complete"] and len(summary["processed"]) == 2
    m = spark.read.parquet(os.path.join(out, "metrics/batch=*"))
    total = m.agg(F.sum("n_docs")).collect()[0][0]
    assert total == 500  # every sf0.001 doc accounted for in lineage
