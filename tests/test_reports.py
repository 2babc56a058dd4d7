"""Quality-metadata sinks (daQ/QPRO recast): write_reports contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from luzzu_spark.fixtures import as_webpages, load_table
from luzzu_spark.metrics import (facet_rollup, observations,
                                 partition_lineage, rank_sources)
from luzzu_spark.pipeline import QualityPipeline
from luzzu_spark.rules import spec

SF = "/root/testdata/sf0.001"


def test_write_reports_roundtrip(spark, tmp_path):
    path = str(tmp_path / "reports")
    pipe = QualityPipeline()
    pages = as_webpages(load_table(spark, SF, "documents"),
                        inject_pii=True)
    assessed = pipe.assess(pages)
    pipe.write_reports(assessed, path, run_id="run1")
    pipe.write_reports(assessed, path, run_id="run2")

    obs = spark.read.parquet(f"{path}/observations")
    assert set(r.run_id for r in obs.select("run_id")
               .distinct().collect()) == {"run1", "run2"}
    # one observation row per rule per run
    per_run = obs.groupBy("run_id").count().collect()
    assert all(r["count"] == len(spec.RULE_ORDER) for r in per_run)

    lin = spark.read.parquet(f"{path}/lineage") \
        .where(F.col("run_id") == "run1")
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == 500

    prob = spark.read.parquet(f"{path}/problems") \
        .where(F.col("run_id") == "run1")
    # every problem row names a registered rule
    rules = {r.rule for r in prob.select("rule").distinct().collect()}
    assert rules <= set(spec.RULE_ORDER)
    # dropped docs == docs with ≥1 problem row
    n_dropped = assessed.where(~F.col("keep")).count()
    assert prob.select("url").distinct().count() == n_dropped


def test_observation_facets_complete(spark, assessed):
    obs = observations(assessed)
    rows = {r.metric: r for r in obs.collect()}
    assert set(rows) == set(spec.RULE_ORDER)
    assert all(r.n_obs == 500 for r in rows.values())
    assert all(r.category in ("intrinsic", "contextual")
               for r in rows.values())


def test_facet_rollup_grains(spark, assessed):
    roll = facet_rollup(assessed).collect()
    # grand total + per-category + per-dimension + per-metric grains
    grand = [r for r in roll if r.category is None]
    assert len(grand) == 1
    assert grand[0].n_obs == 500 * len(spec.RULE_ORDER)


def test_rank_sources_deterministic(spark, assessed):
    r1 = rank_sources(assessed).collect()
    r2 = rank_sources(assessed).collect()
    assert r1 == r2
    ranks = [r.rank for r in r1]
    assert ranks[0] == 1 and ranks == sorted(ranks)
