"""Quality-metadata aggregates — the daQ observation graph, recast.

Luzzu persists queryable quality metadata per run (Category → Dimension
→ Metric → Observation; /root/reference/README.md:6,8) plus dataset
rankings (README.md:15). Here each artifact is an aggregate DataFrame
over the assessed corpus — partial aggregation, rollups and window
ranks all ride Catalyst; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from luzzu_spark.rules import spec

# daQ facet mapping: category → dimension → metric (frozen; the rollup
# query reports observations at every level of this hierarchy).
RULE_FACETS: dict[str, tuple[str, str]] = {
    "min_chars": ("intrinsic", "conciseness"),
    "word_count": ("intrinsic", "conciseness"),
    "mean_word_len": ("intrinsic", "interpretability"),
    "max_word_len": ("intrinsic", "interpretability"),
    "symbol_ratio": ("intrinsic", "cleanliness"),
    "stopword_frac": ("intrinsic", "naturalness"),
    "dup_ngram_frac": ("intrinsic", "conciseness"),
    "langid_conf": ("contextual", "understandability"),
    "perplexity": ("contextual", "naturalness"),
    # opt-in compliance rule (registry.robots_noindex_rule); absent
    # from the default registry, so the frozen daQ hierarchy output is
    # unchanged unless --drop-noindex registers it
    "robots_noindex": ("accessibility", "licensing"),
}


def partition_lineage(assessed: DataFrame) -> DataFrame:
    """Per-partition lineage + keep/drop counts (BASELINE.json:6,14).

    spark_partition_id ties each aggregate row to the physical partition
    that produced it — the resumability/audit unit. Map-side partial
    aggregation makes this one narrow shuffle of num_partitions rows.
    """
    return (assessed
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_keep"),
                 F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


def rule_firing_rates(assessed: DataFrame) -> DataFrame:
    """Per-rule fired counts + rates, ONE aggregation job.

    Explodes the rule_scores map (every doc scores every rule, so each
    rule's group size IS the doc total — no separate count() job that
    would recompute the assessed frame when the caller didn't persist
    it, VERDICT r1). Rules that never fired appear with n_fired = 0."""
    per = (assessed
           .select(F.explode("rule_scores").alias("rule", "_v"),
                   "drop_reasons")
           .withColumn("fired", F.array_contains(
               "drop_reasons", F.col("rule")).cast("long")))
    return (per.groupBy("rule")
            .agg(F.sum("fired").alias("n_fired"),
                 F.count(F.lit(1)).alias("n_docs"))
            .withColumn("fire_rate",
                        F.try_divide(F.col("n_fired"), F.col("n_docs")))
            .select("rule", "n_fired", "fire_rate")
            .orderBy("rule"))


def score_histogram(assessed: DataFrame, rule: str, lo: float, hi: float,
                    n_buckets: int = 20) -> DataFrame:
    """Fixed-width histogram of one rule's score column.

    Bucket index via floor arithmetic (portable to any SQL oracle);
    clamped to [0, n_buckets-1]; one narrow groupBy on a small key."""
    if hi <= lo:
        raise ValueError(f"score_histogram needs hi > lo, got "
                         f"[{lo}, {hi}] — a degenerate range would "
                         "divide by zero (review r05)")
    col = F.col(f"score_{rule}").cast("double")
    step = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0),
                   F.floor((col - F.lit(lo)) / F.lit(step)).cast("int")))
    return (assessed
            .where(col.isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("bucket"))


def observations(assessed: DataFrame) -> DataFrame:
    """Long-form daQ observations: (category, dimension, metric,
    mean/min/max score, fire count) — from ONE pass via explode of the
    rule_scores map, not one job per rule."""
    facet_map = F.create_map(*[
        x for rule, (cat, dim) in RULE_FACETS.items()
        for x in (F.lit(rule), F.array(F.lit(cat), F.lit(dim)))])
    per_rule = (assessed
                .select(F.explode("rule_scores").alias("metric", "value"),
                        F.col("drop_reasons"))
                .withColumn("fired", F.array_contains(
                    "drop_reasons", F.col("metric")))
                .withColumn("facets", facet_map[F.col("metric")]))
    return (per_rule.groupBy("metric")
            .agg(F.first(F.col("facets")[0]).alias("category"),
                 F.first(F.col("facets")[1]).alias("dimension"),
                 F.avg("value").alias("mean_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"),
                 F.sum(F.col("fired").cast("long")).alias("n_fired"),
                 F.count(F.lit(1)).alias("n_obs"))
            .orderBy("metric"))


def facet_rollup(assessed: DataFrame) -> DataFrame:
    """daQ hierarchy rollup: observations at metric / dimension /
    category / grand-total grains in one ROLLUP aggregation."""
    obs = observations(assessed)
    return (obs.rollup("category", "dimension", "metric")
            .agg(F.sum("n_fired").alias("n_fired"),
                 F.sum("n_obs").alias("n_obs"),
                 F.avg("mean_value").alias("mean_of_means"))
            .orderBy("category", "dimension", "metric"))


def quality_score(assessed: DataFrame,
                  weights: dict[str, float] | None = None) -> DataFrame:
    """Composite per-doc quality score = weighted pass fraction
    (Luzzu's user-weighted metric sum, README.md:15)."""
    w = weights or {r: 1.0 for r in spec.RULE_ORDER}
    total = sum(w.values())
    passed = [
        F.when(F.array_contains("drop_reasons", F.lit(r)), F.lit(0.0))
        .otherwise(F.lit(wt)) for r, wt in w.items()]
    score = sum(passed[1:], passed[0]) / F.lit(total)
    return assessed.withColumn("quality_score", score)


def rank_sources(assessed: DataFrame, by: str = "source") -> DataFrame:
    """Dataset ranking recast: rank sources/hosts by mean quality.

    mean_quality folds to exact integers before the one double
    division (sum of passed-rule counts / (|rules| × n)): a float
    avg() of per-doc k/9 scores is order-dependent (1/9 is not
    representable — CLAUDE.md rule 12), so this form is what makes the
    ranking both deterministic under any partitioning and
    hash-replayable by the DuckDB verdict oracle
    (queries_ml.pipeline_rank_sources). Numerically it is the same
    mean, computed associatively."""
    n_rules = len(spec.RULE_ORDER)
    n_passed = (F.lit(n_rules)
                - F.size(F.array_intersect(
                    "drop_reasons",
                    F.array(*[F.lit(r) for r in spec.RULE_ORDER]))))
    agg = (assessed.groupBy(by)
           .agg((F.sum(n_passed.cast("long"))
                 / (float(n_rules) * F.count(F.lit(1))))
                .alias("mean_quality"),
                F.count(F.lit(1)).alias("n_docs")))
    w = Window.orderBy(F.desc("mean_quality"), F.asc(by))
    return agg.withColumn("rank", F.rank().over(w))
