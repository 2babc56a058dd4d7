"""Physical-plan shape assertions (.explain contracts).

Correct results are necessary, not sufficient — at 100 TB the PLAN is
the product. These tests pin the plan properties the scale design
depends on: filter/column pushdown into the parquet scan, broadcast
joins for dims, ONE fused ArrowEvalPython stage, map-side partial
aggregation, and no shuffle for bucket-local reads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from luzzu_spark.fixtures import as_webpages, load_table
from luzzu_spark.pipeline import QualityPipeline

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    d = load_table(spark, SF, "documents").where(F.col("lang") == "en") \
        .select("doc_id")
    plan = _plan(d)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan \
        or "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan, plan


def test_column_pruning_reaches_scan(spark):
    d = load_table(spark, SF, "lineitem") \
        .groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(d)
    # ReadSchema must carry ONLY the two referenced columns
    assert "ReadSchema: struct<l_quantity:double,l_returnflag:string>" \
        in plan.replace("\n", ""), plan


def test_dim_join_is_broadcast(spark):
    n = load_table(spark, SF, "nation")
    r = load_table(spark, SF, "region")
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pipeline_single_arrow_stage(spark):
    pages = as_webpages(load_table(spark, SF, "documents"))
    a = QualityPipeline().assess(pages)
    plan = _plan(a)
    assert plan.count("ArrowEvalPython") == 1, (
        "plugin-rule UDFs must fuse into ONE ArrowEvalPython stage "
        "(text crosses the JVM/Python boundary once)")
    assert "BatchEvalPython" not in plan, "no row-at-a-time Python"


def test_agg_is_partial_then_final(spark):
    li = load_table(spark, SF, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(agg)
    assert "partial_sum" in plan, plan  # map-side combine before shuffle


def test_topk_uses_take_ordered(spark):
    p = load_table(spark, SF, "part")
    q = p.select("p_partkey", "p_retailprice") \
        .orderBy(F.desc("p_retailprice")).limit(5)
    assert "TakeOrderedAndProject" in _plan(q)


def test_semi_join_stays_semi(spark):
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    assert "LeftSemi" in _plan(j)


def test_bucketed_sink_seen_join_no_corpus_shuffle(spark, tmp_path):
    """The REAL corpus sink (write_filtered bucket_table=...) feeds the
    cross-run seen-set anti-join with NO shuffle on the committed side.

    At 10^12 docs the committed corpus must never reshuffle; only the
    incoming batch pays one Exchange to align with the bucketing."""
    from luzzu_spark.dedup import seen_anti_join
    docs = load_table(spark, SF, "documents")
    pages = as_webpages(docs)
    pipe = QualityPipeline()
    pipe.write_filtered(pages, str(tmp_path / "corpus"),
                        bucket_table="seen_corpus_plan", n_buckets=8)
    try:
        seen = spark.table("seen_corpus_plan")
        batch = pages.select("url", "doc_id")
        # fixture tables are tiny, so AQE would pick broadcast (which
        # also disables bucket scans); force the sort-merge path the
        # bucketing exists for — at corpus scale neither side is
        # broadcastable
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(seen_anti_join(batch, seen))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, (
            "only the incoming batch may shuffle; the bucketed corpus "
            "side must be exchange-free:\n" + plan)
        # the corpus side reads the url key only — text never scans
        assert "ReadSchema: struct<url:string>" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS seen_corpus_plan")


def test_scrub_filter_not_recomputed_in_scan(spark):
    """The dedup explode path must not duplicate the shingle expression
    into a pushed-down filter (the regression this repo hit: a
    size(shingles)>0 pre-filter re-evaluated tokenize→hash→shingle 3×
    below the projection)."""
    from luzzu_spark import dedup
    docs = load_table(spark, SF, "documents")
    sigs = dedup.minhash_signatures(docs)
    plan = _plan(sigs)
    # the tokenize expression (split) appears in projections only —
    # never inside a Filter condition
    for line in plan.splitlines():
        if line.strip().startswith("Condition") and "split(" in line:
            raise AssertionError(
                "shingle pipeline duplicated into a Filter:\n" + line)


def test_ivf_probe_join_is_broadcast_no_row_python(spark):
    """IVF search: exploded query probes must BROADCAST onto the
    indexed corpus (the corpus never shuffles for a search), and all
    Python stages must be Arrow-vectorized."""
    from luzzu_spark import ivf
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    plan = _plan(ivf.ivf_topk(emb, q, k=5, nprobe=2, n_lists=8))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_ivf_persisted_index_prunes_at_scan_time(spark, tmp_path):
    """VERDICT r02 item 6: a search against the PERSISTED IVF index
    (partitioned by list_id) must open only the probed cell
    directories — PartitionFilters in the plan, probed dirs only in
    inputFiles() — and return exactly what the in-memory path returns
    with the same centroids/nprobe."""
    import re

    from luzzu_spark import ivf
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    indexed, centroids = ivf.build_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    ivf.persist_index(indexed, path)

    out = ivf.ivf_topk_over_index(spark, path, q, centroids,
                                  k=5, nprobe=2)
    plan = _plan(out)
    m = re.search(r"PartitionFilters: \[[^\]]*list_id", plan)
    assert m, plan

    probed = {r["list_id"] for r in
              ivf._probed_queries(q, centroids, 2, "vec_id", "embedding")
              .select("list_id").distinct().collect()}
    # inputFiles() lists PRE-pruning candidates; the executed scan's
    # input_file_name() shows which cell directories were actually read
    pruned_scan = (spark.read.parquet(path)
                   .where(F.col("list_id").isin(sorted(probed))))
    opened = {int(re.search(r"list_id=(\d+)", r["f"]).group(1))
              for r in pruned_scan.select(
                  F.input_file_name().alias("f")).distinct().collect()}
    assert opened == probed, (opened, probed)
    assert len(opened) < 8, "pruning read every cell"

    want = sorted((r["query_id"], r["rnk"], r["neighbor_id"])
                  for r in ivf.ivf_topk(emb, q, k=5, nprobe=2, n_lists=8,
                                        centroids=centroids).collect())
    got = sorted((r["query_id"], r["rnk"], r["neighbor_id"])
                 for r in out.collect())
    assert got == want


def test_ngram_jaccard_no_cartesian(spark):
    """Exact-Jaccard pairs must block via the inverted shingle index —
    an equi-join on the shingle key, never an all-pairs product."""
    from luzzu_spark import queries_text  # noqa: F401 — registry import
    from luzzu_spark.queries import queries
    df = queries()["dedup_ngram_jaccard_exact"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_no_text_typed_shuffle_keys(spark):
    """VERDICT r02 items 2-3: the cross-doc span scrub and the
    benchmark-decontamination check must shuffle/join on FIXED-WIDTH
    md5 digests — raw span/gram/text columns may never be
    partitioning keys (at corpus scale that ships the whole text body
    through the wire as keys). Same regex the fleet-wide audit
    (scripts/plan_audit.py) applies to every catalog query."""
    import re

    import scripts.plan_audit as audit_mod
    from luzzu_spark import queries_text  # noqa: F401 — registry import
    from luzzu_spark.queries import queries

    for name in ("dedup_cross_doc_spans", "docs_benchmark_contamination"):
        plan = _plan(queries()[name](spark, SF))
        offenders = audit_mod._text_shuffle_keys(plan)
        assert not offenders, f"{name}: {offenders}"

    # the span-count pass actually keys on the md5 digest
    span_plan = _plan(queries()["dedup_cross_doc_spans"](spark, SF))
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)", span_plan)
    assert any("span_key#" in k for k in keys), span_plan


def test_q19_disjunction_stays_hash_join(spark):
    """The OR-bundle join (TPC-H Q19 shape) must extract the common
    equi-key into a hash join with the disjunction as residual — never
    degrade to a nested-loop/cartesian product."""
    from luzzu_spark.queries import queries
    plan = _plan(queries()["q19_disjunctive_predicates"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_blocklist_join_is_broadcast_anti(spark):
    """The domain blocklist must apply as a broadcast anti-join — the
    corpus side never shuffles for it."""
    from luzzu_spark import queries_web  # noqa: F401 — registry import
    from luzzu_spark.queries import queries
    plan = _plan(queries()["url_host_blocklist"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q17_subquery_is_decorrelated(spark):
    """The correlated scalar subquery must decorrelate into a
    per-partkey aggregate + join (one extra shuffle), not a per-row
    re-execution of the subquery."""
    from luzzu_spark.queries import queries
    df = queries()["q17_small_quantity_revenue"](spark, SF)
    opt = _optimized(df)
    plan = _plan(df)
    assert "scalar-subquery" not in opt.lower(), opt
    assert plan.count("Aggregate") >= 1 and "Join" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_persisted_index_prunes_at_scan_time(spark, tmp_path):
    """The compressed PQ index shares the production layout: persisted
    partitioned by list_id, a search pushes its probe list into the
    scan as a partition filter (PartitionFilters) and returns exactly
    what the in-memory ivfpq path returns with the same models."""
    import re

    from luzzu_spark import ivf, pq
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    models = pq.train_ivfpq(emb, n_lists=8)
    indexed = pq.build_pq_index(emb, *models)
    path = str(tmp_path / "pq_index")
    ivf.persist_index(indexed, path)

    out = pq.ivfpq_topk_over_index(spark, path, q, models, emb,
                                   k=5, nprobe=2)
    plan = _plan(out)
    assert re.search(r"PartitionFilters: \[[^\]]*list_id", plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    want = sorted((r["query_id"], r["rnk"], r["neighbor_id"])
                  for r in pq.ivfpq_topk(emb, q, k=5, nprobe=2,
                                         n_lists=8,
                                         models=models).collect())
    got = sorted((r["query_id"], r["rnk"], r["neighbor_id"])
                 for r in out.collect())
    assert got == want


def test_incremental_minhash_committed_side_bucket_aligned(spark,
                                                           tmp_path):
    """Cross-run near-dup search: BOTH committed index scans (band
    table and signature table) must read bucket-aligned — the
    10^12-row index never reshuffles for a daily batch; only the
    batch side pays exchanges, and its signature exchange is shared
    (ReusedExchange) so the MinHash UDF runs once per batch. Asserted
    on the EXECUTED adaptive plan (exchange reuse only materializes at
    runtime)."""
    from luzzu_spark import dedup
    docs = load_table(spark, SF, "documents")
    sigs_t, bands_t = "plan_inc_sigs", "plan_inc_bands"
    try:
        dedup.commit_minhash_index(docs, sigs_t, bands_t,
                                   str(tmp_path / "inc_idx"),
                                   n_buckets=4)
        new = docs.withColumn("doc_id", F.col("doc_id") + 100000)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = dedup.incremental_minhash_pairs(spark, new, sigs_t,
                                                 bands_t, threshold=0.5)
            df.collect()  # AQE finalizes the plan at execution
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the adaptive plan string repeats each stage's subtree, so
        # the two logical scans can print more than twice — every
        # occurrence must be bucket-aligned
        scans = [ln for ln in plan.splitlines()
                 if "FileScan parquet" in ln
                 and ("plan_inc_sigs" in ln or "plan_inc_bands" in ln)]
        assert len(scans) >= 2, plan
        assert any("plan_inc_sigs" in ln for ln in scans), plan
        assert any("plan_inc_bands" in ln for ln in scans), plan
        for ln in scans:
            assert "Bucketed: true" in ln, ln
        assert "ReusedExchange" in plan, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {sigs_t}")
        spark.sql(f"DROP TABLE IF EXISTS {bands_t}")


def test_aqe_splits_planted_skew_join(spark):
    """The 10^12-doc design claims AQE absorbs residual host skew that
    salting doesn't pre-treat (BASELINE.md design-scale table). Proven
    on an executed plan: a 90%-hot-key join under corpus-shaped
    thresholds makes AQE split the skewed partition —
    SortMergeJoin(skew=true) — with results identical to the
    untreated join."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    big = (spark.range(100000)
           .withColumn("host",
                       F.when(F.col("id") % 10 < 9, F.lit(0))
                       .otherwise((F.col("id") % 1000).cast("long")))
           .withColumn("payload", F.concat_ws("", *[
               F.md5(F.col("id").cast("string"))] * 4)))
    dim = spark.range(1000).select(
        F.col("id").alias("host"),
        F.md5(F.col("id").cast("string")).alias("meta"))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = big.join(dim, "host")
        n_skew = j.count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert n_skew == big.join(dim, "host").count()


def test_corpus_sink_prunes_lang_partitions(spark, tmp_path):
    """The lang-partitioned corpus sink (write_filtered) must give a
    per-language reader scan-time pruning: the lang predicate lands in
    PartitionFilters, and input_file_name() on the executed scan shows
    ONLY the matching lang directory was read — at 100 TB a
    one-language job touches 1/N of the corpus bytes."""
    import re

    pages = as_webpages(load_table(spark, SF, "documents"))
    out = str(tmp_path / "corpus")
    QualityPipeline().write_filtered(pages, out)

    reader = spark.read.parquet(out).where(F.col("lang") == "en") \
        .select("doc_id", "lang")
    plan = _plan(reader)
    assert re.search(r"PartitionFilters: \[[^\]]*lang", plan), plan

    files = {r["f"] for r in
             reader.select(F.input_file_name().alias("f")).collect()}
    assert files and all("lang=en" in f for f in files), files



def test_no_unbounded_driver_materialization():
    """Source-level audit (VERDICT r03): every .collect()/.toPandas()
    in luzzu_spark/ must be allow-listed in plan_audit with the bound
    that justifies it (centroid samples, ≤256² Gram rows, nprobe ids).
    A new corpus-shaped driver materialization fails here before it
    ever reaches a cluster."""
    import scripts.plan_audit as pa
    hits = pa.driver_materialization_hits()
    assert hits == [], hits


def test_bloom_index_filter_plan_shapes(spark, tmp_path):
    """The persisted Bloom index's two layouts, plan-pinned:

    S=1 — ZERO exchanges, one ArrowEvalPython over the broadcast
    bitmap: the map-only claim (SHUFFLE.md measures it at 0 bytes).
    S>1 — exactly ONE Exchange (the batch aligning to shard files);
    the per-task shard load is a mapInPandas, not a join, so the
    committed index contributes no scan at all in either layout."""
    from luzzu_spark import dedup

    keys = spark.createDataFrame(
        [(f"http://a.example/{i}",) for i in range(300)], "url string")
    idx1 = str(tmp_path / "p1")
    idx8 = str(tmp_path / "p8")
    dedup.bloom_index_commit(keys, "url", idx1, shards=1)
    dedup.bloom_index_commit(keys, "url", idx8, shards=8)
    batch = spark.createDataFrame(
        [(f"http://b.example/{i}", i) for i in range(300)],
        "url string, doc_id long")

    p1 = _plan(dedup.bloom_index_filter(batch, idx1, "url"))
    assert "Exchange" not in p1, p1
    assert p1.count("ArrowEvalPython") == 1, p1

    p8 = _plan(dedup.bloom_index_filter(batch, idx8, "url"))
    assert p8.count("Exchange hashpartitioning") == 1, p8
    assert "MapInPandas" in p8, p8
    # no second scan: the index is files, not a joined relation
    assert p8.count("Scan") <= p1.count("Scan") + 1, p8
