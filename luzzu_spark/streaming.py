"""Structured Streaming variant — Luzzu's incremental assessment mode.

Luzzu's processor is a bounded-queue stream over a dataset's quads
(/root/reference/README.md:12; SURVEY.md §3.1) — single pass, memory
O(metric state). The Spark recast uses Structured Streaming with
watermarks for bounded state (a notion Luzzu never needed: its input is
a finite file, ours is an unbounded crawl feed):

- quality assessment itself is stateless per row → the SAME pipeline
  transforms (rules, verdict, scrub) apply to a streaming DataFrame
  unchanged; this module wires them to readStream/writeStream.
- metric aggregates become windowed aggregations + watermark;
- seen-URL dedup becomes dropDuplicatesWithinWatermark (state bounded
  by the watermark horizon instead of growing forever).

Every builder takes/returns DataFrames so batch tests can exercise the
identical expressions; streaming tests run the real engine against a
file source over the events/documents fixtures with an in-memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from luzzu_spark.pipeline import QualityPipeline


def read_page_stream(spark: SparkSession, path: str,
                     schema, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a page-table directory: each newly
    landed file is one micro-batch increment (the crawl-feed shape).
    maxFilesPerTrigger bounds per-batch work — at production scale this
    is the ingest back-pressure knob."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def assess_stream(pages: DataFrame,
                  pipeline: QualityPipeline | None = None) -> DataFrame:
    """The full quality pipeline over a streaming DataFrame.

    Works unchanged because every pipeline stage is a stateless
    projection/filter (scores, UDFs, verdict, scrub) — no global agg
    inside assess(). auto_spread is disabled on a COPY of the supplied
    pipeline (dataclasses.replace — mutating the argument would
    silently strip auto_spread from a shared instance's later batch
    use, ADVICE r1): repartition-by-number is not valid
    pre-aggregation in a stream, and micro-batch file splits already
    set parallelism."""
    import dataclasses
    pipe = (dataclasses.replace(pipeline, auto_spread=False)
            if pipeline is not None else QualityPipeline(auto_spread=False))
    return pipe.assess(pages)


def windowed_verdict_counts(assessed: DataFrame, ts_col: str = "warc_ts",
                            window: str = "10 minutes",
                            watermark: str = "30 minutes") -> DataFrame:
    """Streaming metric fold: keep/drop counts per tumbling window.

    The watermark bounds state: windows older than the horizon are
    finalized and evicted (late rows beyond it are dropped — a
    correctness/latency trade Luzzu's finite single pass never faced)."""
    return (assessed
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("keep").cast("long")).alias("n_keep"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_docs", "n_keep"))


def sliding_event_counts(events: DataFrame, window: str = "10 minutes",
                         slide: str = "5 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Sliding-window stream agg (each event in window/slide windows);
    batch twin: queries_scale.events_sliding_10x5. State per open
    window is bounded by the watermark horizon; the overlap factor
    (window/slide) multiplies state size — the knob to watch at scale.

    ts arrives as TIMESTAMP_NTZ from the parquet fixture; watermarks
    require TIMESTAMP, so cast first (UTC session tz → same instant)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (ev.withWatermark("ts", watermark)
            .groupBy(F.window(F.col("ts"), window, slide).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "n_events", "sum_value"))


def stream_dedup_urls(pages: DataFrame, ts_col: str = "warc_ts",
                      watermark: str = "30 minutes") -> DataFrame:
    """Seen-URL dedup with bounded state: keeps the first occurrence of
    each url within the watermark horizon. The batch twin is
    row_number()-over-url (queries.dedup_first_doc_per_source)."""
    return (pages.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["url"]))


def session_event_counts(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Session windows over the events stream (SURVEY.md §2.8): activity
    sessions close after `gap` of silence per user.

    ts arrives as TIMESTAMP_NTZ from the parquet fixture; watermarks
    require TIMESTAMP, so cast first (UTC session tz → same instant)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window(F.col("ts"), gap).alias("s"),
                     F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id",
                    F.col("s.start").alias("session_start"),
                    F.col("s.end").alias("session_end"),
                    "n_events", "sum_value"))


def view_to_click_join(views: DataFrame, clicks: DataFrame,
                       horizon: str = "10 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream INTERVAL join (SURVEY.md §2.8 family): each view
    joins the same user's clicks landing within `horizon` after it —
    the attribution-window shape (impression→conversion).

    State contract: BOTH sides carry watermarks and the join condition
    time-bounds the match (click_ts in [view_ts, view_ts + horizon]),
    so Spark can evict buffered rows once the watermark passes the
    bound — without the time bound a stream-stream inner join would
    buffer both streams forever. The same builder runs in batch for
    the parity twin (tests/test_streaming.py)."""
    v = (views.withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts")))
    c = (clicks.withColumn("ts", F.col("ts").cast("timestamp"))
         .withWatermark("ts", watermark)
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts")))
    return (v.join(
        c, (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts")
           + F.expr(f"INTERVAL {horizon}")))
        .select(F.col("v_user").alias("user_id"), "view_id", "click_id",
                F.unix_timestamp("view_ts").alias("view_epoch"),
                F.unix_timestamp("click_ts").alias("click_epoch")))


def enrich_with_static(stream_df: DataFrame, dim: DataFrame,
                       key: str = "event_type") -> DataFrame:
    """Stream-STATIC join (SURVEY.md §2.8 family): each micro-batch
    joins the static dimension — no watermark or state needed, because
    the static side is fully known; Spark broadcasts it into every
    batch. The 100 TB shape: a slowly-changing reference table
    (source reputation, host metadata) enriches the live crawl stream
    without any stream-side buffering. Same builder runs in batch for
    the parity twin (tests/test_streaming.py).

    LEFT join (ADVICE r03): events whose key is missing from the
    dimension pass through with NULL enrichment columns instead of
    silently vanishing — enrichment must never act as a filter."""
    return stream_df.join(F.broadcast(dim), key, "left")


def stateful_user_totals(events: DataFrame,
                         watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-user event count + value sum, emitted each micro-batch.

    This is Luzzu's incremental metric fold made explicit — per-key
    state carries (n, sum) across batches exactly like a metric
    object's accumulators across `compute(quad)` calls, and each
    micro-batch emits the updated `metricValue()`. State is bounded by
    the key cardinality (per-user), not the stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key: tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [round(s, 2)]})

    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (ev.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType="user_id bigint, n_events bigint, "
                                 "sum_value double",
                stateStructType="n bigint, s double",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def write_epoch_idempotent(df: DataFrame, out_path: str,
                           epoch_id: int) -> None:
    """Idempotent-per-epoch corpus write: rows land under
    epoch=<id>/ via DYNAMIC partition overwrite, so re-running the
    same epoch REPLACES its directory instead of appending a second
    copy. This is what upgrades foreachBatch from at-least-once to
    effectively-once output (given deterministic batch replay): a
    failure between write and checkpoint commit replays the epoch, and
    the replay rewrites the same directory (ADVICE r02)."""
    # per-write option, NOT the session conf: toggling the global conf
    # races with any concurrent writer in the same session — a second
    # sink restoring 'static' mid-flight would turn this overwrite into
    # a full-corpus wipe (review r05). DataFrameWriter honors the
    # option for path-based writes; the conf dance is only needed for
    # insertInto (commit_minhash_index).
    (df.withColumn("epoch", F.lit(int(epoch_id)))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("epoch").parquet(out_path))


def write_stream_filtered(pages: DataFrame, out_path: str,
                          checkpoint: str,
                          pipeline: QualityPipeline | None = None):
    """Continuous filtered-corpus sink: each micro-batch runs the FULL
    quality pipeline and writes its kept, scrubbed rows under the
    corpus directory's epoch=<id>/ partition. foreachBatch (not a
    plain parquet sink) because the batch is assessed ONCE and could
    fan out to multiple sinks — metrics/report writers slot in next to
    the corpus write exactly like the batch ResumableRun.

    Delivery semantics (ADVICE r02): foreachBatch alone is
    at-least-once — a failure between the write and the checkpoint
    commit replays the micro-batch. The write is therefore idempotent
    PER EPOCH (write_epoch_idempotent: dynamic partition overwrite on
    a lit(epoch_id) column), so a replayed batch rewrites the same
    epoch directory and readers never see duplicate rows — the same
    write-then-commit contract as the built-in file sink's log and
    checkpoint.ResumableRun's manifest.

    Streaming twin of pipeline.write_filtered + checkpoint.ResumableRun."""
    import dataclasses
    pipe = (dataclasses.replace(pipeline, auto_spread=False)
            if pipeline is not None
            else QualityPipeline(auto_spread=False))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch_idempotent(pipe.filtered(batch_df), out_path,
                               epoch_id)

    return (pages.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def write_stream_filtered_neardup(pages: DataFrame, out_path: str,
                                  checkpoint: str, index_prefix: str,
                                  index_path: str,
                                  threshold: float = 0.5,
                                  pipeline: QualityPipeline | None = None,
                                  n_buckets: int = 4):
    """write_stream_filtered + a self-maintaining cross-epoch near-dup
    index (the streaming twin of run_filter.py --neardup-index): each
    micro-batch drops documents near-duplicating content KEPT by any
    earlier epoch (bucket-aligned joins against the committed MinHash
    index — the index never shuffles), prunes in-batch clusters, runs
    the full pipeline, writes epoch-idempotently, and appends its kept
    docs' signatures for the next epoch.

    Delivery semantics: BOTH writes are idempotent per epoch. The
    corpus write uses dynamic partition overwrite on an epoch column;
    the index append does the same through
    commit_minhash_index(epoch_id=...) — a replayed micro-batch
    rewrites its own ``epoch=<id>`` partition of the sigs/bands
    tables, so the index row count is invariant under replay
    (VERDICT r03 item 5; pinned by the replay test in
    tests/test_streaming.py)."""
    import dataclasses

    from luzzu_spark.dedup import (commit_minhash_index,
                                   incremental_near_dup_filter)
    pipe = (dataclasses.replace(pipeline, auto_spread=False)
            if pipeline is not None
            else QualityPipeline(auto_spread=False))
    sigs_t = f"{index_prefix}_sigs"
    bands_t = f"{index_prefix}_bands"

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        exists = (spark.catalog.tableExists(sigs_t)
                  and spark.catalog.tableExists(bands_t))
        if exists:
            # exclude_epoch: a replayed epoch must not self-match the
            # signatures its own failed attempt committed (they sit in
            # this epoch's partition and get overwritten below anyway)
            batch_df = incremental_near_dup_filter(
                spark, batch_df, sigs_t, bands_t, threshold=threshold,
                exclude_epoch=epoch_id)
        # pin for the TWO consumers: without it, the corpus write and
        # the index commit each re-execute the full assessment (the
        # Arrow plugin stage) — 2-3 pipeline runs per micro-batch
        # (review r05; same discipline as pipeline.write_reports)
        kept = pipe.filtered(batch_df).persist()
        try:
            write_epoch_idempotent(kept, out_path, epoch_id)
            commit_minhash_index(kept, sigs_t, bands_t, index_path,
                                 n_buckets=n_buckets,
                                 mode="append" if exists else "overwrite",
                                 epoch_id=epoch_id)
        finally:
            kept.unpersist()

    return (pages.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def write_stream_filtered_bloom(pages: DataFrame, out_path: str,
                                checkpoint: str, bloom_path: str,
                                key: str = "url",
                                expected_items: int | None = None,
                                shards: int = 1,
                                pipeline: QualityPipeline | None = None):
    """write_stream_filtered + a persisted-Bloom cross-epoch seen-set
    (the streaming twin of run_filter.py --seen-bloom-path — Dolma's
    continuous-dedup mode): each micro-batch drops keys any earlier
    epoch kept, in one map-only Arrow stage with ZERO committed-side
    I/O, runs the full pipeline, writes epoch-idempotently, and ORs
    its kept keys into the bitmap. Approximate by contract: committed
    keys always drop; ~fpp of novel keys over-drop (never a leaked
    duplicate). Pass ``expected_items`` sized for the stream LIFETIME
    on the first epoch (the bitmap cannot grow).

    Replay protocol — the bitmap cannot un-OR, so ORDERING carries
    the correctness: output first, then an epoch marker, then the
    bitmap commit (always from the epoch's WRITTEN output, the single
    source of truth).
    - Replay BEFORE the marker: the bitmap holds no trace of this
      epoch (its commit never ran), so the re-filter sees exactly what
      the first attempt saw and the epoch directory rewrites
      idempotently.
    - Replay AFTER the marker: the epoch's output is complete on disk;
      the sink re-commits that output's keys (OR-idempotent no-op)
      and NEVER re-filters — the bitmap may already contain this
      epoch's keys, and a re-filter would self-match the whole batch
      away (the trap the near-dup index escapes with exclude_epoch;
      a bitmap has no epochs to exclude, hence the marker).
    - The marker carries the batch's content fingerprint (row count +
      order-independent key digest): replaying an epoch id over
      DIFFERENT input — a fresh checkpoint against a changed page
      directory, the one way epoch ids collide across lineages —
      RAISES instead of silently skipping the new data's filter,
      assessment and write (review r05).
    - Keys duplicated WITHIN one micro-batch collapse to one
      deterministic first-wins row before the bitmap filter (the
      bitmap only knows PRIOR epochs, so a same-batch recrawl would
      otherwise write both copies permanently)."""
    import dataclasses
    import json as _json
    import os

    from pyspark.errors import AnalysisException

    from luzzu_spark.dedup import bloom_index_commit, bloom_index_filter
    pipe = (dataclasses.replace(pipeline, auto_spread=False)
            if pipeline is not None
            else QualityPipeline(auto_spread=False))

    def fingerprint(df: DataFrame) -> dict:
        # order-independent and replay-stable: same rows -> same
        # digest regardless of partitioning; fold per row before the
        # sum (CLAUDE.md rule 8: sums of raw int64 hashes overflow)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64(F.col(key)),
                         F.lit(2**31 - 1))).alias("d")).collect()[0]
        return {"n": int(row["n"]), "key_digest": int(row["d"] or 0)}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        marker = os.path.join(bloom_path,
                              f"epoch_{int(epoch_id)}.written")
        fresh = not os.path.exists(marker)
        fp = fingerprint(batch_df)
        if fresh:
            # deterministic first-wins within the batch: one row per
            # key, ties broken by the row hash so replays pick the
            # same copy (maps are not hashable — skip them; the
            # remaining columns pin real page rows uniquely)
            hashable = [f.name for f in batch_df.schema.fields
                        if "map<" not in f.dataType.simpleString()]
            w = Window.partitionBy(key).orderBy(
                F.asc(F.xxhash64(*[F.col(c) for c in hashable])))
            batch_df = (batch_df
                        .withColumn("_rn", F.row_number().over(w))
                        .where(F.col("_rn") == 1).drop("_rn"))
            if os.path.exists(os.path.join(bloom_path, "meta.json")):
                batch_df = bloom_index_filter(batch_df, bloom_path, key)
            kept = pipe.filtered(batch_df)
            write_epoch_idempotent(kept, out_path, epoch_id)
            os.makedirs(bloom_path, exist_ok=True)
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(fp, f)
            os.replace(tmp, marker)
        else:
            with open(marker) as f:
                raw = f.read()
            recorded = _json.loads(raw) if raw.strip() else None
            if recorded is not None and recorded != fp:
                raise RuntimeError(
                    f"epoch {int(epoch_id)} marker at {marker} records "
                    f"{recorded} but this batch fingerprints as {fp}: "
                    "the epoch id was reused over DIFFERENT input "
                    "(fresh checkpoint against a changed source?). "
                    "Refusing to skip the batch — point the stream at "
                    "a new out/bloom path pair or restore the original "
                    "checkpoint.")
        try:
            kept_keys = (spark.read.parquet(out_path)
                         .where(F.col("epoch") == int(epoch_id))
                         .select(key))
        except AnalysisException as exc:
            # two legitimate misses, both "nothing kept yet ANYWHERE":
            # the corpus path absent, or present with no data files
            # (an all-dropped first epoch leaves only _SUCCESS, which
            # fails schema inference). Detected by ERROR CLASS, not
            # os.path (review r05: os.path.exists is always False on
            # s3a/hdfs, which would swallow REAL failures and
            # permanently omit a kept epoch's keys from the bitmap —
            # and always True for the empty local dir, which would
            # crash-loop the stream). Anything else surfaces.
            msg = str(exc)
            if ("PATH_NOT_FOUND" in msg
                    or "UNABLE_TO_INFER_SCHEMA" in msg):
                return
            raise
        # meta's last_epoch makes the fill counter exact under replay:
        # each epoch's keys count once even if a prior attempt crashed
        # between the marker write and this commit
        bloom_index_commit(kept_keys, key, bloom_path,
                           expected_items=expected_items,
                           shards=shards, epoch_id=int(epoch_id))

    return (pages.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def run_to_memory(df: DataFrame, query_name: str,
                  output_mode: str = "append") -> "object":
    """Drain a stream into an in-memory table (tests/demos): returns the
    StreamingQuery; caller awaits termination/processes then reads
    spark.table(query_name)."""
    return (df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start())
