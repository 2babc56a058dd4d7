#!/usr/bin/env python
"""spark-submit entry point for the quality-filter run (BASELINE.json:14).

    spark-submit --py-files dist/luzzu_spark.zip scripts/run_filter.py \
        --input /data/webpages --output /data/filtered \
        [--master local[32]] [--batch-size 8] [--repeat 1] [--json]

Input: parquet of Common-Crawl-style pages (url, warc_ts, html, text,
lang) — or a `documents` fixture table, which is lifted to that shape
deterministically (--as-webpages). Output: scrubbed, filtered corpus
under batch=<id>/ dirs plus a committed-batch manifest (resumable — a
rerun with the same output dir continues after the last commit) and
per-partition lineage metrics.

--repeat N times the run N times into separate output dirs and reports
the LAST run's throughput: run 1 pays JVM JIT + Python-worker spin-up;
steady state is what extrapolates to a long-lived cluster job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_args() -> argparse.Namespace:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--master", default=None,
                   help="override; else inherit spark-submit's --master")
    p.add_argument("--batch-size", type=int, default=8,
                   help="input files per committed batch")
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--as-webpages", action="store_true",
                   help="lift a documents-schema input to the page shape")
    p.add_argument("--input-format", default=None,
                   choices=["parquet", "json", "csv"],
                   help="corpus serialization (default: sniff from the "
                        "path; remote dirs must pass this explicitly)")
    p.add_argument("--input-schema", default=None,
                   help="DDL schema for json/csv inputs (default: the "
                        "documents corpus shape)")
    p.add_argument("--inject-pii", action="store_true")
    p.add_argument("--salt-buckets", type=int, default=0,
                   help=">0 enables salted host repartitioning")
    p.add_argument("--json", action="store_true",
                   help="print one machine-readable JSON line at the end")
    p.add_argument("--bench", action="store_true",
                   help="throughput mode: noop sink, no manifest/metrics; "
                        "repeat N times, report the MIN (steady state)")
    return p.parse_args()


def main() -> None:
    args = build_args()
    from luzzu_spark.checkpoint import ResumableRun
    from luzzu_spark.fixtures import as_webpages
    from luzzu_spark.pipeline import QualityPipeline
    from luzzu_spark.session import DEFAULT_CONFS
    from luzzu_spark.sources import DOCUMENTS_SCHEMA, read_corpus, \
        sniff_format

    builder = SparkSession.builder.appName("luzzu_spark_filter")
    if args.master:
        builder = builder.master(args.master)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    pipe = QualityPipeline(
        repartition_salted=args.salt_buckets > 0,
        num_partitions=None)
    fmt = args.input_format or sniff_format(args.input)
    schema = (args.input_schema or DOCUMENTS_SCHEMA) \
        if fmt in ("json", "csv") else None

    # prepare runs the expensive plugin-UDF assessment ONCE per batch
    # (ResumableRun persists it); both sinks derive from that frame —
    # the round-1 version re-assessed in metrics_fn (ADVICE r1)
    def prepare(pages):
        if args.as_webpages or "url" not in pages.columns:
            pages = as_webpages(pages, inject_pii=args.inject_pii)
        return pipe.assess(pages)

    def transform(assessed):
        return pipe.filtered_from_assessed(assessed)

    def metrics(assessed):
        from luzzu_spark.metrics import partition_lineage
        return partition_lineage(assessed)

    corpus = read_corpus(spark, args.input, schema=schema, fmt=fmt)
    n_docs = corpus.count()
    result: dict = {}
    if args.bench:
        assessed = prepare(corpus)
        times = []
        for i in range(max(args.repeat, 2)):
            t0 = time.perf_counter()
            assessed.write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
            print(f"# bench run {i}: {times[-1]:.2f}s", file=sys.stderr)
        sec = min(times[1:])      # run 0 is JIT/worker warm-up
        result = {"sec": round(sec, 3), "n_docs": n_docs,
                  "docs_per_sec": round(n_docs / sec, 1),
                  "trials": [round(t, 2) for t in times],
                  "master": spark.conf.get("spark.master")}
        if args.json:
            print(json.dumps(result))
        spark.stop()
        return
    for i in range(args.repeat):
        out = args.output if args.repeat == 1 else f"{args.output}/run{i}"
        run = ResumableRun(transform=transform, metrics_fn=metrics,
                           prepare=prepare, batch_size=args.batch_size,
                           fmt=fmt, schema=schema)
        t0 = time.perf_counter()
        summary = run.run(spark, args.input, out)
        sec = time.perf_counter() - t0
        result = {"run": i, "sec": round(sec, 3), "n_docs": n_docs,
                  "docs_per_sec": round(n_docs / sec, 1),
                  "batches": summary["planned"],
                  "complete": summary["complete"],
                  "master": spark.conf.get("spark.master")}
        print(f"# run {i}: {result['docs_per_sec']} docs/sec "
              f"({sec:.1f}s, {summary['planned']} batches)",
              file=sys.stderr)
    if args.json:
        print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
