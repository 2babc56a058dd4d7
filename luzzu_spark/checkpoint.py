"""Resumable batch runs — the Iceberg-snapshot watermark, parquet-fallback.

North rule (BASELINE.json:14): the filter run must be "resumable from
checkpoint with per-partition lineage + metrics". Luzzu itself restarts
an assessment from scratch (single-pass stream processor, SURVEY.md §4);
resumability is new-engine semantics:

- **Unit of commit: the input-file batch.** The input table's files are
  listed (cheap metadata op), sorted, and chunked into deterministic
  batches; the batch id is a content hash of its file list, so re-listing
  the same input yields the same batch plan in every run.
- **Manifest = committed-batch ledger.** After a batch's outputs are
  fully written, one JSON entry lands in `<output>/_manifest/`. A batch
  is either fully committed or not committed — output dirs without a
  manifest entry are ignored and rewritten on resume (write-then-commit,
  the same contract as an Iceberg snapshot commit).
- **Resume = skip committed batches.** A restarted run replans the same
  batches, drops the committed ones, and processes the rest. No
  reprocessing, no duplicates.

On an Iceberg deployment the equivalent is `option("start-snapshot-id",
<last committed>)` incremental reads with the metrics table written in
the same transaction; this module keeps the identical lifecycle over
plain parquet so the contract is testable in this sandbox.

Scale: the manifest holds one tiny JSON per batch (thousands of batches
for 10^12 docs at ~10^9 docs/batch) — driver-side metadata, never row
data. Batch outputs land under `batch=<id>/` subdirs so a kept batch is
immutable and re-listable; readers MUST use
`ResumableRun.output_glob(output)` (= `<output>/batch=*/`): a bare
`spark.read.parquet(output)` with recursiveFileLookup would sweep the
sibling `metrics/` parquet (different schema) and `_manifest/` JSON
into the corpus read (review r05).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _batch_id(files: tuple[str, ...]) -> str:
    h = hashlib.sha256("\n".join(files).encode()).hexdigest()
    return h[:16]


def plan_batches(files: list[str],
                 batch_size: int) -> list[tuple[str, tuple[str, ...]]]:
    """Deterministic batch plan: sorted files, fixed-size chunks.

    Same input listing → same chunks → same batch ids, in every run —
    the property resume correctness rests on."""
    ordered = tuple(sorted(files))
    out = []
    for i in range(0, len(ordered), batch_size):
        chunk = ordered[i:i + batch_size]
        out.append((_batch_id(chunk), chunk))
    return out


@dataclass
class BatchManifest:
    """Committed-batch ledger: one JSON file per committed batch."""

    path: str

    def _entry(self, batch_id: str) -> str:
        return os.path.join(self.path, f"batch-{batch_id}.json")

    def committed(self) -> dict[str, dict]:
        if not os.path.isdir(self.path):
            return {}
        out = {}
        for name in sorted(os.listdir(self.path)):
            if name.startswith("batch-") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    meta = json.load(f)
                out[meta["batch_id"]] = meta
        return out

    def commit(self, batch_id: str, meta: dict) -> None:
        """Atomic-enough local commit: write temp, rename into place."""
        os.makedirs(self.path, exist_ok=True)
        entry = dict(meta, batch_id=batch_id, committed_at=time.time())
        tmp = self._entry(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._entry(batch_id))

    def invalidate(self, batch_id: str) -> None:
        """Drop a committed batch whose id fell out of the current
        plan: remove its output/metrics dirs first, the ledger entry
        last — a crash mid-invalidate leaves the entry present and the
        next run re-invalidates (never the reverse, which would leave
        orphan output dirs matched by output_glob)."""
        entry = self._entry(batch_id)
        if os.path.exists(entry):
            with open(entry) as f:
                meta = json.load(f)
            for k in ("output", "metrics"):
                p = meta.get(k)
                if p and os.path.isdir(p):
                    shutil.rmtree(p)
            os.remove(entry)

    # ---- plan ledger: detects input-listing / batch-size drift ------
    def plan_path(self) -> str:
        return os.path.join(self.path, "plan.json")

    def read_plan(self) -> dict | None:
        if not os.path.exists(self.plan_path()):
            return None
        with open(self.plan_path()) as f:
            return json.load(f)

    def write_plan(self, plan: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self.plan_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, self.plan_path())


@dataclass
class ResumableRun:
    """Run `transform` over an input table batch-by-batch, committing
    each batch to the manifest; a rerun continues where the last commit
    left off.

    transform: frame → output DataFrame (e.g. the pipeline's
    `filtered`); metrics_fn (optional): frame → metrics DataFrame
    written next to the batch output (per-partition lineage).

    prepare (optional): pages → shared frame (e.g. the pipeline's
    `assess`). When set, the prepared frame is persisted per batch and
    BOTH transform and metrics_fn receive it — the expensive
    plugin-UDF assessment runs once per batch instead of once per sink
    (the double-assess ADVICE r1 finding).

    fmt/schema: input serialization for sources.read_corpus — parquet
    (default, self-describing), json, or csv with a declared schema;
    the resumable lifecycle is serialization-agnostic.

    Plan drift: the manifest carries a plan ledger (batch_size + input
    listing fingerprint). A batch_size change between runs would
    silently re-chunk every batch under new ids while the stale
    committed dirs kept matching output_glob — so it REFUSES with a
    clear error. Input-listing growth (the crawl-feed case) is handled
    by invalidating committed batches whose id left the current plan
    (their output dirs are removed before processing): with
    lexically-appended listings only the last partial chunk shifts, so
    one batch reprocesses and downstream readers never see duplicate
    rows."""

    transform: Callable[[DataFrame], DataFrame]
    metrics_fn: Callable[[DataFrame], DataFrame] | None = None
    batch_size: int = 1  # files per batch; tune to ~target task count
    prepare: Callable[[DataFrame], DataFrame] | None = None
    fmt: str | None = None
    schema: object | None = None  # StructType | DDL string (json/csv)

    def _read(self, spark: SparkSession, paths) -> DataFrame:
        from luzzu_spark.sources import read_corpus
        return read_corpus(spark, paths, schema=self.schema,
                           fmt=self.fmt)

    def run(self, spark: SparkSession, input_dir: str, output_dir: str,
            max_batches: int | None = None) -> dict:
        """Process uncommitted batches; return a run summary.

        max_batches caps work for this invocation (also how tests
        simulate a mid-run kill: run 2 of 4 batches, rerun, assert the
        first 2 are skipped)."""
        files = self._read(spark, input_dir).inputFiles()
        batches = plan_batches(files, self.batch_size)
        manifest = BatchManifest(os.path.join(output_dir, "_manifest"))
        prior = manifest.read_plan()
        if prior is not None and prior["batch_size"] != self.batch_size:
            raise ValueError(
                f"batch_size changed ({prior['batch_size']} → "
                f"{self.batch_size}): committed batch ids would no "
                "longer match the plan; rerun with the recorded "
                "batch_size or start a fresh output dir")
        current_ids = {b for b, _ in batches}
        invalidated = [bid for bid in manifest.committed()
                       if bid not in current_ids]
        for bid in invalidated:
            manifest.invalidate(bid)
        manifest.write_plan({
            "batch_size": self.batch_size,
            "n_files": len(files),
            "listing_sha": _batch_id(tuple(sorted(files)))})
        done = manifest.committed()
        processed, skipped = [], []
        for batch_id, chunk in batches:
            if batch_id in done:
                skipped.append(batch_id)
                continue
            if max_batches is not None and len(processed) >= max_batches:
                break
            pages = self._read(spark, list(chunk))
            frame = self.prepare(pages) if self.prepare else pages
            if self.prepare is not None:
                frame = frame.persist()
            try:
                out_path = os.path.join(output_dir, f"batch={batch_id}")
                out = self.transform(frame)
                out.write.mode("overwrite").parquet(out_path)
                meta: dict = {"files": list(chunk), "output": out_path}
                if self.metrics_fn is not None:
                    m_path = os.path.join(output_dir,
                                          f"metrics/batch={batch_id}")
                    self.metrics_fn(frame).write.mode("overwrite") \
                        .parquet(m_path)
                    meta["metrics"] = m_path
            finally:
                if self.prepare is not None:
                    frame.unpersist()
            manifest.commit(batch_id, meta)
            processed.append(batch_id)
        return {"planned": len(batches), "processed": processed,
                "skipped": skipped, "invalidated": invalidated,
                "complete": len(processed) + len(skipped) == len(batches)}

    @staticmethod
    def output_glob(output_dir: str) -> str:
        return os.path.join(output_dir, "batch=*")
