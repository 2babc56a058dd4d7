"""Source format handling — Luzzu's any-serialization ingest, recast.

Luzzu ingests any RDF serialization through Jena RIOT's format sniffing
(/root/reference/README.md:14 "representing and exchanging" —
[paper — not in checkout]); the engine equivalent reads a corpus from
parquet (columnar, the scale default), JSON-lines, or CSV behind one
call, with a DECLARED schema in every case — schema inference at read
time is both slow (extra pass) and nondeterministic under sampling, so
it is never used (SURVEY.md §1.2: fixed, declared schema).

An `iceberg://catalog.db.table` URI routes to the Iceberg catalog
reader in deployments that carry the runtime; this sandbox has no
Iceberg jar, so that branch raises with a clear message rather than
silently degrading.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
}


def sniff_format(path: str) -> str:
    """Format from the path: URI scheme first, else file extension,
    else the extensions present in a directory listing (majority of
    recognized data files; deterministic tie-break by format name)."""
    if path.startswith("iceberg://"):
        return "iceberg"
    ext = os.path.splitext(path)[1].lower()
    if ext in _EXT_FORMAT:
        return _EXT_FORMAT[ext]
    if os.path.isdir(path):
        counts: dict[str, int] = {}
        for name in os.listdir(path):
            e = os.path.splitext(name)[1].lower()
            if e in _EXT_FORMAT:
                counts[_EXT_FORMAT[e]] = counts.get(_EXT_FORMAT[e], 0) + 1
        if counts:
            return sorted(counts.items(),
                          key=lambda kv: (-kv[1], kv[0]))[0][0]
    return "parquet"  # the corpus default


def read_corpus(spark: SparkSession, path: str,
                schema: StructType | str | None = None,
                fmt: str | None = None) -> DataFrame:
    """Read a corpus table from any supported serialization.

    schema is required for json/csv (declared, never inferred); parquet
    carries its own. CSV assumes a header row matching the schema's
    column order."""
    fmt = fmt or sniff_format(path)
    if fmt == "iceberg":
        raise NotImplementedError(
            "Iceberg catalog reads need the iceberg-spark-runtime jar: "
            "spark.read.format('iceberg').load(table) — not available "
            "in this environment")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require a declared schema "
                         "(inference is nondeterministic under sampling)")
    reader = spark.read.schema(schema)
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    raise ValueError(f"unsupported format: {fmt}")
