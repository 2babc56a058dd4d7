#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 from
N to 4N executors).

No real cluster exists in this sandbox, so the substitution documented
in BASELINE.md is: the SAME spark-submit job over the SAME input at
local[8] and local[32] (N=8 cores vs 4N=32 cores), steady-state
throughput each (run twice in-process, second run timed), and

    efficiency = throughput(32) / (4 × throughput(8))

Each parallelism level runs in its own JVM via spark-submit --py-files
(the launch mode the north rule names), so nothing warm leaks between
levels. Prints one JSON line; paste the numbers into BASELINE.md.

Usage: python scripts/scaling_bench.py [--replicate 20] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_pyfiles_zip(dest: str) -> str:
    """Package luzzu_spark/ for --py-files (the deployment artifact)."""
    zpath = os.path.join(dest, "luzzu_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "luzzu_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def write_input(sf_dir: str, replicate: int, dest: str, n_files: int) -> int:
    """Materialize the replicated document corpus as an n_files parquet
    dir (deterministic; same corpus bench.py uses)."""
    from luzzu_spark.session import get_spark
    import bench
    spark = get_spark("scaling_input", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = bench.replicated_pages(spark, sf_dir, replicate) \
        .drop("html")  # pages shape minus the heavy binary copy
    docs.repartition(n_files).write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    spark.stop()
    return n


def run_level(cores: int, zip_path: str, input_dir: str,
              out_root: str, repeat: int = 4) -> dict:
    out = os.path.join(out_root, f"local{cores}")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_filter.py"),
        "--input", input_dir, "--output", out,
        "--bench", "--repeat", str(repeat), "--json",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=1800)
    last = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")]
    if not last:
        raise RuntimeError(
            f"no JSON from local[{cores}]:\n{proc.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--n-files", type=int, default=64)
    ap.add_argument("--small", type=int, default=8,
                    help="N (cores) for the small level")
    ap.add_argument("--rounds", type=int, default=2,
                    help="paired rounds (levels alternate so slow host-"
                         "load drift cancels; best per level is kept)")
    args = ap.parse_args()
    big = args.small * 4

    work = tempfile.mkdtemp(prefix="luzzu_scaling_")
    try:
        zip_path = make_pyfiles_zip(work)
        input_dir = os.path.join(work, "input")
        n_docs = write_input(args.sf_dir, args.replicate, input_dir,
                             args.n_files)
        best: dict[int, float] = {}
        for _round in range(args.rounds):
            for cores in (args.small, big):
                r = run_level(cores, zip_path, input_dir, work)
                tp = r["docs_per_sec"]
                best[cores] = max(best.get(cores, 0.0), tp)
                print(f"# round {_round} local[{cores}]: {tp} docs/sec "
                      f"(trials {r['trials']})", file=sys.stderr)
        tp_n, tp_4n = best[args.small], best[big]
        eff = tp_4n / (4 * tp_n)
        print(json.dumps({
            "n_docs": n_docs,
            "levels": {f"local[{args.small}]": tp_n,
                       f"local[{big}]": tp_4n},
            "speedup_n_to_4n": round(tp_4n / tp_n, 3),
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "pass": eff >= 0.8,
            "launch": "spark-submit --py-files luzzu_spark.zip",
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
