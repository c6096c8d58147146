#!/usr/bin/env python
"""N vs 4N scaling measurement through the REAL deployment path:
`spark-submit --py-files dist/datascrapexter_spark.zip tools/submit_job.py`
at two parallelism levels (north_rule: two cluster sizes, efficiency
>= 0.8; local[N] masters stand in for executor counts in the sandbox).

Methodology identical to `bench.py --scaling` (BASELINE.md): each arm
taskset-pinned to exactly N cores so JVM + Python workers share the
bound, load settled below 2 before every run, arms ALTERNATE across
`--reps` repetitions so hypervisor-steal drift taxes both arms equally,
median per arm. Prints ONE JSON line.

    python tools/spark_submit_scaling.py --arms 2,8 --mult 50 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from build_pyfiles import build  # noqa: E402


def _settle(max_load: float = 2.0, timeout_s: float = 180.0) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with open("/proc/loadavg") as fh:
                load1 = float(fh.read().split()[0])
        except OSError:
            return
        if load1 < max_load:
            return
        time.sleep(10)


def find_spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError("spark-submit not found on PATH or in pyspark/bin")


def submit_run(cores: int, zip_path: str, sf_dir: str, mult: int,
               pin: bool = True) -> dict:
    _settle()
    cmd = [
        find_spark_submit(),
        "--master", f"local[{cores}]",
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--sf-dir", sf_dir, "--mult", str(mult),
    ]
    if pin and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    # run from a neutral cwd so the repo checkout can't shadow the zip
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd="/tmp")
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in spark-submit output:\n{out.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="2,8")
    ap.add_argument("--mult", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    zip_path = build()
    n_small, n_big = (int(x) for x in args.arms.split(","))
    reps: dict[int, list[dict]] = {n_small: [], n_big: []}
    for _ in range(args.reps):
        for c in (n_small, n_big):
            reps[c].append(submit_run(c, zip_path, args.sf_dir, args.mult))
    runs = {}
    for c, rs in reps.items():
        rs.sort(key=lambda r: r["wall_s"])
        med = dict(rs[len(rs) // 2])
        med["all_walls_s"] = [r["wall_s"] for r in rs]
        runs[c] = med
    thr_n, thr_4n = runs[n_small]["urls_per_sec"], runs[n_big]["urls_per_sec"]
    print(json.dumps({
        "path": "spark-submit --py-files",
        "py_files": os.path.relpath(zip_path, REPO),
        "n_cores": n_small,
        "n4_cores": n_big,
        "thr_n": thr_n,
        "thr_4n": thr_4n,
        "efficiency": round(thr_4n / ((n_big / n_small) * thr_n), 3),
        "runs": runs,
    }))


if __name__ == "__main__":
    main()
