#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

NOT the driver bench (bench.py is frozen): this tool isolates individual
queries with the noop sink, reports min/median of N reps, and can dump
`.explain("formatted")` plans to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/bench_extra.py q10_url_canonicalize q14_minhash_lsh    # time
  python tools/bench_extra.py --reps 3 all                            # all bench queries
  python tools/bench_extra.py --plan plans/r06 --suffix before q10_url_canonicalize
  python tools/bench_extra.py --frontier                              # frontier round only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names, or 'all'")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--frontier", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from datascrapexter_spark.session import get_spark

    extra = {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"}
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    except OSError:
        pass
    spark = get_spark(f"bench-extra-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus * 2, 16), extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    from datascrapexter_spark.queries import QUERIES

    if args.frontier:
        from datascrapexter_spark.benchjob import frontier_bench
        frontier_bench(spark, sf_dir, mult=2)  # warm-up
        runs = [frontier_bench(spark, sf_dir) for _ in range(args.reps)]
        print(json.dumps({"frontier": runs}))
        spark.stop()
        return

    names = args.queries
    if names == ["all"]:
        import bench as benchmod
        names = list(benchmod.BENCH_QUERIES)

    if not args.no_warm:
        for t in ("lineitem", "documents", "embeddings", "events"):
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        (QUERIES["q01_pricing_summary"](spark, sf_dir)
         .write.format("noop").mode("overwrite").save())

    out: dict[str, dict] = {}
    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    for name in names:
        ws = sorted(walls[name])
        out[name] = {"median": ws[len(ws) // 2], "min": ws[0], "walls": walls[name]}

    if args.plan:
        os.makedirs(os.path.join(REPO, args.plan), exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(REPO, args.plan,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(txt)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
