#!/usr/bin/env python
"""spark-submit application for the frontier-scheduling job (north_rule:
"runs via spark-submit --py-files ... at N and 4N executors").

Usage (cluster shape; local masters stand in for executor counts in the
sandbox):

    python tools/build_pyfiles.py     # -> dist/datascrapexter_spark.zip
    spark-submit --master local[8] \
        --py-files dist/datascrapexter_spark.zip \
        tools/submit_job.py --sf-dir /root/testdata/sf0.1 --mult 10

On a real cluster the same invocation is
`spark-submit --master yarn --num-executors N --py-files ...` — nothing
in the job references the repo checkout: `datascrapexter_spark` resolves
from the shipped zip on driver AND executors (the UDF closures
re-import it worker-side), which this script asserts before running.

Prints ONE JSON line: the frontier_bench result (n_urls, wall_s,
urls_per_sec, n_scheduled) plus the master and parallelism it ran at.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mult", type=int, default=10,
                    help="URL variants per lineitem row (input scale)")
    ap.add_argument("--warmup-mult", type=int, default=2,
                    help="untimed warm-up round input scale; 0 skips")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # No .master() here: the cluster shape comes from spark-submit
    # (--master/--num-executors), never from code — that is the whole
    # point of the submit path.
    spark = (
        SparkSession.builder.appName("dsx-frontier-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(par * 2, 16)))

    # the package must come from the --py-files artifact, not a repo
    # checkout on sys.path (drivers on a cluster edge node have no repo)
    import datascrapexter_spark
    from datascrapexter_spark.benchjob import frontier_bench

    pkg_src = os.path.dirname(os.path.abspath(datascrapexter_spark.__file__))

    if args.warmup_mult > 0:
        frontier_bench(spark, args.sf_dir, mult=args.warmup_mult)
    res = frontier_bench(spark, args.sf_dir, mult=args.mult)
    res.update(
        master=spark.sparkContext.master,
        default_parallelism=par,
        package_source=pkg_src,
        package_from_pyfiles=".zip" in pkg_src,
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
