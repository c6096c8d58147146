#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline workload at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line.

Headline metric (BASELINE.json): **URLs scheduled+deduped per second** over
a synthetic frontier round derived from `lineitem` — each row fans out into
`mult` raw URL variants (mixed-case hosts, default ports, tracking params,
fragments); the timed pipeline is exactly one scheduling round of the crawl
engine's core:

  canonicalize (Arrow UDF) -> xxhash64 -> intra-batch dedup (tracking-param
  variants collapse) -> anti-join against a pre-materialized url_seen table
  (half the URLs) -> per-registered-domain politeness budgets -> salted
  two-phase top-k schedule -> count.

`--scaling` additionally reruns the frontier job at local[N] and local[4N]
(N = cpus/4) on the SAME input and reports throughput at both plus
efficiency = thr_4N / (4 * thr_N)  (the sandbox stand-in for N vs 4N
executors; north_rule target >= 0.8).

Query timings use the noop sink so the full plan executes (no collect()).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q05_events_hourly",
    "q08_user_sessions",
    "q10_url_canonicalize",
    "q12_field_extraction",
    "q13_dedup_exact",
    "q14_minhash_lsh",
    "q16_simhash",
    "q17_embedding_topk",
    "q19_text_stats",
]

URL_MULT = int(os.environ.get("SPARK_GRAFT_URL_MULT", "10"))


def _session(cpus: int) -> SparkSession:
    from datascrapexter_spark.session import get_spark

    return get_spark(
        f"bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _raw_urls(spark: SparkSession, sf_dir: str, mult: int) -> DataFrame:
    """Raw (pre-canonicalization) URL stream from lineitem: per row, `mult`
    variants — even variants differ only by tracking params (dedup inside
    the batch), odd variants are distinct paths. Host carries skew: domain
    id is suppkey mod 97, and supplier popularity in lineitem is nonuniform.
    """
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_linenumber"
    )
    # the parquet scan yields only a few input splits; without an explicit
    # repartition the whole canonicalize stage would run at file-count
    # parallelism (the single biggest scale bug a frontier job can have)
    n_part = spark.sparkContext.defaultParallelism * 2
    v = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("v")
    df = li.repartition(n_part).select("l_orderkey", "l_suppkey", "l_linenumber", v)
    path_leaf = F.when(
        F.col("v") % 2 == 1, F.concat(F.lit("/x"), F.col("v").cast("string"))
    ).otherwise(F.lit(""))
    return df.select(
        F.concat(
            F.lit("https://WWW.Shard"),
            (F.col("l_suppkey") % 7).cast("string"),
            F.lit(".Site"),
            (F.col("l_suppkey") % 97).cast("string"),
            F.lit(".COM:443/item/"),
            F.col("l_orderkey").cast("string"),
            F.lit("/"),
            F.col("l_linenumber").cast("string"),
            path_leaf,
            F.lit("/?utm_source=bench&ref=r"),
            F.col("v").cast("string"),
            F.lit("&b=2&a=1#frag"),
        ).alias("url")
    )


def frontier_bench(spark: SparkSession, sf_dir: str, mult: int = URL_MULT) -> dict:
    """One crawl-scheduling round over the synthetic frontier; returns
    {n_urls, wall_s, urls_per_sec, n_scheduled, n_new}."""
    from datascrapexter_spark.frontier.politeness import (
        PolitenessConfig,
        schedule_topk,
        tokens_per_round,
    )
    from datascrapexter_spark.functions.urlnorm import (
        canonicalize_struct_udf,
        normalize_url_udf,
    )

    raw = _raw_urls(spark, sf_dir, mult)
    n_urls = raw.count()

    # pre-materialize the url_seen table (half the canonical space) — this
    # is prior-round state, not part of the timed round
    tmp = tempfile.mkdtemp(prefix="bench_seen_")
    seen_path = os.path.join(tmp, "url_seen")
    (
        raw.filter(F.xxhash64("url") % 2 == 0)
        .withColumn("url_canon", normalize_url_udf("url"))
        .select(F.xxhash64("url_canon").alias("url_hash"))
        .dropDuplicates(["url_hash"])
        .write.mode("overwrite").parquet(seen_path)
    )
    seen = spark.read.parquet(seen_path)

    cfg = PolitenessConfig(max_pages_per_round_per_domain=1000,
                           round_seconds=500.0)
    t0 = time.monotonic()
    cand = (
        raw.select(canonicalize_struct_udf("url").alias("c"))
        .select("c.url_canon", "c.host", "c.domain")
        .withColumn("url_hash", F.xxhash64("url_canon"))
        .dropDuplicates(["url_hash"])
        .withColumn("priority", F.lit(5))
        .withColumn("round_added", F.lit(0))
    )
    new = cand.join(seen, "url_hash", "left_anti")
    budgets = new.select("domain").distinct().select(
        "domain",
        tokens_per_round(F.lit(0.0), F.lit(None).cast("double"),
                         F.lit(None).cast("int"), cfg).alias("tokens"),
    )
    sched = schedule_topk(new, budgets, cfg)
    n_scheduled = sched.count()
    wall = time.monotonic() - t0
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "n_urls": n_urls,
        "wall_s": round(wall, 3),
        "urls_per_sec": round(n_urls / wall, 1),
        "n_scheduled": n_scheduled,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from datascrapexter_spark.queries import QUERIES

    spark = _session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _force(QUERIES[name](spark, sf_dir))
        qtimes[name] = round(time.monotonic() - t0, 3)

    fb = frontier_bench(spark, sf_dir)

    out = {
        "metric": "urls_scheduled_deduped_per_sec",
        "value": fb["urls_per_sec"],
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_val,
        "cpus": cpus,
        "frontier": fb,
    }

    if scaling:
        spark.stop()
        n_small = max(cpus // 4, 1)
        runs = {}
        for c in (n_small, cpus):
            s = _session(c)
            s.sparkContext.setLogLevel("ERROR")
            # warm-up pass to exclude one-time JIT/session costs
            frontier_bench(s, sf_dir)
            runs[c] = frontier_bench(s, sf_dir)
            s.stop()
        thr_n, thr_4n = runs[n_small]["urls_per_sec"], runs[cpus]["urls_per_sec"]
        out["scaling"] = {
            "n_cores": n_small,
            "n4_cores": cpus,
            "thr_n": thr_n,
            "thr_4n": thr_4n,
            "efficiency": round(thr_4n / (4.0 * thr_n), 3),
            "runs": runs,
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
