"""Per-stage timing of the frontier round at a given core count (taskset-
pinned by the caller). Identifies which stage fails to scale N -> 4N."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_URL_MULT", "30"))
    sf_dir = "/root/testdata/sf0.1"
    from datascrapexter_spark.frontier.politeness import (
        PolitenessConfig, schedule_topk, tokens_per_round)
    from datascrapexter_spark.frontier.robots import RobotsIndex
    from datascrapexter_spark.functions.urlnorm import (
        host_col, normalize_url_udf, registered_domain, registered_domain_col)
    import pandas as pd
    from pyspark.sql.types import BooleanType

    s = bench._session(cores)
    s.sparkContext.setLogLevel("ERROR")
    bench.frontier_bench(s, sf_dir, mult=2)  # warm-up

    raw = bench._raw_urls(s, sf_dir, mult)
    import tempfile, shutil
    tmp = tempfile.mkdtemp(prefix="prof_seen_")
    (raw.filter(F.xxhash64("url") % 2 == 0)
        .withColumn("url_canon", normalize_url_udf("url"))
        .select(F.xxhash64("url_canon").alias("url_hash"))
        .dropDuplicates(["url_hash"]).write.mode("overwrite")
        .parquet(tmp + "/seen"))
    seen = s.read.parquet(tmp + "/seen")
    robots = RobotsIndex.from_texts(bench._bench_robots())
    cfg = PolitenessConfig(max_pages_per_round_per_domain=1000,
                           round_seconds=500.0)
    delays = {}
    for host in bench._bench_robots():
        d = robots.by_host[host].get_crawl_delay("DataScrapexter")
        dom = registered_domain(host)
        delays[dom] = max(delays.get(dom, 0.0), d)
    delays_df = s.createDataFrame(sorted(delays.items()),
                                  "domain string, crawl_delay_s double")
    budgets = delays_df.select(
        "domain", tokens_per_round(F.col("crawl_delay_s"),
                                   F.lit(None).cast("double"),
                                   F.lit(None).cast("int"), cfg).alias("tokens"))

    @F.pandas_udf(BooleanType())
    def allowed_udf(hosts: pd.Series, paths: pd.Series) -> pd.Series:
        return robots.allowed_series("DataScrapexter", hosts, paths)

    timings = {}

    def mark(name, df):
        t0 = time.monotonic()
        bench._force(df)
        timings[name] = round(time.monotonic() - t0, 1)

    canon = raw.select(normalize_url_udf("url").alias("url_canon"))
    mark("1_canonicalize", canon)
    cand = (canon.withColumn("url_hash", F.xxhash64("url_canon"))
            .dropDuplicates(["url_hash"])
            .withColumn("host", host_col("url_canon"))
            .withColumn("domain", registered_domain_col(F.col("host"))))
    mark("2_plus_dedup_hostdomain", cand)
    gated = cand.filter(allowed_udf(
        "host", F.coalesce(F.parse_url("url_canon", F.lit("PATH")), F.lit(""))))
    mark("3_plus_robots", gated)
    new = (gated.join(seen.hint("shuffle_hash"), "url_hash", "left_anti")
           .withColumn("priority", F.lit(5)).withColumn("round_added", F.lit(0)))
    mark("4_plus_antijoin", new)
    sched = schedule_topk(new, budgets, cfg)
    mark("5_plus_schedule", sched)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"cores": cores, "timings": timings}))
    s.stop()


if __name__ == "__main__":
    main()
