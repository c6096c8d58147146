"""Per-round wall vs ACCUMULATED frontier size (VERDICT r2 item #1's
"done" evidence): run an identical constant-work round loop over a state
store pre-loaded with N vs 4N dead (already-crawled) URLs and report the
per-round walls.

With round 3's incremental frontier state (append-only transition deltas +
terminal archive + scan-only url_seen probe) the per-round cost depends on
the ROUND's work, not on history, so the two arms' medians should match;
the round-2 design (full frontier join+overwrite per round and a url_seen
shuffle per round) grew with the accumulated state.

Constant work per arm per round: H chain hosts, budget 1 page/host/round —
every round fetches H pages and discovers H new URLs, regardless of how
much history the store carries.

Usage: python tools/frontier_state_bench.py [n_dead] [mult] [rounds]
Prints one JSON line {"arms": {...}, "wall_ratio_4x_vs_1x": r}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datascrapexter_spark.frontier.politeness import PolitenessConfig  # noqa: E402
from datascrapexter_spark.frontier.scheduler import (  # noqa: E402
    CrawlConfig,
    CrawlEngine,
)
from datascrapexter_spark.frontier.state import StateStore  # noqa: E402
from datascrapexter_spark.session import get_spark  # noqa: E402

N_HOSTS = 16
CHAIN = 40


def make_web():
    pages, seeds = [], []
    for h in range(N_HOSTS):
        host = f"h{h}.ex{h}.com"
        seeds.append((f"https://{host}/p/0", 5))
        for i in range(CHAIN):
            nxt = f'<a href="/p/{i + 1}">n</a>' if i < CHAIN - 1 else ""
            html = f"<html><body><h1>{h}:{i}</h1>{nxt}</body></html>"
            pages.append((f"https://{host}/p/{i}", None, html.encode(),
                          "", "en"))
    return pages, seeds


def inject_dead_history(spark, engine, n_dead: int) -> None:
    """Pre-load the store with n_dead terminal URLs (archive rows +
    url_seen hashes + bloom partials) — the footprint of a long-running
    crawl, never touched by this run's candidates."""
    dead = spark.range(n_dead).select(
        F.concat(F.lit("https://dead.ex/x/"),
                 F.col("id").cast("string")).alias("url_canon"))
    dead = dead.withColumn("url_hash", F.xxhash64("url_canon"))
    dead_rows = dead.select(
        "url_canon", "url_hash",
        F.lit("dead.ex").alias("host"), F.lit("dead.ex").alias("domain"),
        F.lit(5).alias("priority"), F.lit(0).alias("attempts"),
        F.lit(0).alias("round_added"), F.lit("done").alias("state"))
    sids = dict(engine._snapshot_ids)
    sids["url_seen"] = engine.store.url_seen.append_round(
        spark, dead.select("url_hash"), round_no=0, idempotent=False)
    sids["frontier_archive"] = engine.store["frontier_archive"].append(
        dead_rows)
    sids["bloom_shards"] = engine.store["bloom_shards"].append(
        engine._bloom_partials(dead.select("url_hash"), 0))
    engine.store.commit_round(0, sids)
    engine._snapshot_ids = sids


def run_arm(spark, n_dead: int, rounds: int) -> dict:
    pages_rows, seeds_rows = make_web()
    pages = spark.createDataFrame(
        pages_rows, "url string, warc_ts timestamp, html binary, "
                    "text string, lang string")
    seeds = spark.createDataFrame(seeds_rows, "url string, priority int")
    root = tempfile.mkdtemp(prefix=f"fsb_{n_dead}_")
    try:
        pol = PolitenessConfig(max_pages_per_round_per_domain=1,
                               requests_per_second=10.0, round_seconds=10.0)
        cfg = CrawlConfig(politeness=pol, max_rounds=rounds + 1)
        engine = CrawlEngine(spark, StateStore(root), pages, {}, cfg)
        engine.init(seeds)
        inject_dead_history(spark, engine, n_dead)
        walls, stats = [], []
        for r in range(1, rounds + 1):
            s = engine.run_round(r)
            walls.append(s["wall_ms"])
            stats.append((s["scheduled"], s["fetched"], s["new_urls"]))
        # every round does identical work — assert it so the comparison
        # is honest
        assert len(set(stats[1:-1])) == 1, stats
        return {
            "n_dead": n_dead,
            "per_round_wall_ms": walls,
            # round 1 pays JIT/session warm-up; median of the rest
            "median_wall_ms": statistics.median(walls[1:]),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n_dead = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("frontier-state-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up arm (JIT, Python workers) — discarded
    run_arm(spark, 1000, 3)
    arms = {}
    for nd in (n_dead, n_dead * mult):
        arms[f"{nd}"] = run_arm(spark, nd, rounds)
    small, big = arms[f"{n_dead}"], arms[f"{n_dead * mult}"]
    print(json.dumps({
        "arms": arms,
        "wall_ratio_4x_vs_1x": round(
            big["median_wall_ms"] / small["median_wall_ms"], 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
