"""Scale evidence for the incremental dedup probe (q72 / VERDICT-style
receipt): probe wall for a FIXED new-crawl batch against a small vs
INCDEDUP_ARMS-times-larger corpus index (default 1x vs 16x).

The claim: dedup_batch_indexed reads only the batch's bucket partitions
and the candidates' shingle shards, so its cost tracks the BATCH, not the
corpus — at a larger corpus the probe should be ~flat, while the
two-table operator (minhash_batch_pairs) re-signatures the whole corpus
and grows with it. Measured (2026-08-18, settled, alternating
median-of-3, local[32]): probe 3.30 -> 3.29 s (ratio 0.998) from 5k to
80k corpus docs; two-table 5.27 -> 9.03 s (ratio 1.714) on the same
arms.

Method (same discipline as frontier_state_bench): settle below a load
threshold before each rep, alternate (lo, hi) pairs so box drift taxes
both arms equally, report per-arm medians + the ratio. Index builds are
untimed (they are the amortized at-rest cost).

Usage: python tools/incremental_dedup_bench.py [--reps=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datascrapexter_spark.ops import dedup  # noqa: E402
from datascrapexter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ARMS = tuple(int(x) for x in os.environ.get("INCDEDUP_ARMS", "1,16").split(","))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KW = dict(num_hashes=16, bands=4, key_prefix_len=2, n_shingle_shards=128)


def _settle(limit: float = 2.0, timeout: float = 120.0) -> None:
    t0 = time.monotonic()
    while os.getloadavg()[0] > limit and time.monotonic() - t0 < timeout:
        time.sleep(5)


def corpus_times(spark, mult: int):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    # copy 0 = the original; copies k>0 get token-REVERSED text so the
    # corpus copies are not near-dups of each other (or of the batch):
    # a growing corpus must not mean growing true-match count, else the
    # probe is MEANT to do more work and flatness is unmeasurable
    rev = F.array_join(F.reverse(F.split(F.trim(F.col("text")), "[ ]+")), " ")
    parts = [docs.select(
        (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
        (F.col("text") if k == 0
         else F.concat(rev, F.lit(f" c{k}"))).alias("text"))
        for k in range(mult)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def batch_of(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    d = F.col("doc_id")
    # small batch (20 docs): its band keys touch a small fraction of
    # the bands x 16^kp cells, so partition pruning has room to show
    return (docs.filter(d % 250 == 0)
            .select((d + 50_000_000).alias("doc_id"),
                    F.col("text").alias("text")))


def main() -> None:
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    spark = get_spark("incdedup-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    batch = batch_of(spark).persist()
    n_batch = batch.count()

    arms = {}
    for mult in ARMS:
        corpus = corpus_times(spark, mult)
        path = f"/tmp/incdedup_idx_{mult}x"
        dedup.write_minhash_index(corpus, path, "doc_id", "text", **KW)
        arms[mult] = {"path": path, "corpus": corpus,
                      "n_corpus": corpus.count(),
                      "probe_walls": [], "twotable_walls": []}

    # warm-up (untimed) then alternating timed reps
    for mult in ARMS:
        dedup.dedup_batch_indexed(spark, arms[mult]["path"], batch,
                                  "doc_id", "text", threshold=0.5,
                                  **KW).count()
    for _ in range(reps):
        for mult in ARMS:
            _settle()
            t0 = time.monotonic()
            dedup.dedup_batch_indexed(spark, arms[mult]["path"], batch,
                                      "doc_id", "text", threshold=0.5,
                                      **KW).count()
            arms[mult]["probe_walls"].append(round(time.monotonic() - t0, 3))
        for mult in ARMS:
            _settle()
            t0 = time.monotonic()
            dedup.minhash_batch_pairs(arms[mult]["corpus"], batch,
                                      "doc_id", "text", num_hashes=16,
                                      bands=4, threshold=0.5).count()
            arms[mult]["twotable_walls"].append(
                round(time.monotonic() - t0, 3))

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    out = {
        "n_batch": n_batch,
        "arms": {
            f"{m}x": {
                "n_corpus": arms[m]["n_corpus"],
                "probe_median_s": med(arms[m]["probe_walls"]),
                "probe_walls_s": arms[m]["probe_walls"],
                "twotable_median_s": med(arms[m]["twotable_walls"]),
                "twotable_walls_s": arms[m]["twotable_walls"],
            } for m in ARMS
        },
    }
    lo, hi = f"{ARMS[0]}x", f"{ARMS[1]}x"
    out["probe_ratio_hi_over_lo"] = round(
        out["arms"][hi]["probe_median_s"]
        / out["arms"][lo]["probe_median_s"], 3)
    out["twotable_ratio_hi_over_lo"] = round(
        out["arms"][hi]["twotable_median_s"]
        / out["arms"][lo]["twotable_median_s"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
