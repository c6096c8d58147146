"""Capture-to-capture content drift, integer-exact.

When a crawler re-fetches a URL (revisit scheduling, frontier/revisit.py)
it needs to know *how much* the content changed, not just whether the
digest flipped: a rotated ad changes the digest but not the page, and a
rewritten article matters more than a new timestamp in the footer.  This
operator measures drift between consecutive captures of the same URL as
1 - Jaccard over word n-gram shingle sets, in exact ppm integers.

The reference engine has no notion of capture history (each run fetches
once; internal/scraper/engine.go); drift is the archive-tier companion
to the CDX capture index (functions/surt.py) and feeds the same
change-rate estimate q50's revisit policy consumes — a drift_ppm
threshold distinguishes "changed meaningfully" from "digest noise".

Scale shape: ONE hash exchange on url (the window partition key); the
shingle sets for current and previous capture are per-row array ops
(split -> distinct -> intersect) inside codegen, so no second shuffle
and no pairwise join anywhere — history length per URL bounds the
window, not the corpus.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles_col

MICRO = 1_000_000


def _idiv(a: Column, b: Column) -> Column:
    """Exact nonnegative integer floor division (see reputation._idiv)."""
    return ((a - a % b) / b).cast("long")


def capture_drift(hist: DataFrame, url_col: str = "url",
                  ts_col: str = "ts", text_col: str = "text",
                  n: int = 3, tiebreak_col: str | None = None) -> DataFrame:
    """Per-capture drift vs the previous capture of the same URL.

    Returns (url, ts, n_shingles, overlap, union_size, jaccard_ppm,
    drift_ppm); the first capture of a URL has NULL drift columns.
    Ordering inside a URL is (ts, tiebreak_col) so replayed histories
    are deterministic even with duplicate timestamps.
    """
    sh = F.array_distinct(shingles_col(text_col, n))
    df = hist.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
        sh.alias("_sh"))
    order = [F.col("ts").asc()] + ([F.col("_tb").asc()] if tiebreak_col
                                   else [])
    prev = F.lag("_sh").over(Window.partitionBy("url").orderBy(*order))
    overlap = F.size(F.array_intersect(F.col("_sh"), F.col("_prev")))
    union = (F.size("_sh") + F.size("_prev") - overlap)
    jac = F.when(union > 0,
                 _idiv(F.lit(MICRO) * overlap.cast("long"),
                       union.cast("long"))).otherwise(F.lit(MICRO))
    return (df.withColumn("_prev", prev)
            .select(
                "url", "ts",
                F.size("_sh").alias("n_shingles"),
                F.when(F.col("_prev").isNotNull(), overlap)
                .alias("overlap"),
                F.when(F.col("_prev").isNotNull(), union)
                .alias("union_size"),
                F.when(F.col("_prev").isNotNull(), jac)
                .alias("jaccard_ppm"),
                F.when(F.col("_prev").isNotNull(), F.lit(MICRO) - jac)
                .alias("drift_ppm")))
