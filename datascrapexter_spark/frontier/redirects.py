"""Redirect-chain resolution over a (src → dst) redirect map.

The reference follows redirects inline per HTTP request (Go's
``http.Client`` default policy inside internal/scraper/engine.go:
fetch-time, per-URL, invisible to the data plane). A batch crawl at
10^10 URLs instead records redirects as rows — (src, dst) pairs from
30x responses — and resolves every URL to its canonical terminal in
one distributed pass, so url_seen, dedup, and the link graph all key
on the terminal URL, not whichever alias a page linked.

``resolve_redirects`` follows chains with at most ``max_hops``
iterative keyed equi-joins (hop h joins only the still-live subset —
the live set shrinks as chains terminate, so late hops are nearly
free). Real redirect chains are short (browsers cap around 20; >95 %
are <= 3 hops), which makes the sequential-hop plan the right one; a
pointer-doubling log(h) variant only pays off for adversarially deep
chains and would double-count exchanged bytes for the common case.

Scale shape: the redirect map is repartitioned by ``src`` ONCE and
persisted, so every hop's join reuses that single partitioning and
only the (shrinking) live set shuffles per hop — the graphrank
iteration pattern. At rest you'd bucket the map by src (the url_seen
bucketed-table layout, frontier/state.py) to remove the one-time
shuffle too.

Statuses: ``ok`` — confirmed terminal (the final URL is not a redirect
source) within ``max_hops`` lookups; ``unresolved`` — still inside the
map after ``max_hops`` hops (cycle, or a chain longer than the cap).
The DuckDB oracle (q61) replays the identical recurrence as a bounded
recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(urls: DataFrame, redirects: DataFrame,
                      url_col: str = "url", src_col: str = "src",
                      dst_col: str = "dst", max_hops: int = 8) -> DataFrame:
    """Resolve each URL to its redirect terminal.

    ``redirects`` must be a functional map (one dst per src — HTTP
    gives exactly one Location per source). Returns one row per input
    URL: (url, final_url, n_hops, status).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    r = (redirects
         .select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
         .repartition("_src")
         .persist())

    def _advance(df: DataFrame, hop: int) -> DataFrame:
        # re-aliased per hop: the repeated self-referencing join would
        # otherwise trip Spark's ambiguous-self-join detection
        src, dst = f"_src{hop}", f"_dst{hop}"
        rh = r.select(F.col("_src").alias(src), F.col("_dst").alias(dst))
        step = df.join(rh, df["cur"] == rh[src], "left")
        return step.select(
            df["url"],
            F.coalesce(rh[dst], df["cur"]).alias("cur"),
            (df["hops"] + F.when(rh[dst].isNull(), 0).otherwise(1))
            .alias("hops"),
            rh[dst].isNull().alias("done"))

    state = _advance(urls.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("cur"),
        F.lit(0).cast("long").alias("hops")), 0)
    finished = []
    for hop in range(1, max_hops):
        finished.append(state.filter("done"))
        state = _advance(state.filter("NOT done").drop("done"), hop)
    finished.append(state)

    out = finished[0]
    for part in finished[1:]:
        out = out.unionByName(part)
    return out.select(
        "url", F.col("cur").alias("final_url"),
        F.col("hops").alias("n_hops"),
        F.when(F.col("done"), F.lit("ok")).otherwise(F.lit("unresolved"))
        .alias("status"))
