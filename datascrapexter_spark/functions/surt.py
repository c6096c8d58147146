"""SURT keys + CDX-style capture index — the web-archive lookup layout.

SURT (Sort-friendly URI Reordering Transform) is the public convention
(Internet Archive / iipc; also Common Crawl's cc-index tables) for turning
URLs into keys whose lexicographic order groups captures by registrable
domain, then host, then path:

    HTTP://WWW.Shop1.Example.COM:80/Items/9?z=9&A=1#f
        -> com,example,shop1)/items/9?a=1&z=9

CDX is the index format built on it: one line per capture, sorted by
(surt_key, timestamp), carrying a payload digest. The reference
canonicalizes URLs for dedup identity (pkg/utils/url.go NormalizeURL —
ported in functions/urlnorm.py) but has no archive-ordered key; this module
adds it so crawl output can feed a cc-index-style lookup table.

Implemented rules (documented subset of the IA spec): lowercase everything;
drop the fragment; drop default ports (80 for http, 443 for https); drop a
leading ``www.`` label; reverse the remaining host labels joined with
commas, then ``)``; keep the path verbatim (lowercased); sort query
parameters. Everything is native Column expressions — one whole-stage
codegen Project, no Python, no shuffle — and the DuckDB oracle (q49)
replays the same surgery with list functions, so the transform is gated
cross-engine, not golden-filed.

Scale: `cdx_index` produces a globally ordered layout the way a 100-TB sort
must — repartitionByRange on the key + sortWithinPartitions — i.e. a range
exchange and per-partition sorts, never a single-partition global window.
Sorted-run correctness (within and across partition boundaries) is asserted
in tests; the row *values* are what the oracle gates (order-insensitive
hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key_col(url: Column) -> Column:
    """SURT key from a raw URL as pure expressions (see module docstring
    for the exact rule subset)."""
    u = F.regexp_replace(F.lower(url), "#.*$", "")
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    hostport = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    # a surviving non-default port rides AFTER the reversed labels
    # (com,example:8080) — split it off before the label reversal
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    bare = F.regexp_replace(host, r":\d+$", "")
    rev = F.concat(F.array_join(F.reverse(F.split(bare, r"\.")), ","), port)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev, F.lit(")"), path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)))


def cdx_index(df: DataFrame, url_col: str = "url", ts_col: str | None = None,
              payload_col: str | None = None,
              num_ranges: int | None = None) -> DataFrame:
    """CDX-style capture index: (surt_key, ts, digest, url) in global
    (surt_key, ts, url) order via range repartition + partition-local
    sorts — the distributed total-sort plan, no single-partition window."""
    cols = [surt_key_col(F.col(url_col)).alias("surt_key"),
            (F.col(ts_col) if ts_col else F.lit(None).cast("timestamp")
             ).alias("ts"),
            (F.md5(F.col(payload_col)) if payload_col
             else F.md5(F.col(url_col))).alias("digest"),
            F.col(url_col).alias("url")]
    # r06: persist the keyed projection — repartitionByRange SAMPLES its
    # child to build range bounds, so the regex-heavy SURT derivation
    # would otherwise execute twice (sampling pass + real pass).
    out = df.select(*cols).persist()
    ranged = (out.repartitionByRange(num_ranges, "surt_key", "ts", "url")
              if num_ranges else out.repartitionByRange("surt_key", "ts",
                                                        "url"))
    return ranged.sortWithinPartitions("surt_key", "ts", "url")


def cdx_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot diff of two CDX capture indexes (cdx_index output or any
    (surt_key, digest) tables): per URL-key, is the capture new, gone,
    changed, or unchanged between crawls — the incremental-crawl
    planning input (what to refetch) and the archive-integrity report
    (what vanished). Keys repeated within a snapshot are collapsed to
    their latest capture by (ts, digest) max first, so the diff is
    well-defined per key.

    Scale shape: both sides collapse to key-width via one groupBy
    each (map-side combinable), then ONE full-outer sort-merge join on
    surt_key — at rest both snapshots would be bucketed by surt_key
    (the url_seen pattern, frontier/state.py), making the join
    exchange-free; status is a codegen CASE over null-ness + digest
    equality, and the host rollup is a prefix extraction off the SURT
    key itself (no URL re-parse).

    Returns (surt_key, host_rev, status, old_digest, new_digest) with
    status in {'added','removed','changed','unchanged'}.
    """
    def latest(df: DataFrame, side: str) -> DataFrame:
        cols = dict.fromkeys(df.columns)
        ts = F.col("ts") if "ts" in cols else F.lit(None).cast("timestamp")
        return (df.select("surt_key", ts.alias("_ts"), "digest")
                .groupBy("surt_key")
                .agg(F.max(F.struct(F.col("_ts"), F.col("digest")))
                     .alias("_m"))
                .select("surt_key",
                        F.col("_m.digest").alias(f"{side}_digest")))
    o = latest(old, "old")
    n = latest(new, "new")
    joined = o.join(n, "surt_key", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), F.lit("added"))
              .when(F.col("new_digest").isNull(), F.lit("removed"))
              .when(F.col("old_digest") == F.col("new_digest"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    host_rev = F.regexp_extract("surt_key", r"^([^)]*)\)", 1)
    return joined.select("surt_key", host_rev.alias("host_rev"),
                         status.alias("status"), "old_digest",
                         "new_digest")
