"""Sitemap XML -> typed capture table, pure codegen.

The reference consumes robots.txt ``Sitemap:`` URLs and their ``<loc>``
entries only as frontier seeds (compliance GetSitemaps +
frontier/links._sitemap_locs).  At archive scale a sitemap is more than
a seed list: ``<lastmod>``/``<changefreq>``/``<priority>`` are the
publisher's own freshness signals, exactly what revisit scheduling
(frontier/revisit.py) wants as priors.  This module parses sitemap
documents into one row per ``<url>`` entry — entirely with built-in
regexp functions, so the whole parse is codegen ``Project`` + one
``explode`` (a generator, not a shuffle): no Python, no DOM, and the
XML column dies in the same stage it is read.

Scope (documented subset): well-formed ``<urlset>``/``<sitemapindex>``
documents as real crawlers emit them; tag content is taken verbatim
(sitemaps are machine-generated — no entity decoding beyond the three
XML escapes, matching the protocol's spec examples).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s): entries may span lines. Non-greedy so adjacent entries split.
_URL_ENTRY_RE = "(?s)<url>(.*?)</url>"
_SITEMAP_ENTRY_RE = "(?s)<sitemap>(.*?)</sitemap>"


def _tag(entry: Column, tag: str) -> Column:
    """Verbatim tag body, NULL when the tag is absent."""
    return F.nullif(
        F.regexp_extract(entry, f"(?s)<{tag}>(.*?)</{tag}>", 1), F.lit(""))


def _unescape(c: Column) -> Column:
    amp = F.replace(F.replace(c, F.lit("&lt;"), F.lit("<")),
                    F.lit("&gt;"), F.lit(">"))
    return F.replace(amp, F.lit("&amp;"), F.lit("&"))


def parse_sitemaps_df(sitemaps: DataFrame, xml_col: str = "xml",
                      id_cols: tuple[str, ...] = ("sitemap_url",)
                      ) -> DataFrame:
    """One row per ``<url>`` entry: (id_cols..., loc, lastmod,
    changefreq, priority, is_index=false) — plus one row per nested
    ``<sitemap>`` index entry with is_index=true and only loc set.

    priority/changefreq stay verbatim strings (no float parsing — exact
    across engines; callers map changefreq to revisit intervals).
    """
    ids = [F.col(c) for c in id_cols]
    url_entries = (
        sitemaps.select(
            *ids,
            F.explode(F.regexp_extract_all(F.col(xml_col),
                                           F.lit(_URL_ENTRY_RE), 1))
            .alias("_e"))
        .select(
            *ids,
            _unescape(_tag(F.col("_e"), "loc")).alias("loc"),
            _tag(F.col("_e"), "lastmod").alias("lastmod"),
            _tag(F.col("_e"), "changefreq").alias("changefreq"),
            _tag(F.col("_e"), "priority").alias("priority"),
            F.lit(False).alias("is_index")))
    index_entries = (
        sitemaps.select(
            *ids,
            F.explode(
                F.regexp_extract_all(F.col(xml_col),
                                     F.lit(_SITEMAP_ENTRY_RE), 1))
            .alias("_e"))
        .select(
            *ids,
            _unescape(_tag(F.col("_e"), "loc")).alias("loc"),
            _tag(F.col("_e"), "lastmod").alias("lastmod"),
            F.lit(None).cast("string").alias("changefreq"),
            F.lit(None).cast("string").alias("priority"),
            F.lit(True).alias("is_index")))
    return url_entries.unionByName(index_entries)


# Sitemap-protocol changefreq -> revisit interval prior, in hours
# (integer; 'always'=1h, 'never'=one year) — feeds revisit_priority as
# a publisher-declared change-rate prior.
CHANGEFREQ_HOURS = {
    "always": 1, "hourly": 1, "daily": 24, "weekly": 168,
    "monthly": 720, "yearly": 8760, "never": 8760,
}


def changefreq_hours_col(changefreq: Column) -> Column:
    expr = None
    for k, v in CHANGEFREQ_HOURS.items():
        cond = changefreq == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(F.lit(None).cast("int"))


def sitemap_coverage(listed: DataFrame, crawled: DataFrame,
                     listed_url_col: str = "loc",
                     crawled_url_col: str = "url",
                     host_col: str | None = None) -> DataFrame:
    """Sitemap-vs-crawl coverage audit per host: how much of what the
    publisher listed did the crawl actually capture, and how much of
    the capture the publisher never listed — the two drift directions a
    crawl operator watches (stale sitemaps vs discovery leakage). The
    reference stores sitemap URLs only as seeds (internal/config types);
    the audit join is engine extension surface like the revisit planner.

    Per host: n_listed, n_crawled (listed ∩ crawled), n_missed (listed
    only), n_unlisted (crawled only), coverage_ppm = 1e6 * n_crawled
    div n_listed (0 when nothing listed).

    Scale shape: both sides collapse to DISTINCT url (key-width,
    map-side combinable) -> ONE full-outer url equi-join (bucketed at
    rest in practice — the url_seen pattern) -> host-width groupBy of
    three boolean counters. Host defaults to the URL authority parsed
    by one regexp (codegen) — pass ``host_col`` when a canonical host
    column already exists.
    """
    def side(df: DataFrame, col: str, mark: str) -> DataFrame:
        out = df.select(F.col(col).alias("url"),
                        *( [F.col(host_col).alias("_h")] if host_col
                           else [] ))
        return out.distinct().withColumn(mark, F.lit(1))
    lo = side(listed, listed_url_col, "_listed")
    cr = side(crawled, crawled_url_col, "_crawled")
    on = ["url"] + (["_h"] if host_col else [])
    j = lo.join(cr, on, "full_outer")
    host = (F.col("_h") if host_col
            else F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)",
                                  1))
    agg = (j.select(host.alias("host"),
                    F.coalesce("_listed", F.lit(0)).alias("l"),
                    F.coalesce("_crawled", F.lit(0)).alias("c"))
           .groupBy("host")
           .agg(F.sum("l").cast("long").alias("n_listed"),
                F.sum(F.col("l") * F.col("c")).cast("long")
                .alias("n_crawled"),
                F.sum(F.col("l") * (F.lit(1) - F.col("c"))).cast("long")
                .alias("n_missed"),
                F.sum((F.lit(1) - F.col("l")) * F.col("c")).cast("long")
                .alias("n_unlisted")))
    return agg.withColumn(
        "coverage_ppm",
        F.coalesce(F.expr("(1000000 * n_crawled) div nullif(n_listed, 0)"),
                   F.lit(0)).cast("long"))
