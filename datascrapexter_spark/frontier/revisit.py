"""Recrawl (revisit) priority from per-URL fetch history.

The reference crawls each configured target once per run (engine.go round
loop; no freshness model). A production frontier at 10^10 URLs must decide
*when to come back*: the classic policy (Cho & Garcia-Molina, "Effective
Page Refresh Policies for Web Crawlers", 2003) estimates each page's change
rate from its observed fetch history and prioritizes stale, frequently
changing pages.

This operator implements that estimate deterministically over a history
table (url, ts, digest):

- per URL, fetches ordered by (ts, tiebreak): a *change* is a fetch whose
  payload digest differs from the previous fetch's digest (lag window).
- change_rate_micro = SCALE * n_changes / (n_fetches - 1), exact integer
  division; single-observation URLs get CHANGE_PRIOR_MICRO (unknown rate).
- age_hours = (now - last fetch ts) in whole hours, integer.
- priority_micro = change_rate_micro * age_hours — stale AND volatile
  pages sort first; fresh or static pages sink.

All arithmetic is integer (order-independent → oracle-exact, q50). Plan
shape: ONE shuffle on url (window lag + the groupBy rollup share the same
partitioning, so Catalyst plans a single Exchange), key-width rows only —
digests are 32-char md5, payloads never move. `now_us` is a driver scalar
(one agg, same contract as the bloom size gates); pass it explicitly for
reproducible tests / incremental runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
CHANGE_PRIOR_MICRO = 500_000   # unknown change rate for single-fetch URLs
US_PER_HOUR = 3_600_000_000


def revisit_priority(history: DataFrame, url_col: str = "url",
                     ts_col: str = "ts", digest_col: str = "digest",
                     tiebreak_col: str | None = None,
                     now_us: int | None = None) -> DataFrame:
    """(url, n_fetches, n_changes, change_rate_micro, age_hours,
    priority_micro) — one row per URL. See module docstring for the
    recurrence; every output is BIGINT."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(url_col).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    if now_us is None:
        now_us = history.agg(
            F.max(ts_us).alias("m")).collect()[0].m
    prev = F.lag(F.col(digest_col)).over(w)
    obs = history.select(
        F.col(url_col).alias("url"),
        ts_us.alias("ts_us"),
        F.when(prev.isNotNull() & (prev != F.col(digest_col)), 1)
        .otherwise(0).alias("changed"))
    per_url = obs.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("changed").cast("long").alias("n_changes"),
        F.max("ts_us").alias("last_us"))
    rate = (F.when(F.col("n_fetches") > 1,
                   F.expr(f"({SCALE} * n_changes) div (n_fetches - 1)"))
            .otherwise(F.lit(CHANGE_PRIOR_MICRO)).cast("long"))
    return per_url.select(
        "url", "n_fetches", "n_changes",
        rate.alias("change_rate_micro"),
        F.expr(f"({now_us} - last_us) div {US_PER_HOUR}").cast("long")
        .alias("age_hours"),
        (rate * F.expr(f"({now_us} - last_us) div {US_PER_HOUR}"))
        .cast("long").alias("priority_micro"))


def revisit_decisions(state: DataFrame,
                      rate_col: str = "change_rate_micro",
                      age_col: str = "age_hours",
                      etag_col: str | None = None,
                      last_modified_col: str | None = None,
                      prior_hours_col: str | None = None,
                      base_hours: int = 24, min_hours: int = 1,
                      max_hours: int = 720) -> DataFrame:
    """Turn per-URL freshness state into concrete recrawl decisions.

    The bandwidth reality of recrawling at 10^10 URLs is that most
    revisits should be HTTP revalidations, not fetches: a conditional
    GET (If-None-Match / If-Modified-Since) costs a ~200-byte 304 when
    the page is unchanged. This planner assigns each URL:

    - ``interval_hours`` — target revisit interval, inverse to the
      observed change rate: ``clamp(base_hours * SCALE / max(rate, 1),
      min_hours, max_hours)`` (a page changing every fetch revisits at
      ``base_hours``; a static page decays to ``max_hours``), further
      capped by an optional per-URL prior (e.g. the sitemap
      ``changefreq`` hours from sources/sitemap.py, q57);
    - ``due`` — age reached the interval;
    - ``decision`` — ``skip`` (not due), ``conditional_get`` (due and
      the server gave an ETag or Last-Modified validator), ``fetch``
      (due, no validator).

    All integer/boolean codegen over the per-URL state table — zero
    shuffle, zero Python; composes directly on ``revisit_priority``
    output. Oracle-gated (q65).
    """
    interval = F.expr(
        f"({base_hours} * {SCALE}) div greatest({rate_col}, 1)")
    interval = F.least(F.lit(max_hours).cast("long"),
                       F.greatest(F.lit(min_hours).cast("long"), interval))
    if prior_hours_col is not None:
        interval = F.least(
            interval,
            F.coalesce(F.col(prior_hours_col).cast("long"),
                       F.lit(max_hours).cast("long")))
    due = F.col(age_col) >= interval
    cheap = F.lit(False)
    if etag_col is not None:
        cheap = cheap | F.coalesce(F.col(etag_col), F.lit(False))
    if last_modified_col is not None:
        cheap = cheap | F.coalesce(F.col(last_modified_col), F.lit(False))
    return (state
            .withColumn("interval_hours", interval)
            .withColumn("due", due)
            .withColumn("decision",
                        F.when(~F.col("due"), F.lit("skip"))
                        .when(cheap, F.lit("conditional_get"))
                        .otherwise(F.lit("fetch"))))
