"""URL template mining: generalize URL paths into structural templates.

A crawl frontier at 10^10 URLs is dominated by a few thousand URL
*shapes* per site (``/product/{n}``, ``/item/{hex}``, ``/u/{uuid}``).
Mining those templates powers the same decisions the reference makes
per-config by hand — which URL patterns to follow
(internal/scraper/engine.go follow rules), where spider traps live
(our frontier/traps.py scores anomalies per URL; templates aggregate
them per shape), and how to cap crawl budgets per listing type — but
learned from the corpus instead of declared.

Everything here is pure Catalyst codegen (regexp + array transforms,
zero Python nodes, zero UDFs): classification runs inside the scan's
WholeStageCodegen and the only exchange in ``mine_url_templates`` is
the final (host, template) partial-agg groupBy, so at 100 TB the plan
is one corpus scan plus one keyed shuffle of tiny (host, template)
rows.

Segment classes, checked in order (first match wins, on the lowercased
segment):

- ``{n}``     all digits
- ``{uuid}``  8-4-4-4-12 hex
- ``{hex}``   >= 8 hex chars containing at least one digit
- ``{id}``    >= 6 chars of [a-z0-9_-] containing at least one digit
- otherwise the literal segment (original case preserved)

The DuckDB oracle (oracles.py q59) replays the identical regex table
via ``list_transform`` — both engines must agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) classification table — shared, in order, with
# the oracle SQL generator. Patterns are anchored and engine-portable
# (same semantics under Java regex and RE2).
SEGMENT_CLASSES: tuple[tuple[str, str], ...] = (
    (r"^[0-9]+$", "{n}"),
    (r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
     "{uuid}"),
    (r"^[0-9a-f]{8,}$", "{hex}"),
    (r"^[a-z0-9_-]{6,}$", "{id}"),
)
_HAS_DIGIT = "[0-9]"
# classes that additionally require a digit (pure-alpha hex strings like
# "deadbeef" are far more likely to be words; pure-alpha slugs are slugs)
_DIGIT_REQUIRED = {"{hex}", "{id}"}

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"


def _classify(seg: Column) -> Column:
    low = F.lower(seg)
    out = seg
    for pat, cls in reversed(SEGMENT_CLASSES):
        cond = low.rlike(pat)
        if cls in _DIGIT_REQUIRED:
            cond = cond & low.rlike(_HAS_DIGIT)
        out = F.when(cond, F.lit(cls)).otherwise(out)
    return out


def url_host_col(url: Column | str) -> Column:
    """Lowercased authority (host[:port]) of an absolute URL; '' if the
    URL has no scheme://authority prefix."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def url_template_col(url: Column | str) -> Column:
    """Structural template ``host/class1/class2`` of an absolute URL.

    Query string and fragment are dropped (their presence is surfaced
    separately by :func:`mine_url_templates`); empty path mines as
    ``host/``.
    """
    c = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(c, _PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    classed = F.transform(segs, _classify)
    return F.concat(url_host_col(c), F.lit("/"),
                    F.array_join(classed, "/"))


def mine_url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Aggregate a URL corpus into per-(host, template) shape stats.

    Returns one row per (host, template) with ``n_urls``,
    ``n_distinct`` (distinct full URLs — n_urls >> n_distinct flags
    recrawl-heavy shapes), ``n_with_query`` (URLs carrying a query
    string — high share flags faceted/trap-prone shapes), and
    ``example_url`` (lexicographic min, a stable representative).

    Scale shape: classification is map-side codegen over the scan; the
    single exchange carries (host, template, url-hash-level) rows only
    — never page payloads.
    """
    u = F.col(url_col)
    prepared = df.select(
        url_host_col(u).alias("host"),
        url_template_col(u).alias("template"),
        u.alias("_url"),
        u.rlike(r"^[a-z][a-z0-9+.-]*://[^?#]*\?").cast("long")
        .alias("_has_q"),
    )
    return (prepared
            .groupBy("host", "template")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("_url").alias("n_distinct"),
                 F.sum("_has_q").alias("n_with_query"),
                 F.min("_url").alias("example_url")))
