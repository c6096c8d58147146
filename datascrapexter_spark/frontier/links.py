"""Out-link extraction for the crawl loop.

Equivalent surface in the reference: pagination/next-URL discovery parses
the current page's DOM for anchors (internal/scraper/
pagination_strategies.go:216-311 next_button href; engine.go:678-804 page
loop). Generalized here to full link-frontier extraction: one
`mapInPandas` pass emits (page url_canon, out-link canonical URL) pairs —
parse once per page, resolve against the page URL, validate http(s),
canonicalize. Arrow-batched; emits a variable number of rows per input
row (the UDTF-shaped analog, SURVEY §2.10).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.urlnorm import is_valid_url, normalize_url, resolve_url
from ..html import parse_html, select

LINKS_SCHEMA = T.StructType([
    T.StructField("src_url_canon", T.StringType()),
    T.StructField("out_url_canon", T.StringType()),
])


def is_sitemap_url(url: str) -> bool:
    """Sitemap pages get <loc>-element extraction instead of anchors."""
    path = url.split("?", 1)[0].split("#", 1)[0]
    return path.endswith((".xml", "/sitemap")) and "sitemap" in path.rsplit(
        "/", 1)[-1]


def extract_links_py(html, base_url: str, selector: str = "a[href]") -> list[str]:
    """Ordered, per-page-deduped canonical out-links of one page.

    Sitemap URLs (…/sitemap*.xml) are parsed for <loc> entries — the
    sitemap protocol's URL list (the reference exposes the sitemap URLs via
    GetSitemaps, compliance_test.go:250-252; consuming them is this
    engine's frontier generalization)."""
    if is_sitemap_url(base_url):
        return _sitemap_locs(html, base_url)
    doc = parse_html(html or "")
    seen: set[str] = set()
    out: list[str] = []
    for a in select(doc, selector):
        href = a.attr("href")
        if not href or href.startswith(("#", "javascript:", "mailto:", "tel:")):
            continue
        absolute = resolve_url(base_url, href)
        if not is_valid_url(absolute):
            continue
        canon = normalize_url(absolute)
        if canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out


def _sitemap_locs(html, base_url: str) -> list[str]:
    """Canonical URLs from a sitemap's <loc> elements (urlset entries)."""
    doc = parse_html(html or "")
    seen: set[str] = set()
    out: list[str] = []
    for node in select(doc, "loc"):
        raw = node.text().strip()
        if not raw:
            continue
        absolute = resolve_url(base_url, raw)
        if not is_valid_url(absolute):
            continue
        canon = normalize_url(absolute)
        if canon not in seen:
            seen.add(canon)
            out.append(canon)
    return out


def extract_links_df(fetched: DataFrame, url_col: str = "url_canon",
                     html_col: str = "html",
                     selector: str = "a[href]") -> DataFrame:
    """(url_canon, html) -> exploded (src_url_canon, out_url_canon)."""
    sel = selector

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, dst = [], []
            for base, html in zip(pdf[url_col], pdf[html_col]):
                if html is None:
                    continue
                for link in extract_links_py(html, base, sel):
                    src.append(base)
                    dst.append(link)
            yield pd.DataFrame(
                {"src_url_canon": src, "out_url_canon": dst},
                columns=["src_url_canon", "out_url_canon"],
            )

    return fetched.select(url_col, html_col).mapInPandas(run, LINKS_SCHEMA)
