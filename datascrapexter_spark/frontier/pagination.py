"""Pagination strategies: offset / numbered-pages / url_pattern / cursor /
next_button, with the reference's exact next-URL and completion semantics.

Reference: /root/reference/internal/scraper/pagination_strategies.go
  OffsetStrategy        :27-92   (?offset=S+page*L&limit=L, stop at MaxOffset;
                                  params Set + Encode -> keys sorted)
  CursorStrategy        :95-205  (cursor from selector text/attr; stop on
                                  empty or repeated cursor; MaxPages cap)
  NextButtonStrategy    :208-311 (href of selector; disabled by attr/class/
                                  "disabled" class/span tag/empty-# href)
  NumberedPagesStrategy :314-375 (?page=N or {page}/{PAGE} template)
  CreatePaginationStrategy :379-424 (config dispatch; url_pattern ->
                                  numbered with template)
and pagination.go:116-167 (ValidatePaginationConfig).

Spark-first split:
- offset / pages / url_pattern need no DOM: the whole page sequence is a
  pure function of config, generated driver-side (`page_urls`) and fed to
  the frontier as seed rows — the reference computes these one at a time in
  its sequential loop (engine.go:721-733); declared up-front they become a
  plain scan, and per-host sequencing is preserved by the politeness
  scheduler's deterministic order.
- cursor / next_button depend on each fetched page's DOM: one mapInPandas
  pass (`extract_next_urls_df`) emits (src url, next_url, cursor) per page;
  the crawl round loop appends next_url to the frontier. Cursor-repeat
  protection (strategy state in the reference) becomes a join against the
  previous round's cursor column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.urlnorm import _encode_query, _parse_query_pairs, resolve_url
from ..html import parse_html, select

VALID_TYPES = ("offset", "pages", "numbered", "url_pattern", "cursor",
               "next_button")


@dataclass
class PaginationSpec:
    """Normalized strategy config (CreatePaginationStrategy parity)."""
    type: str
    base_url: str = ""
    offset_param: str = ""   # defaults applied at use: "offset"
    limit_param: str = ""    # "limit"
    page_param: str = ""     # "page" (numbered) / "cursor" (cursor)
    limit: int = 10
    start_offset: int = 0
    start_page: int = 1
    max_pages: int = 10          # engine.go:715-718 default safety cap
    max_offset: int = 0
    url_template: str = ""
    cursor_selector: str = ""
    cursor_attr: str = ""
    selector: str = ""           # next_button selector
    disabled_attr: str = ""
    disabled_class: str = ""

    def cursor_param_name(self) -> str:
        """CreatePaginationStrategy maps config PageParam -> CursorParam
        for the cursor strategy (:414-421); default 'cursor'."""
        return (self.page_param or "cursor") if self.type == "cursor" else "cursor"

    def validate(self) -> None:
        """ValidatePaginationConfig parity (pagination.go:116-167)."""
        if self.type not in VALID_TYPES:
            raise ValueError(f"unknown pagination strategy: {self.type}")
        if self.type == "next_button" and not self.selector:
            raise ValueError("selector is required for next_button pagination")
        if self.type == "url_pattern" and not self.url_template:
            raise ValueError("url_template is required for url_pattern pagination")
        if self.type == "cursor" and not self.cursor_selector:
            raise ValueError("cursor_selector is required for cursor strategy")


def _set_query_params(base_url: str, updates: dict[str, str]) -> str:
    """Go query.Set + Encode parity: replace keys, re-encode sorted."""
    from urllib.parse import urlsplit

    u = urlsplit(base_url)
    pairs = [(k, v) for k, v in _parse_query_pairs(u.query)
             if k not in updates]
    pairs.extend(sorted(updates.items()))
    query = _encode_query(pairs)
    out = ""
    if u.scheme:
        out += u.scheme + ":"
    if u.netloc:
        out += "//" + u.netloc
    out += u.path
    if query:
        out += "?" + query
    if u.fragment:
        out += "#" + u.fragment
    return out


# ---------------------------------------------------------------------------
# DOM-free strategies: whole page sequence up front
# ---------------------------------------------------------------------------


def offset_next_url(spec: PaginationSpec, current_url: str,
                    page_num: int) -> str | None:
    """OffsetStrategy.GetNextURL (:38-76): next offset = start + page*limit;
    None once max_offset reached."""
    limit = spec.limit if spec.limit > 0 else 10
    next_offset = spec.start_offset + page_num * limit
    if spec.max_offset > 0 and next_offset >= spec.max_offset:
        return None
    base = spec.base_url or current_url
    return _set_query_params(base, {
        spec.offset_param or "offset": str(next_offset),
        spec.limit_param or "limit": str(limit),
    })


def numbered_next_url(spec: PaginationSpec, current_url: str,
                      page_num: int) -> str | None:
    """NumberedPagesStrategy.GetNextURL (:323-361): ?page=N or {page}/{PAGE}
    template; None once past max_pages."""
    start = spec.start_page if spec.start_page > 0 else 1
    next_page = start + page_num
    if spec.max_pages > 0 and next_page > spec.max_pages:
        return None
    base = spec.base_url or spec.url_template or current_url
    if "{page}" in base or "{PAGE}" in base:
        return base.replace("{page}", str(next_page)).replace(
            "{PAGE}", str(next_page))
    return _set_query_params(base, {spec.page_param or "page": str(next_page)})


def page_urls(spec: PaginationSpec, seed_url: str | None = None) -> list[str]:
    """The full page sequence for a DOM-free strategy. This is what feeds
    the frontier: the reference generates the same URLs one per loop
    iteration (engine.go:720-733).

    First-page semantics follow the engine loop, which is the path actually
    executed: for `offset` the loop computes EVERY page URL including the
    first (engine.go:721-733 renders baseURL?offset=0&limit=L at pageNum=0,
    never the bare base URL), and url_pattern templates render start_page.
    Numbered `pages` strategies fetch the bare seed first (the engine only
    consults GetNextURL from pageNum>0)."""
    spec.validate()
    seed = seed_url or spec.base_url or spec.url_template
    if spec.type in ("url_pattern", "offset"):
        # these strategies render every page, incl. the first (start_page /
        # start_offset at page_num=0)
        urls = []
        fn0 = offset_next_url if spec.type == "offset" else numbered_next_url
        first = fn0(spec, seed, 0)
        if first is not None:
            urls.append(first)
    else:
        urls = [seed]
    fn = offset_next_url if spec.type == "offset" else numbered_next_url
    cap = spec.max_pages if spec.max_pages > 0 else 10
    page_num = 1
    while len(urls) < cap:
        nxt = fn(spec, urls[-1] if urls else seed, page_num)
        if nxt is None:
            break
        urls.append(nxt)
        page_num += 1
    return urls


# ---------------------------------------------------------------------------
# DOM-dependent strategies: cursor + next_button
# ---------------------------------------------------------------------------


def extract_cursor(html, spec: PaginationSpec) -> str:
    """CursorStrategy.extractCursor (:165-188): selector text or attr,
    '' when absent."""
    doc = parse_html(html or "")
    nodes = select(doc, spec.cursor_selector)
    if not nodes:
        return ""
    if spec.cursor_attr:
        return nodes[0].attr(spec.cursor_attr) or ""
    return nodes[0].text().strip()


def cursor_next_url(spec: PaginationSpec, current_url: str, html,
                    page_num: int, last_cursor: str = "") -> tuple[str | None, str]:
    """CursorStrategy.GetNextURL (:113-163). Returns (next_url, cursor);
    next_url None on completion (no/repeated cursor, page cap)."""
    if spec.max_pages > 0 and page_num > spec.max_pages:
        return None, last_cursor
    cursor = extract_cursor(html, spec)
    if cursor == "" or cursor == last_cursor:
        return None, cursor
    base = spec.base_url or current_url
    limit = spec.limit if spec.limit > 0 else 10
    url = _set_query_params(base, {
        spec.cursor_param_name(): cursor,
        spec.limit_param or "limit": str(limit),
    })
    return url, cursor


def next_button_next_url(spec: PaginationSpec, current_url: str, html,
                         page_num: int) -> str | None:
    """NextButtonStrategy.GetNextURL + IsComplete disabled heuristics
    (:215-311): disabled attr/class, 'disabled' class, span tag, empty/'#'
    href all end pagination."""
    if spec.max_pages > 0 and page_num > spec.max_pages:
        return None
    doc = parse_html(html or "")
    nodes = select(doc, spec.selector)
    if not nodes:
        return None
    node = nodes[0]
    if spec.disabled_attr and node.attr(spec.disabled_attr) is not None:
        return None
    classes = (node.attr("class") or "").split()
    if spec.disabled_class and spec.disabled_class in classes:
        return None
    if "disabled" in classes:
        return None
    if node.tag == "span":
        return None
    href = node.attr("href")
    if not href or href == "#":
        return None
    return resolve_url(current_url, href)


NEXT_URL_SCHEMA = T.StructType([
    T.StructField("src_url", T.StringType()),
    T.StructField("next_url", T.StringType()),
    T.StructField("cursor", T.StringType()),
])


def extract_next_urls_df(fetched: DataFrame, spec: PaginationSpec,
                         url_col: str = "url_canon", html_col: str = "html",
                         page_num: int = 1) -> DataFrame:
    """One Arrow pass over fetched pages -> (src_url, next_url, cursor).

    next_url NULL when that page ends its chain. Cursor-repeat protection
    across rounds: join this round's `cursor` against the previous round's
    and null out matches (the reference's lastCursor state, :144-149).
    """
    spec.validate()
    spec_local = spec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, nxt, cur = [], [], []
            for u, h in zip(pdf[url_col], pdf[html_col]):
                if spec_local.type == "cursor":
                    n, c = cursor_next_url(spec_local, u, h, page_num)
                elif spec_local.type == "next_button":
                    n, c = next_button_next_url(spec_local, u, h, page_num), ""
                else:
                    raise ValueError(
                        f"{spec_local.type} pages are generated up front by "
                        "page_urls(), not extracted from the DOM")
                src.append(u)
                nxt.append(n)
                cur.append(c)
            yield pd.DataFrame(
                {"src_url": src, "next_url": nxt, "cursor": cur},
                columns=["src_url", "next_url", "cursor"],
            )

    return fetched.select(url_col, html_col).mapInPandas(run, NEXT_URL_SCHEMA)
