"""Pagination strategy parity tests.

Golden expectations derive from the reference's formulas
(/root/reference/internal/scraper/pagination_strategies.go):
  offset:   next = start_offset + page_num*limit; query Set+Encode sorts keys
  numbered: next = start_page + page_num; {page}/{PAGE} templates
  cursor:   selector text/attr; stop on empty/repeated cursor
  next_button: disabled attr/class/'disabled'/span/empty-'#' href
"""

from __future__ import annotations

import pytest

from datascrapexter_spark.frontier.pagination import (
    PaginationSpec,
    cursor_next_url,
    extract_next_urls_df,
    next_button_next_url,
    numbered_next_url,
    offset_next_url,
    page_urls,
)


def test_offset_sequence():
    spec = PaginationSpec(type="offset", base_url="https://x.com/list",
                          limit=10, max_offset=35)
    # page 1 -> offset 10, page 2 -> 20, page 3 -> 30, page 4 -> 40 >= 35 stop
    assert offset_next_url(spec, spec.base_url, 1) == \
        "https://x.com/list?limit=10&offset=10"
    assert offset_next_url(spec, spec.base_url, 3) == \
        "https://x.com/list?limit=10&offset=30"
    assert offset_next_url(spec, spec.base_url, 4) is None


def test_offset_merges_existing_query_sorted():
    spec = PaginationSpec(type="offset", base_url="https://x.com/l?q=shoes",
                          limit=5)
    # Go url.Values.Encode() sorts keys: limit < offset < q
    assert offset_next_url(spec, spec.base_url, 1) == \
        "https://x.com/l?limit=5&offset=5&q=shoes"


def test_offset_custom_params_and_start():
    spec = PaginationSpec(type="offset", base_url="https://x.com/a",
                          offset_param="from", limit_param="size",
                          limit=20, start_offset=100)
    assert offset_next_url(spec, spec.base_url, 1) == \
        "https://x.com/a?from=120&size=20"


def test_numbered_query_param():
    spec = PaginationSpec(type="pages", base_url="https://x.com/c", max_pages=3)
    assert numbered_next_url(spec, spec.base_url, 1) == "https://x.com/c?page=2"
    assert numbered_next_url(spec, spec.base_url, 2) == "https://x.com/c?page=3"
    assert numbered_next_url(spec, spec.base_url, 3) is None  # 4 > max_pages


def test_numbered_template():
    spec = PaginationSpec(type="url_pattern",
                          url_template="https://x.com/p/{page}/items",
                          max_pages=5)
    assert numbered_next_url(spec, spec.url_template, 2) == \
        "https://x.com/p/3/items"


def test_page_urls_sequences():
    offset = PaginationSpec(type="offset", base_url="https://x.com/l",
                            limit=10, max_offset=30, max_pages=10)
    # the engine loop renders offset=0 for the FIRST page too
    # (engine.go:721-733), never the bare base URL
    assert page_urls(offset) == [
        "https://x.com/l?limit=10&offset=0",
        "https://x.com/l?limit=10&offset=10",
        "https://x.com/l?limit=10&offset=20",
    ]
    tmpl = PaginationSpec(type="url_pattern",
                          url_template="https://x.com/p/{PAGE}",
                          start_page=1, max_pages=3)
    assert page_urls(tmpl) == [
        "https://x.com/p/1", "https://x.com/p/2", "https://x.com/p/3",
    ]


def test_page_urls_default_cap_is_10():
    spec = PaginationSpec(type="pages", base_url="https://x.com/c",
                          max_pages=0)
    assert len(page_urls(spec)) == 10  # engine.go:715-718 safety default


def test_cursor_extraction_and_loop_protection():
    spec = PaginationSpec(type="cursor", cursor_selector=".next-cursor",
                          limit=10, max_pages=10)
    html = '<div class="next-cursor">abc123</div>'
    url, cur = cursor_next_url(spec, "https://x.com/f", html, 1)
    assert url == "https://x.com/f?cursor=abc123&limit=10"
    assert cur == "abc123"
    # repeated cursor -> complete
    url2, _ = cursor_next_url(spec, "https://x.com/f", html, 2,
                              last_cursor="abc123")
    assert url2 is None
    # no cursor element -> complete
    url3, cur3 = cursor_next_url(spec, "https://x.com/f", "<p>end</p>", 2)
    assert url3 is None and cur3 == ""


def test_cursor_from_attribute_and_custom_param():
    spec = PaginationSpec(type="cursor", cursor_selector="a.more",
                          cursor_attr="data-cursor", page_param="after",
                          limit=25)
    html = '<a class="more" data-cursor="XYZ">more</a>'
    url, cur = cursor_next_url(spec, "https://x.com/f?a=1", html, 1)
    assert url == "https://x.com/f?a=1&after=XYZ&limit=25"
    assert cur == "XYZ"


@pytest.mark.parametrize("html,expected", [
    ('<a class="next" href="/p/2">next</a>', "https://x.com/p/2"),
    ('<a class="next" href="https://x.com/abs">n</a>', "https://x.com/abs"),
    ('<a class="next disabled" href="/p/2">n</a>', None),   # disabled class
    ('<span class="next">n</span>', None),                  # span = disabled
    ('<a class="next" href="#">n</a>', None),               # '#' href
    ('<a class="next" href="">n</a>', None),                # empty href
    ('<p>no button</p>', None),                             # absent
])
def test_next_button(html, expected):
    spec = PaginationSpec(type="next_button", selector=".next", max_pages=10)
    assert next_button_next_url(spec, "https://x.com/p/1", html, 1) == expected


def test_next_button_disabled_attr():
    spec = PaginationSpec(type="next_button", selector=".next",
                          disabled_attr="aria-disabled")
    html = '<a class="next" aria-disabled="true" href="/p/2">n</a>'
    assert next_button_next_url(spec, "https://x.com/p/1", html, 1) is None


def test_validate_rejects_bad_config():
    with pytest.raises(ValueError):
        PaginationSpec(type="bogus").validate()
    with pytest.raises(ValueError):
        PaginationSpec(type="next_button").validate()
    with pytest.raises(ValueError):
        PaginationSpec(type="url_pattern").validate()
    with pytest.raises(ValueError):
        PaginationSpec(type="cursor").validate()


def test_extract_next_urls_df(spark):
    spec = PaginationSpec(type="next_button", selector="a.next", max_pages=10)
    rows = [
        ("https://h.com/p/1", '<a class="next" href="/p/2">n</a>'),
        ("https://h.com/p/2", '<a class="next" href="/p/3">n</a>'),
        ("https://h.com/p/3", '<span class="next">end</span>'),
    ]
    df = spark.createDataFrame(rows, "url_canon string, html string")
    out = {r["src_url"]: r["next_url"]
           for r in extract_next_urls_df(df, spec).collect()}
    assert out == {
        "https://h.com/p/1": "https://h.com/p/2",
        "https://h.com/p/2": "https://h.com/p/3",
        "https://h.com/p/3": None,
    }


def test_extract_next_urls_df_cursor(spark):
    spec = PaginationSpec(type="cursor", cursor_selector=".cur", limit=2)
    rows = [
        ("https://h.com/f", '<i class="cur">c1</i>'),
        ("https://h.com/f?cursor=c1&limit=2", "<p>done</p>"),
    ]
    df = spark.createDataFrame(rows, "url_canon string, html string")
    got = {r["src_url"]: (r["next_url"], r["cursor"])
           for r in extract_next_urls_df(df, spec).collect()}
    assert got["https://h.com/f"] == ("https://h.com/f?cursor=c1&limit=2", "c1")
    assert got["https://h.com/f?cursor=c1&limit=2"] == (None, "")
