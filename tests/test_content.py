"""Boilerplate-removal classifier on handcrafted pages: leaf-block
segmentation, the exact 1/3 link-density boundary, zero-word blocks,
bytes input, and the one-Arrow-crossing plan shape."""
from __future__ import annotations

from pyspark.sql import Row

from datascrapexter_spark.extract.content import (
    extract_main_content_df, extract_main_content_py)

LONG = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 words


def test_nested_blocks_only_leaves_count():
    # div wraps two p's: the div is NOT a leaf block, the p's are
    h = f"<html><body><div><p>{LONG}</p><p>tiny one</p></div></body></html>"
    r = extract_main_content_py(h)
    assert r["n_blocks"] == 2
    assert r["main_text"] == LONG
    assert r["total_words"] == 12 and r["content_words"] == 10


def test_link_density_boundary_is_inclusive():
    # 12 words, 4 inside links: 3*4 == 1*12 -> exactly 1/3, kept
    words8 = "w1 w2 w3 w4 w5 w6 w7 w8"
    h = (f"<html><body><p>{words8} <a href='/'>l1 l2 l3 l4</a></p>"
         "</body></html>")
    r = extract_main_content_py(h)
    assert r["n_content_blocks"] == 1
    # one more link word tips it over: 3*5 > 13
    h2 = (f"<html><body><p>{words8} <a href='/'>l1 l2 l3 l4 l5</a></p>"
          "</body></html>")
    assert extract_main_content_py(h2)["n_content_blocks"] == 0


def test_zero_word_blocks_ignored():
    h = f"<html><body><div> </div><p></p><p>{LONG}</p></body></html>"
    r = extract_main_content_py(h)
    assert r["n_blocks"] == 1 and r["n_content_blocks"] == 1


def test_empty_page():
    r = extract_main_content_py("<html><body></body></html>")
    assert r == {"main_text": "", "n_blocks": 0, "n_content_blocks": 0,
                 "total_words": 0, "content_words": 0, "boiler_ppm": 0}


def test_bytes_input_and_list_items():
    h = (f"<html><body><ul><li>{LONG} extra</li>"
         "<li><a href='/'>nav link</a></li></ul></body></html>").encode()
    r = extract_main_content_py(h)
    assert r["n_blocks"] == 2 and r["n_content_blocks"] == 1
    assert r["main_text"].startswith("alpha")


def test_df_passthrough_and_plan(spark):
    pages = spark.createDataFrame(
        [Row(doc_id=7, site="s", html=f"<html><body><p>{LONG}</p>"
                                      "</body></html>")],
        "doc_id long, site string, html string")
    out = extract_main_content_df(pages)
    assert out.columns[:2] == ["doc_id", "site"]
    row = out.collect()[0]
    assert row["doc_id"] == 7 and row["main_text"] == LONG
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_main_content_field_type(spark):
    """main_content as a config-driven field: whole-doc by default,
    subtree-scoped with a selector, DataFrame path included."""
    from pyspark.sql import Row

    from datascrapexter_spark.extract import FieldConfig, extract_fields_df
    from datascrapexter_spark.extract.fields import extract_field
    from datascrapexter_spark.html.dom import parse_html

    page = (f"<html><body><div class='nav'><a href='/'>home link</a></div>"
            f"<div id='art'><p>{LONG}</p></div>"
            f"<p>{LONG} tail words here</p></body></html>")
    doc = parse_html(page)
    whole = extract_field(doc, FieldConfig(
        name="content", selector="", type="main_content"))
    assert whole == f"{LONG}\n{LONG} tail words here"
    scoped = extract_field(doc, FieldConfig(
        name="content", selector="#art", type="main_content"))
    assert scoped == LONG

    pages = spark.createDataFrame([Row(doc_id=1, html=page)],
                                  "doc_id long, html string")
    out = extract_fields_df(pages, [FieldConfig(
        name="content", selector="", type="main_content")])
    assert out.collect()[0]["content"] == whole
