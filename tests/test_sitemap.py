"""Sitemap parser on handcrafted documents: optional tags, XML escapes,
index documents, multiline entries, changefreq mapping, plan shape."""
from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from datascrapexter_spark.sources.sitemap import (
    changefreq_hours_col, parse_sitemaps_df)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?x=1&amp;y=&lt;2&gt;</loc>
    <lastmod>2024-05-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://ex.com/bare</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?><sitemapindex>
<sitemap><loc>https://ex.com/s1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
<sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def _parse(spark, xml):
    df = spark.createDataFrame([Row(sitemap_url="https://ex.com/sm", xml=xml)],
                               "sitemap_url string, xml string")
    return parse_sitemaps_df(df).collect()


def test_urlset_entries(spark):
    rows = sorted(_parse(spark, URLSET), key=lambda r: r["loc"])
    assert len(rows) == 2
    full, bare = rows
    assert full["loc"] == "https://ex.com/a?x=1&y=<2>"   # unescaped
    assert full["lastmod"] == "2024-05-01"
    assert full["changefreq"] == "daily" and full["priority"] == "0.8"
    assert full["is_index"] is False
    assert bare["loc"] == "https://ex.com/bare"
    assert bare["lastmod"] is None and bare["changefreq"] is None
    assert bare["priority"] is None


def test_sitemapindex_entries(spark):
    rows = sorted(_parse(spark, INDEX), key=lambda r: r["loc"])
    assert [r["loc"] for r in rows] == [
        "https://ex.com/s1.xml", "https://ex.com/s2.xml"]
    assert all(r["is_index"] for r in rows)
    assert rows[0]["lastmod"] == "2024-01-01"
    assert all(r["changefreq"] is None and r["priority"] is None
               for r in rows)


def test_changefreq_mapping(spark):
    df = spark.createDataFrame(
        [Row(cf=c) for c in ["always", "hourly", "daily", "weekly",
                             "monthly", "yearly", "never", "bogus", None]],
        "cf string")
    got = {r["cf"]: r["h"] for r in df.select(
        "cf", changefreq_hours_col(F.col("cf")).alias("h")).collect()}
    assert got["always"] == 1 and got["daily"] == 24
    assert got["weekly"] == 168 and got["monthly"] == 720
    assert got["yearly"] == 8760 and got["never"] == 8760
    assert got["bogus"] is None and got[None] is None


def test_plan_is_codegen_generate(spark):
    df = spark.createDataFrame([Row(sitemap_url="u", xml=URLSET)],
                               "sitemap_url string, xml string")
    plan = parse_sitemaps_df(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate explode" in plan
    assert "Python" not in plan and "Exchange" not in plan
