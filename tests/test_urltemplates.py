"""URL template mining: segment classification, aggregation, plan shape."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from datascrapexter_spark.functions.urltemplates import (
    mine_url_templates, url_host_col, url_template_col)


def _templates(spark, urls):
    df = spark.createDataFrame([Row(url=u) for u in urls], "url string")
    rows = df.select(url_template_col("url").alias("t")).collect()
    return [r["t"] for r in rows]


def test_segment_classes(spark):
    cases = {
        "https://a.com/product/12345": "a.com/product/{n}",
        "https://a.com/item/0a1b2c3d4e5f": "a.com/item/{hex}",
        # hex-length but no digit -> not hex; 8 chars of [a-z] -> {id}? no:
        # {id} requires a digit too, so the literal survives
        "https://a.com/item/deadbeefcafe": "a.com/item/deadbeefcafe",
        "https://a.com/u/0a1b2c3d-4e5f-0a1b-2c3d-4e5f0a1b2c3d":
            "a.com/u/{uuid}",
        # under 6 chars -> literal even with a digit
        "https://a.com/p/rev-3/x": "a.com/p/rev-3/x",
        "https://a.com/p/review-33": "a.com/p/{id}",
        "https://a.com/static/css/main.css": "a.com/static/css/main.css",
        # query + fragment dropped; empty path -> host/
        "https://a.com/product/7?page=2#frag": "a.com/product/{n}",
        "https://A.COM": "a.com/",
        # UPPER-hex classifies (lowercased for the check), literal keeps case
        "https://a.com/item/0A1B2C3D4E": "a.com/item/{hex}",
        "https://a.com/About": "a.com/About",
    }
    got = _templates(spark, list(cases))
    assert got == list(cases.values())


def test_mine_url_templates_aggregates(spark):
    urls = ["https://s.com/p/1", "https://s.com/p/2", "https://s.com/p/2",
            "https://s.com/p/3?q=x", "https://t.com/about"]
    df = spark.createDataFrame([Row(url=u) for u in urls], "url string")
    out = {(r["host"], r["template"]): r.asDict()
           for r in mine_url_templates(df).collect()}
    p = out[("s.com", "s.com/p/{n}")]
    assert p["n_urls"] == 4 and p["n_distinct"] == 3
    assert p["n_with_query"] == 1
    assert p["example_url"] == "https://s.com/p/1"
    assert out[("t.com", "t.com/about")]["n_urls"] == 1


def test_mine_plan_is_pure_codegen(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://h.com/p/"), F.col("id").cast("string"))
        .alias("url"))
    plan = mine_url_templates(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "EvalPython" not in plan          # no Python UDF nodes
    assert plan.count("Exchange") <= 2       # partial/final agg pair only
