"""SURT key + CDX index (functions/surt.py) — per-rule golden cases and
the distributed total-sort contract. Cross-engine key derivation is gated
by q49."""

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.functions.surt import cdx_index, surt_key_col

CASES = [
    # (raw url, expected surt key)
    ("HTTP://WWW.Shop1.Example.COM:80/Items/9?z=9&A=1#f",
     "com,example,shop1)/items/9?a=1&z=9"),
    ("https://example.com:443/", "com,example)/"),
    ("https://example.com", "com,example)"),                 # no path
    ("http://example.com:8080/x", "com,example:8080)/x"),    # non-default port kept
    ("https://example.com:80/x", "com,example:80)/x"),       # :80 is not https' default
    ("http://sub.www.example.com/", "com,example,www,sub)/"),  # only LEADING www strips
    ("http://www.example.com/a?b", "com,example)/a?b"),
    ("http://host/p?c=2&b=1&a=3", "host)/p?a=3&b=1&c=2"),
]


def test_surt_rule_golden(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r.k for r in
           df.select(surt_key_col(F.col("url")).alias("k")).collect()]
    assert got == [want for _, want in CASES]


def test_cdx_globally_sorted(spark):
    rows = [(f"https://h{i % 17}.example.org/p/{(i * 7) % 31}?b=2&a=1",)
            for i in range(400)]
    df = spark.createDataFrame(rows, "url string")
    out = cdx_index(df, url_col="url", num_ranges=5)
    # per-partition order AND cross-partition boundaries both monotone
    parts = out.select("surt_key").rdd.glom().collect()
    flat = []
    for p in parts:
        keys = [r.surt_key for r in p]
        assert keys == sorted(keys)
        flat.extend(keys)
    assert flat == sorted(flat)
    assert len(flat) == 400


def test_cdx_plan_is_range_sort_not_window(spark):
    df = spark.createDataFrame([("https://a.example.org/x",)], "url string")
    out = cdx_index(df, url_col="url", num_ranges=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Window" not in plan


def test_cdx_digest_from_payload(spark):
    df = spark.createDataFrame(
        [("https://a.example.org/x", b"payload-bytes")],
        "url string, html binary")
    row = cdx_index(df, url_col="url", payload_col="html").collect()[0]
    import hashlib
    assert row.digest == hashlib.md5(b"payload-bytes").hexdigest()
    assert row.surt_key == "org,example,a)/x"
