"""JVM-side host/registered-domain columns must agree with the Python
parity functions on canonical URLs (the fast path used by the bench and
available to the engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datascrapexter_spark.functions.urlnorm import (
    extract_domain,
    host_col,
    normalize_url,
    registered_domain,
    registered_domain_col,
)

RAW_URLS = [
    "https://WWW.Shop5.Example.COM:443/orders/1/?b=2&a=1#f",
    "http://Site0.example.co.uk:80/page/0",
    "https://user:pw@Host.Example.com/path",
    "https://shop9.example.co.uk/x?utm_source=a",
    "https://single-label/path",
    "https://a.b.c.d.example.com/deep",
    "https://xn--bcher-kva.example/umlaut",
    "https://h0.ex0.com/d/0",
]


def test_native_host_and_domain_match_python(spark):
    canon = [normalize_url(u) for u in RAW_URLS]
    df = spark.createDataFrame([(c,) for c in canon], "url_canon string")
    got = df.select(
        "url_canon",
        host_col("url_canon").alias("h"),
        registered_domain_col(host_col("url_canon")).alias("d"),
    ).collect()
    for row in got:
        expect_h = extract_domain(row["url_canon"])
        expect_d = registered_domain(expect_h)
        assert row["h"] == expect_h, row["url_canon"]
        assert row["d"] == expect_d, row["url_canon"]
