"""Security validation (internal/security/security.go parity): driver
port semantics, sanitization, secure-context table, and driver↔Spark
twin parity of the URL risk score."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.functions.security import (
    SecurityConfig,
    SecurityValidator,
    is_secure_context,
    sanitize_input,
    url_risk_score_col,
)


@pytest.fixture(scope="module")
def validator():
    return SecurityValidator()


@pytest.mark.parametrize("url,types,min_score", [
    ("https://shop.example.com/items", [], 0),
    ("http://shop.example.com/items", [], 10),          # http warning +10
    ("ftp://shop.example.com/a", ["disallowed_scheme"], 30),
    ("https://localhost/x", ["localhost_access"], 15),
    ("https://x.example.com/admin/panel", ["sensitive_path"], 15),
    ("https://x.example.com/?q=union+select", ["sql_keywords"], 30),
    ("https://hidden.onion", ["tor_hidden_service"], 30),
    ("https://x.example.com/" + "a" * 2100, ["url_length_exceeded"], 15),
])
def test_validate_url_table(validator, url, types, min_score):
    res = validator.validate_url(url)
    assert sorted(i.type for i in res.issues) == sorted(types)
    assert res.risk_score >= min_score
    assert res.valid is (not types)


def test_blocked_domains():
    v = SecurityValidator(SecurityConfig(blocked_domains=("bad.com",)))
    res = v.validate_url("https://sub.bad.com/x")
    assert any(i.type == "blocked_domain" and i.severity == "critical"
               for i in res.issues)
    assert v.validate_url("https://notbad.com/x").valid


@pytest.mark.parametrize("value,families", [
    ("hello world", []),
    ("1 = 1; drop table users", ["sql_injection_risk"]),
    ("<script>alert('x')</script>", ["xss_risk"]),
    ("a | nc evil 99", ["command_injection_risk"]),
    ("../../etc/passwd", ["path_traversal_risk"]),
])
def test_validate_input_table(validator, value, families):
    res = validator.validate_input(value, "f")
    assert sorted(i.type for i in res.issues) == sorted(families)


def test_sanitize_and_secure_context():
    assert sanitize_input("a\x00b\x07c\td\n") == "abc\td\n"
    assert is_secure_context("https", "anything.com")
    assert is_secure_context("http", "localhost")
    assert not is_secure_context("http", "site.com")
    assert not is_secure_context("ftp", "localhost")


def test_risk_score_spark_twin_parity(spark, validator):
    """The codegen url_risk_score_col matches the driver port's
    risk_score for parseable URLs (the same pattern tables feed both)."""
    urls = [
        "https://shop.example.com/items",
        "http://shop.example.com/items",
        "ftp://x.example.com/a",
        "https://localhost/x",
        "https://x.example.com/admin/panel?q=union+select",
        "http://localhost/config",
        "https://hidden.onion",
        "https://x.example.com/" + "a" * 2100,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["score"]
           for r in df.select("url",
                              url_risk_score_col("url").alias("score"))
           .collect()}
    for u in urls:
        assert got[u] == validator.validate_url(u).risk_score, u
