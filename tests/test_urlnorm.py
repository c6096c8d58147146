"""URL canonicalization goldens.

Cases derive from the doc examples and semantics of
/root/reference/internal/utils/utils.go:250-331 (NormalizeURL,
cleanQueryParams, ExtractDomain, ResolveURL, IsValidURL).
"""

import pytest

from datascrapexter_spark.functions.urlnorm import (
    extract_domain,
    is_valid_url,
    normalize_url,
    registered_domain,
    resolve_url,
)

NORMALIZE_CASES = [
    # utils.go:250-255 doc example
    ("HTTPS://Example.com:443/path/?b=2&a=1&utm_source=test",
     "https://example.com/path?a=1&b=2"),
    ("https://example.com/path?a=1&b=2", "https://example.com/path?a=1&b=2"),
    # default port stripping
    ("http://Example.COM:80/x", "http://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # trailing slash: stripped unless path is exactly "/"
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com/", "https://example.com/"),
    # fragment dropped
    ("https://example.com/page#section", "https://example.com/page"),
    # tracking params dropped (case-insensitive), others sorted
    ("https://e.com/p?fbclid=x&z=1&A=2&gclid=y&ref=r&source=s",
     "https://e.com/p?A=2&z=1"),
    ("https://e.com/p?UTM_Source=x&q=1", "https://e.com/p?q=1"),
    # all params tracking -> no query at all
    ("https://e.com/p?utm_medium=m", "https://e.com/p"),
    # multi-value params keep order within key, keys sorted
    ("https://e.com/p?b=2&a=1&b=1", "https://e.com/p?a=1&b=2&b=1"),
    # query encoding: space -> '+', Go QueryEscape safe set
    ("https://e.com/p?q=a b", "https://e.com/p?q=a+b"),
]


@pytest.mark.parametrize("raw,expected", NORMALIZE_CASES)
def test_normalize_url(raw, expected):
    assert normalize_url(raw) == expected


def test_normalize_idempotent():
    for raw, _ in NORMALIZE_CASES:
        once = normalize_url(raw)
        assert normalize_url(once) == once


EXTRACT_DOMAIN_CASES = [
    ("https://example.com:8080/path", "example.com"),  # utils.go doc example
    ("https://Sub.Example.COM/x", "sub.example.com"),
    ("not a url", ""),
]


@pytest.mark.parametrize("raw,expected", EXTRACT_DOMAIN_CASES)
def test_extract_domain(raw, expected):
    assert extract_domain(raw) == expected


def test_resolve_url():
    # utils.go:176-200 doc example
    assert resolve_url("https://example.com/page", "../other") == \
        "https://example.com/other"
    assert resolve_url("https://example.com/a/", "b") == "https://example.com/a/b"
    assert resolve_url("https://example.com/a", "#frag") == \
        "https://example.com/a#frag"
    assert resolve_url("", "x") == "x"
    assert resolve_url("https://e.com", "") == "https://e.com"
    assert resolve_url("https://e.com/x", "//cdn.e.com/y") == "https://cdn.e.com/y"


def test_is_valid_url():
    assert is_valid_url("https://example.com")
    assert is_valid_url("http://example.com/p?q=1")
    assert not is_valid_url("not a url")
    assert not is_valid_url("ftp://example.com")
    assert not is_valid_url("")
    assert not is_valid_url("https://")


def test_registered_domain():
    assert registered_domain("www.example.com") == "example.com"
    assert registered_domain("a.b.example.co.uk") == "example.co.uk"
    assert registered_domain("example.com") == "example.com"
    assert registered_domain("localhost") == "localhost"


def test_fast_split_matches_urlsplit_reference():
    """The r06 regex fast path in _normalize_split must be bit-identical
    to the urlsplit-based reference on adversarial inputs (IPv6 brackets,
    userinfo, control chars, empty components, junk) — any shape the
    regex cannot represent exactly must FALL BACK, never approximate."""
    import random
    import string
    from urllib.parse import urlsplit

    from datascrapexter_spark.functions import urlnorm

    def ref_split(raw):
        try:
            u = urlsplit(raw)
        except ValueError:
            return raw, None
        netloc = u.netloc.lower()
        return urlnorm._normalize_parts(
            u.scheme.lower(), netloc, u.path, u.query), netloc

    rng = random.Random(7)
    chars = (string.ascii_letters + string.digits
             + ":/?#[]@!$&'()*+,;=%.-_~ \t\n\\^`{}|<>\"")
    cases = []
    for i in range(4000):
        cases.append("".join(rng.choice(chars)
                             for _ in range(rng.randrange(0, 60))))
        host = rng.choice(["WWW.Ex.COM", "ex.com:443", "ex.com:80",
                           "[::1]:8080", "user:pw@Ex.com", "ex.com.",
                           "[bad", "x[y].com", ""])
        path = rng.choice(["a/b/", "a//b", "%7Euser", "a b", ""])
        q = rng.choice(["a=1&b=2", "utm_source=x&a=1", "a=%20&A=+",
                        "ref=5", "x", "=v", "a=1&a=0", ""])
        scheme = rng.choice(["http", "HTTPS", "https", "ftp", "HtTp"])
        cases.append(f"{scheme}://{host}/{path}?{q}#frag{i % 7}")
    for c in cases:
        assert urlnorm._normalize_split(c) == ref_split(c), repr(c)


def test_spark_udf_parity(spark):
    """Arrow-batched UDFs must agree with the pure functions."""
    from pyspark.sql import functions as F

    from datascrapexter_spark.functions.urlnorm import (
        extract_domain_udf,
        normalize_url_udf,
    )

    raws = [c[0] for c in NORMALIZE_CASES]
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    rows = df.select(
        normalize_url_udf("url").alias("canon"),
        extract_domain_udf("url").alias("dom"),
    ).collect()
    for raw, row in zip(raws, rows):
        assert row["canon"] == normalize_url(raw)
        assert row["dom"] == extract_domain(raw)
