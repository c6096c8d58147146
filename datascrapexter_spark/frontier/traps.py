"""Spider-trap / URL-anomaly detection, pure codegen.

Crawler traps — calendar pages that link to the next day forever,
session-id URLs that make every visit look new, self-similar repeating
path segments, parameter explosions — are the classic way a frontier
drowns at scale: a handful of hosts can mint unbounded "new" URLs and
starve the rest of the crawl.  The reference engine relies on its
max-depth/max-pages caps only (internal/scraper/engine.go crawl limits);
at a 10^10-URL frontier that is not enough, because a trap fills the
budget with junk *before* the cap bites.

Every heuristic here is a built-in Spark expression over the URL string
(regex + array ops), so trap scoring is one codegen ``Project`` that can
run inside the frontier's canonicalization pass — no Python, no shuffle,
no second scan.  The same rules are expressible in ANSI/DuckDB SQL,
which is how q52's oracle re-derives them independently.

Flags (each an independent column, composable by config):
- ``repeat_trap``    — >=2 surplus path segments (a/b/a/b self-similarity)
- ``calendar_trap``  — /YYYY/M/D date path nested deeper than 6 segments
- ``session_param``  — session-id query key or 32-hex / UUID value
- ``deep_path``      — more than ``max_depth`` segments
- ``param_blowup``   — more than ``max_params`` query parameters
- ``trap_score``     — weighted integer score; ``is_trap`` at >= 40
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PATH_RE = "^[a-z][a-z0-9+.\\-]*://[^/?#]+(/[^?#]*)?"
QUERY_RE = "\\?([^#]*)"
CALENDAR_RE = "/[0-9]{4}/[0-9]{1,2}/[0-9]{1,2}(/|$)"
# Session-bearing query keys (lowercased) and opaque-token value shapes.
SESSION_KEYS = ("sessionid", "phpsessid", "jsessionid", "sid", "session",
                "sess", "token")
HEX32_RE = "^[0-9a-f]{32}$"
UUID_RE = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"


def _segments(url: Column) -> Column:
    path = F.regexp_extract(url, PATH_RE, 1)
    return F.filter(F.split(path, "/"), lambda s: s != "")


def _params(url: Column) -> Column:
    q = F.regexp_extract(url, QUERY_RE, 1)
    return F.when(q == "", F.array().cast("array<string>")) \
        .otherwise(F.split(q, "&"))


def trap_cols(url: Column, max_depth: int = 12,
              max_params: int = 8) -> dict[str, Column]:
    """All trap signals as named Columns for one-Project composition."""
    segs = _segments(url)
    params = _params(url)
    depth = F.size(segs)
    surplus = depth - F.size(F.array_distinct(segs))
    path = F.regexp_extract(url, PATH_RE, 1)

    def _is_session(p: Column) -> Column:
        key = F.lower(F.regexp_extract(p, "^([^=]*)", 1))
        val = F.lower(F.regexp_extract(p, "=(.*)$", 1))
        return key.isin(*SESSION_KEYS) | val.rlike(HEX32_RE) \
            | val.rlike(UUID_RE)

    repeat_trap = surplus >= 2
    calendar_trap = path.rlike(CALENDAR_RE) & (depth > 6)
    session_param = F.exists(params, _is_session)
    deep_path = depth > max_depth
    param_blowup = F.size(params) > max_params
    score = (repeat_trap.cast("int") * 40
             + calendar_trap.cast("int") * 30
             + session_param.cast("int") * 20
             + deep_path.cast("int") * 20
             + param_blowup.cast("int") * 10)
    return {
        "path_depth": depth,
        "repeat_trap": repeat_trap,
        "calendar_trap": calendar_trap,
        "session_param": session_param,
        "deep_path": deep_path,
        "param_blowup": param_blowup,
        "trap_score": score,
        "is_trap": score >= 40,
    }


def filter_traps(df, url_col: str = "url", threshold: int = 40):
    """Drop trap URLs in place — one codegen Filter, zero extra scans."""
    score = trap_cols(F.col(url_col))["trap_score"]
    return df.filter(score < threshold)


# ---------------------------------------------------------------------------
# Driver-side twin (the security.py pattern): the oracle crawl simulator
# needs the exact same verdicts without a Spark session. Same pattern
# tables, same weights — tests assert Python/codegen parity on fixtures.
# ---------------------------------------------------------------------------
import re as _re

_PATH_RE_PY = _re.compile("^[a-z][a-z0-9+.\\-]*://[^/?#]+(/[^?#]*)?")
_CALENDAR_RE_PY = _re.compile(CALENDAR_RE)
_HEX32_RE_PY = _re.compile(HEX32_RE)
_UUID_RE_PY = _re.compile(UUID_RE)


def trap_score_py(url: str, max_depth: int = 12,
                  max_params: int = 8) -> int:
    """Integer trap score, bit-identical to ``trap_cols``'s trap_score."""
    m = _PATH_RE_PY.match(url)
    path = (m.group(1) or "") if m else ""
    qm = _re.search("\\?([^#]*)", url)
    query = qm.group(1) if qm else ""
    segs = [s for s in path.split("/") if s]
    params = query.split("&") if query else []
    depth = len(segs)
    surplus = depth - len(set(segs))

    def is_session(p: str) -> bool:
        key, _, val = p.partition("=")
        return (key.lower() in SESSION_KEYS
                or bool(_HEX32_RE_PY.match(val.lower()))
                or bool(_UUID_RE_PY.match(val.lower())))

    score = 0
    if surplus >= 2:
        score += 40
    if _CALENDAR_RE_PY.search(path) and depth > 6:
        score += 30
    if any(is_session(p) for p in params):
        score += 20
    if depth > max_depth:
        score += 20
    if len(params) > max_params:
        score += 10
    return score
