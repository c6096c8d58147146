"""PII detection + redaction for training-data text.

The standard scrub pass before corpus release: find emails, IPv4
addresses, and international phone numbers and replace them with typed
placeholder tokens (the common convention — keep a token so the language
model sees "something was here" without the value). The inverse of the
extraction engine's email/phone FIELD types (extract/fields.py), built
from the same pattern family.

All pure codegen (`regexp_replace` / `regexp_extract_all` chains) — no
Python, no shuffle; at 100 TB this runs inside the scan stage. Patterns
deliberately use only syntax shared by Java regex (Spark) and RE2
(DuckDB) — no backrefs, no lookaround — so the oracle replays them
verbatim; that also keeps them linear-time on adversarial text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: emails first (an email would otherwise leave its domain
# after a phone-ish digit run is cut), then IPs, then phones
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # international form only (+ then 7-15 digits, optional separators):
    # bare national digit runs collide with ids/quantities far too often
    ("phone", r"\+\d(?:[ -]?\d){6,14}\b", "<PHONE>"),
)


def pii_count_cols(text: Column | str) -> dict[str, Column]:
    """n_<kind> match counts per row (regexp_extract_all size)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def scrub_col(text: Column | str) -> Column:
    """Text with every PII match replaced by its typed placeholder,
    applied in PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c
