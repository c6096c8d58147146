"""Seeded anti-detection columns: user-agent rotation, header profiles,
delay randomization.

The data-plane-modelable parts of the reference's antidetect module —
UserAgentRotator (/root/reference/internal/antidetect/antidetect.go:
25-55), HeaderRotator (:131-158), DelayRandomizer (:159-184) — rendered
as deterministic per-request Spark columns. The reference rotates with
process-global RNG + a mutex'd index, which is meaningless across 1000
executors; the cluster-correct rendering keys every choice on
(url_hash, round, seed) via xxhash64:

  - reproducible across retries and crash-resume (same request -> same
    browser identity — which is also what an anti-detection profile
    wants: one stable identity per page visit, not a flicker);
  - uniform over the pool (xxhash64 avalanche), matching the rotator's
    long-run distribution without any shared counter;
  - zero state, pure codegen — no Python, no shuffle.

The pools are the reference's defaults verbatim (antidetect.go:461-492)
— a config-table parity surface like the transform rules. Fingerprint /
TLS / captcha solving (fingerprint.go, tls.go, captcha.go) stay out of
scope: they modulate live HTTP exchanges this sandbox cannot make.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# antidetect.go:461-469 getDefaultUserAgents
DEFAULT_USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) "
    "Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
]

# antidetect.go:471-478 getRandomAccept
ACCEPT_VALUES = [
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/avif,"
    "image/webp,*/*;q=0.8",
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/webp,"
    "image/apng,*/*;q=0.8",
    "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
]

# antidetect.go:480-489 getRandomAcceptLanguage
ACCEPT_LANGUAGE_VALUES = [
    "en-US,en;q=0.9",
    "en-GB,en;q=0.9",
    "en-US,en;q=0.9,fr;q=0.8",
    "en-US,en;q=0.9,es;q=0.8",
    "en-US,en;q=0.9,de;q=0.8",
]

# GetHeaders' fixed headers (antidetect.go:144-147)
STATIC_HEADERS = {
    "accept_encoding": "gzip, deflate, br",
    "dnt": "1",
    "connection": "keep-alive",
    "upgrade_insecure_requests": "1",
}


def _pick_col(pool: list[str], *key_cols, seed: int = 0,
              salt: str = "") -> Column:
    """Uniform deterministic pick from a small pool:
    pool[xxhash64(keys, salt, seed) mod len]. element_at is 1-based."""
    idx = F.pmod(F.xxhash64(*key_cols, F.lit(salt), F.lit(seed)),
                 F.lit(len(pool))).cast("int")
    return F.element_at(F.array(*[F.lit(v) for v in pool]), idx + 1)


def user_agent_col(url_hash, round_col, agents: list[str] | None = None,
                   seed: int = 0) -> Column:
    """Per-request user agent (UserAgentRotator.GetRandom, seeded)."""
    return _pick_col(agents or DEFAULT_USER_AGENTS,
                     url_hash, round_col, seed=seed, salt="ua")


def accept_col(url_hash, round_col, seed: int = 0) -> Column:
    return _pick_col(ACCEPT_VALUES, url_hash, round_col,
                     seed=seed, salt="accept")


def accept_language_col(url_hash, round_col, seed: int = 0) -> Column:
    return _pick_col(ACCEPT_LANGUAGE_VALUES, url_hash, round_col,
                     seed=seed, salt="lang")


def header_profile_col(url_hash, round_col,
                       agents: list[str] | None = None,
                       seed: int = 0) -> Column:
    """The full HeaderRotator.GetHeaders profile (antidetect.go:138-150)
    as one struct column — rotated fields seeded per request, fixed
    fields constant."""
    return F.struct(
        user_agent_col(url_hash, round_col, agents, seed).alias("user_agent"),
        accept_col(url_hash, round_col, seed).alias("accept"),
        accept_language_col(url_hash, round_col, seed).alias(
            "accept_language"),
        *[F.lit(v).alias(k) for k, v in STATIC_HEADERS.items()],
    )


def delay_ms_col(url_hash, round_col, min_ms: int, max_ms: int,
                 seed: int = 0) -> Column:
    """DelayRandomizer.GetDelay (antidetect.go:163-167): a delay in
    [min_ms, max_ms) — `min + hash mod (max-min)`, the deterministic twin
    of `min + rand.Int63n(diff)`. The crawl consumes it as a politeness
    jitter label; in a live fetcher it spaces requests inside a round."""
    if max_ms <= min_ms:
        raise ValueError(f"need max_ms > min_ms, got [{min_ms}, {max_ms})")
    diff = max_ms - min_ms
    return (F.lit(min_ms)
            + F.pmod(F.xxhash64(url_hash, round_col, F.lit("delay"),
                                F.lit(seed)),
                     F.lit(diff))).cast("long")
