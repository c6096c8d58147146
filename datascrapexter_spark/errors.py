"""Error-recovery service: retry, per-operation circuit breakers, and
fallback strategies.

Reference: /root/reference/internal/errors/service.go
  retry defaults + failure policy     :120-137
  ExecuteWithRetry                    :153-182
  ExecuteWithRecovery                 :185-255
  circuit breaker get/configure       :258-295
  executeFallback (none/cached/default/alternative/degrade) :305-339
  result cache                        :341-375
  executeAlternativeOperation         :377-400
  shouldRetry retryable patterns      :403-421
  calculateDelay exponential backoff  :424-430
  GetUserFriendlyError                :433-505

Driver-side by design: this wraps driver operations (a crawl run, a sink
write, a config load) — executor-side failure handling stays Spark's task
retry. Time is injected (clock/sleeper) so recovery behavior is
deterministic under test, the same way the crawl engine renders the
reference's wall-clock rate limiting as a round-wise recurrence.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

# service.go:12-17
DEFAULT_CB_MAX_FAILURES = 5
DEFAULT_CB_RESET_TIMEOUT_S = 60.0

# shouldRetry patterns (service.go:409-414)
RETRYABLE_PATTERNS = (
    "timeout", "connection refused", "no such host",
    "500", "502", "503", "504", "429",
    "temporary", "service unavailable",
)

# FallbackStrategy enum (service.go:78-84)
FALLBACK_NONE = "none"
FALLBACK_CACHED = "cached"
FALLBACK_DEFAULT = "default"
FALLBACK_ALTERNATIVE = "alternative"
FALLBACK_DEGRADE = "degrade"


@dataclass
class RetryConfig:
    # service.go:122-127
    max_retries: int = 3
    base_delay_s: float = 2.0
    backoff_factor: float = 2.0
    max_delay_s: float = 300.0


@dataclass
class FallbackConfig:
    # service.go:87-93
    strategy: str = FALLBACK_NONE
    default_value: Any = None
    alternative: str = ""
    cache_timeout_s: float = 0.0     # 0 = no expiry check
    degraded: Any = None


@dataclass
class RecoveryResult:
    # service.go:109-117
    success: bool = False
    used_fallback: bool = False
    fallback_type: str = ""
    attempt_count: int = 0
    result: Any = None
    original_error: Exception | None = None


class CircuitOpen(RuntimeError):
    pass


@dataclass
class _Breaker:
    # performance.go:426-515 / service.go:58-68, state machine:
    # closed -> open after max_failures -> half-open after reset_timeout
    # -> closed on success / re-open on failure
    name: str
    max_failures: int = DEFAULT_CB_MAX_FAILURES
    reset_timeout_s: float = DEFAULT_CB_RESET_TIMEOUT_S
    failures: int = 0
    state: str = "closed"
    opened_at: float = 0.0

    def can_execute(self, now: float) -> bool:
        if self.state == "open":
            if now - self.opened_at >= self.reset_timeout_s:
                self.state = "half_open"
                return True
            return False
        return True

    def record_success(self) -> None:
        self.failures = 0
        self.state = "closed"

    def record_failure(self, now: float) -> None:
        self.failures += 1
        if self.state == "half_open" or self.failures >= self.max_failures:
            self.state = "open"
            self.opened_at = now


@dataclass
class ErrorRecoveryService:
    retry: RetryConfig = dc_field(default_factory=RetryConfig)
    clock: Callable[[], float] = time.monotonic
    sleeper: Callable[[float], None] = time.sleep
    _breakers: dict[str, _Breaker] = dc_field(default_factory=dict)
    _fallbacks: dict[str, FallbackConfig] = dc_field(default_factory=dict)
    _cache: dict[str, tuple[Any, float]] = dc_field(default_factory=dict)

    # -- configuration ---------------------------------------------------

    def configure_circuit_breaker(self, operation: str, max_failures: int,
                                  reset_timeout_s: float) -> None:
        self._breakers[operation] = _Breaker(
            operation, max_failures, reset_timeout_s)

    def configure_fallback(self, operation: str, cfg: FallbackConfig) -> None:
        self._fallbacks[operation] = cfg

    def _breaker(self, operation: str) -> _Breaker:
        if operation not in self._breakers:
            self._breakers[operation] = _Breaker(operation)
        return self._breakers[operation]

    # -- retry core ------------------------------------------------------

    def should_retry(self, err: Exception, attempt: int) -> bool:
        """service.go:403-421: only recognized transient errors retry."""
        if attempt >= self.retry.max_retries:
            return False
        msg = str(err).lower()
        return any(p in msg for p in RETRYABLE_PATTERNS)

    def calculate_delay_s(self, attempt: int) -> float:
        """service.go:424-430: base * factor^attempt, capped."""
        return min(
            self.retry.base_delay_s * self.retry.backoff_factor ** attempt,
            self.retry.max_delay_s)

    def execute_with_retry(self, operation: Callable[[], Any],
                           operation_name: str) -> Any:
        """ExecuteWithRetry (service.go:153-182): the wrapper around whole
        driver operations (the reference wraps runScraper in it,
        cmd/datascrapexter/main.go:28-44)."""
        last: Exception | None = None
        for attempt in range(self.retry.max_retries + 1):
            try:
                return operation()
            except Exception as e:  # noqa: BLE001 — mirrors error-value Go
                last = e
                if not self.should_retry(e, attempt):
                    break
                self.sleeper(self.calculate_delay_s(attempt))
        raise RuntimeError(
            f"operation {operation_name} failed after "
            f"{self.retry.max_retries + 1} attempts: {last}") from last

    # -- full recovery ---------------------------------------------------

    def execute_with_recovery(self, operation_name: str,
                              operation: Callable[[], Any]) -> RecoveryResult:
        """ExecuteWithRecovery (service.go:185-255): breaker gate -> retry
        loop -> fallback on exhaustion; successes feed the fallback cache."""
        res = RecoveryResult()
        breaker = self._breaker(operation_name)
        if not breaker.can_execute(self.clock()):
            res.original_error = CircuitOpen(
                f"circuit breaker is open for operation: {operation_name}")
            fb = self._run_fallback(operation_name)
            if fb is not None:
                res.success = True
                res.used_fallback = True
                res.fallback_type = "circuit_breaker_fallback"
                res.result = fb[0]
            return res

        last: Exception | None = None
        for attempt in range(self.retry.max_retries + 1):
            res.attempt_count += 1
            try:
                data = operation()
            except Exception as e:  # noqa: BLE001
                last = e
                breaker.record_failure(self.clock())
                if not self.should_retry(e, attempt):
                    break
                self.sleeper(self.calculate_delay_s(attempt))
                continue
            breaker.record_success()
            res.success = True
            res.result = data
            self._cache[operation_name] = (data, self.clock())
            return res

        res.original_error = last
        fb = self._run_fallback(operation_name)
        if fb is not None:
            res.success = True
            res.used_fallback = True
            res.fallback_type = "retry_exhausted_fallback"
            res.result = fb[0]
        return res

    # -- fallback strategies --------------------------------------------

    def _run_fallback(self, operation_name: str) -> tuple[Any] | None:
        """executeFallback (service.go:305-339). Returns (value,) or None
        (a 1-tuple so a legitimate None/False fallback value still counts
        as recovered)."""
        cfg = self._fallbacks.get(operation_name,
                                  FallbackConfig(strategy=FALLBACK_NONE))
        if cfg.strategy == FALLBACK_CACHED:
            return self._cached(operation_name, cfg.cache_timeout_s)
        if cfg.strategy == FALLBACK_DEFAULT:
            if cfg.default_value is not None:
                return (cfg.default_value,)
            return None
        if cfg.strategy == FALLBACK_ALTERNATIVE:
            if cfg.alternative:
                return (self._alternative(operation_name, cfg.alternative),)
            return None
        if cfg.strategy == FALLBACK_DEGRADE:
            if cfg.degraded is not None:
                return (cfg.degraded,)
            return ({"degraded": True, "operation": operation_name},)
        return None

    def _cached(self, operation_name: str,
                max_age_s: float) -> tuple[Any] | None:
        got = self._cache.get(operation_name)
        if got is None:
            return None
        data, ts = got
        if max_age_s > 0 and self.clock() - ts > max_age_s:
            return None
        return (data,)

    def _alternative(self, operation_name: str, alternative: str) -> dict:
        """executeAlternativeOperation (service.go:377-400): the framework
        envelopes, verbatim."""
        if alternative == "mobile_version":
            return {"source": "mobile_fallback",
                    "message": "Using mobile version as fallback",
                    "operation": operation_name}
        if alternative == "api_fallback":
            return {"source": "api_fallback",
                    "message": "Using API as fallback to HTML scraping",
                    "operation": operation_name}
        if alternative == "cached_alternative":
            got = self._cached(f"{alternative}_{operation_name}", 3600.0)
            return got[0] if got is not None else None
        return {"source": "generic_alternative", "alternative": alternative,
                "operation": operation_name,
                "message": "Alternative strategy executed"}


def user_friendly_error(err: Exception | None
                        ) -> tuple[str, str, list[str]]:
    """GetUserFriendlyError (service.go:433-505): (title, message,
    suggestions)."""
    if err is None:
        return "", "", []
    msg = str(err).lower()
    if "timeout" in msg:
        return ("Connection Timeout",
                "The request timed out while trying to connect to the "
                "website.",
                ["Check your internet connection",
                 "Increase timeout value in configuration",
                 "The website might be slow or experiencing issues"])
    if "no such host" in msg:
        return ("Domain Not Found", "Could not find the website domain.",
                ["Check if the URL is spelled correctly",
                 "Verify the domain exists by opening it in a browser",
                 "Check your DNS settings"])
    if "connection refused" in msg:
        return ("Connection Refused",
                "The website server refused the connection.",
                ["Check if the website is accessible in a browser",
                 "The server might be temporarily down",
                 "Try using a proxy server"])
    if "selector" in msg:
        return ("Element Not Found",
                "Could not find the specified element on the webpage.",
                ["Check if the CSS selector is correct",
                 "Verify the element exists on the page",
                 "The website structure might have changed"])
    if "yaml" in msg:
        return ("Configuration Error",
                "The configuration file has invalid YAML syntax.",
                ["Check YAML indentation (use spaces, not tabs)",
                 "Ensure proper quoting of string values",
                 "Use a YAML validator online to check syntax"])
    if "429" in msg or "rate limit" in msg:
        return ("Rate Limit Exceeded", "You're making requests too quickly.",
                ["Reduce the scraping speed/frequency",
                 "Add longer delays between requests",
                 "Use a different IP address or proxy"])
    return ("Unexpected Error",
            "An unexpected error occurred during the operation.",
            ["Try running the command again",
             "Check your configuration file",
             "Verify your internet connection"])
