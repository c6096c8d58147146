"""Error-recovery service: table-driven scenarios mirroring
/root/reference/internal/errors/service_test.go (retry success, fallback
on exhaustion, cached fallback, breaker open/recover, all strategies,
retryable patterns, backoff curve, user-friendly messages). Pure driver
logic — no SparkSession needed."""

from __future__ import annotations

import pytest

from datascrapexter_spark.errors import (
    FALLBACK_ALTERNATIVE,
    FALLBACK_CACHED,
    FALLBACK_DEFAULT,
    FALLBACK_DEGRADE,
    ErrorRecoveryService,
    FallbackConfig,
    RetryConfig,
    user_friendly_error,
)


class FakeTime:
    def __init__(self):
        self.now = 0.0
        self.slept: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        self.slept.append(s)
        self.now += s


def make_service(**retry_kw) -> tuple[ErrorRecoveryService, FakeTime]:
    ft = FakeTime()
    svc = ErrorRecoveryService(retry=RetryConfig(**retry_kw),
                               clock=ft.clock, sleeper=ft.sleep)
    return svc, ft


def test_recovery_success_first_try():
    # TestService_ExecuteWithRecovery_Success
    svc, _ = make_service()
    res = svc.execute_with_recovery("op", lambda: "ok")
    assert res.success and res.result == "ok"
    assert res.attempt_count == 1 and not res.used_fallback


def test_recovery_retry_then_success():
    # TestService_ExecuteWithRecovery_RetrySuccess: transient error twice,
    # then success; non-retryable errors do NOT retry
    svc, ft = make_service(base_delay_s=1.0, backoff_factor=2.0)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("connection refused")
        return 42

    res = svc.execute_with_recovery("op", flaky)
    assert res.success and res.result == 42 and res.attempt_count == 3
    assert ft.slept == [1.0, 2.0]  # exponential backoff between attempts

    def fatal():
        raise RuntimeError("invalid selector syntax")

    res2 = svc.execute_with_recovery("op2", fatal)
    assert not res2.success and res2.attempt_count == 1


def test_recovery_fallback_on_exhaustion():
    # TestService_ExecuteWithRecovery_FallbackUsed
    svc, _ = make_service(max_retries=1, base_delay_s=0.0)
    svc.configure_fallback("op", FallbackConfig(
        strategy=FALLBACK_DEFAULT, default_value={"d": 1}))

    def always_timeout():
        raise RuntimeError("timeout")

    res = svc.execute_with_recovery("op", always_timeout)
    assert res.success and res.used_fallback
    assert res.fallback_type == "retry_exhausted_fallback"
    assert res.result == {"d": 1}
    assert isinstance(res.original_error, RuntimeError)


def test_recovery_cached_fallback_and_expiry():
    # TestService_ExecuteWithRecovery_CachedFallback + cache management:
    # a success primes the cache; later failures serve it until expiry
    svc, ft = make_service(max_retries=0)
    svc.configure_fallback("op", FallbackConfig(
        strategy=FALLBACK_CACHED, cache_timeout_s=100.0))
    assert svc.execute_with_recovery("op", lambda: "fresh").success

    def boom():
        raise RuntimeError("503 service unavailable")

    res = svc.execute_with_recovery("op", boom)
    assert res.success and res.used_fallback and res.result == "fresh"

    ft.now += 1000.0  # cache expired
    res2 = svc.execute_with_recovery("op", boom)
    assert not res2.success


def test_circuit_breaker_open_halfopen_close():
    # TestCircuitBreaker_BasicOperation + _Recovery
    svc, ft = make_service(max_retries=0)
    svc.configure_circuit_breaker("op", max_failures=2, reset_timeout_s=60.0)

    def boom():
        raise RuntimeError("timeout")

    svc.execute_with_recovery("op", boom)
    svc.execute_with_recovery("op", boom)   # 2 failures -> open
    res = svc.execute_with_recovery("op", boom)
    assert not res.success and res.attempt_count == 0  # gated, not executed
    assert "circuit breaker is open" in str(res.original_error)

    ft.now += 61.0  # reset timeout -> half-open probe allowed
    res2 = svc.execute_with_recovery("op", lambda: "recovered")
    assert res2.success and res2.result == "recovered"
    # breaker closed again: next failure doesn't trip immediately
    res3 = svc.execute_with_recovery("op", boom)
    assert res3.attempt_count == 1


def test_breaker_open_uses_fallback():
    svc, _ = make_service(max_retries=0)
    svc.configure_circuit_breaker("op", max_failures=1, reset_timeout_s=60.0)
    svc.configure_fallback("op", FallbackConfig(
        strategy=FALLBACK_DEGRADE))

    def boom():
        raise RuntimeError("timeout")

    svc.execute_with_recovery("op", boom)  # opens
    res = svc.execute_with_recovery("op", boom)
    assert res.success and res.fallback_type == "circuit_breaker_fallback"
    assert res.result == {"degraded": True, "operation": "op"}


@pytest.mark.parametrize("cfg,expected", [
    # TestService_ConfigureFallback_AllStrategies
    (FallbackConfig(strategy=FALLBACK_DEFAULT, default_value="dv"), "dv"),
    (FallbackConfig(strategy=FALLBACK_DEGRADE, degraded={"lite": True}),
     {"lite": True}),
    (FallbackConfig(strategy=FALLBACK_ALTERNATIVE,
                    alternative="mobile_version"),
     {"source": "mobile_fallback",
      "message": "Using mobile version as fallback", "operation": "op"}),
    (FallbackConfig(strategy=FALLBACK_ALTERNATIVE,
                    alternative="api_fallback"),
     {"source": "api_fallback",
      "message": "Using API as fallback to HTML scraping",
      "operation": "op"}),
    (FallbackConfig(strategy=FALLBACK_ALTERNATIVE, alternative="other"),
     {"source": "generic_alternative", "alternative": "other",
      "operation": "op", "message": "Alternative strategy executed"}),
])
def test_fallback_strategies_table(cfg, expected):
    svc, _ = make_service(max_retries=0)
    svc.configure_fallback("op", cfg)

    def boom():
        raise RuntimeError("timeout")

    res = svc.execute_with_recovery("op", boom)
    assert res.success and res.used_fallback and res.result == expected


@pytest.mark.parametrize("msg,retryable", [
    # TestService_RetryableErrorPatterns (service.go:409-414 list)
    ("request timeout", True),
    ("connection refused", True),
    ("no such host", True),
    ("HTTP 503 service unavailable", True),
    ("HTTP 429 too many requests", True),
    ("temporary failure in name resolution", True),
    ("invalid yaml", False),
    ("selector not found", False),
    ("permission denied", False),
])
def test_retryable_patterns(msg, retryable):
    svc, _ = make_service()
    assert svc.should_retry(RuntimeError(msg), 0) is retryable
    # attempt cap always wins
    assert svc.should_retry(RuntimeError(msg), 99) is False


def test_backoff_curve_and_cap():
    svc, _ = make_service(base_delay_s=2.0, backoff_factor=2.0,
                          max_delay_s=300.0)
    assert [svc.calculate_delay_s(a) for a in range(4)] == \
        [2.0, 4.0, 8.0, 16.0]
    assert svc.calculate_delay_s(20) == 300.0  # capped


def test_execute_with_retry_raises_wrapped():
    svc, ft = make_service(max_retries=2, base_delay_s=1.0)
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        svc.execute_with_retry(
            lambda: (_ for _ in ()).throw(RuntimeError("timeout")), "op")
    assert ft.slept == [1.0, 2.0]


@pytest.mark.parametrize("msg,title", [
    ("dial tcp: timeout", "Connection Timeout"),
    ("no such host", "Domain Not Found"),
    ("connection refused", "Connection Refused"),
    ("bad selector .x", "Element Not Found"),
    ("yaml: line 3", "Configuration Error"),
    ("got 429", "Rate Limit Exceeded"),
    ("wat", "Unexpected Error"),
])
def test_user_friendly_messages(msg, title):
    t, m, sugg = user_friendly_error(RuntimeError(msg))
    assert t == title and m and len(sugg) == 3
    assert user_friendly_error(None) == ("", "", [])
