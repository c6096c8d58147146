"""Health/alert semantics vs the reference (monitoring.py).

Table-driven mirrors of health.go GetHealth/GetReadiness/GetLiveness
status aggregation (health.go:264-366) and dashboard.go's default alert
rules + cooldowns (dashboard.go:961-984), evaluated over synthetic
metrics tables — the data-plane rendering of the reference's HTTP
monitoring sidecar."""

import pytest

from datascrapexter_spark.monitoring import (
    DEGRADED,
    HEALTHY,
    UNHEALTHY,
    UNKNOWN,
    AlertManager,
    CheckResult,
    HealthCheck,
    HealthManager,
    crawl_health_report,
    dashboard_summary,
    default_alert_rules,
    memory_check,
)


def _static_check(name, status, critical=False):
    return HealthCheck(name, lambda: CheckResult(status), critical=critical)


# health.go:283-321 — (check statuses+criticality) -> overall
AGGREGATION_CASES = [
    ([(HEALTHY, False)], HEALTHY),
    ([(HEALTHY, False), (HEALTHY, True)], HEALTHY),
    ([(DEGRADED, False)], DEGRADED),
    ([(UNKNOWN, False)], DEGRADED),
    ([(UNHEALTHY, False)], DEGRADED),          # non-critical unhealthy
    ([(UNHEALTHY, True)], UNHEALTHY),          # critical unhealthy
    ([(HEALTHY, False), (UNHEALTHY, False), (DEGRADED, False)], DEGRADED),
    ([(DEGRADED, False), (UNHEALTHY, True)], UNHEALTHY),
]


@pytest.mark.parametrize("statuses,expected", AGGREGATION_CASES)
def test_get_health_aggregation(statuses, expected):
    mgr = HealthManager()
    for i, (status, critical) in enumerate(statuses):
        mgr.register(_static_check(f"c{i}", status, critical))
    mgr.run_checks()
    assert mgr.get_health().status == expected


def test_readiness_and_liveness_semantics():
    # degraded is READY (health.go:331-343) and LIVE
    mgr = HealthManager()
    mgr.register(_static_check("a", DEGRADED))
    mgr.run_checks()
    assert mgr.get_readiness().status == HEALTHY
    assert mgr.get_liveness().status == HEALTHY

    # non-critical unhealthy only DEGRADES overall health (health.go:
    # 289-295), and readiness follows overall status — so still ready
    # and live; only a critical failure flips either probe
    mgr2 = HealthManager()
    mgr2.register(_static_check("a", UNHEALTHY, critical=False))
    mgr2.run_checks()
    assert mgr2.get_health().status == DEGRADED
    assert mgr2.get_readiness().status == HEALTHY
    assert mgr2.get_liveness().status == HEALTHY

    # critical unhealthy: not ready AND not live
    mgr3 = HealthManager()
    mgr3.register(_static_check("a", UNHEALTHY, critical=True))
    mgr3.run_checks()
    assert mgr3.get_readiness().status == UNHEALTHY
    assert mgr3.get_liveness().status == UNHEALTHY


def test_disabled_checks_are_skipped():
    mgr = HealthManager()
    bad = _static_check("bad", UNHEALTHY, critical=True)
    bad.enabled = False
    mgr.register(bad)
    mgr.register(_static_check("ok", HEALTHY))
    mgr.run_checks()
    health = mgr.get_health()
    assert health.status == HEALTHY
    assert health.summary["total"] == 1


def test_crashing_check_is_unhealthy():
    def boom():
        raise RuntimeError("db down")

    mgr = HealthManager()
    mgr.register(HealthCheck("db", boom, critical=True))
    mgr.run_checks()
    assert mgr.get_health().status == UNHEALTHY
    assert "db down" in mgr.checks["db"].message


def test_alert_rules_fire_and_cooldown():
    mgr = AlertManager(default_alert_rules())
    # round 1: 40% errors -> High Error Rate fires
    fired = mgr.evaluate_round(
        {"round": 1, "scheduled": 10, "fetched": 6, "error_rate": 0.4})
    assert [a.rule for a in fired] == ["High Error Rate"]
    assert fired[0].level == "warning"
    # round 2, still erroring: inside the 5-round cooldown -> silent
    assert mgr.evaluate_round(
        {"round": 2, "scheduled": 10, "fetched": 6, "error_rate": 0.4}) == []
    # round 7: cooldown expired -> fires again; total fetch failure also
    # trips Job Failure (error level)
    fired7 = mgr.evaluate_round(
        {"round": 7, "scheduled": 10, "fetched": 0, "error_rate": 1.0})
    assert {a.rule for a in fired7} == {"High Error Rate", "Job Failure"}
    assert len(mgr.get_active_alerts()) == 3


def test_memory_check_threshold_injectable():
    ok = memory_check(80.0, reader=lambda: (40, 100))
    assert ok.check_fn().status == HEALTHY
    hot = memory_check(80.0, reader=lambda: (90, 100))
    res = hot.check_fn()
    assert res.status == DEGRADED and "High memory" in res.message
    unknown = memory_check(80.0, reader=lambda: (90, 0))
    assert unknown.check_fn().status == UNKNOWN


ROUND_COLS = ("round int, scheduled long, fetched long, new_urls long, "
              "pending long, wall_ms long")


def test_crawl_health_report_end_to_end(spark):
    rounds = spark.createDataFrame(
        [(1, 10, 10, 5, 5, 100),    # clean
         (2, 10, 8, 2, 3, 100),     # 20% errors -> degraded + alert
         (3, 6, 5, 1, 0, 100)],     # recovers to 16.7% -> still degraded
        ROUND_COLS)
    reqs = spark.createDataFrame(
        [(1, "h.ex", "fetched", 10), (2, "h.ex", "fetched", 8),
         (2, "h.ex", "miss", 2), (3, "h.ex", "fetched", 5),
         (3, "h.ex", "miss", 1)],
        "round int, host string, status string, n long")
    report = crawl_health_report(rounds, reqs)
    assert report["health"]["status"] == DEGRADED
    checks = report["health"]["checks"]
    assert checks["crawl_error_rate"]["status"] == DEGRADED
    assert checks["frontier_progress"]["status"] == HEALTHY
    assert report["readiness"] == HEALTHY and report["liveness"] == HEALTHY
    # alert replay: error rate crossed 10% at round 2, round 3 within
    # cooldown -> exactly one High Error Rate alert
    assert [a["rule"] for a in report["alerts"]] == ["High Error Rate"]
    assert report["summary"] == {
        "total_requests": 26, "successful_pages": 23, "failed_pages": 3,
        "rounds": 3, "requests_by_status": {"fetched": 23, "miss": 3}}


def test_stuck_crawl_is_unhealthy_and_not_live(spark):
    rounds = spark.createDataFrame([(1, 10, 0, 0, 10, 100)], ROUND_COLS)
    report = crawl_health_report(rounds)
    assert report["health"]["status"] == UNHEALTHY   # critical check fails
    assert report["liveness"] == UNHEALTHY
    assert {a["rule"] for a in report["alerts"]} == {
        "High Error Rate", "Job Failure"}


def test_empty_tables_report_unknown(spark):
    report = crawl_health_report(None)
    assert report["health"]["checks"]["crawl_error_rate"]["status"] == UNKNOWN
    assert report["health"]["status"] == DEGRADED  # unknown degrades
    assert report["alerts"] == []
    assert dashboard_summary(None, None)["total_requests"] == 0
