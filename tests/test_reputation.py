"""Host reputation + budget allocation on handcrafted fetch histories."""
from __future__ import annotations

from pyspark.sql import Row

from datascrapexter_spark.frontier.reputation import (
    MICRO, allocate_budget, host_reputation, reputation_budgets)


def _hist(spark, rows):
    return spark.createDataFrame(
        [Row(host=h, is_error=e, is_dup=d) for h, e, d in rows],
        "host string, is_error boolean, is_dup boolean")


def test_clean_host_full_score(spark):
    rep = {r["host"]: r for r in host_reputation(
        _hist(spark, [("a", False, False)] * 4)).collect()}
    assert rep["a"]["n_fetches"] == 4
    assert rep["a"]["err_ppm"] == 0 and rep["a"]["dup_ppm"] == 0
    assert rep["a"]["score_micro"] == MICRO


def test_rates_floor_division_and_score(spark):
    # 1 error of 3 fetches -> 333333 ppm (floored); no dups
    rep = {r["host"]: r for r in host_reputation(
        _hist(spark, [("a", True, False), ("a", False, False),
                      ("a", False, False)])).collect()}
    assert rep["a"]["err_ppm"] == 333333
    assert rep["a"]["score_micro"] == (MICRO - 333333)


def test_all_error_host_keeps_probe_floor(spark):
    rep = {r["host"]: r for r in host_reputation(
        _hist(spark, [("bad", True, True)] * 5)).collect()}
    assert rep["bad"]["err_ppm"] == MICRO
    assert rep["bad"]["score_micro"] == MICRO // 100


def test_budget_proportional_and_conserved(spark):
    hist = _hist(spark, [("a", False, False)] * 3
                 + [("b", True, False), ("b", True, False)])  # b all-error
    out = {r["host"]: r for r in
           reputation_budgets(hist, total_budget=1000).collect()}
    total_score = MICRO + MICRO // 100
    assert out["a"]["budget"] == 1000 * MICRO // total_score
    assert out["b"]["budget"] == 1000 * (MICRO // 100) // total_score
    # floor allocation never exceeds the total
    assert out["a"]["budget"] + out["b"]["budget"] <= 1000


def test_total_is_single_pass(spark):
    # the scalar score total must share the aggregate subtree (window),
    # not duplicate it (self-join => two scans of the fetch history)
    rep = host_reputation(_hist(spark, [("a", False, False)]))
    plan = allocate_budget(rep, 100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan
