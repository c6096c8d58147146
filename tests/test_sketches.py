"""HLL register sketches: exactness of registers, merge law, accuracy."""

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.ops.sketches import (hll_estimate, hll_registers,
                                               merge_registers)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"))


def test_estimate_accuracy_mid_range(spark):
    n = 20_000
    est = hll_estimate(hll_registers(_keys(spark, 0, n), "k", p=8), p=8)
    assert abs(est - n) / n < 0.20      # 3 sigma at p=8 (~6.5 % se)


def test_estimate_small_range_linear_counting(spark):
    n = 30
    est = hll_estimate(hll_registers(_keys(spark, 0, n), "k", p=8), p=8)
    assert abs(est - n) / n < 0.15


def test_duplicates_do_not_move_registers(spark):
    base = _keys(spark, 0, 1000)
    dup = base.unionByName(base).unionByName(base)
    a = sorted(map(tuple, hll_registers(base, "k", p=8).collect()))
    b = sorted(map(tuple, hll_registers(dup, "k", p=8).collect()))
    assert a == b


def test_merge_equals_union(spark):
    a, b = _keys(spark, 0, 3000), _keys(spark, 2000, 6000)
    merged = sorted(map(tuple, merge_registers(
        hll_registers(a, "k", p=8), hll_registers(b, "k", p=8)).collect()))
    union = sorted(map(tuple, hll_registers(
        a.unionByName(b), "k", p=8).collect()))
    assert merged == union


def test_validation(spark):
    with pytest.raises(ValueError):
        hll_registers(_keys(spark, 0, 1), "k", p=3)
    with pytest.raises(ValueError):
        merge_registers()


def test_register_bounds(spark):
    rows = hll_registers(_keys(spark, 0, 5000), "k", p=8).collect()
    assert len(rows) <= 256
    for r in rows:
        assert 0 <= r["reg"] < 256
        assert 1 <= r["max_rho"] <= 53


def test_registers_single_exchange_plan(spark):
    plan = hll_registers(_keys(spark, 0, 100), "k", p=8)._jdf \
        .queryExecution().executedPlan().toString()
    # map-side partial max collapses partitions to <= 2^p rows before
    # the ONLY shuffle; no Python nodes anywhere
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan
