"""Capture-drift operator on handcrafted histories: exact ppm values,
NULL first capture, deterministic tiebreak, single-exchange plan."""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from datascrapexter_spark.ops.drift import capture_drift


def _hist(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, ts=datetime(2024, 1, 1, h), event_id=i, text=t)
         for u, h, i, t in rows],
        "url string, ts timestamp, event_id long, text string")


def test_drift_values(spark):
    hist = _hist(spark, [
        ("u", 0, 0, "a b c d e"),        # 3 shingles: abc bcd cde
        ("u", 1, 1, "a b c d e"),        # identical -> drift 0
        ("u", 2, 2, "a b c d x"),        # shingles abc bcd cdx: overlap 2/4
        ("u", 3, 3, "p q r s t"),        # disjoint -> drift 1e6
    ])
    out = {r["ts"].hour: r for r in
           capture_drift(hist, tiebreak_col="event_id").collect()}
    assert out[0]["overlap"] is None and out[0]["drift_ppm"] is None
    assert out[0]["n_shingles"] == 3
    assert out[1]["jaccard_ppm"] == 1_000_000 and out[1]["drift_ppm"] == 0
    assert out[2]["overlap"] == 2 and out[2]["union_size"] == 4
    assert out[2]["jaccard_ppm"] == 500_000 and out[2]["drift_ppm"] == 500_000
    assert out[3]["overlap"] == 0 and out[3]["drift_ppm"] == 1_000_000


def test_short_text_single_shingle(spark):
    hist = _hist(spark, [("u", 0, 0, "one two"), ("u", 1, 1, "one two")])
    out = sorted(capture_drift(hist, tiebreak_col="event_id").collect(),
                 key=lambda r: r["ts"])
    assert out[0]["n_shingles"] == 1
    assert out[1]["drift_ppm"] == 0


def test_tiebreak_orders_equal_timestamps(spark):
    # same ts: event_id decides which capture is "previous" — exactly one
    # row is first (NULL drift), the other diffs against disjoint text
    hist = _hist(spark, [
        ("u", 0, 2, "x y z w"), ("u", 0, 1, "a b c d"),
    ])
    drifts = [r["drift_ppm"] for r in
              capture_drift(hist, tiebreak_col="event_id").collect()]
    assert sorted(drifts, key=lambda v: (v is None, v)) == [1_000_000, None]


def test_single_exchange_plan(spark):
    hist = _hist(spark, [("u", 0, 0, "a b c d")])
    plan = capture_drift(hist, tiebreak_col="event_id")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Python" not in plan and "Join" not in plan
