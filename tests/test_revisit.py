"""Recrawl priority (frontier/revisit.py) — recurrence semantics on a
hand-built fetch history plus the one-shuffle plan contract. Cross-engine
exactness is gated by q50."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.frontier.revisit import (
    CHANGE_PRIOR_MICRO,
    SCALE,
    revisit_priority,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
HOUR_US = 3_600_000_000


def _ts(h):
    return datetime(2024, 1, 1 + h // 24, h % 24, 0, 0)


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # volatile: 3 fetches, changes every time (rate = 1.0)
        ("u/volatile", _ts(0), 0, "d1"),
        ("u/volatile", _ts(1), 1, "d2"),
        ("u/volatile", _ts(2), 2, "d3"),
        # static: 4 fetches, never changes (rate = 0)
        ("u/static", _ts(0), 3, "s"),
        ("u/static", _ts(1), 4, "s"),
        ("u/static", _ts(2), 5, "s"),
        ("u/static", _ts(3), 6, "s"),
        # half: 3 fetches, 1 change of 2 intervals (rate = 0.5)
        ("u/half", _ts(0), 7, "a"),
        ("u/half", _ts(5), 8, "a"),
        ("u/half", _ts(10), 9, "b"),
        # single observation -> prior
        ("u/once", _ts(1), 10, "x"),
    ]
    return spark.createDataFrame(
        rows, "url string, ts timestamp, event_id long, digest string")


def test_recurrence_semantics(spark, history):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    now = int(datetime(2024, 1, 2).timestamp()) * 1_000_000  # T0 + 24h
    got = {r.url: r for r in revisit_priority(
        history, tiebreak_col="event_id", now_us=now).collect()}
    assert len(got) == 4
    v = got["u/volatile"]
    assert (v.n_fetches, v.n_changes, v.change_rate_micro) == (3, 2, SCALE)
    assert v.age_hours == 22 and v.priority_micro == 22 * SCALE
    s = got["u/static"]
    assert (s.n_changes, s.change_rate_micro, s.priority_micro) == (0, 0, 0)
    h = got["u/half"]
    assert h.change_rate_micro == SCALE // 2
    assert h.age_hours == 14 and h.priority_micro == 14 * (SCALE // 2)
    o = got["u/once"]
    assert o.change_rate_micro == CHANGE_PRIOR_MICRO
    assert o.priority_micro == 23 * CHANGE_PRIOR_MICRO


def test_default_now_is_corpus_max(spark, history):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    got = {r.url: r for r in revisit_priority(
        history, tiebreak_col="event_id").collect()}
    # now = max ts = u/half's last fetch at T0+10h
    assert got["u/half"].age_hours == 0
    assert got["u/static"].age_hours == 7


def test_tiebreak_orders_equal_timestamps(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [("u", T0, 2, "b"), ("u", T0, 1, "a"), ("u", T0, 3, "a")]
    df = spark.createDataFrame(
        rows, "url string, ts timestamp, event_id long, digest string")
    r = revisit_priority(df, tiebreak_col="event_id").collect()[0]
    # event_id order: a, b, a -> 2 changes
    assert (r.n_fetches, r.n_changes) == (3, 2)


def test_single_shuffle_plan(spark, history):
    out = revisit_priority(history, tiebreak_col="event_id", now_us=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the lag window and the per-url rollup share one hash Exchange on url
    assert plan.count("Exchange hashpartitioning") == 1


def test_revisit_decisions_lattice(spark):
    from pyspark.sql import Row

    from datascrapexter_spark.frontier.revisit import revisit_decisions

    rows = [
        # volatile (rate 1e6): interval 24h; overdue, etag -> cond get
        Row(url="a", change_rate_micro=1_000_000, age_hours=30,
            has_etag=True, has_lm=False, prior_hours=None),
        # same but no validator -> full fetch
        Row(url="b", change_rate_micro=1_000_000, age_hours=30,
            has_etag=False, has_lm=False, prior_hours=None),
        # not yet due -> skip regardless of validators
        Row(url="c", change_rate_micro=1_000_000, age_hours=23,
            has_etag=True, has_lm=True, prior_hours=None),
        # static (rate 0): clamps to 720h max
        Row(url="d", change_rate_micro=0, age_hours=719,
            has_etag=False, has_lm=False, prior_hours=None),
        # static but sitemap prior says daily -> prior caps the interval
        Row(url="e", change_rate_micro=0, age_hours=25,
            has_etag=False, has_lm=True, prior_hours=24),
        # rate so high the raw interval would be < 1h -> min clamp 1h
        Row(url="f", change_rate_micro=1_000_000_000, age_hours=1,
            has_etag=False, has_lm=False, prior_hours=None),
    ]
    df = spark.createDataFrame(
        rows, "url string, change_rate_micro long, age_hours long, "
              "has_etag boolean, has_lm boolean, prior_hours int")
    out = {r["url"]: r.asDict() for r in revisit_decisions(
        df, etag_col="has_etag", last_modified_col="has_lm",
        prior_hours_col="prior_hours").collect()}
    assert out["a"]["interval_hours"] == 24
    assert out["a"]["due"] is True
    assert out["a"]["decision"] == "conditional_get"
    assert out["b"]["decision"] == "fetch"
    assert out["c"]["due"] is False and out["c"]["decision"] == "skip"
    assert out["d"]["interval_hours"] == 720
    assert out["d"]["decision"] == "skip"
    assert out["e"]["interval_hours"] == 24
    assert out["e"]["decision"] == "conditional_get"
    assert out["f"]["interval_hours"] == 1 and out["f"]["due"] is True


def test_revisit_decisions_pure_codegen(spark):
    from pyspark.sql import Row

    from datascrapexter_spark.frontier.revisit import revisit_decisions

    df = spark.createDataFrame(
        [Row(url="a", change_rate_micro=1, age_hours=1)],
        "url string, change_rate_micro long, age_hours long")
    plan = revisit_decisions(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
