"""Rate-limit strategy parity (ratelimiter.go:91-99 strategies,
:363-409 adaptive multiplier w/ min-change gate, :411-425 burst rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datascrapexter_spark.frontier.politeness import (
    PolitenessConfig,
    burst_size,
    interval_multiplier,
    strategy_tokens_per_round,
)


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_interval_multiplier_reference_constants(spark):
    cfg = PolitenessConfig()
    col = interval_multiplier(F.col("err"), F.col("consec"), F.col("prev"), cfg)
    rows = [
        (0.0, 0, 1.0),    # clean -> 1.0
        (0.5, 0, 1.0),    # err 50% -> 1 + 0.5*3 = 2.5
        (1.0, 0, 1.0),    # err 100% -> 4.0 ("up to 4x slower")
        (0.05, 0, 1.0),   # below 10% threshold -> 1.0
        (0.5, 10, 1.0),   # consec 10 > limit 5 -> 2.5 * (10/5) = 5.0
        (0.5, 100, 1.0),  # consec ratio capped at 10 -> 2.5 * 10 = 25.0
        (0.5, 0, 2.45),   # |2.5-2.45|/2.45 ~ 2% < 10% min change -> keep 2.45
        (0.5, 0, 2.0),    # 25% change >= 10% -> adopt 2.5
    ]
    got = _eval(spark, col, rows, "err double, consec int, prev double")
    assert got == [1.0, 2.5, 4.0, 1.0, 5.0, 25.0, 2.45, 2.5]


def test_burst_size_rules(spark):
    cfg = PolitenessConfig(burst=10)
    col = burst_size(F.col("err"), cfg)
    got = _eval(spark, col, [(0.0,), (0.04,), (0.1,), (0.25,), (1.0,)],
                "err double")
    # <5% -> 15; 5..20% -> 10; >20% -> 5
    assert got == [15, 15, 10, 5, 5]


def test_strategy_budgets(spark):
    rows = [(0.0, 0.0, 0, 1.0), (0.0, 0.5, 0, 1.0)]
    schema = "delay double, err double, consec int, prev double"

    def tokens(strategy):
        cfg = PolitenessConfig(requests_per_second=2.0, round_seconds=5.0,
                               burst=4, strategy=strategy,
                               max_pages_per_round_per_domain=100)
        col = strategy_tokens_per_round(F.col("delay"), F.col("err"),
                                        F.col("consec"), F.col("prev"), cfg)
        return _eval(spark, col, rows, schema)

    # base = 5s * 2rps = 10 tokens
    assert tokens("fixed") == [10, 10]            # no adaptation
    assert tokens("adaptive") == [10, 4]          # 10 / 2.5 at 50% errors
    assert tokens("burst") == [16, 12]            # 10 + burst(6 / 2)
    assert tokens("hybrid") == [16, 6]            # 4 + burst(2) at 50% err


def test_crawl_delay_still_caps_rate(spark):
    cfg = PolitenessConfig(requests_per_second=2.0, round_seconds=10.0,
                           strategy="fixed",
                           max_pages_per_round_per_domain=100)
    col = strategy_tokens_per_round(F.col("delay"), F.lit(0.0), F.lit(0),
                                    F.lit(1.0), cfg)
    got = _eval(spark, col, [(0.0,), (2.0,), (20.0,)], "delay double")
    # no delay -> 20; 2s delay -> 0.5 rps -> 5; 20s capped at 10s -> 1
    assert got == [20, 5, 1]
