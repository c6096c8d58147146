"""Validation-rule operator + error thresholds + streaming windowed aggs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datascrapexter_spark.extract.validation import (
    ValidationRule,
    error_counts,
    should_stop,
    split_valid,
    validate_df,
)
from datascrapexter_spark.streaming import (
    run_to_memory,
    stream_files,
    windowed_event_counts,
)


def _sample(spark):
    rows = [
        (1, "valid name", "42", "true"),
        (2, "x", "42", "true"),            # too short
        (3, None, "42", "true"),           # missing required
        (4, "valid name", "not-num", "true"),   # bad number
        (5, "other name", "7", "maybe"),   # bad boolean
    ]
    return spark.createDataFrame(
        rows, "id long, name string, amount string, flag string")


RULES = [
    ValidationRule(field="name", type="string", required=True, min_length=3,
                   default="unknown"),
    ValidationRule(field="amount", type="number"),
    ValidationRule(field="flag", type="boolean"),
]


def test_validate_non_strict_substitutes_defaults(spark):
    out = {r["id"]: r for r in validate_df(_sample(spark), RULES).collect()}
    assert out[1]["name"] == "valid name" and out[1]["_violations"] == []
    assert out[2]["name"] == "unknown"           # default substituted
    assert "too short" in out[2]["_violations"][0]
    assert out[3]["name"] == "unknown"           # required missing -> default
    assert out[4]["amount"] is None              # no default -> field deleted
    assert out[5]["flag"] is None


def test_validate_strict_drops_failing_rows(spark):
    kept = validate_df(_sample(spark), RULES, strict=True)
    assert [r["id"] for r in kept.orderBy("id").collect()] == [1]


def test_split_valid(spark):
    ok, rejected = split_valid(_sample(spark), RULES)
    assert ok.count() == 1 and rejected.count() == 4


def test_options_whitelist(spark):
    df = spark.createDataFrame([(1, "red"), (2, "pink")], "id long, c string")
    rules = [ValidationRule(field="c", options=["red", "blue"])]
    ok, rej = split_valid(df, rules)
    assert [r["id"] for r in ok.collect()] == [1]
    assert "not in allowed options" in rej.collect()[0]["_violations"][0]


def test_error_threshold_semantics(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, False), (4, True)], "id long, _success boolean")
    errors, total = error_counts(df)
    assert (errors, total) == (2, 4)
    assert not should_stop(2, 2, 4)  # gate disabled
    assert should_stop(2, 2, 4, stop_on_error_threshold=True, error_threshold=2)
    assert not should_stop(1, 1, 4, stop_on_error_threshold=True, error_threshold=2)
    assert should_stop(0, 2, 4, stop_on_error_threshold=True,
                       error_threshold_percent=50.0)
    assert not should_stop(0, 1, 4, stop_on_error_threshold=True,
                           error_threshold_percent=50.0)


def test_streaming_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    batch = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
         (2, "2024-01-01 10:55:00", 1, "view", 2.0, "{}"),
         (3, "2024-01-01 11:05:00", 2, "click", 5.0, "{}"),
         (4, "2024-01-01 23:05:00", 2, "view", 1.0, "{}")],  # advances watermark
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(src)

    stream = stream_files(spark, src)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, "1 hour", "2 hours")
    run_to_memory(agg, "win_counts", ckpt, output_mode="append")
    got = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.table("win_counts").collect()}
    # watermark = 23:05 - 2h = 21:05 -> the 10:00 and 11:00 windows finalized
    assert got[("2024-01-01 10:00:00", "view")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "click")] == (1, 5.0)
    # the 23:00 window is NOT finalized yet (>= watermark) -> absent in append
    assert ("2024-01-01 23:00:00", "view") not in got
