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


def test_streaming_adaptive_rate_state(spark, tmp_path):
    """Custom stateful streaming operator (applyInPandasWithState): the
    AdaptiveRateLimiter recurrence carries per-domain state across
    micro-batches AND across query restarts (checkpointed GroupState).

    Batch 1: d1 all-errors (err 1.0 -> consec 1), d2 clean (consec 0).
    Batch 2 (separate drain, same checkpoint): d1 all-errors again ->
    consec must come back as 2 — only possible if state was restored."""
    import os

    from datascrapexter_spark.frontier.politeness import (
        PolitenessConfig,
        tokens_per_round_py,
    )
    from datascrapexter_spark.streaming.events import adaptive_rate_stream

    src = str(tmp_path / "fetch_events")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    schema = "domain string, ok boolean"
    pol = PolitenessConfig(requests_per_second=2.0, round_seconds=5.0,
                           max_pages_per_round_per_domain=10)

    def drain(name):
        # foreachBatch sink: supports checkpoint RECOVERY (the memory sink
        # does not), which is exactly what batch 2 exercises
        rows = []

        def sink(batch_df, _batch_id):
            rows.extend(batch_df.collect())

        stream = (spark.readStream.schema(schema).parquet(src))
        out = adaptive_rate_stream(stream, pol)
        q = (out.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["domain"]: r for r in rows}

    spark.createDataFrame(
        [("d1", False)] * 4 + [("d2", True)] * 3, schema
    ).write.mode("append").parquet(src)
    got1 = drain("rate_b1")
    assert got1["d1"]["err_rate"] == 1.0 and got1["d1"]["consec_err"] == 1
    assert got1["d1"]["tokens"] == tokens_per_round_py(0.0, 1.0, 1, pol)
    assert got1["d2"]["consec_err"] == 0
    assert got1["d2"]["tokens"] == tokens_per_round_py(0.0, 0.0, 0, pol)

    spark.createDataFrame(
        [("d1", False)] * 2 + [("d2", False)] * 1, schema
    ).write.mode("append").parquet(src)
    got2 = drain("rate_b2")
    # d1's consecutive-error count RESUMED from checkpointed state
    assert got2["d1"]["consec_err"] == 2 and got2["d1"]["batch_no"] == 2
    assert got2["d1"]["tokens"] == tokens_per_round_py(0.0, 1.0, 2, pol)
    assert got2["d2"]["consec_err"] == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from datascrapexter_spark.streaming.events import streaming_dedup

    src = str(tmp_path / "landing_dd")
    ckpt = str(tmp_path / "ckpt_dd")
    os.makedirs(src, exist_ok=True)
    batch = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "view", 1.0, "A"),
         (2, "2024-01-01 10:10:00", 1, "view", 1.0, "A"),   # dup of 1
         (3, "2024-01-01 10:20:00", 1, "view", 1.0, "B"),
         (4, "2024-01-01 10:30:00", 1, "view", 2.0, "A"),   # dup of 1
         (5, "2024-01-01 10:40:00", 1, "click", 1.0, "A")], # kind differs
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(src)

    stream = stream_files(spark, src)
    dd = streaming_dedup(stream, ["event_type", "props"],
                         watermark="2 hours")
    assert dd.isStreaming and "_digest" not in dd.columns
    run_to_memory(dd, "dedup_stream", ckpt, output_mode="append")
    got = spark.table("dedup_stream").collect()
    # exactly ONE survivor per content identity (which one is processing-
    # order dependent — the documented contrast with batch exact_dedup)
    assert sorted((r["event_type"], r["props"]) for r in got) == \
        [("click", "A"), ("view", "A"), ("view", "B")]
    assert {r["event_id"] for r in got if r["props"] == "B"} == {3}
    assert {r["event_id"] for r in got if r["event_type"] == "click"} == {5}
    assert [r["event_id"] for r in got
            if (r["event_type"], r["props"]) == ("view", "A")][0] in (1, 2, 4)


def test_streaming_change_detection_state(spark, tmp_path):
    """Streaming revisit twin (q50's rule, live): per-URL digest state
    carries across micro-batches and restarts; in-batch rows apply in
    ts order so the transition count is deterministic.

    Batch 1: u1 digests a->b (1 change over 2 fetches), u2 a (prior).
    Batch 2 (fresh drain, same checkpoint): u1 b->c (change must count
    from RESTORED digest b), u2 a again (no change)."""
    import os

    from datascrapexter_spark.streaming.events import change_detect_stream

    src = str(tmp_path / "captures")
    ckpt = str(tmp_path / "ckpt_chg")
    os.makedirs(src, exist_ok=True)
    schema = "url string, digest string, ts long"

    def drain():
        rows = []

        def sink(batch_df, _bid):
            rows.extend(batch_df.collect())

        stream = spark.readStream.schema(schema).parquet(src)
        out = change_detect_stream(stream)
        q = (out.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r["url"]: r for r in rows}

    spark.createDataFrame(
        [("u1", "a", 1), ("u1", "b", 2), ("u2", "a", 1)], schema
    ).write.mode("append").parquet(src)
    got1 = drain()
    assert got1["u1"]["n_fetches"] == 2 and got1["u1"]["n_changes"] == 1
    assert got1["u1"]["change_rate_micro"] == 1_000_000
    assert got1["u2"]["n_fetches"] == 1
    assert got1["u2"]["change_rate_micro"] == 500_000  # single-fetch prior

    spark.createDataFrame(
        [("u1", "c", 3), ("u2", "a", 2)], schema
    ).write.mode("append").parquet(src)
    got2 = drain()
    # u1: restored digest 'b' -> 'c' is a change; 2 changes over 3 fetches
    assert got2["u1"]["n_fetches"] == 3 and got2["u1"]["n_changes"] == 2
    assert got2["u1"]["batch_changes"] == 1
    assert got2["u1"]["change_rate_micro"] == 1_000_000
    # u2: same digest -> no change; rate (1e6*0)//(2-1) = 0
    assert got2["u2"]["n_changes"] == 0
    assert got2["u2"]["change_rate_micro"] == 0
