"""Streaming ingestion of event/metric records + watermarked windowed aggs.

readStream -> event-time window agg -> writeStream; watermark bounds state
for late data. At crawl scale the input directory is the landing zone the
fetch tier writes to; `Trigger.AvailableNow` drains whatever has landed and
checkpoints, which composes with the batch-incremental round loop (run the
drain between rounds) — one code path serves both continuous and
catch-up execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_files(spark: SparkSession, path: str,
                 schema: T.StructType = EVENT_SCHEMA,
                 fmt: str = "parquet",
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a landing directory (schema is mandatory for
    streaming file sources)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def windowed_event_counts(stream: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts") -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    The watermark bounds in-flight state: windows older than
    max(event time) - watermark finalize and evict — required for an
    unbounded crawl-metrics stream."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def run_to_memory(agg: DataFrame, name: str, checkpoint_dir: str,
                  output_mode: str = "append") -> None:
    """Drain everything currently in the source into an in-memory table via
    Trigger.AvailableNow, then stop — the between-rounds catch-up pattern.
    With append mode only watermark-finalized windows emit."""
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def write_stream_parquet(agg: DataFrame, path: str, checkpoint_dir: str,
                         output_mode: str = "append"):
    """Continuous sink to parquet (the production path); returns the query
    handle so the caller owns its lifecycle."""
    return (
        agg.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


# ---------------------------------------------------------------------------
# custom stateful operator: streaming AdaptiveRateLimiter
# ---------------------------------------------------------------------------

RATE_STATE_SCHEMA = T.StructType([
    T.StructField("consec_err", T.IntegerType()),
    T.StructField("batches_seen", T.IntegerType()),
])

RATE_OUT_SCHEMA = T.StructType([
    T.StructField("domain", T.StringType()),
    T.StructField("batch_no", T.IntegerType()),
    T.StructField("attempts", T.LongType()),
    T.StructField("errors", T.LongType()),
    T.StructField("err_rate", T.DoubleType()),
    T.StructField("consec_err", T.IntegerType()),
    T.StructField("tokens", T.IntegerType()),
])


def adaptive_rate_stream(fetch_events: DataFrame, pol=None,
                         crawl_delay_s: float = 0.0,
                         state_timeout_ms: int = 0) -> DataFrame:
    """Streaming AdaptiveRateLimiter: the reference's rate-limiter recurrence
    (ratelimiter.go:363-426; round-wise rendering in
    frontier/politeness.py) as a CUSTOM STATEFUL STREAMING OPERATOR over a
    fetch-event stream (domain string, ok boolean, ...).

    Per micro-batch and per domain: err_rate = errors/attempts over the
    batch; consecutive-bad-batch count carries in GroupState
    (applyInPandasWithState — checkpointed, so a restarted query resumes
    its penalty state exactly); the emitted `tokens` is the next batch's
    budget via the SAME tokens_per_round recurrence the batch scheduler
    and the sequential oracle use.

    Output mode must be "update". State size: one (int, int) per domain —
    bounded by domain count, evictable via `state_timeout_ms` for domains
    that go quiet (ProcessingTimeTimeout).
    """
    from ..frontier.politeness import (
        PolitenessConfig,
        next_consec_errors_py,
        tokens_per_round_py,
    )

    pol = pol or PolitenessConfig()
    timeout = "ProcessingTimeTimeout" if state_timeout_ms else "NoTimeout"

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        consec, seen = state.get if state.exists else (0, 0)
        attempts = errors = 0
        for pdf in pdfs:
            attempts += len(pdf)
            errors += int((~pdf["ok"].astype(bool)).sum())
        if attempts == 0:
            return
        err_rate = errors / attempts
        consec = next_consec_errors_py(err_rate, consec, pol)
        tokens = tokens_per_round_py(crawl_delay_s, err_rate, consec, pol)
        seen += 1
        state.update((consec, seen))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame([{
            "domain": key[0], "batch_no": seen,
            "attempts": attempts, "errors": errors,
            "err_rate": round(err_rate, 6),
            "consec_err": consec, "tokens": tokens,
        }])

    return (
        fetch_events.groupBy("domain")
        .applyInPandasWithState(
            update, RATE_OUT_SCHEMA, RATE_STATE_SCHEMA, "update", timeout)
    )


def streaming_dedup(stream: DataFrame, content_cols: list[str],
                    ts_col: str = "ts",
                    watermark: str = "2 hours") -> DataFrame:
    """Ingest-time exact dedup: the streaming twin of ops.dedup.exact_dedup
    (identity = md5 of the NULL-sentinel concat, the same documented
    digest contract), for landing-zone pipelines where duplicates arrive
    continuously (re-fetches, retried uploads).

    dropDuplicatesWithinWatermark keys the state store on the digest and
    EVICTS entries once they age past the watermark — bounded state on an
    unbounded stream, which plain dropDuplicates cannot give. Exactly one
    record per identity survives the watermark horizon, but WHICH one is
    arrival/processing-order dependent (across partitions of a micro-batch
    it is not defined) — unlike batch exact_dedup's deterministic
    keep-first-by-order_col. Duplicates separated by more than the
    watermark are deliberately NOT collapsed either. Both caveats are why
    this operator only thins the hot ingest path; the global, reproducible
    guarantee stays with batch exact_dedup over the compacted corpus.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
             for c in content_cols]
    return (stream
            .withColumn("_digest", F.md5(F.concat_ws("\x1f", *parts)))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_digest"])
            .drop("_digest"))
