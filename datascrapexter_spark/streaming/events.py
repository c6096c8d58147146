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
