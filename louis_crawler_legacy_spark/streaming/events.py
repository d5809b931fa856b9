"""Structured Streaming surfaces.

The reference has NO true streaming source (SURVEY §1.2 — its crawl loop is
iterative batch), so streaming here covers the two places a production
deployment of this engine would stream:

1. **Crawl-metrics firehose**: the engine appends a metrics row per round;
   `stream_metrics` tails the metrics table directory as a file stream and
   maintains running counters — the live dashboard feed.
2. **Event-log windowed aggregation**: `windowed_event_counts` is the
   generic watermarked tumbling-window aggregate over an event stream
   (late data handled by the watermark) used for fetch/error rates.

Both run with `availableNow` triggers in tests (bounded), `processingTime`
in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_metrics(spark: SparkSession, metrics_dir_glob: str) -> DataFrame:
    """readStream over the snapshot table's parquet dirs → per-trigger
    running totals. Returns the streaming DataFrame (caller attaches the
    writeStream sink)."""
    from louis_crawler_legacy_spark.plans.crawl import METRICS_SCHEMA

    stream = (
        spark.readStream.schema(METRICS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(metrics_dir_glob)
    )
    return stream.groupBy().agg(
        F.sum("n_batch").alias("total_scheduled"),
        F.sum("n_new_frontier").alias("total_deduped"),
        F.sum("n_errored").alias("total_errored"),
        F.max("round").alias("latest_round"),
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on both batch and
    streaming DataFrames (same plan; Catalyst inserts the stateful
    aggregation only under a streaming sink)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "cnt",
            "total_value",
        )
    )


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def run_stream_once(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str,
    window: str = "10 minutes",
) -> None:
    """Bounded end-to-end streaming run (availableNow trigger): parquet file
    stream → watermarked windowed agg → parquet sink. Used by tests; the
    production variant swaps the trigger."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_dir)
    )
    agg = windowed_event_counts(stream, window=window)
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
