"""Structured Streaming over the events table.

The reference has NO streaming (SURVEY.md §2.8 — everything is batch with
file-level resume). This module is the engine's forward-looking surface for
continuous ingestion at scale: the same rollups the batch engine computes
(events_hourly_rollup in __spark_entry__, DuckDB-oracled) expressed as
watermarked streaming aggregations, so a 100 TB/day event feed can maintain
the tables incrementally instead of recomputing.

Correctness strategy (tests/test_streaming.py): run each streaming query
with `trigger(availableNow=True)` over the driver's events parquet and
assert the result equals the batch computation on the same data — the
streaming/batch equivalence Spark guarantees for aligned watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Windowed count/sum per event_type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based), the stateful-op surface."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.round("value_sum", 2).alias("value_sum"),
        )
    )


def run_available_now(stream_df: DataFrame, name: str) -> DataFrame:
    """Drain the stream into a memory sink (test/driver harness helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
