"""Structured Streaming over the events table.

The reference has NO streaming surface (SURVEY.md §2.6) — its iteration is
batch-synchronous supersteps.  This module covers the task sheet's streaming
checklist with the standard Spark constructs a training-data pipeline uses
for event feeds: file-source readStream, watermarked tumbling-window
aggregation, and a stateful running counter via applyInPandasWithState.

Batch parity: ``hourly_counts_batch`` computes the same aggregation with the
batch API, and tests assert streaming (availableNow trigger) == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet files.
    ``max_files_per_trigger`` caps files per micro-batch — under an
    availableNow trigger this forces MULTIPLE micro-batches, exercising
    state-store continuation and watermark advancement across batches
    (one batch processes everything otherwise)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type — late rows beyond
    the watermark are dropped, state is bounded (the scale requirement for
    an unbounded feed)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_counts_batch(events: DataFrame) -> DataFrame:
    """Batch twin of windowed_counts (1-hour windows, no watermark)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, sum_value) maintained in the state store across
    micro-batches (Arrow-batched — no per-row Python), emitted once per
    user per batch.  The pattern a training pipeline uses for per-source
    running quotas/counters that windowed aggregation can't express."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_events long, sum_value double",
        "n long, s double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_dedup_first_seen(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence per ``event_id``
    within the watermark horizon — the streaming twin of
    ``functions.dedup.exact_duplicates`` (state bounded by the watermark,
    the requirement for an unbounded feed; on documents the key would be
    ``sha2(text, 256)``)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_stream_once(spark: SparkSession, src_path: str, query_name: str = "events_agg") -> DataFrame:
    """Process everything currently in ``src_path`` with an availableNow
    trigger into an in-memory sink; returns the result table."""
    stream = windowed_counts(read_event_stream(spark, src_path))
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
