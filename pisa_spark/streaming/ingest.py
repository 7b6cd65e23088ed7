"""Structured Streaming ingest for the pages/events feed.

The north rule's build is batch (the reference's "streaming" is a
discrete snapshot loop, /root/reference/src/main.py:115-151 — micro-
batch by construction). This module provides the genuinely-streaming
ingest edge a production deployment would put in front of the batch
index build:

* ``stream_events`` — file-source stream over a directory of parquet
  drops (at scale: a Kafka source with identical downstream code);
* ``windowed_event_counts`` — event-time tumbling window + watermark
  (late data handled, state bounded);
* ``incremental_doc_lengths`` — the per-microbatch stage of the index
  build (tokenize + per-doc stats), showing the batch transformations
  compose unchanged onto a stream;
* ``run_available_now`` — drain with the availableNow trigger into a
  memory sink; used by tests (deterministic, no timers).

Micro-batches map 1:1 onto the resumable build's waves (lineage.py):
each drained batch of pages would run build_postings for its doc-range
buckets and append lineage rows — the streaming spine of T18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col


def stream_events(
    spark: SparkSession, dir_path: str, schema: str | None = None
) -> DataFrame:
    """File-source stream of parquet drops in dir_path."""
    if schema is None:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts with a watermark bounding
    state: (window_start, event_type, n_events, total_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def incremental_doc_lengths(pages_stream: DataFrame) -> DataFrame:
    """Per-microbatch tokenize + doc stats — the streaming front of the
    index build; identical expression tree as the batch path."""
    return pages_stream.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).select("doc_id", F.size("tokens").alias("doc_len"))


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain the stream with availableNow into a memory sink; return
    the result as a batch DataFrame (test/verification harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
