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


SESSION_OUTPUT_SCHEMA = "user_id long, event_id long, session_seq long"
SESSION_STATE_SCHEMA = "last_ts_us long, session_seq long"


def streaming_sessionize(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Stateful gap-based sessionization on a stream: the
    applyInPandasWithState rendering of operators.sessions.sessionize.

    Per-user state = (last event time in us, current session ordinal);
    events within a microbatch are sorted (ts, event_id); a gap >
    gap_minutes (or fresh state) starts a new session. With in-order
    arrival per user the output equals the batch operator exactly
    (asserted in tests with the history split across microbatches,
    which exercises state carry-over)."""
    import pandas as pd

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        import numpy as np

        frames = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            raw = pdf["ts"].astype("int64").to_numpy()
            unit_div = 1000 if str(pdf["ts"].dtype).endswith("[ns]") else 1
            t_us = raw // unit_div
            prev = np.empty_like(t_us)
            prev[1:] = t_us[:-1]
            prev[0] = last_ts if last_ts is not None else np.iinfo(np.int64).min
            # int64-min sentinel: subtraction would overflow, so the
            # fresh-state break is forced explicitly
            breaks = (t_us - np.where(prev == np.iinfo(np.int64).min, t_us, prev)) > gap_us
            if last_ts is None:
                breaks[0] = True
            seqs = seq + np.cumsum(breaks.astype(np.int64))
            seq = int(seqs[-1])
            last_ts = int(t_us[-1])
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(t_us.size, user_id, np.int64),
                        "event_id": pdf["event_id"].to_numpy(np.int64),
                        "session_seq": seqs,
                    }
                )
            )
        state.update((last_ts, seq))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_index_ingest(
    docs_stream: DataFrame,
    corpus_dir: str,
    index_root: str,
    checkpoint_dir: str,
    docs_per_bucket: int = 64,
    wave_size: int = 8,
    dedup_content: bool = False,
):
    """Streaming front of the resumable index build (the T18 spine made
    literal): each micro-batch of documents (doc_id, text) is appended
    to the staging corpus snapshot, then the incremental build runs —
    the per-bucket content fingerprints make it rebuild ONLY the
    doc-range buckets the batch touched (new ranges + at most one
    boundary bucket), committing waves + lineage exactly like the batch
    path, with manifest-atomic visibility.

    foreachBatch is the right hook: the inner build is a batch job, so
    the whole existing lineage/resume machinery composes unchanged; a
    crash between corpus append and build is healed by the next batch
    (or a manual build) because pending-bucket detection is stateless.
    foreachBatch is AT-LEAST-ONCE, so the corpus append must be
    idempotent: a replayed micro-batch is anti-joined against already-
    ingested doc_ids before appending (append-only contract — a replay
    can never re-add or mutate an existing doc). The append goes
    THROUGH the manifest catalog (write-generation-then-publish), so a
    crash mid-append leaves only an unpublished generation — the next
    batch's anti-join reads the manifest and never sees torn files
    (tests/test_resume.py::test_torn_corpus_append_invisible). Returns
    the started StreamingQuery (availableNow trigger — drains what's
    there and stops; swap the trigger for continuous ingest).

    dedup_content=True additionally drops exact content duplicates at
    the door (the standard crawl-ingest hygiene step): a new doc whose
    normalized-token md5 (functions.text.content_fingerprint) matches
    an already-ingested doc — or a lower-doc_id doc in the same batch
    (min-doc_id-wins, deterministic) — never enters the corpus. The
    existing side of the anti-join recomputes fingerprints from stored
    text, so the rule is stateless and replay-stable; at scale,
    persist a (fingerprint) side table through the catalog instead of
    recomputing (same join, one more maintained table).
    """
    from pisa_spark.index.lineage import build_index_resumable
    from pisa_spark.sources import catalog

    corpus_table = "documents.parquet"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new = batch_df.select("doc_id", "text")
        have_corpus = catalog.table_exists(corpus_dir, corpus_table)
        if have_corpus:
            existing = catalog.read_table(
                batch_df.sparkSession, corpus_dir, corpus_table
            ).select("doc_id")
            new = new.join(existing, "doc_id", "left_anti")
        if dedup_content:
            from pisa_spark.functions.text import content_fingerprint
            from pyspark.sql import Window

            fp = new.withColumn("fp", content_fingerprint(F.col("text")))
            # in-batch: min doc_id per fingerprint wins (deterministic)
            w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
            fp = fp.withColumn("rn", F.row_number().over(w)).filter(
                F.col("rn") == 1
            )
            if have_corpus:
                seen = catalog.read_table(
                    batch_df.sparkSession, corpus_dir, corpus_table
                ).select(content_fingerprint(F.col("text")).alias("fp"))
                fp = fp.join(seen, "fp", "left_anti")
            new = fp.select("doc_id", "text")
        if new.isEmpty():
            return  # pure replay — corpus and index already reflect it
        catalog.write_table(new, corpus_dir, corpus_table, mode="append")
        # bound the generation count: each micro-batch appends one
        # generation; past 16 live dirs, fold them into one (atomic
        # publish, superseded dirs left to vacuum) so a long-running
        # stream's readers pay a constant file listing
        catalog.compact_table(
            batch_df.sparkSession, corpus_dir, corpus_table, min_dirs=16
        )
        build_index_resumable(
            batch_df.sparkSession,
            corpus_dir,
            index_root,
            wave_size=wave_size,
            docs_per_bucket=docs_per_bucket,
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


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
