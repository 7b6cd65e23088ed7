"""Resumable index build with per-partition lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics" (BASELINE.json). Spark-native rendering of the
reference's skip-if-checkpoint-exists resume
(/root/reference/src/helpers/Runner.py:115-137) and its snapshot-block
materialization (/root/reference/src/helpers/Reader.py:148-178):

* The build is chunked into **waves** of doc-range buckets. Each wave
  is one Spark job writing only its buckets via dynamic partition
  overwrite (idempotent: re-running a wave replaces exactly the same
  partitions byte-for-byte — content is a pure function of the input).
* After a wave's data commit, one lineage row per bucket is appended to
  the ``lineage`` table: (bucket, status, docs, postings, blocks,
  bytes_out, wall_s, wave). A killed build leaves earlier waves
  committed + recorded; rerun left-anti-joins pending buckets against
  committed lineage and processes only those.
* ``docs_per_s`` / ``postings_per_s`` derive from the same rows — the
  lineage table doubles as the metrics table (SURVEY T19).

At cluster scale, one wave = one Iceberg append of a few thousand
bucket-partitions; wave size bounds the blast radius of a failure while
keeping the job count low (10^12 docs / 1M-doc buckets / 4096-bucket
waves ≈ 250 jobs).
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import BLOCK_SIZE, build_postings, corpus_stats
from pisa_spark.sources import catalog

LINEAGE_SCHEMA = (
    "bucket int, status string, docs long, postings long, blocks long, "
    "bytes_out long, wall_s double, wave int"
)

POSTINGS_TABLE = "postings"
LINEAGE_TABLE = "lineage"
STATS_TABLE = "corpus_stats"


def committed_buckets(spark: SparkSession, index_root: str) -> set[int]:
    if not catalog.table_exists(index_root, LINEAGE_TABLE):
        return set()
    rows = (
        catalog.read_table(spark, index_root, LINEAGE_TABLE)
        .filter(F.col("status") == "committed")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def build_index_resumable(
    spark: SparkSession,
    sf_dir: str,
    index_root: str,
    n_buckets: int = 32,
    wave_size: int = 8,
    block_size: int = BLOCK_SIZE,
    fail_after_waves: int | None = None,
) -> dict:
    """Build (or resume) the persistent index at ``index_root``.

    fail_after_waves: test hook — raise after N waves to simulate a
    mid-build crash (the kill/rerun test of SURVEY §5.2 item 4).

    Returns summary metrics {docs, postings, waves_run, buckets_done}.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens")).cache()
    try:
        stats_row = corpus_stats(toks).collect()[0]
        n_docs = int(stats_row["n_docs"])
        avgdl = float(stats_row["avgdl"])
        max_doc = toks.agg(F.max("doc_id")).collect()[0][0]
        span = max(1, math.ceil((max_doc + 1) / n_buckets))

        catalog.write_table(
            spark.createDataFrame(
                [(n_docs, avgdl, int(stats_row["total_terms"]))],
                "n_docs long, avgdl double, total_terms long",
            ),
            index_root,
            STATS_TABLE,
        )

        done = committed_buckets(spark, index_root)
        pending = [b for b in range(n_buckets) if b not in done]
        waves = [
            pending[i : i + wave_size] for i in range(0, len(pending), wave_size)
        ]
        waves_run = 0
        for wave_no, wave in enumerate(waves):
            t0 = time.perf_counter()
            lo = min(wave) * span
            hi = (max(wave) + 1) * span
            # bucket ranges are contiguous per wave only if buckets are;
            # filter precisely on membership after the cheap range prune
            wave_toks = toks.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).filter(((F.col("doc_id") / span).cast("int")).isin(wave))
            postings = build_postings(
                wave_toks, n_docs, avgdl, n_buckets=n_buckets,
                max_doc_id=max_doc, block_size=block_size,
            )
            catalog.write_table(
                postings, index_root, POSTINGS_TABLE, partition_by=["bucket"],
                mode="overwrite",
            )
            wall = time.perf_counter() - t0
            written = catalog.read_table(spark, index_root, POSTINGS_TABLE).filter(
                F.col("bucket").isin(wave)
            )
            per_bucket = (
                written.groupBy("bucket")
                .agg(
                    F.sum("n").alias("postings"),
                    F.count(F.lit(1)).alias("blocks"),
                    (
                        F.sum(F.octet_length("docs"))
                        + F.sum(F.octet_length("tfs"))
                        + F.sum(F.octet_length("dls"))
                    ).alias("bytes_out"),
                )
                .collect()
            )
            ndocs_wave = {
                r["bucket"]: r["cnt"]
                for r in wave_toks.groupBy(
                    ((F.col("doc_id") / span).cast("int")).alias("bucket")
                )
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            stats_by_bucket = {r["bucket"]: r for r in per_bucket}
            lineage_rows = [
                (
                    b,
                    "committed",
                    int(ndocs_wave.get(b, 0)),
                    int(stats_by_bucket[b]["postings"]) if b in stats_by_bucket else 0,
                    int(stats_by_bucket[b]["blocks"]) if b in stats_by_bucket else 0,
                    int(stats_by_bucket[b]["bytes_out"]) if b in stats_by_bucket else 0,
                    wall / len(wave),
                    wave_no,
                )
                for b in wave
            ]
            catalog.write_table(
                spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA),
                index_root,
                LINEAGE_TABLE,
                mode="append",
            )
            waves_run += 1
            if fail_after_waves is not None and waves_run >= fail_after_waves:
                raise RuntimeError(f"simulated crash after wave {waves_run}")
        lineage = catalog.read_table(spark, index_root, LINEAGE_TABLE)
        agg = lineage.filter(F.col("status") == "committed").agg(
            F.sum("docs").alias("docs"),
            F.sum("postings").alias("postings"),
            F.countDistinct("bucket").alias("buckets_done"),
        ).collect()[0]
        return {
            "docs": int(agg["docs"] or 0),
            "postings": int(agg["postings"] or 0),
            "buckets_done": int(agg["buckets_done"] or 0),
            "waves_run": waves_run,
            "n_docs": n_docs,
            "avgdl": avgdl,
        }
    finally:
        toks.unpersist()


def load_index(spark: SparkSession, index_root: str) -> tuple[DataFrame, dict]:
    """Read the persistent index back: (postings_df, stats)."""
    postings = catalog.read_table(spark, index_root, POSTINGS_TABLE)
    srow = catalog.read_table(spark, index_root, STATS_TABLE).collect()[0]
    return postings, {
        "n_docs": srow["n_docs"],
        "avgdl": srow["avgdl"],
        "total_terms": srow["total_terms"],
    }
