"""Sequence packing for LLM training data (concat-and-split).

The standard packing used by large-scale pretraining pipelines: the
corpus concatenates into one token stream in a deterministic document
order, and training sequences are consecutive fixed-length windows of
that stream. The per-document artifact is WHERE each document landed:
its global token offset and which sequence ids it spans — the index a
data loader (or an attrition/contamination audit) needs to map a
training sequence back to documents.

The only global computation is an exclusive PREFIX SUM of document
lengths in the total doc_id order. ``sum() OVER (ORDER BY doc_id)``
plans as a single-partition window in Spark — the 10^12-doc front-door
problem — so this uses the same two-phase rendering as dense-id
assignment (operators/ids.py, zipWithIndex-style):

1. range-exchange + in-partition sort on doc_id (partitions hold
   contiguous ranges, sorted);
2. one tiny job sums lengths per physical partition (|partitions|
   rows to the driver) and a driver prefix sum gives each partition's
   global start offset;
3. a narrow mapInPandas appends offset = partition_offset +
   np.cumsum(local lengths, exclusive) — vectorized, no shuffle.

Determinism/invariance contract: offsets equal the exclusive prefix
sum in the total doc_id order, independent of partition count or
boundaries (same argument as global_positions; asserted across
parallelism in tests/test_packing.py). Documents longer than
``seq_len`` simply span multiple sequences — the concat-split
contract never drops or pads mid-stream (padding happens only in the
final short sequence, reported via ``tail_tokens``).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def packed_offsets(
    docs: DataFrame,
    length_col: str = "n_tokens",
    n_partitions: int | None = None,
) -> DataFrame:
    """Append ``offset`` = exclusive prefix sum of ``length_col`` in
    total doc_id order — the scalable two-phase prefix sum."""
    spark = docs.sparkSession
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    arranged = (
        docs.repartitionByRange(n_partitions, "doc_id")
        .sortWithinPartitions("doc_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sums = {
        r["pid"]: int(r["s"])
        for r in arranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum(length_col).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(sums) + 1 if sums else 0):
        offsets[pid] = acc
        acc += sums.get(pid, 0)
    out_schema = StructType(
        list(docs.schema.fields) + [StructField("offset", LongType(), False)]
    )

    def add_offsets(pdf_iter):
        base = None
        seen = 0
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            lens = pdf[length_col].to_numpy(np.int64)
            pdf = pdf.drop(columns="__pid")
            pdf["offset"] = base + seen + np.concatenate(
                ([0], np.cumsum(lens)[:-1])
            )
            seen += int(lens.sum())
            yield pdf

    out = arranged.withColumn("__pid", F.spark_partition_id()).mapInPandas(
        add_offsets, schema=out_schema
    )
    out = out.localCheckpoint(eager=True)
    arranged.unpersist()
    return out


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    length_col: str = "n_tokens",
    n_partitions: int | None = None,
) -> DataFrame:
    """Per-document packing report under the concat-split contract:
    (doc_id, <length_col>, offset, first_seq, last_seq, n_seqs) —
    first/last sequence ids the doc's tokens land in and how many
    sequences it spans. Zero-length documents occupy no tokens and
    report the sequence their offset points at (first_seq ==
    last_seq, n_seqs = 0)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be >= 1")
    with_off = packed_offsets(
        docs, length_col=length_col, n_partitions=n_partitions
    )
    L = F.lit(int(seq_len))
    first = F.floor(F.col("offset") / L).cast("long")
    last = F.floor(
        (F.col("offset") + F.greatest(F.col(length_col) - 1, F.lit(0))) / L
    ).cast("long")
    n_seqs = F.when(F.col(length_col) == 0, F.lit(0).cast("long")).otherwise(
        last - first + 1
    )
    return with_off.select(
        "doc_id",
        F.col(length_col).cast("long").alias(length_col),
        "offset",
        first.alias("first_seq"),
        F.when(F.col(length_col) == 0, first)
        .otherwise(last)
        .cast("long")
        .alias("last_seq"),
        n_seqs.alias("n_seqs"),
    )


def packing_stats(
    docs: DataFrame, seq_len: int, length_col: str = "n_tokens"
) -> DataFrame:
    """Corpus-level packing summary: total tokens, number of full
    sequences, tail padding, and how many documents straddle a
    sequence boundary (the fraction a loader must mask across
    boundaries). One aggregate over the per-doc report."""
    rep = pack_sequences(docs, seq_len, length_col=length_col)
    L = int(seq_len)
    return rep.agg(
        F.sum(length_col).cast("long").alias("total_tokens"),
        F.ceil(F.sum(length_col) / F.lit(L)).cast("long").alias("n_sequences"),
        (
            F.ceil(F.sum(length_col) / F.lit(L)) * F.lit(L)
            - F.sum(length_col)
        ).cast("long").alias("tail_padding"),
        F.sum((F.col("n_seqs") > 1).cast("long")).alias("docs_straddling"),
    )
