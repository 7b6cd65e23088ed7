"""Scalable deterministic dense-id assignment (SURVEY T4).

``row_number() OVER (ORDER BY key)`` plans as a SINGLE-partition sort in
Spark — the whole corpus funnels through one task, which is the front
door of a 10^12-doc build and cannot stand. This module provides the
two-phase ("zipWithIndex-style") equivalent with the same semantic
contract: id = 0-based rank in the total order of the key columns,
identical across runs and parallelism levels (the determinism bar of the
reference's dense max+1 id space, /root/reference/src/helpers/Reader.py:62).

Phase plan:

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` — a range
   exchange totally orders the partitions; every partition holds a
   contiguous key range, sorted. The result is persisted so phases 2-3
   see the identical physical partitioning.
2. One tiny job counts rows per physical partition
   (``spark_partition_id()`` group-by: |partitions| rows to the driver),
   and a prefix sum yields each partition's global start offset.
3. A narrow ``mapInPandas`` pass appends
   ``id = offset[pid] + local_row_index`` — vectorized ``np.arange`` per
   Arrow batch, no shuffle, no Python per-row work.

Invariance argument: ids equal the key's rank in the global total order,
so as long as the key columns are unique per row the assignment does not
depend on partition count or boundaries (asserted by
tests/test_ids.py across parallelism levels).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_positions(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    n_partitions: int | None = None,
    materialize: bool = True,
    snapshot: tuple[str, str] | None = None,
) -> DataFrame:
    """Append ``out_col`` = 0-based dense rank of the row in the total
    order of ``order_cols`` (which must uniquely identify rows — ties
    would make the rank, and therefore the ids, ill-defined).

    The range-partitioned sorted intermediate is persisted
    (MEMORY_AND_DISK) because phases 2 and 3 must observe the same
    physical partition layout; the RESULT is then localCheckpointed
    (eager) and the intermediate unpersisted before returning, so one
    call pins exactly one copy — the id'd output — and the Context
    Cleaner releases it on GC.

    snapshot=(root, table): the EXECUTOR-LOSS-RESILIENT cluster-scale
    mode — see ``global_positions_snapshot`` (this function delegates).
    localCheckpoint blocks are lost with their executor; the snapshot
    mode persists the range-bucketed intermediate via the manifest
    catalog instead, so every downstream stage recomputes from an
    immutable committed copy.
    """
    if snapshot is not None:
        return global_positions_snapshot(
            df, order_cols, out_col, snapshot[0], snapshot[1], n_partitions
        )
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    arranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in arranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def add_ids(pdf_iter):
        # one call per partition; batches arrive in partition sort order
        base = None
        seen = 0
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            n = len(pdf)
            pdf = pdf.drop(columns="__pid")
            pdf[out_col] = np.arange(seen, seen + n, dtype=np.int64) + base
            seen += n
            yield pdf

    out = arranged.withColumn("__pid", F.spark_partition_id()).mapInPandas(
        add_ids, schema=out_schema
    )
    if not materialize:
        # plan-inspection/testing mode: the caller sees the live plan
        # (range exchange + sort + kernel) instead of the checkpoint
        # scan, and owns the persisted intermediate's lifecycle
        return out
    out = out.localCheckpoint(eager=True)
    arranged.unpersist()
    return out


def global_positions_snapshot(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    root: str,
    table: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Executor-loss-resilient variant of ``global_positions``: the
    range-bucketed intermediate is COMMITTED through the manifest
    catalog, then ids are assigned off that immutable copy.

    Same contract (out_col = rank in the order_cols total order,
    invariant to runs and parallelism), different durability: a lost
    executor recomputes any downstream partition from the committed
    snapshot files, whereas a lost localCheckpoint block kills the
    lineage-truncated plan. One extra write+read of the corpus — the
    price of restartability, paid once per build.

    The bucket id is materialized INTO the snapshot (``__bucket`` =
    range-partition ordinal), so phase 2/3 never depend on the physical
    layout of the re-read: counts aggregate the column, and phase 3
    re-clusters by the column. Rows of one bucket may arrive in any
    file split — the kernel keeps a running index per bucket, and
    within-bucket order is re-established by an explicit local sort.
    """
    if "__bucket" in df.columns:
        raise ValueError(
            "global_positions_snapshot reserves the '__bucket' column;"
            " rename it in the input first"
        )
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = max(spark.sparkContext.defaultParallelism, 2)
    from pisa_spark.sources import catalog

    bucketed = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__bucket", F.spark_partition_id())
    )
    catalog.write_table(bucketed, root, table)
    snap = catalog.read_table(spark, root, table)
    counts = {
        r["__bucket"]: r["cnt"]
        for r in snap.groupBy("__bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in range(max(counts) + 1 if counts else 0):
        offsets[b] = acc
        acc += counts.get(b, 0)

    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), False)]
    )

    def add_ids(pdf_iter):
        # sortWithinPartitions delivers the partition's rows in key
        # order; buckets are key ranges, so each bucket is a contiguous
        # run (possibly split across Arrow batches — the ``seen``
        # counters carry the within-bucket index over)
        seen: dict[int, int] = {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            bvals = pdf["__bucket"].to_numpy()
            out = pdf.drop(columns="__bucket")
            ids = np.empty(len(out), dtype=np.int64)
            start = 0
            for b, cnt in zip(*_run_lengths(bvals)):
                base = offsets[int(b)] + seen.get(int(b), 0)
                ids[start : start + cnt] = np.arange(base, base + cnt)
                seen[int(b)] = seen.get(int(b), 0) + cnt
                start += cnt
            out[out_col] = ids
            yield out

    return (
        snap.repartition(n_partitions, "__bucket")
        .sortWithinPartitions(*order_cols)
        .mapInPandas(add_ids, schema=out_schema)
    )


def _run_lengths(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(values, lengths) of consecutive runs in ``a``."""
    if a.size == 0:
        return np.empty(0, a.dtype), np.empty(0, np.int64)
    change = np.flatnonzero(a[1:] != a[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [a.size]))
    return a[starts], ends - starts
