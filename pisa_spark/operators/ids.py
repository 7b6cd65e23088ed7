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
) -> DataFrame:
    """Append ``out_col`` = 0-based dense rank of the row in the total
    order of ``order_cols`` (which must uniquely identify rows — ties
    would make the rank, and therefore the ids, ill-defined).

    The range-partitioned sorted intermediate is persisted
    (MEMORY_AND_DISK) because phases 2 and 3 must observe the same
    physical partition layout; the RESULT is then localCheckpointed
    (eager) and the intermediate unpersisted before returning, so one
    call pins exactly one copy — the id'd output — and the Context
    Cleaner releases it on GC. At cluster scale the equivalent is
    writing the sorted snapshot to the catalog once and assigning ids
    off that immutable copy (localCheckpoint is not resilient to
    executor loss).
    """
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
