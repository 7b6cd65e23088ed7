"""Table catalog — the single swap point between the parquet-directory
stand-in used in this sandbox and a real Iceberg catalog.

Every index artifact goes through these four functions; nothing else in
the engine touches storage paths. With an Iceberg runtime on the
cluster, `write_table`/`read_table` become
``df.writeTo(name).append()`` / ``spark.table(name)`` and commits are
Iceberg snapshot commits; the layout contract (partition column,
atomic per-partition visibility) is identical.

Atomicity in the stand-in: Spark's parquet committer makes each
``write`` all-or-nothing per output directory (job-level _SUCCESS);
per-bucket dynamic partition overwrite gives idempotent re-writes of a
single bucket, which the resumable build (lineage.py) relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def write_table(
    df: DataFrame,
    root: str,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        # dynamic overwrite: only partitions present in df are replaced
        w = w.option("partitionOverwriteMode", "dynamic").partitionBy(*partition_by)
    w.parquet(table_path(root, name))


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(root, name))


def table_exists(root: str, name: str) -> bool:
    p = table_path(root, name)
    return os.path.isdir(p) and any(
        not f.startswith(("_", ".")) for f in os.listdir(p)
    )
