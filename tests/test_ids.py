"""Two-phase dense-id assignment (operators/ids.py): ids must equal the
global-sort row_number oracle and be invariant to partition count —
the determinism bar of the reference's dense id space
(/root/reference/src/helpers/Reader.py:62)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pisa_spark.corpus import assign_doc_ids, pages_from_documents
from pisa_spark.operators.ids import global_positions
from pisa_spark.operators.snapshots import interactions_from_events


@pytest.fixture(scope="module")
def pages(spark, sf_dir):
    return pages_from_documents(spark, sf_dir).drop("html").cache()


def _ids(df, order_cols, n_partitions):
    out = global_positions(df, order_cols, "gid", n_partitions=n_partitions)
    key = order_cols[0]
    return {r[key]: r["gid"] for r in out.select(key, "gid").collect()}


def test_matches_global_sort_oracle(pages):
    w = Window.orderBy("url")
    oracle = {
        r["url"]: r["oid"]
        for r in pages.withColumn("oid", F.row_number().over(w) - 1)
        .select("url", "oid")
        .collect()
    }
    assert _ids(pages, ["url"], 8) == oracle


def test_invariant_under_partition_count(pages):
    # same ids whether the range exchange lands on 2, 8, or 17 partitions
    a = _ids(pages, ["url"], 2)
    b = _ids(pages, ["url"], 8)
    c = _ids(pages, ["url"], 17)
    assert a == b == c


def test_assign_doc_ids_dense(pages):
    out = assign_doc_ids(pages)
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == list(range(len(ids)))


def test_interactions_pos_dense_and_ordered(spark, sf_dir):
    inter = interactions_from_events(spark, sf_dir)
    rows = inter.select("ts", "pos").collect()
    assert sorted(r["pos"] for r in rows) == list(range(len(rows)))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    assert all(a["ts"] <= b["ts"] for a, b in zip(by_pos, by_pos[1:]))


def test_snapshot_mode_matches_and_invariant(pages, tmp_path):
    """snapshot=(root, table) mode: identical ids to the in-memory mode
    across parallelism levels, with the intermediate committed through
    the manifest catalog (executor-loss-resilient variant)."""
    base = _ids(pages, ["url"], 8)
    for i, n in enumerate((3, 11)):
        out = global_positions(
            pages, ["url"], "gid", n_partitions=n,
            snapshot=(str(tmp_path), f"snap_{i}"),
        )
        got = {r["url"]: r["gid"] for r in out.select("url", "gid").collect()}
        assert got == base
    # the snapshot was committed through the catalog (manifest present)
    from pisa_spark.sources import catalog

    assert catalog.table_exists(str(tmp_path), "snap_0")
