"""Kill/rerun resumability (SURVEY §5.2 item 4): a crashed build resumes
from committed buckets, produces an identical index, and never
duplicates lineage rows."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.index.build import build_index_dataframes
from pisa_spark.index.lineage import (
    build_index_resumable,
    committed_buckets,
    load_index,
)
from pisa_spark.query.bm25 import bm25_topk_wand
from pisa_spark.sources import catalog
from tests.test_index_build import decode_index


def test_kill_and_resume_identical(spark, sf_dir, tmp_path):
    root_a = str(tmp_path / "idx_crash")
    root_b = str(tmp_path / "idx_clean")

    # crash after 1 of 2 waves
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index_resumable(
            spark, sf_dir, root_a, n_buckets=8, wave_size=4, fail_after_waves=1
        )
    done = committed_buckets(spark, root_a)
    assert len(done) == 4  # first wave committed

    # resume: only pending buckets are built
    summary = build_index_resumable(spark, sf_dir, root_a, n_buckets=8, wave_size=4)
    assert summary["waves_run"] == 1
    assert summary["buckets_done"] == 8

    # clean single-shot build for comparison
    build_index_resumable(spark, sf_dir, root_b, n_buckets=8, wave_size=8)

    pa, stats_a = load_index(spark, root_a)
    pb, _ = load_index(spark, root_b)
    assert decode_index(pa.collect()) == decode_index(pb.collect())

    # no duplicate lineage rows
    lin = catalog.read_table(spark, root_a, "lineage")
    assert lin.count() == lin.select("bucket").distinct().count() == 8
    assert lin.filter(F.col("status") != "committed").count() == 0
    # metrics are populated
    agg = lin.agg(F.sum("docs"), F.sum("postings"), F.sum("bytes_out")).collect()[0]
    assert agg[0] == 500 and agg[1] > 0 and agg[2] > 0


def test_rerun_noop_and_loaded_index_queryable(spark, sf_dir, tmp_path):
    root = str(tmp_path / "idx")
    build_index_resumable(spark, sf_dir, root, n_buckets=8, wave_size=8)
    # rerun: everything committed -> zero waves
    summary = build_index_resumable(spark, sf_dir, root, n_buckets=8, wave_size=8)
    assert summary["waves_run"] == 0

    postings, stats = load_index(spark, root)
    q = [{"query_id": 0, "terms": ["data", "join"], "conjunctive": False}]
    got = bm25_topk_wand(postings, q, stats["n_docs"], stats["avgdl"], k=10).collect()
    # must equal the in-memory build's answer
    mem_postings, _, _, mem_stats = build_index_dataframes(spark, sf_dir, n_buckets=8)
    expect = bm25_topk_wand(
        mem_postings, q, mem_stats["n_docs"], mem_stats["avgdl"], k=10
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))
