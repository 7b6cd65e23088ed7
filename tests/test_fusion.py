"""Rank fusion (query/fusion.py): hand-checked RRF / CombSUM / CombMNZ
examples plus the driver gates replayed against the DuckDB twins."""

import duckdb
import pytest

import __spark_entry__ as E
from pisa_spark.query.fusion import combsum_fuse, rrf_fuse


def _run(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long, score double"
    )


def test_rrf_hand_example(spark):
    a = _run(spark, [(0, 1, 10, 5.0), (0, 2, 11, 4.0)])
    b = _run(spark, [(0, 1, 11, 9.0), (0, 2, 12, 1.0)])
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in rrf_fuse([a, b], k=3).collect()
    }
    assert got[11][0] == 1 and abs(got[11][1] - (1 / 62 + 1 / 61)) < 1e-12
    assert got[10][0] == 2 and abs(got[10][1] - 1 / 61) < 1e-12
    assert got[12][0] == 3 and abs(got[12][1] - 1 / 62) < 1e-12


def test_rrf_weights_and_depth(spark):
    a = _run(spark, [(0, 1, 10, 5.0), (0, 2, 11, 4.0)])
    b = _run(spark, [(0, 1, 11, 9.0)])
    got = {
        r["doc_id"]: r["score"]
        for r in rrf_fuse([a, b], k=3, depth=1, weights=[2.0, 1.0]).collect()
    }
    # depth=1 drops a's rank-2 row entirely; weights scale per run
    assert set(got) == {10, 11}
    assert abs(got[10] - 2 / 61) < 1e-12
    assert abs(got[11] - 1 / 61) < 1e-12
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_combsum_and_mnz_hand_example(spark):
    a = _run(spark, [(0, 1, 10, 5.0), (0, 2, 11, 4.0)])
    b = _run(spark, [(0, 1, 11, 9.0), (0, 2, 12, 1.0)])
    # min-max norms: a -> {10: 1, 11: 0}; b -> {11: 1, 12: 0}
    s = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in combsum_fuse([a, b], k=3).collect()
    }
    assert s[10] == (1, 1.0) and s[11] == (2, 1.0) and s[12] == (3, 0.0)
    m = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in combsum_fuse([a, b], k=3, mnz=True).collect()
    }
    # MNZ multiplies by the number of runs retrieving the doc
    assert m[11] == (1, 2.0) and m[10] == (2, 1.0) and m[12] == (3, 0.0)


def test_combsum_constant_run_normalizes_to_zero(spark):
    a = _run(spark, [(0, 1, 10, 3.0), (0, 2, 11, 3.0)])
    got = {r["doc_id"]: r["score"] for r in combsum_fuse([a], k=2).collect()}
    assert got == {10: 0.0, 11: 0.0}


def test_fusion_gates_match_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for name in ("fusion_rrf_topk", "fusion_combmnz_topk"):
        got = E.queries()[name](spark, sf_dir).toPandas()
        want = con.execute(E.oracle_sql()[name]).df()
        key = ["query_id", "rank"]
        got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(key).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), name
        for c in got.columns:
            assert got[c].astype(float).tolist() == pytest.approx(
                want[c].astype(float).tolist(), abs=1e-9
            ), (name, c)
