"""Pre-retrieval QPP (query/qpp.py): closed-form witness, absent-term
conventions, and the driver gate replayed against the DuckDB twin."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import term_frequencies
from pisa_spark.query.qpp import qpp_predictors, qpp_witness


def _fixture(spark):
    rows = [
        (1, "data data join"),
        (2, "data scan"),
        (3, "join scan scan scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tok = {d: t.split() for d, t in rows}
    return term_frequencies(toks), tok


def test_matches_pure_python_witness(spark):
    tf, tok = _fixture(spark)
    queries = [
        {"query_id": 0, "terms": ["data", "join"]},
        {"query_id": 1, "terms": ["scan"]},
        {"query_id": 2, "terms": ["data", "nosuchterm"]},
        {"query_id": 3, "terms": ["allabsent"]},
    ]
    n_docs = len(tok)
    total_cf = sum(len(v) for v in tok.values())
    got = {
        r["query_id"]: r.asDict()
        for r in qpp_predictors(tf, queries, n_docs, total_cf).collect()
    }
    want = qpp_witness(tok, queries)
    assert set(got) == set(want) == {0, 1, 2}  # all-absent query: no row
    for qid, w in want.items():
        g = got[qid]
        for key, val in w.items():
            assert g[key] == pytest.approx(val, abs=1e-12), (qid, key)


def test_hand_computed_values(spark):
    tf, tok = _fixture(spark)
    # corpus: N=3 docs, total_cf=9; 'scan' df=2 cf=4
    out = qpp_predictors(
        tf, [{"query_id": 1, "terms": ["scan"]}], 3, 9
    ).collect()[0]
    idf = math.log(3 / 2)
    assert out["avg_idf"] == pytest.approx(idf)
    assert out["max_idf"] == pytest.approx(idf)
    assert out["sum_scq"] == pytest.approx(
        (1 + math.log(4)) * math.log(1 + 3 / 2)
    )
    assert out["avg_ictf"] == pytest.approx(math.log2(9 / 4), abs=1e-12)
    # single present term: scs = log2(1/1) + avg_ictf = avg_ictf
    assert out["scs"] == pytest.approx(out["avg_ictf"], abs=1e-12)


def test_empty_query_set_raises(spark):
    tf, _ = _fixture(spark)
    with pytest.raises(ValueError):
        qpp_predictors(tf, [], 3, 9)


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = E.queries()["qpp_predictors"](spark, sf_dir).toPandas()
    want = con.execute(E.oracle_sql()["qpp_predictors"]).df()
    got = got[sorted(got.columns)].sort_values("query_id").reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values("query_id").reset_index(drop=True)
    assert len(got) == len(want) == 4  # query 4 (all absent) emits no row
    for c in got.columns:
        assert got[c].astype(float).tolist() == pytest.approx(
            want[c].astype(float).tolist(), abs=1e-9
        ), c
