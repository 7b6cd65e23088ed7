"""trec_eval harness (operators/treceval.py): hand-computed golden
values on a tiny run, then the full gate vs its DuckDB oracle twin."""

import duckdb
import pytest

import __spark_entry__ as E
from pisa_spark.operators.treceval import trec_eval


def _collect(df):
    return {
        (r["query_id"], r["metric"]): r["value"] for r in df.collect()
    }


@pytest.fixture(scope="module")
def tiny(spark):
    # query 1: rel docs {10:2, 11:1, 12:1}; run ranks 10@1, 99@2, 11@3
    # query 2: no relevant judgments -> excluded everywhere
    run = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 99), (1, 3, 11), (2, 1, 50)],
        "query_id int, rank int, doc_id int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (1, 12, 1), (1, 99, 0), (2, 50, 0)],
        "query_id int, doc_id int, rel int",
    )
    return run, qrels


def test_hand_computed_metrics(tiny):
    run, qrels = tiny
    got = _collect(trec_eval(run, qrels, k=10))
    # AP = (1/1 + 2/3) / 3 relevant = 0.5556
    assert got[(1, "ap")] == pytest.approx(0.5556)
    # DCG = 3/log2(2) + 0 + 1/log2(4) = 3.5
    # IDCG = 3/log2(2) + 1/log2(3) + 1/log2(4) = 4.1309
    assert got[(1, "ndcg")] == pytest.approx(round(3.5 / (3 + 1 / 1.5849625007211562 + 0.5), 4))
    assert got[(1, "p_at_k")] == pytest.approx(0.2)  # 2 hits / 10
    assert got[(1, "rr")] == pytest.approx(1.0)
    assert got[(1, "recall")] == pytest.approx(0.6667)  # 2 / 3
    # query 2 has no rel>0 judgment: absent from rows and the mean
    assert not any(q == 2 for q, _ in got)
    assert got[(-1, "ap")] == pytest.approx(0.5556)  # mean over query 1


def test_unjudged_run_docs_gain_zero(tiny):
    run, qrels = tiny
    # doc 99 (judged 0) and absent judgments behave identically
    got_with = _collect(trec_eval(run, qrels, k=10))
    got_wo = _collect(
        trec_eval(run, qrels.filter("doc_id <> 99"), k=10)
    )
    assert got_with == got_wo


def test_rank_cutoff(tiny):
    run, qrels = tiny
    got = _collect(trec_eval(run, qrels, k=2))
    # only rank 1 hit survives the cut: AP = 1/3, hits = 1
    assert got[(1, "ap")] == pytest.approx(0.3333)
    assert got[(1, "p_at_k")] == pytest.approx(0.5)
    assert got[(1, "recall")] == pytest.approx(0.3333)


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    got = (
        E.queries()["trec_eval_metrics"](spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "metric"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(E.oracle_sql()["trec_eval_metrics"])
        .df()
        .sort_values(["query_id", "metric"])
        .reset_index(drop=True)
    )
    assert list(got.query_id) == list(want.query_id)
    assert list(got.metric) == list(want.metric)
    assert list(got.value) == pytest.approx(list(want.value))
