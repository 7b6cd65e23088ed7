"""MaxP passage retrieval (query/passages.py): windowing semantics,
hand-checked best-passage selection, whole-doc equivalence when the
window covers the document, and the driver gate vs the DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from pisa_spark.corpus import tokens_col
from pisa_spark.query.passages import bm25_maxp_topk, passage_relation


def _toks(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))


def test_passage_windowing(spark):
    toks = _toks(spark, [(1, "a b c d e f g")])  # 7 tokens, plen 3
    ptf, plen = passage_relation(toks, passage_len=3)
    lens = {(r["doc_id"], r["pid"]): r["p_len"] for r in plen.collect()}
    assert lens == {(1, 0): 3, (1, 1): 3, (1, 2): 1}
    tf = {
        (r["pid"], r["term"]): r["tf"] for r in ptf.collect()
    }
    assert tf[(0, "a")] == 1 and tf[(2, "g")] == 1
    with pytest.raises(ValueError):
        passage_relation(toks, passage_len=0)


def test_best_passage_and_tie_rule(spark):
    # doc 1: 'hit' concentrated in passage 1; doc 2: spread thin
    toks = _toks(
        spark,
        [
            (1, "x x x x hit hit hit x"),
            (2, "hit x x x x x x hit"),
            (3, "x x x x x x x x"),
            (4, "x x x x x x x x"),
            (5, "x x x x x x x x"),
        ],
    )
    out = bm25_maxp_topk(
        toks, [{"query_id": 0, "terms": ["hit"]}], k=10, passage_len=4
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    assert set(rows) == {1, 2}
    # concentration wins: tf=2 in one window beats tf=1 windows
    assert rows[1]["rank"] == 1 and rows[1]["best_pid"] == 1
    # doc 2's two windows tie at tf=1, p_len=4 -> earliest pid wins
    assert rows[2]["best_pid"] == 0
    assert rows[1]["score"] > rows[2]["score"]


def test_window_covering_doc_equals_whole_doc_bm25(spark, sf_dir):
    """passage_len >= max doc length -> passage stats ARE document
    stats, so MaxP must equal plain document BM25 rank-for-rank."""
    from pisa_spark.index.build import term_document_frequency, term_frequencies
    from pisa_spark.query.bm25 import bm25_topk_dataframe

    toks = E._tokens(spark, sf_dir)
    max_len = toks.agg(F.max("doc_len")).collect()[0][0]
    queries = [{"query_id": 0, "terms": ["data", "join"]}]
    got = bm25_maxp_topk(toks, queries, k=10, passage_len=int(max_len)).collect()
    tf = term_frequencies(toks)
    n_docs, avgdl = E._stats(spark, sf_dir)
    qdf = spark.createDataFrame([(0, "data"), (0, "join")], "query_id int, term string")
    want = bm25_topk_dataframe(
        tf.join(term_document_frequency(tf), "term"), qdf, n_docs, avgdl, k=10
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (r["rank"], r["doc_id"]) for r in sorted(want, key=lambda r: r["rank"])
    ]
    # every best passage is the whole doc
    assert all(r["best_pid"] == 0 for r in got)


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = E.queries()["bm25_maxp_topk"](spark, sf_dir).toPandas()
    want = con.execute(E.oracle_sql()["bm25_maxp_topk"]).df()
    key = ["query_id", "rank"]
    got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert got[c].astype(float).tolist() == pytest.approx(
            want[c].astype(float).tolist(), abs=1e-9
        ), c
