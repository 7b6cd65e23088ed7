"""LTR feature extraction: Spark feature vectors vs an independent
pure-Python witness (Counter-based), and candidate-set identity with
the production BM25 top-k. The DuckDB gate (`ltr_features`) replays
the same plan at corpus scale."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from pisa_spark.index.build import (
    BM25_B,
    BM25_K1,
    term_document_frequency,
    term_frequencies,
)
from pisa_spark.query.bm25 import bm25_topk_dataframe
from pisa_spark.query.ltr import FEATURE_COLUMNS, ltr_features

ROWS = [
    (0, "data join data scan merge"),
    (1, "the the the the the join the the"),
    (2, "spark query scan window data"),
    (3, "solo"),
    (4, "data data data join window query table scan"),
    (5, "join scan join scan data the"),
]
QUERIES = [(0, ["data", "join"]), (1, ["the"]), (2, ["spark", "query", "scan"])]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks)
    tf_full = tf.join(term_document_frequency(tf), "term")
    stats = toks.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in QUERIES for t in terms],
        "query_id int, term string",
    )
    return tf_full, qdf, int(stats[0]), float(stats[1])


def _witness():
    """Independent dict/Counter computation of every feature."""
    tok = {d: t.split(" ") for d, t in ROWS}
    n_docs = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n_docs
    dfc = collections.Counter()
    for ts in tok.values():
        dfc.update(set(ts))
    feats = {}
    for qid, terms in QUERIES:
        q = sorted(set(terms))
        for d, ts in tok.items():
            c = collections.Counter(ts)
            hit = [t for t in q if c[t] > 0]
            if not hit:
                continue
            score = 0.0
            idf_sum = 0.0
            for t in hit:
                idf = math.log((n_docs - dfc[t] + 0.5) / (dfc[t] + 0.5))
                denom = c[t] + BM25_K1 * (
                    1 - BM25_B + BM25_B * len(ts) / avgdl
                )
                score += idf * c[t] * (BM25_K1 + 1) / denom
                idf_sum += idf
            feats[(qid, d)] = dict(
                score=score,
                matched=len(hit),
                n_terms=len(q),
                doc_len=len(ts),
                sum_tf=sum(c[t] for t in hit),
                max_tf=max(c[t] for t in hit),
                min_df=min(dfc[t] for t in hit),
                max_df=max(dfc[t] for t in hit),
                idf_sum=idf_sum,
            )
    return feats


def test_features_match_witness(corpus):
    tf_full, qdf, n_docs, avgdl = corpus
    out = ltr_features(tf_full, qdf, n_docs, avgdl, k=10).collect()
    expected = _witness()
    assert {(r["query_id"], r["doc_id"]) for r in out} == set(expected)
    for r in out:
        w = expected[(r["query_id"], r["doc_id"])]
        assert r["score"] == pytest.approx(w["score"], abs=1e-9)
        assert r["idf_sum"] == pytest.approx(w["idf_sum"], abs=1e-9)
        for col in (
            "matched", "n_terms", "doc_len", "sum_tf",
            "max_tf", "min_df", "max_df",
        ):
            assert r[col] == w[col], (r["query_id"], r["doc_id"], col)


def test_candidates_are_the_bm25_topk(corpus):
    """The candidate policy IS the production ranker: (query, rank,
    doc, score) must be identical to bm25_topk_dataframe."""
    tf_full, qdf, n_docs, avgdl = corpus
    ltr = ltr_features(tf_full, qdf, n_docs, avgdl, k=3)
    ref = bm25_topk_dataframe(tf_full, qdf, n_docs, avgdl, k=3)
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in ltr.collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in ref.collect()
    )
    assert a == b


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("ltr_engine") / "idx")
    return SearchEngine.build(
        spark, "/root/testdata/sf0.001", root, n_buckets=8, wave_size=8
    )


def test_index_served_matches_relational(spark, eng):
    """extract_features (compressed-index decode, metadata df) must be
    row-identical to ltr_features over the corpus tf relation."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pisa_spark.corpus import tokens_col
    from pisa_spark.index.build import term_document_frequency

    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks)
    tf_full = tf.join(term_document_frequency(tf), "term")
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "join"), (1, "the"), (2, "spark"), (2, "query")],
        "query_id int, term string",
    )
    rel = ltr_features(
        tf_full, qdf, eng.stats["n_docs"], eng.stats["avgdl"], k=10
    )
    idx = eng.extract_features(
        [
            {"query_id": 0, "terms": ["data", "join"]},
            {"query_id": 1, "terms": ["the"]},
            {"query_id": 2, "terms": ["spark", "query"]},
        ],
        k=10,
    )

    def norm(df):
        return sorted(
            (
                r["query_id"], r["rank"], r["doc_id"],
                round(r["score"], 9), r["matched"], r["n_terms"],
                r["doc_len"], r["sum_tf"], r["max_tf"], r["min_df"],
                r["max_df"], round(r["idf_sum"], 9),
            )
            for r in df.collect()
        )

    assert norm(idx) == norm(rel)


def test_term_vectors_round_trip(spark, eng):
    """term_vectors (block-range pruned decode + metadata df) must
    equal the tokenizer-derived relation for the requested docs."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    from pisa_spark.corpus import tokens_col
    from pisa_spark.index.build import term_document_frequency

    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks)
    want = {
        (r["doc_id"], r["term"]): (r["tf"], r["doc_len"], r["df"])
        for r in tf.join(term_document_frequency(tf), "term")
        .filter(F.col("doc_id").isin([7, 99]))
        .collect()
    }
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["doc_len"], r["df"])
        for r in eng.term_vectors([7, 99]).collect()
    }
    assert got == want
    # with_df=False drops the metadata join but keeps the vector
    slim = eng.term_vectors([7], with_df=False)
    assert slim.columns == ["doc_id", "term", "tf", "doc_len"]
    assert {r["term"] for r in slim.collect()} == {
        t for d, t in want if d == 7
    }
    with pytest.raises(ValueError):
        eng.term_vectors([])


def test_facade_refuses_unsupported(eng):
    with pytest.raises(ValueError):
        eng.extract_features(["data -spam"])
    with pytest.raises(ValueError):
        eng.extract_features(["+data join"])


def test_schema_and_k(corpus):
    tf_full, qdf, n_docs, avgdl = corpus
    out = ltr_features(tf_full, qdf, n_docs, avgdl, k=2)
    assert out.columns == FEATURE_COLUMNS
    per_q = collections.Counter(r["query_id"] for r in out.collect())
    assert all(v <= 2 for v in per_q.values())
