"""Hybrid dense+sparse retrieval (query/hybrid.py + engine facade):
composition identity, weight semantics, LSH path, deletes, refusals."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.engine import SearchEngine
from pisa_spark.index.build import term_document_frequency, term_frequencies
from pisa_spark.query.bm25 import bm25_topk_dataframe
from pisa_spark.query.fusion import rrf_fuse
from pisa_spark.query.hybrid import dense_run_as_docs, hybrid_rrf_topk
from pisa_spark.similarity.ann import cosine_topk_bruteforce

DEPTH = 15


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    tf0 = term_frequencies(toks)
    tf = tf0.join(term_document_frequency(tf0), "term").cache()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    return tf, emb, int(row[0]), float(row[1])


@pytest.fixture(scope="module")
def qframes(spark, corpus):
    _, emb, _, _ = corpus
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "join"), (1, "the")], "query_id int, term string"
    )
    qv = emb.filter(F.col("vec_id").isin([0, 1])).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return qdf, qv


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in df.collect()
    )


def test_hybrid_is_the_composition(corpus, qframes):
    tf, emb, n_docs, avgdl = corpus
    qdf, qv = qframes
    fused = hybrid_rrf_topk(
        tf, qdf, qv, emb, n_docs, avgdl, k=10, depth=DEPTH
    )
    sparse = bm25_topk_dataframe(tf, qdf, n_docs, avgdl, k=DEPTH)
    dense = dense_run_as_docs(cosine_topk_bruteforce(emb, qv, k=DEPTH))
    manual = rrf_fuse([sparse, dense], k=10, depth=DEPTH)
    assert _rows(fused) == _rows(manual)


def test_zero_dense_weight_recovers_sparse_order(corpus, qframes):
    tf, emb, n_docs, avgdl = corpus
    qdf, qv = qframes
    fused = hybrid_rrf_topk(
        tf, qdf, qv, emb, n_docs, avgdl, k=10, depth=DEPTH,
        weights=[1.0, 0.0],
    )
    sparse = bm25_topk_dataframe(tf, qdf, n_docs, avgdl, k=10)
    assert _rows(fused) == _rows(
        sparse.select("query_id", "rank", "doc_id", "score")
    )


def test_doc_in_both_runs_outranks_single_run_peer(corpus, qframes):
    """At equal per-run rank r, a doc present in both runs must beat a
    doc present in only one (RRF monotonicity)."""
    tf, emb, n_docs, avgdl = corpus
    qdf, qv = qframes
    sparse = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25_topk_dataframe(
            tf, qdf, n_docs, avgdl, k=DEPTH
        ).collect()
    }
    dense = {
        (r["query_id"], r["vec_id"]): r["rank"]
        for r in cosine_topk_bruteforce(emb, qv, k=DEPTH).collect()
    }
    fused = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in hybrid_rrf_topk(
            tf, qdf, qv, emb, n_docs, avgdl, k=500, depth=DEPTH
        ).collect()
    }
    for (q, d), s in fused.items():
        exp = 0.0
        if (q, d) in sparse:
            exp += 1.0 / (60.0 + sparse[(q, d)])
        if (q, d) in dense:
            exp += 1.0 / (60.0 + dense[(q, d)])
        assert abs(s - exp) < 1e-12, (q, d)


def test_lsh_dense_path_runs(corpus, qframes):
    tf, emb, n_docs, avgdl = corpus
    qdf, qv = qframes
    out = hybrid_rrf_topk(
        tf, qdf, qv, emb, n_docs, avgdl, k=5, depth=DEPTH,
        dense="lsh", nbits=8, n_tables=2,
    ).collect()
    assert len(out) > 0
    with pytest.raises(ValueError, match="brute.*lsh|'lsh'"):
        hybrid_rrf_topk(
            tf, qdf, qv, emb, n_docs, avgdl, dense="exactish"
        )


def test_engine_facade_and_deletes(spark, sf_dir, tmp_path_factory, corpus):
    tf, emb, n_docs, avgdl = corpus
    root = str(tmp_path_factory.mktemp("hybrid") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=8, wave_size=8
    ).with_embeddings(f"{sf_dir}/embeddings.parquet")
    vec0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    out = eng.search_hybrid(["data join"], [vec0], k=10, depth=DEPTH)
    got = {r["doc_id"]: r["rank"] for r in out.collect()}
    # parity with the relation path for the same query shapes
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "join")], "query_id int, term string"
    )
    qv = spark.createDataFrame(
        [(0, [float(x) for x in vec0])],
        "query_id int, query_vec array<float>",
    )
    want = {
        r["doc_id"]: r["rank"]
        for r in hybrid_rrf_topk(
            tf, qdf, qv, emb, n_docs, avgdl, k=10, depth=DEPTH
        ).collect()
    }
    assert got == want
    # deletes: the top doc disappears from the fused ranking entirely
    top = min(got, key=got.get)
    eng.delete_docs([int(top)], persist=False)
    after = eng.search_hybrid(["data join"], [vec0], k=10, depth=DEPTH)
    assert int(top) not in {r["doc_id"] for r in after.collect()}


def test_engine_refusals(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hybrid_g") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    with pytest.raises(ValueError, match="with_embeddings"):
        eng.search_hybrid(["data"], [[0.0, 1.0]])
    eng.with_embeddings(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="one query vector"):
        eng.search_hybrid(["data", "join"], [[0.0, 1.0]])


def test_explicit_query_ids_align_runs(spark, sf_dir, tmp_path_factory, corpus):
    """Dict queries with explicit query_ids must fuse BOTH runs under
    those ids — positional dense ids would split every query in two."""
    tf, emb, n_docs, avgdl = corpus
    root = str(tmp_path_factory.mktemp("hybrid_ids") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=8, wave_size=8
    ).with_embeddings(f"{sf_dir}/embeddings.parquet")
    vec0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    out7 = eng.search_hybrid(
        [{"query_id": 7, "terms": ["data", "join"]}], [vec0],
        k=10, depth=DEPTH,
    ).collect()
    assert out7 and all(r["query_id"] == 7 for r in out7)
    out0 = eng.search_hybrid(["data join"], [vec0], k=10, depth=DEPTH)
    a = sorted((r["rank"], r["doc_id"]) for r in out7)
    b = sorted((r["rank"], r["doc_id"]) for r in out0.collect())
    assert a == b  # same fused ranking, only the id differs
    with pytest.raises(ValueError, match="duplicate"):
        eng.search_hybrid(
            [{"query_id": 1, "terms": ["data"]},
             {"query_id": 1, "terms": ["join"]}],
            [vec0, vec0],
        )
