"""MMR diversification (query/diversify.py).

Contracts: first pick is the relevance argmax; picks are distinct and
capped at min(k, candidates); a near-duplicate of an already-picked doc
is demoted below a fresh doc at balanced weight; div10=0 degenerates to
pure relevance order; the whole selection is run-to-run deterministic
(pure int64 objective after the floors)."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.query.diversify import candidate_tokens, mmr_rerank


def _cands(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, doc_id long, score double"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


FIX_DOCS = [
    (1, "spark shuffle join exchange plan"),
    (2, "spark shuffle join exchange plan"),          # exact dup of 1
    (3, "window aggregate partition stream state"),
    (4, "codec varint block posting compress"),
    (5, "spark shuffle join exchange optimizer"),     # near-dup of 1
]
FIX_CANDS = [
    (0, 1, 9.0),
    (0, 2, 8.9),   # would be rank 2 by relevance, but duplicates doc 1
    (0, 5, 8.5),   # near-dup of doc 1
    (0, 3, 6.0),
    (0, 4, 5.0),
]


def test_first_pick_is_relevance_argmax_and_dup_demoted(spark):
    out = mmr_rerank(
        _cands(spark, FIX_CANDS),
        candidate_tokens(_docs(spark, FIX_DOCS)),
        k=5,
        div10=5,
    ).toPandas().sort_values("rank")
    order = out.doc_id.tolist()
    assert order[0] == 1                       # relevance argmax first
    assert set(order) == {1, 2, 3, 4, 5}       # distinct, all 5 ranked
    # the exact duplicate (doc 2, sim 10^6) must fall behind BOTH
    # fresh-content docs despite its higher relevance
    assert order.index(2) > order.index(3)
    assert order.index(2) > order.index(4)


def test_div0_degenerates_to_relevance_order(spark):
    out = mmr_rerank(
        _cands(spark, FIX_CANDS),
        candidate_tokens(_docs(spark, FIX_DOCS)),
        k=5,
        div10=0,
    ).toPandas().sort_values("rank")
    assert out.doc_id.tolist() == [1, 2, 5, 3, 4]


def test_negative_scores_keep_direction(spark):
    # BM25 head-term scores are negative; min-max must keep the LEAST
    # negative doc as the relevance argmax
    cands = [(7, 1, -1.0), (7, 3, -2.0), (7, 4, -3.0)]
    out = mmr_rerank(
        _cands(spark, cands),
        candidate_tokens(_docs(spark, FIX_DOCS)),
        k=1,
        div10=5,
    ).toPandas()
    assert out.doc_id.tolist() == [1]
    assert out.objective.tolist() == [5000000]  # (10-5) * 10^6


def test_k_caps_and_determinism(spark):
    cands = _cands(spark, FIX_CANDS)
    toks = candidate_tokens(_docs(spark, FIX_DOCS))
    a = mmr_rerank(cands, toks, k=3, div10=5).toPandas()
    b = mmr_rerank(cands, toks, k=3, div10=5).toPandas()
    assert len(a) == 3
    assert a.sort_values("rank").values.tolist() == (
        b.sort_values("rank").values.tolist()
    )
    # more k than candidates: stops at the candidate count
    single = [(9, 4, 2.0)]
    out = mmr_rerank(_cands(spark, single), toks, k=10, div10=5).toPandas()
    assert len(out) == 1
    assert out.objective.tolist() == [5000000]  # all-equal guard rn=10^6


def test_div10_validation(spark):
    with pytest.raises(ValueError):
        mmr_rerank(
            _cands(spark, FIX_CANDS),
            candidate_tokens(_docs(spark, FIX_DOCS)),
            div10=11,
        )


def test_facade_search_diverse_parity(spark, sf_dir, tmp_path_factory):
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("diverse") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=8).with_corpus(
        sf_dir
    )
    out = eng.search_diverse("data join", k=5, candidates=15).toPandas()
    cands = eng.search("data join", k=15)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = mmr_rerank(
        cands, candidate_tokens(docs), k=5, div10=5
    ).toPandas()
    assert out.sort_values("rank").values.tolist() == (
        direct.sort_values("rank").values.tolist()
    )
    # first pick is the plain relevance winner
    top1 = eng.search("data join", k=1).collect()[0]["doc_id"]
    assert out.sort_values("rank").doc_id.iloc[0] == top1
