"""Recursive graph bisection reordering (index/bisection.py — PISA
recursive_graph_bisection parity).

Contracts:
- the NumPy kernel separates disjoint vocabulary cliques, is
  deterministic, and handles degenerate inputs;
- the distributed mapping is a permutation, invariant to partition
  count;
- on a vocabulary-clustered corpus with scattered ids, BP shrinks the
  compressed doc-id payload vs the id-order baseline WITHOUT any
  metadata key (the capability reorder_by_key cannot offer);
- serving over a BP-reordered index is score-identical;
- the persistent build path (reorder_by="bisection") round-trips.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.index.bisection import bp_order, reorder_by_bisection
from pisa_spark.index.reorder import apply_reorder, payload_bytes, restore_ids
from tests.test_reorder import _build, _clustered_docs, _docs, _tokens

SF = "/root/testdata/sf0.001"


def _csr(term_lists):
    lens = np.array([len(t) for t in term_lists], dtype=np.int64)
    indptr = np.zeros(len(term_lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    flat = (
        np.concatenate([np.asarray(t, dtype=np.int64) for t in term_lists])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    return indptr, flat


def test_kernel_separates_disjoint_cliques():
    # docs alternate between two disjoint vocabularies; BP's first
    # level must untangle them (any interleaving is strictly worse
    # under the cost model)
    a, b = [0, 1, 2], [3, 4, 5]
    terms = [a if i % 2 == 0 else b for i in range(16)]
    indptr, flat = _csr(terms)
    order = bp_order(indptr, flat, iters=8, leaf=2)
    sides = [i % 2 for i in order]
    assert sides[:8] == [sides[0]] * 8 and sides[8:] == [1 - sides[0]] * 8


def test_kernel_deterministic_and_permutation():
    rng = np.random.RandomState(3)
    terms = [rng.choice(40, size=6, replace=False) for _ in range(64)]
    indptr, flat = _csr(terms)
    o1 = bp_order(indptr.copy(), flat.copy())
    o2 = bp_order(indptr.copy(), flat.copy())
    assert np.array_equal(o1, o2)
    assert sorted(o1.tolist()) == list(range(64))


def test_kernel_degenerate_inputs():
    # empty / single / all-empty-docs
    assert bp_order(np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int64)).tolist() == []
    assert bp_order(np.zeros(2, dtype=np.int64), np.empty(0, dtype=np.int64)).tolist() == [0]
    indptr, flat = _csr([[], [], [], []])
    assert sorted(bp_order(indptr, flat, leaf=1).tolist()) == [0, 1, 2, 3]


def test_mapping_permutation_and_partition_invariance(spark):
    docs = _docs(spark)
    n = docs.count()
    m1 = reorder_by_bisection(docs)
    got = {(r["doc_id"], r["new_id"]) for r in m1.collect()}
    assert sorted(v for _, v in got) == list(range(n))
    m2 = reorder_by_bisection(docs.repartition(17))
    assert {(r["doc_id"], r["new_id"]) for r in m2.collect()} == got


def test_bp_compresses_clustered_corpus_without_metadata(spark):
    docs = _clustered_docs(spark)
    mapping = reorder_by_bisection(docs).cache()
    base_toks = _tokens(docs)
    re_toks = apply_reorder(_tokens(docs), mapping)
    p0, _, _ = _build(base_toks)
    p1, _, _ = _build(re_toks)
    b0, b1 = payload_bytes(p0), payload_bytes(p1)
    # ids are hash-scattered across 8 topics; BP must rediscover the
    # topical clusters from the doc-term graph alone
    assert b1["docs_bytes"] < b0["docs_bytes"] * 0.9, (b0, b1)


def test_bp_serving_score_identical(spark):
    from pisa_spark.query.bm25 import bm25_topk_wand

    docs = _docs(spark)
    mapping = reorder_by_bisection(docs).cache()
    p0, n, avgdl = _build(_tokens(docs))
    p1, n1, avgdl1 = _build(apply_reorder(_tokens(docs), mapping))
    assert (n, round(avgdl, 9)) == (n1, round(avgdl1, 9))
    queries = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["window", "merge"], "conjunctive": True},
    ]
    base = bm25_topk_wand(p0, queries, n, avgdl, k=10).toPandas()
    reo = restore_ids(
        bm25_topk_wand(p1, queries, n, avgdl, k=10), mapping
    ).toPandas()
    for qid in (0, 1):
        bs = sorted(base[base.query_id == qid].score.round(6), reverse=True)
        rs = sorted(reo[reo.query_id == qid].score.round(6), reverse=True)
        assert bs == rs


def test_max_range_chunking_and_presort(spark):
    # max_range smaller than the corpus: ids stay a permutation and
    # every range keeps its contiguous id span
    docs = _clustered_docs(spark, n_docs=512)
    m = reorder_by_bisection(docs, max_range=128, presort=["topic"])
    rows = m.collect()
    assert sorted(r["new_id"] for r in rows) == list(range(512))
    # presort by topic => each 128-id range holds docs of ~one topic;
    # with 8 topics x 64 docs, range r covers topics 2r..2r+1 exactly
    topic = {r["doc_id"]: r["topic"] for r in docs.collect()}
    for r in rows:
        rng = r["new_id"] // 128
        t = int(topic[r["doc_id"]][5:])
        assert t // 2 == rng


def test_persistent_bisection_build(spark, tmp_path):
    from pisa_spark.engine import SearchEngine

    eng = SearchEngine.build(
        spark, SF, str(tmp_path / "bidx"), n_buckets=8, wave_size=8,
        reorder_by="bisection",
    )
    plain = SearchEngine.build(
        spark, SF, str(tmp_path / "pidx"), n_buckets=8, wave_size=8
    )
    got = sorted(
        eng.restore(eng.search("data join", k=10)).toPandas().score.round(6)
    )
    base = sorted(plain.search("data join", k=10).toPandas().score.round(6))
    assert got == base
    fresh = SearchEngine.load(spark, str(tmp_path / "bidx"))
    assert fresh._reordered
