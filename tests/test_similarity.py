"""ANN: brute force is the ground truth; LSH recall measured against it."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.similarity.ann import cosine_topk_bruteforce, lsh_bucket_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_bruteforce_matches_numpy(emb, queries):
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    ids = np.array([r["vec_id"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    norms = np.linalg.norm(mat, axis=1)
    got = cosine_topk_bruteforce(emb, queries, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for qid in range(5):
        qv = mat[ids == qid][0]
        cos = mat @ qv / (norms * np.linalg.norm(qv))
        order = sorted(zip(cos, ids), key=lambda x: (-x[0], x[1]))[:10]
        expect = [(i + 1, int(v), c) for i, (c, v) in enumerate(order)]
        have = sorted(by_q[qid])
        assert [(r, v) for r, v, _ in have] == [(r, v) for r, v, _ in expect]
        for (_, _, c1), (_, _, c2) in zip(have, expect):
            assert abs(c1 - c2) < 1e-9


def test_lsh_topk_recall_random_data(emb, queries):
    """Uniform random embeddings are the LSH worst case (no cluster
    structure); still demand non-trivial recall vs brute force."""
    bf = cosine_topk_bruteforce(emb, queries, k=10).collect()
    lsh = lsh_bucket_topk(
        emb, queries, k=10, nbits=6, probe_hamming=2, n_tables=4
    ).collect()
    bf_set = {(r["query_id"], r["vec_id"]) for r in bf}
    lsh_set = {(r["query_id"], r["vec_id"]) for r in lsh}
    recall = len(bf_set & lsh_set) / len(bf_set)
    assert recall >= 0.5, recall
    # rank-1 self-match must always survive (query is its own nearest)
    top1 = {(r["query_id"], r["vec_id"]) for r in lsh if r["rank"] == 1}
    assert top1 == {(q, q) for q in range(5)}


def test_lsh_recalls_planted_near_duplicates(spark, emb, queries):
    """The designed-for case: each query has 5 planted near-copies
    (deterministic small perturbation, cosine ~0.99+). LSH must find
    essentially all of them."""
    import numpy as np

    base = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    planted = []
    next_id = 100000
    for qid in range(5):
        v = base[qid]
        for j in range(5):
            # deterministic perturbation: +-0.5% per component
            rng = np.random.default_rng(qid * 10 + j)
            nv = v * (1.0 + 0.005 * rng.standard_normal(v.size))
            planted.append((next_id, [float(x) for x in nv]))
            next_id += 1
    extra = spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    corpus = emb.select("vec_id", "embedding").unionByName(extra)
    lsh = lsh_bucket_topk(
        corpus, queries, k=6, nbits=8, probe_hamming=1, n_tables=4
    ).collect()
    found = {(r["query_id"], r["vec_id"]) for r in lsh}
    want = {(q, 100000 + q * 5 + j) for q in range(5) for j in range(5)}
    want |= {(q, q) for q in range(5)}  # self
    recall = len(found & want) / len(want)
    assert recall >= 0.9, recall


def test_lsh_scores_are_exact_for_returned(emb, queries):
    """LSH may miss candidates but never mis-scores returned ones."""
    bf = {(r["query_id"], r["vec_id"]): r["cosine"]
          for r in cosine_topk_bruteforce(emb, queries, k=500).collect()}
    for r in lsh_bucket_topk(emb, queries, k=10, nbits=6, probe_hamming=2).collect():
        assert abs(bf[(r["query_id"], r["vec_id"])] - r["cosine"]) < 1e-9
