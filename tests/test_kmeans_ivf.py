"""Deterministic k-means + IVF ANN tests (ref #40 analog + IVF scale
path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.similarity.ann import cosine_topk_bruteforce
from pisa_spark.similarity.kmeans import (
    CENTROID_DECIMALS,
    DIST_DECIMALS,
    assign_clusters,
    ivf_topk,
    kmeans_fit,
    quantize_half_away,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def centroids(emb):
    return kmeans_fit(emb, k=8, n_iter=3)


def test_kmeans_matches_numpy(spark, emb, centroids):
    """Driver-side NumPy re-implementation with identical init/rules
    (including the cross-engine quantization contract: distances
    rounded to DIST_DECIMALS before argmin, means to CENTROID_DECIMALS)
    must produce identical centroids (determinism + correctness)."""
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    C = X[:8].copy()
    for _ in range(3):
        d2 = quantize_half_away(
            ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), DIST_DECIMALS
        )
        assign = d2.argmin(axis=1)
        for c in range(8):
            m = assign == c
            if m.any():
                C[c] = quantize_half_away(X[m].mean(axis=0), CENTROID_DECIMALS)
    assert np.allclose(centroids, C, atol=1e-12)


def test_assign_deterministic_across_partitions(emb, centroids):
    a = {r["vec_id"]: r["cluster"] for r in assign_clusters(emb, centroids).collect()}
    b = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb.repartition(7), centroids).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(8))


def test_ivf_recall_and_exact_scores(emb, centroids):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bf = cosine_topk_bruteforce(emb, queries, k=10).collect()
    ivf = ivf_topk(emb, queries, centroids, k=10, nprobe=4).collect()
    bf_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in bf}
    bf_set = set(bf_scores)
    ivf_set = {(r["query_id"], r["vec_id"]) for r in ivf}
    recall = len(bf_set & ivf_set) / len(bf_set)
    # random embeddings + L2 buckets vs cosine ranking: modest floor,
    # but the self-match must always be found (its bucket is probed 1st)
    assert recall >= 0.3, recall
    top1 = {(r["query_id"], r["vec_id"]) for r in ivf if r["rank"] == 1}
    assert top1 == {(q, q) for q in range(5)}
    # scores of returned candidates are exact
    full = {(r["query_id"], r["vec_id"]): r["cosine"]
            for r in cosine_topk_bruteforce(emb, queries, k=500).collect()}
    for r in ivf:
        assert abs(full[(r["query_id"], r["vec_id"])] - r["cosine"]) < 1e-9
