"""Search-result clustering (query/cluster.py): witness replay of the
quantized per-query k-means, separation sanity, degenerate shapes."""

import numpy as np
import pytest

from pisa_spark.query.cluster import cluster_results
from pisa_spark.similarity.kmeans import quantize_half_away

# three tight groups in 4-d
VECS = {
    0: [0.0, 0.0, 0.0, 0.1],
    1: [0.1, 0.0, 0.0, 0.0],
    2: [0.0, 0.1, 0.1, 0.0],
    10: [5.0, 5.0, 5.0, 5.1],
    11: [5.1, 5.0, 5.0, 5.0],
    20: [9.0, 0.0, 9.0, 0.1],
    21: [9.1, 0.0, 9.0, 0.0],
    99: [2.0, 2.0, 2.0, 2.0],  # not in any result set
}


def _witness(ids, n_clusters, iters):
    ids = sorted(ids)
    vecs = np.array([VECS[i] for i in ids], dtype=np.float64)
    kk = min(n_clusters, len(ids))
    cents = vecs[:kk].copy()

    def assign(c):
        d2 = quantize_half_away(
            ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), 9
        )
        return d2.argmin(axis=1)

    for _ in range(iters):
        a = assign(cents)
        new = cents.copy()
        for c in range(kk):
            m = a == c
            if m.any():
                new[c] = quantize_half_away(
                    vecs[m].sum(axis=0) / float(m.sum()), 6
                )
        cents = new
    return dict(zip(ids, assign(cents).tolist()))


@pytest.fixture(scope="module")
def frames(spark):
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS.items()],
        "vec_id long, embedding array<float>",
    )
    res = spark.createDataFrame(
        [(0, d) for d in (0, 1, 2, 10, 11, 20, 21)]
        + [(1, d) for d in (0, 10)],
        "query_id int, doc_id long",
    )
    return res, emb


def test_matches_witness_and_separates(frames):
    res, emb = frames
    got = {}
    for r in cluster_results(res, emb, n_clusters=3, iters=3).collect():
        got[(r["query_id"], r["doc_id"])] = r["cluster"]
    w0 = _witness([0, 1, 2, 10, 11, 20, 21], 3, 3)
    for d, c in w0.items():
        assert got[(0, d)] == c, d
    # the three tight groups land in three distinct clusters
    assert got[(0, 0)] == got[(0, 1)] == got[(0, 2)]
    assert got[(0, 10)] == got[(0, 11)]
    assert got[(0, 20)] == got[(0, 21)]
    assert len({got[(0, 0)], got[(0, 10)], got[(0, 20)]}) == 3
    # query 1 has fewer docs than clusters: kk = 2, both assigned
    w1 = _witness([0, 10], 3, 3)
    assert got[(1, 0)] == w1[0] and got[(1, 10)] == w1[10]
    # doc 99 is in no result set
    assert all(d != 99 for (_, d) in got)


def test_partition_invariance(frames, spark):
    res, emb = frames
    a = sorted(
        (r["query_id"], r["doc_id"], r["cluster"])
        for r in cluster_results(
            res.repartition(7), emb.repartition(5), 3, 3
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["doc_id"], r["cluster"])
        for r in cluster_results(res, emb, 3, 3).collect()
    )
    assert a == b


def test_validation_and_engine_guard(frames, spark, sf_dir, tmp_path_factory):
    res, emb = frames
    with pytest.raises(ValueError):
        cluster_results(res, emb, n_clusters=0)
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("clu") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    with pytest.raises(ValueError, match="with_embeddings"):
        eng.search_clustered("data")
    out = eng.with_embeddings(
        f"{sf_dir}/embeddings.parquet"
    ).search_clustered("data join", k=10, n_clusters=2, iters=2)
    rows = out.collect()
    assert rows and {r["cluster"] for r in rows} <= {0, 1}


def test_cluster_labels_witness_and_stop_exclusion(spark):
    from pisa_spark.query.cluster import cluster_labels

    clusters = spark.createDataFrame(
        [(0, 1, 0), (0, 2, 0), (0, 3, 1)],
        "query_id int, doc_id long, cluster int",
    )
    tf = spark.createDataFrame(
        [
            (1, "apple", 3), (1, "the", 9),
            (2, "apple", 2), (2, "pear", 5),
            (3, "kiwi", 4), (3, "the", 1),
            (9, "apple", 99),  # not in any cluster
        ],
        "doc_id long, term string, tf int",
    )
    got = {
        (r["query_id"], r["cluster"], r["rank"]): (r["term"], r["score"])
        for r in cluster_labels(clusters, tf, top=2).collect()
    }
    # cluster 0: the=9, apple=5, pear=5 -> top2 = the, then apple
    # (score tie 5/5 breaks term ASC)
    assert got[(0, 0, 1)] == ("the", 9)
    assert got[(0, 0, 2)] == ("apple", 5)
    assert got[(0, 1, 1)] == ("kiwi", 4)
    # stop exclusion drops 'the' everywhere
    stop = spark.createDataFrame([("the",)], "term string")
    got2 = {
        (r["query_id"], r["cluster"], r["rank"]): r["term"]
        for r in cluster_labels(
            clusters, tf, stopwords=stop, top=2
        ).collect()
    }
    assert got2[(0, 0, 1)] == "apple"
    assert all(t != "the" for t in got2.values())
