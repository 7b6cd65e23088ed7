"""Model-based inference scorers: MF dot top-k (seen-masked) and
integer fixed-point LightGCN propagation, NumPy-replicated."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.operators.embedscore import (
    W_SCALE,
    bipartite_edges,
    embedding_dot_topk,
    lightgcn_propagate,
    synthetic_embeddings,
)


def test_synthetic_embeddings_deterministic_bounded(spark):
    nodes = spark.range(50).withColumnRenamed("id", "node")
    a = synthetic_embeddings(nodes, dim=6, scale=1000).collect()
    b = synthetic_embeddings(nodes.repartition(7), dim=6, scale=1000).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 300
    assert all(-1000 <= r["e"] <= 1000 for r in a)
    # different salt -> different table
    c = synthetic_embeddings(nodes, dim=6, scale=1000, salt="other").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_embedding_dot_topk_hand_check(spark):
    ue = spark.createDataFrame(
        [(0, 0, 2), (0, 1, -1), (1, 0, 1), (1, 1, 3)], "node long, d int, e long"
    )
    ie = spark.createDataFrame(
        [(10, 0, 1), (10, 1, 1), (11, 0, 5), (11, 1, 0), (12, 0, 0), (12, 1, 2)],
        "node long, d int, e long",
    )
    users = spark.createDataFrame([(0,), (1,)], "user_id long")
    # dots: u0: i10=1, i11=10, i12=-2 ; u1: i10=4, i11=5, i12=6
    got = {
        (r["user_id"], r["rank"]): (r["item_id"], r["score"])
        for r in embedding_dot_topk(ue, ie, users, k=2).collect()
    }
    assert got[(0, 1)] == (11, 10) and got[(0, 2)] == (10, 1)
    assert got[(1, 1)] == (12, 6) and got[(1, 2)] == (11, 5)
    # seen masking drops the top item and promotes the next
    seen = spark.createDataFrame([(0, 11)], "user_id long, item_id long")
    masked = {
        (r["user_id"], r["rank"]): r["item_id"]
        for r in embedding_dot_topk(ue, ie, users, seen=seen, k=2).collect()
    }
    assert masked[(0, 1)] == 10 and masked[(0, 2)] == 12


def test_dot_tie_breaks_by_item_id(spark):
    ue = spark.createDataFrame([(0, 0, 1)], "node long, d int, e long")
    ie = spark.createDataFrame(
        [(7, 0, 5), (3, 0, 5), (9, 0, 5)], "node long, d int, e long"
    )
    users = spark.createDataFrame([(0,)], "user_id long")
    rows = embedding_dot_topk(ue, ie, users, k=3).collect()
    assert [(r["rank"], r["item_id"]) for r in sorted(rows, key=lambda r: r["rank"])] \
        == [(1, 3), (2, 7), (3, 9)]


def _numpy_lightgcn(edges, emb0, n_layers):
    """Independent dense replication of the fixed-point propagation."""
    nodes = sorted({n for e in edges for n in e} | set(emb0))
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    dim = len(next(iter(emb0.values())))
    layers = [np.zeros((len(nodes), dim), dtype=np.int64)]
    for n, v in emb0.items():
        layers[0][idx[n]] = v
    for _ in range(n_layers):
        nxt = np.zeros_like(layers[0])
        for s, t in edges:
            wf = math.floor(W_SCALE / math.sqrt(deg[t] * deg[s]))
            nxt[idx[t]] += np.floor(
                layers[-1][idx[s]].astype(np.float64) * wf / W_SCALE
            ).astype(np.int64)
        layers.append(nxt)
    mean = np.floor(
        sum(l.astype(np.float64) for l in layers) / (n_layers + 1)
    ).astype(np.int64)
    return {n: mean[idx[n]] for n in nodes}


def test_lightgcn_propagate_matches_numpy_and_partition_invariant(spark):
    inter = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 1), (2, 0), (2, 2), (1, 2), (0, 2)],
        "user_id long, item_id long",
    )
    edges, _ = bipartite_edges(inter)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    emb = synthetic_embeddings(nodes, dim=4, scale=999)
    got = {
        (r["node"], r["d"]): r["e"]
        for r in lightgcn_propagate(edges, emb, n_layers=2).collect()
    }
    got_rep = {
        (r["node"], r["d"]): r["e"]
        for r in lightgcn_propagate(
            edges.repartition(5), emb.repartition(3), n_layers=2
        ).collect()
    }
    assert got == got_rep

    e_list = [(r["src"], r["dst"]) for r in edges.collect()]
    emb0 = {}
    for r in emb.collect():
        emb0.setdefault(r["node"], [0, 0, 0, 0])[r["d"]] = r["e"]
    want = _numpy_lightgcn(e_list, emb0, n_layers=2)
    for (n, d), e in got.items():
        assert e == want[n][d], (n, d, e, want[n][d])


def test_lightgcn_then_topk_over_ref_blocks(spark, sf_dir):
    """End-to-end: propagate over hist0 bipartite graph, score test
    users, never recommend a seen item."""
    from pisa_spark.operators.snapshots import (
        interactions_from_events,
        split_blocks,
    )

    blocks = split_blocks(interactions_from_events(spark, sf_dir), 5, 0.6)
    hist = blocks.filter(
        (F.col("snapshot_idx") == 0) & (F.col("block_type") == "hist")
    )
    test = blocks.filter(
        (F.col("snapshot_idx") == 0) & (F.col("block_type") == "test")
    )
    edges, off_df = bipartite_edges(hist)
    emb = lightgcn_propagate(
        edges, synthetic_embeddings(
            edges.select(F.col("src").alias("node")).distinct(), dim=4
        ),
        n_layers=1,
    )
    off = off_df.collect()[0]["off"]
    u_emb = emb.filter(F.col("node") < off)
    i_emb = emb.filter(F.col("node") >= off).select(
        (F.col("node") - off).alias("node"), "d", "e"
    )
    recs = embedding_dot_topk(
        u_emb, i_emb, test.select("user_id"),
        seen=hist.select("user_id", "item_id"), k=10,
    )
    leaked = recs.join(
        hist.select("user_id", "item_id").distinct(), ["user_id", "item_id"]
    ).count()
    assert leaked == 0
    per_user = recs.groupBy("user_id").agg(F.max("rank").alias("mx"),
                                           F.count(F.lit(1)).alias("n"))
    assert per_user.filter(F.col("mx") != F.col("n")).count() == 0
