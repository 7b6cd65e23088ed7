"""Link-graph operators: integer fixed-point PageRank vs an exact
pure-Python twin, and connected components / dedup clustering."""

import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from pisa_spark.operators.linkgraph import (
    PAGERANK_SCALE,
    connected_components,
    dedup_clusters,
    pagerank,
)


def _pr_twin(edges, n_iter, d=85, scale=PAGERANK_SCALE):
    """Exact integer twin of pagerank() — same floor-div arithmetic,
    plain Python ints, summation order irrelevant by associativity."""
    e = sorted(set(edges))
    nodes = sorted({u for pair in e for u in pair})
    out = Counter(s for s, _ in e)
    n = len(nodes)
    r0 = scale // n
    base = ((100 - d) * r0) // 100
    r = {v: r0 for v in nodes}
    for _ in range(n_iter):
        dang = sum(r[v] for v in nodes if out[v] == 0)
        share = dang // n
        recv = defaultdict(int)
        for s, t in e:
            recv[t] += r[s] // out[s]
        r = {v: base + ((recv[v] + share) * d) // 100 for v in nodes}
    return r


def _rand_edges(seed, n_nodes=30, n_edges=80):
    rng = random.Random(seed)
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
        if True
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pagerank_matches_integer_twin(spark, seed):
    edges = [(s, t) for s, t in _rand_edges(seed) if s != t]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, n_iter=4).collect()
    }
    assert got == _pr_twin(edges, 4)


def test_pagerank_partition_invariant(spark):
    edges = [(s, t) for s, t in _rand_edges(7, 40, 120) if s != t]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        (r["node"], r["rank_units"])
        for r in pagerank(df.repartition(1), n_iter=3).collect()
    )
    b = sorted(
        (r["node"], r["rank_units"])
        for r in pagerank(df.repartition(13, "dst"), n_iter=3).collect()
    )
    assert a == b


def test_pagerank_dangling_mass_redistributed(spark):
    # 0 -> 1 -> 2, node 2 is a sink: without redistribution its mass
    # would leak every round and totals would collapse toward base*N
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, n_iter=5).collect()
    }
    assert got == _pr_twin(edges, 5)
    total = sum(got.values())
    # mass conserved to within integer floor losses (a few units per
    # node per iteration out of 1e12)
    assert abs(total - PAGERANK_SCALE) < 1000


def test_pagerank_rewards_indegree(spark):
    # star: every leaf links to node 0 (0 keeps its mass via a self
    # loop — avoids the 2-cycle oscillation a 0->1 backlink causes);
    # node 0 must out-rank the leaves
    edges = [(i, 0) for i in range(1, 8)] + [(0, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_units"] for r in pagerank(df, n_iter=6).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_connected_components_two_chains(spark):
    # two chains: {0-1-2-3} and {10-11}; plus isolated pair {20-20}? no
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    comp = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}


def test_connected_components_diameter_needs_iterations(spark):
    # a 12-node path exercises multi-round propagation (diameter 11)
    pairs = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    comp = connected_components(df)
    assert comp.select(F.count_distinct("component")).first()[0] == 1
    assert comp.agg(F.min("component")).first()[0] == 0


def test_dedup_clusters_keep_rule(spark):
    pairs = [(5, 9), (9, 7), (100, 101)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(df).collect()}
    assert rows[5]["canonical_id"] == 5 and rows[5]["keep"]
    assert rows[9]["canonical_id"] == 5 and not rows[9]["keep"]
    assert rows[7]["canonical_id"] == 5 and not rows[7]["keep"]
    assert rows[100]["keep"] and not rows[101]["keep"]
