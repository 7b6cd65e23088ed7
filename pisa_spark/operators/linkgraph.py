"""Link-graph analysis — PageRank and connected components as pure
DataFrame iteration, engineered for exact cross-engine replay.

Web-search context: PageRank is the canonical link-based document
prior (combined with BM25 at ranking time), and connected components
is the canonical post-LSH step of a web dedup pipeline — verified
near-duplicate PAIRS become CLUSTERS, and one canonical document per
cluster survives. The reference's closest analog is its bipartite
interaction graph machinery (degree normalization + propagation,
/root/reference/src/models/Dataloader.py:135-153 and the LightGCN
neighborhood mean /root/reference/src/models/general/LGN.py:41-58):
PageRank is the same sparse propagate-and-reduce dataflow with a
damping prior instead of a learned embedding.

Determinism contract (the same discipline as similarity/kmeans.py's
quantized k-means): ALL PageRank arithmetic is 64-bit integer
fixed-point — rank mass is `scale` integer units, per-edge shares and
the damping blend use integer floor division only. Integer addition
is associative, so results are bit-identical under any partitioning,
any engine, any summation order; a DuckDB oracle replays every
iteration exactly with `//` arithmetic and value-hash-matches.

Scale notes:
* Each PageRank iteration is one hash join (ranks onto edges, both
  sides partitioned by node id) + one partial-aggregated groupBy —
  the textbook Spark rendering; no collects beyond the two scalar
  reads (node count once, dangling mass per iteration).
* Iterates are persisted and the previous one unpersisted, so plan
  depth and recomputation stay O(1) per iteration at any corpus size.
* Label propagation converges in O(component diameter) rounds; for
  near-duplicate clusters the diameter is tiny (pairs come from a
  shared LSH bucket). For adversarial billion-node chains, the
  alternating large-star/small-star contraction (Kiveris et al. 2014,
  "Connected components in MapReduce and beyond") drops this to
  O(log^2 n) rounds — same join/agg primitives, swap-in upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12


def _symmetrize(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    e = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Returns (node, rank_units, rank): ``rank_units`` is the exact
    integer result (``scale`` total mass, bit-identical across
    engines/partitionings — the gate compares this column), ``rank``
    the float rendering for human use.

    Semantics: simple graph (duplicate edges collapse), node set =
    endpoints of ``edges``; per iteration each node's mass splits
    evenly over its out-edges (integer floor), dangling mass is
    redistributed uniformly, and

        r' = ((100-d) * (scale DIV N)) DIV 100
             + (d * (received + dangling_share)) DIV 100

    with d = ``damping_pct`` — the standard damped update with the
    1/N prior, rendered entirely in integer arithmetic. Floor losses
    are bounded by one unit per edge per iteration (~1e-12 of total
    mass) — far below anything that could reorder documents.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nd = (
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .fillna({"outdeg": 0})
        .persist()
    )
    n_nodes = nd.count()
    if n_nodes == 0:
        return nd.select(
            "node",
            F.lit(0).cast("long").alias("rank_units"),
            F.lit(0.0).alias("rank"),
        )
    r0 = scale // n_nodes
    base = ((100 - damping_pct) * r0) // 100
    # localCheckpoint (eager) per iterate: truncates the logical plan,
    # otherwise Catalyst re-analyzes a plan that doubles every round
    # (persist short-circuits execution, not analysis). Same
    # lineage-truncation tradeoff as operators/ids.py:50-58 — at
    # cluster scale, snapshot iterates through the catalog instead if
    # executor loss during an iteration must be survivable.
    ranks = nd.withColumn("r", F.lit(r0).cast("long")).localCheckpoint()
    for _ in range(n_iter):
        dang = (
            ranks.filter(F.col("outdeg") == 0)
            .agg(F.coalesce(F.sum("r"), F.lit(0)))
            .first()[0]
        )
        share = int(dang) // n_nodes
        recv = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"), "r", F.col("outdeg").alias("od")
                ),
                "src",
            )
            .select(F.col("dst").alias("node"), F.expr("r DIV od").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("recv"))
        )
        ranks = (
            nd.join(recv, "node", "left")
            .fillna({"recv": 0})
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base)
                    + F.expr(
                        f"((recv + {share}L) * {damping_pct}) DIV 100"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    out = ranks.select(
        "node",
        F.col("r").alias("rank_units"),
        (F.col("r") / F.lit(float(scale))).alias("rank"),
    )
    nd.unpersist()
    return out


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list via min-label
    propagation: every node starts labeled with its own id; each round
    takes the min of its label and its neighbors' labels; at the fixed
    point every node carries its component's minimum id.

    Returns (node, component) with component = min node id in the
    component — fully integer, so the DuckDB recursive-CTE oracle
    (min reachable id) matches bit-for-bit. Converges in O(diameter)
    rounds (checked per round; raises if ``max_iter`` is hit — see
    module docstring for the O(log^2 n) star-contraction upgrade path
    for adversarial diameters).
    """
    edges = _symmetrize(pairs, src, dst).persist()
    # eager localCheckpoint per round — see pagerank() for why (plan
    # growth, not execution, is what kills driver-loop iteration)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("nl")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("nl").alias("nmin"))
        )
        new = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        ).localCheckpoint()
        changed = (
            new.join(
                labels.withColumnRenamed("label", "old"), "node"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Near-duplicate PAIRS -> dedup CLUSTERS: connected components
    with the canonical survivor per cluster (min doc id — the
    deterministic keep rule). Returns (doc_id, canonical_id, keep);
    docs not in any pair are untouched (callers keep them all — only
    pair members can be duplicates)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )
