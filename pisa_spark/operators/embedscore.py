"""Model-based inference scorers over embedding DataFrames.

Closes the reference's inference-side semantics (training stays out of
scope per the north rule):

* **MF dot scoring** — score(u, i) = <u_vec, i_vec> over every item,
  seen items masked out, exact top-k
  (/root/reference/src/models/general/MF.py:32-41 infer_user_scores =
  matmul(U, I^T); /root/reference/src/Inference.py:227-240 masks seen
  to -inf and takes topk).
* **LightGCN propagation** — embeddings propagated L times over the
  symmetric-normalized bipartite adjacency D^-1/2 A D^-1/2 and MEANED
  across layers 0..L before the same dot scoring
  (/root/reference/src/models/general/LGN.py:41-78 computer()).

Engineering choices (the 100-TB part):

* Embeddings ride in a ROW-PER-DIMENSION relation (node, d, e) with
  INTEGER fixed-point values. Integer sums are associative, so
  partial aggregation order cannot change a result — every gate twin
  replays bit-for-bit in DuckDB (same trick as operators/linkgraph
  PageRank). The only float ops are per-edge weight quantization and
  per-message flooring, each a single deterministic IEEE expression
  evaluated identically by both engines.
* Propagation is join + partial-agg per layer (no driver state, no
  collect): messages = edges x dim rows, combined map-side before the
  one shuffle per layer — the aggregate-messages shape that scales
  with |E| * dim / cores.
* Exhaustive dot top-k is the small/exact path (the reference scores
  ALL items per user); its plan broadcasts the query users so items
  stream once. At corpus scale the ANN module (similarity/ann.py IVF /
  LSH) is the serving path; this operator is the oracle it is graded
  against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed-point denominators, shared with the DuckDB twins
W_SCALE = 10**9  # edge-weight quantization: wf = floor(1e9 / sqrt(du*di))
E_SCALE = 100_000  # synthetic embedding component range [-E_SCALE, E_SCALE]


def synthetic_embeddings(
    nodes: DataFrame,
    dim: int = 8,
    scale: int = E_SCALE,
    salt: str = "emb",
    node_col: str = "node",
) -> DataFrame:
    """Deterministic integer embeddings: (node, d, e) with
    e = md5-derived int in [-scale, scale], a pure function of
    (salt, node, d) — the stand-in for a trained table, replayable in
    SQL on any engine with md5 (the contract every dedup/ANN fixture
    in this repo already uses)."""
    return nodes.select(F.col(node_col).alias("node")).distinct().select(
        "node",
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("d"),
    ).select(
        "node",
        "d",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(salt), "node", "d")), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % (2 * scale + 1)
            - scale
        ).alias("e"),
    )


def bipartite_edges(
    interactions: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> tuple[DataFrame, DataFrame]:
    """Distinct (user, item) pairs -> (edges, offset_df): bidirectional
    (src, dst) edge list over the joint node space with items offset by
    max(user)+1 (the reference's torch.cat([users_emb, items_emb])
    index space, LGN.py:45-46). Returns the 1-row offset relation so
    callers can map item nodes back without a driver round-trip."""
    inter = interactions.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    off = inter.agg((F.max("u") + 1).alias("off"))
    e = inter.crossJoin(F.broadcast(off)).select(
        F.col("u").alias("src"), (F.col("i") + F.col("off")).alias("dst")
    )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return edges, off


def lightgcn_propagate(
    edges: DataFrame, emb: DataFrame, n_layers: int = 2
) -> DataFrame:
    """Integer fixed-point LightGCN propagation (LGN.py:43-57):
    e_{l+1}(n) = sum_{m~n} floor(e_l(m) * wf(n,m) / W_SCALE) with
    wf = floor(W_SCALE / sqrt(deg_n * deg_m)), output = floor(mean of
    layers 0..L). Every sum is over longs (associative — partition
    order cannot matter); the two float steps (weight quantization,
    message flooring) are single IEEE-double expressions DuckDB
    evaluates identically, so the gate twin is bit-exact."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    w_edges = (
        edges.join(deg.withColumnRenamed("src", "_s1"),
                   F.col("src") == F.col("_s1"))
        .withColumnRenamed("deg", "deg_src")
        .drop("_s1")
        .join(deg.withColumnRenamed("src", "_s2"),
              F.col("dst") == F.col("_s2"))
        .withColumnRenamed("deg", "deg_dst")
        .drop("_s2")
        .select(
            "src",
            "dst",
            F.floor(
                F.lit(float(W_SCALE))
                / F.sqrt((F.col("deg_src") * F.col("deg_dst")).cast("double"))
            ).cast("long").alias("wf"),
        )
    )
    layers = [emb.select("node", "d", "e")]
    cur = layers[0]
    for _ in range(n_layers):
        cur = (
            w_edges.join(cur, w_edges["src"] == cur["node"])
            .select(
                F.col("dst").alias("node"),
                "d",
                F.floor(
                    F.col("e").cast("double") * F.col("wf")
                    / F.lit(float(W_SCALE))
                ).cast("long").alias("m"),
            )
            .groupBy("node", "d")
            .agg(F.sum("m").alias("e"))
        )
        layers.append(cur)
    stacked = layers[0]
    for l in layers[1:]:
        stacked = stacked.unionByName(l)
    # mean over layers 0..L (LGN.py:56 torch.mean over the stack);
    # nodes missing from a layer (isolated) contribute implicit zeros,
    # so the divisor is the fixed layer count, not a per-node count
    return stacked.groupBy("node", "d").agg(
        F.floor(F.sum("e").cast("double") / F.lit(float(n_layers + 1)))
        .cast("long")
        .alias("e")
    )


def embedding_dot_topk(
    user_emb: DataFrame,
    item_emb: DataFrame,
    users: DataFrame,
    seen: DataFrame | None = None,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by dot product: for each user in ``users``
    (user_id), score EVERY item in ``item_emb`` (item_id, d, e),
    drop (user, item) pairs in ``seen``, rank by (score DESC,
    item_id ASC) — Inference.py:227-240 with the repo's pinned tie
    rule. Embeddings are (id, d, e) integer relations; scores are
    exact longs. The query-user side is broadcast; items stream."""
    u = F.broadcast(
        users.select("user_id").distinct().join(
            user_emb.select(
                F.col("node").alias("user_id"),
                "d",
                F.col("e").alias("eu"),
            ),
            "user_id",
        )
    )
    i = item_emb.select(
        F.col("node").alias("item_id"), "d", F.col("e").alias("ei")
    )
    scores = (
        u.join(i, "d")
        .groupBy("user_id", "item_id")
        .agg(F.sum(F.col("eu") * F.col("ei")).alias("score"))
    )
    if seen is not None:
        scores = scores.join(
            seen.select("user_id", "item_id").distinct(),
            ["user_id", "item_id"],
            "left_anti",
        )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "rank", "item_id", "score")
    )
