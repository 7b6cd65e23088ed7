"""Graph/sampling operators — the reference's adjacency-normalization
and negative-sampling semantics, Spark-first.

* ``normalized_edges`` — symmetric degree normalization
  ``D^-1/2 A D^-1/2`` of the user-item bipartite graph as an edge
  DataFrame (the reference materializes the dense (U+I)^2 matrix,
  /root/reference/src/models/Dataloader.py:135-153; at 10^12 edges only
  the edge-relation form survives: two degree aggregations + one join).
* ``negative_samples`` — the reference draws negatives by rejection
  sampling against the clicked-set (recursive resample,
  /root/reference/src/models/Dataloader.py:77-100). The distributed
  rendering is a deterministic hash-gated candidate generation +
  left_anti join against the seen set: no RNG state, identical across
  runs/partitions/engines (md5-hash family shared with the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import hash_wide


def normalized_edges(interactions: DataFrame) -> DataFrame:
    """(user_id, item_id) -> (user_id, item_id, weight) with
    weight = 1/sqrt(deg(u) * deg(i)) over the distinct edge set."""
    edges = interactions.select("user_id", "item_id").distinct()
    du = edges.groupBy("user_id").agg(F.count(F.lit(1)).alias("du"))
    di = edges.groupBy("item_id").agg(F.count(F.lit(1)).alias("di"))
    return (
        edges.join(du, "user_id")
        .join(di, "item_id")
        .select(
            "user_id",
            "item_id",
            F.round(1.0 / F.sqrt(F.col("du") * F.col("di")), 6).alias("weight"),
        )
    )


def negative_samples(
    interactions: DataFrame,
    n_per_user: int = 5,
    oversample: int = 4,
) -> DataFrame:
    """Deterministic negative sampling: per user, up to ``n_per_user``
    items the user has NOT interacted with. Returns
    (user_id, item_id, rank) with rank = draw order.

    Bounded candidate generation — the distributed rendering of the
    reference's draw-until-unseen rejection loop
    (/root/reference/src/models/Dataloader.py:77-100), with the RNG
    replaced by the md5 hash family so results are identical across
    runs/partitions/engines:

    1. items get dense indices 0..|I|-1 in item_id order (two-phase
       assignment, operators/ids.py — no global sort);
    2. each user makes ``n_per_user * oversample`` draws
       j = 1..n_draws; draw j picks item index
       pmod(hash_wide('neg:' || user || ':' || j), |I|) — full 64-bit
       hash so item universes beyond 2^32 are all drawable (pmod keeps
       the signed hash non-negative; oracle twin wraps HUGEINT
       identically). The candidate relation is |U| * n_draws rows,
       NEVER the |U| x |I| cross product the naive hash-gate would
       evaluate;
    3. duplicate draws keep their first j, seen items are rejected
       with a left_anti join, and the first ``n_per_user`` survivors
       in draw order win.

    A user who has seen nearly every item can come up short of
    n_per_user (bounded draws = bounded work); raise ``oversample`` if
    the corpus is that dense. The item-index join is broadcast when the
    item dimension is small, a plain idx equi-join otherwise."""
    users = interactions.select("user_id").distinct()
    items = interactions.select("item_id").distinct()
    from pisa_spark.operators.ids import global_positions

    items_idx = global_positions(items, ["item_id"], "idx")
    n_items = items_idx.count()
    if n_items == 0:
        return interactions.sparkSession.createDataFrame(
            [], "user_id long, item_id long, rank int"
        )
    n_draws = n_per_user * oversample
    draws = users.select(
        "user_id",
        F.explode(F.sequence(F.lit(1), F.lit(n_draws))).alias("j"),
    )
    h = hash_wide(
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("j").cast("string")
        ),
        salt="neg:",
    )
    cand = draws.withColumn("idx", F.pmod(h, F.lit(n_items)))
    if n_items < 5_000_000:
        items_idx = F.broadcast(items_idx)
    cand = cand.join(items_idx, "idx").select("user_id", "item_id", "j")
    seen = interactions.select("user_id", "item_id").distinct()
    unseen = cand.join(seen, ["user_id", "item_id"], "left_anti")
    first = unseen.groupBy("user_id", "item_id").agg(F.min("j").alias("j"))
    w = Window.partitionBy("user_id").orderBy(F.col("j").asc())
    return (
        first.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_per_user)
        .select("user_id", "item_id", "rank")
    )
