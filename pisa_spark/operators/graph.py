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

from pisa_spark.dedup.dedup import hash64


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
    gate_mod: int = 7,
) -> DataFrame:
    """Deterministic negative sampling: per user, up to ``n_per_user``
    items the user has NOT interacted with.

    Candidates are hash-gated (hash64(user:item) % gate_mod == 0) so the
    candidate relation is ~|users| * |items| / gate_mod, then the seen
    set is removed with left_anti (the reference's clicked-set rejection,
    made set-algebraic), and the per-user selection takes the smallest
    hash values (deterministic, uniform-ish). Returns
    (user_id, item_id, rank)."""
    users = interactions.select("user_id").distinct()
    items = interactions.select("item_id").distinct()
    h = hash64(
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("item_id").cast("string")
        ),
        salt="neg:",
    )
    cand = (
        users.crossJoin(items)
        .withColumn("h", h)
        .filter(F.col("h") % gate_mod == 0)
    )
    seen = interactions.select("user_id", "item_id").distinct()
    unseen = cand.join(seen, ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(F.col("h").asc(), F.col("item_id").asc())
    return (
        unseen.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_per_user)
        .select("user_id", "item_id", "rank")
    )
