"""Graph normalization + deterministic negative sampling invariants."""

import math

from pyspark.sql import functions as F

from pisa_spark.operators.graph import negative_samples, normalized_edges
from pisa_spark.operators.snapshots import interactions_from_events


def test_normalized_edges_math(spark, sf_dir):
    inter = interactions_from_events(spark, sf_dir)
    edges = normalized_edges(inter).collect()
    # recompute degrees driver-side on the small fixture
    pairs = {(r["user_id"], r["item_id"]) for r in inter.collect()}
    du, di = {}, {}
    for u, i in pairs:
        du[u] = du.get(u, 0) + 1
        di[i] = di.get(i, 0) + 1
    assert len(edges) == len(pairs)
    for r in edges[:200]:
        expect = round(1.0 / math.sqrt(du[r["user_id"]] * di[r["item_id"]]), 6)
        assert abs(r["weight"] - expect) < 1e-9


def test_negative_samples_never_seen_and_deterministic(spark, sf_dir):
    inter = interactions_from_events(spark, sf_dir).cache()
    neg = negative_samples(inter, n_per_user=5)
    leaked = neg.join(
        inter.select("user_id", "item_id").distinct(), ["user_id", "item_id"]
    ).count()
    assert leaked == 0
    per_user = neg.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_user.filter(F.col("n") > 5).count() == 0
    a = sorted(map(tuple, neg.collect()))
    b = sorted(map(tuple, negative_samples(inter.repartition(9), n_per_user=5).collect()))
    assert a == b
