"""Collection-law fits: slope recovery on constructed power laws,
partition invariance of the decimal-summed OLS, checkpoint-curve
semantics."""

import math

from pyspark.sql import functions as F

from pisa_spark.functions.laws import (
    collection_laws,
    heaps_fit,
    heaps_points,
    zipf_fit,
)


def test_zipf_recovers_constructed_slope(spark):
    # cf_i = round(10000 / i^0.8): OLS on the exact points recovers
    # ~-0.8 (rounding of cf perturbs the tail slightly)
    rows = [(f"t{i:04d}", max(1, round(10000 / i**0.8))) for i in range(1, 201)]
    tf = spark.createDataFrame(rows, "term string, tf long")
    r = zipf_fit(tf, top_n=200).collect()[0]
    assert abs(r["zipf_slope"] + 0.8) < 0.02, r
    assert r["zipf_r2"] > 0.99
    assert r["zipf_n"] == 200


def test_zipf_rank_tiebreak_deterministic(spark):
    # equal cf -> rank by term ASC; fit must not depend on input order
    rows = [("b", 10), ("a", 10), ("c", 5), ("d", 2)]
    tf1 = spark.createDataFrame(rows, "term string, tf long")
    tf2 = spark.createDataFrame(rows[::-1], "term string, tf long")
    a = zipf_fit(tf1).collect()[0]
    b = zipf_fit(tf2).collect()[0]
    assert a == b


def test_heaps_points_curve(spark):
    # 4 docs; term first-occurrences staged so the curve is known
    tf = spark.createDataFrame(
        [(0, "a", 2), (0, "b", 1), (1, "a", 1), (1, "c", 1),
         (2, "d", 3), (3, "a", 1)],
        "doc_id long, term string, tf long",
    )
    lens = spark.createDataFrame(
        [(0, 3), (1, 2), (2, 3), (3, 1)], "doc_id long, doc_len long"
    )
    pts = {
        r["c"]: (r["tokens_seen"], r["vocab_seen"])
        for r in heaps_points(tf, lens, [0, 1, 3]).collect()
    }
    assert pts == {0: (3, 2), 1: (5, 3), 3: (9, 4)}


def test_heaps_recovers_constructed_beta(spark):
    # construct tokens_seen n_j and vocab_seen = round(3 * n^0.5)
    pts = []
    for j in range(4, 16):
        n = 2**j
        pts.append((j, n, round(3.0 * math.sqrt(n))))
    df = spark.createDataFrame(pts, "c long, tokens_seen long, vocab_seen long")
    r = heaps_fit(df).collect()[0]
    assert abs(r["heaps_slope"] - 0.5) < 0.01
    assert abs(math.exp(r["heaps_intercept"]) - 3.0) < 0.1
    assert r["heaps_r2"] > 0.999


def test_partition_invariance(spark):
    rows = [(f"t{i}", max(1, 5000 // (i + 1))) for i in range(300)]
    tf = spark.createDataFrame(rows, "term string, tf long")
    a = zipf_fit(tf.repartition(1)).collect()[0]
    b = zipf_fit(tf.repartition(13)).collect()[0]
    assert a == b


def test_collection_laws_one_row(spark):
    tf = spark.createDataFrame(
        [(d, f"t{(d * 7 + i) % 40}", 1 + (d + i) % 3)
         for d in range(50) for i in range(6)],
        "doc_id long, term string, tf long",
    )
    lens = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    out = collection_laws(tf, lens, [0, 1, 3, 7, 15, 31, 49]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["zipf_slope"] < 0  # frequency decreases with rank
    assert 0 < r["heaps_slope"] <= 1  # sublinear vocabulary growth
    assert r["heaps_n"] == 7
