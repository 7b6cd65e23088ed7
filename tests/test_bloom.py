"""Bloom filter: zero false negatives, FPR within the design
envelope, duplicate idempotence, bit_or mergeability, partition
invariance, and the semi-join pre-filter use case."""

from pyspark.sql import functions as F

from pisa_spark.functions.sketches import (
    BLOOM_K,
    BLOOM_M,
    bloom_build,
    bloom_contains,
    bloom_stats,
)


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("x")
    )


def test_bloom_no_false_negatives(spark):
    members = _vals(spark, 1024)
    sk = bloom_build(members, "x")
    res = bloom_contains(sk, members, "x").collect()
    assert len(res) == 1024
    assert all(r["present"] for r in res)


def test_bloom_fpr_within_envelope(spark):
    members = _vals(spark, 1024)
    sk = bloom_build(members, "x")
    absent = _vals(spark, 2000, prefix="absent")
    res = bloom_contains(sk, absent, "x").collect()
    fp = sum(1 for r in res if r["present"])
    # design FPR at n=1024, m=8192, k=4 is ~2.4%; allow generous slack
    assert fp / len(res) < 0.06, fp


def test_bloom_duplicates_are_free(spark):
    base = _vals(spark, 500)
    a = {(r["w"], r["word"]) for r in bloom_build(base, "x").collect()}
    b = {
        (r["w"], r["word"])
        for r in bloom_build(base.union(base).union(base), "x").collect()
    }
    assert a == b


def test_bloom_merge_by_bit_or(spark):
    a, b = _vals(spark, 400), _vals(spark, 400, prefix="w")
    whole = {
        (r["w"], r["word"]) for r in bloom_build(a.union(b), "x").collect()
    }
    merged = {
        (r["w"], r["word"])
        for r in bloom_build(a, "x")
        .unionByName(bloom_build(b, "x"))
        .groupBy("w")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    }
    assert whole == merged


def test_bloom_partition_invariant(spark):
    df = _vals(spark, 900)
    a = {(r["w"], r["word"]) for r in bloom_build(df.repartition(1), "x").collect()}
    b = {(r["w"], r["word"]) for r in bloom_build(df.repartition(17), "x").collect()}
    assert a == b


def test_bloom_stats_shape(spark):
    sk = bloom_build(_vals(spark, 1024), "x")
    row = bloom_stats(sk).collect()[0]
    assert 0 < row["set_bits"] <= BLOOM_M
    # fill_ratio is rounded to 6 dp
    assert abs(row["fill_ratio"] - row["set_bits"] / BLOOM_M) < 1e-6
    assert 0 < row["fpr_est"] < 1
    # at n=1024, m=8192, k=4 the fill is ~1-e^(-0.5) ~ 0.39
    assert 0.3 < row["fill_ratio"] < 0.5


def test_bloom_semi_prefilter_exact(spark):
    # pre-filtering the big side by the bloom then doing the exact
    # semi-join equals the plain exact semi-join (no false negatives
    # means nothing real is dropped; the exact join kills the FPs)
    small = _vals(spark, 200)
    big = _vals(spark, 3000)  # ids 0..2999 -> 200 overlap
    sk = bloom_build(small, "x")
    maybe = (
        big.join(bloom_contains(sk, big, "x"), "x")
        .where("present")
        .drop("present")
    )
    got = {r["x"] for r in maybe.join(small, "x", "left_semi").collect()}
    want = {r["x"] for r in big.join(small, "x", "left_semi").collect()}
    assert got == want and len(want) == 200
