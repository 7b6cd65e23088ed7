"""Deterministic HyperLogLog: accuracy within the published error
envelope, exact partition invariance, duplicate idempotence, and
register mergeability."""

from pyspark.sql import functions as F

from pisa_spark.functions.sketches import hll_distinct, hll_registers


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("x")
    )


def test_hll_accuracy_within_envelope(spark):
    # p=9 -> standard error ~4.6%; allow 3 sigma
    for n in (500, 5000):
        est = hll_distinct(_vals(spark, n), "x").collect()[0]["distinct_est"]
        assert abs(est - n) / n < 0.14, (n, est)


def test_hll_duplicates_are_free(spark):
    base = _vals(spark, 1000)
    dup = base.union(base).union(base)
    a = hll_distinct(base, "x").collect()[0]["distinct_est"]
    b = hll_distinct(dup, "x").collect()[0]["distinct_est"]
    assert a == b


def test_hll_partition_invariant(spark):
    df = _vals(spark, 3000)
    a = hll_distinct(df.repartition(1), "x").collect()[0]["distinct_est"]
    b = hll_distinct(df.repartition(17), "x").collect()[0]["distinct_est"]
    assert a == b


def test_hll_registers_merge_by_max(spark):
    # sketch(A union B) == groupBy-max over union of sketches(A), (B)
    a, b = _vals(spark, 800), _vals(spark, 800, prefix="w")
    whole = {
        (r["b"], r["mreg"])
        for r in hll_registers(a.union(b), "x").collect()
    }
    merged = {
        (r["b"], r["mreg"])
        for r in hll_registers(a, "x")
        .unionByName(hll_registers(b, "x"))
        .groupBy("b")
        .agg(F.max("mreg").alias("mreg"))
        .collect()
    }
    assert whole == merged


def test_hll_grouped(spark):
    df = _vals(spark, 400).withColumn(
        "g", (F.length("x") % 2).cast("string")
    )
    rows = hll_distinct(df, "x", by=["g"]).collect()
    assert len(rows) == 2
    total = sum(r["distinct_est"] for r in rows)
    assert abs(total - 400) / 400 < 0.2


def test_cms_never_underestimates_and_bounds_error(spark):
    from pisa_spark.functions.sketches import cms_build, cms_estimate

    # zipf-ish: value v_i appears i times, i = 1..60 (N = 1830)
    rows = [(f"v{i}",) for i in range(1, 61) for _ in range(i)]
    df = spark.createDataFrame(rows, "x string")
    sk = cms_build(df, "x")
    probes = spark.createDataFrame(
        [(f"v{i}",) for i in (1, 10, 30, 60)] + [("absent",)], "x string"
    )
    est = {r["x"]: r["est"] for r in cms_estimate(sk, probes).collect()}
    n_total = 1830
    for i in (1, 10, 30, 60):
        true = i
        assert est[f"v{i}"] >= true  # one-sided error
        assert est[f"v{i}"] <= true + 2 * n_total / 1024 + 1
    assert est["absent"] <= 2 * n_total / 1024 + 1


def test_cms_merge_by_sum(spark):
    from pisa_spark.functions.sketches import cms_build

    a = spark.createDataFrame([("p",), ("q",), ("p",)], "x string")
    b = spark.createDataFrame([("p",), ("r",)], "x string")
    whole = {
        (r["row"], r["b"], r["cnt"])
        for r in cms_build(a.union(b), "x").collect()
    }
    merged = {
        (r["row"], r["b"], r["cnt"])
        for r in cms_build(a, "x")
        .unionByName(cms_build(b, "x"))
        .groupBy("row", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert whole == merged
