"""Deterministic sampling: reproducibility, stability under growth,
and per-stratum fraction accuracy."""

from pyspark.sql import functions as F

from pisa_spark.operators.sampling import sample_fraction, sample_stratified


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_sample_fraction_accuracy_and_determinism(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sample_fraction(df, 0.25).collect()}
    b = {r["doc_id"] for r in sample_fraction(df.repartition(13), 0.25).collect()}
    assert a == b  # partition-layout independent
    assert abs(len(a) / 4000 - 0.25) < 0.03


def test_sample_stable_under_growth(spark):
    # old rows' decisions never change when new rows arrive
    small = {r["doc_id"] for r in sample_fraction(_docs(spark, 1000), 0.5).collect()}
    big = {r["doc_id"] for r in sample_fraction(_docs(spark, 4000), 0.5).collect()}
    assert small == {d for d in big if d < 1000}


def test_sample_stratified_fractions(spark):
    df = _docs(spark)
    kept = sample_stratified(df, "lang", {"en": 0.1, "de": 0.9}).collect()
    en = sum(1 for r in kept if r["lang"] == "en")
    de = sum(1 for r in kept if r["lang"] == "de")
    n_en = 4000 // 3 + 1
    n_de = 4000 - n_en
    assert abs(en / n_en - 0.1) < 0.04
    assert abs(de / n_de - 0.9) < 0.04


def test_sample_stratified_default_passthrough(spark):
    df = _docs(spark, 300)
    kept = sample_stratified(df, "lang", {"en": 0.0}).collect()
    assert all(r["lang"] == "de" for r in kept)
    assert len(kept) == 300 - (300 // 3)


def test_temperature_fractions_closed_form(spark):
    import pytest as _pt

    from pisa_spark.operators.sampling import temperature_fractions

    df = _docs(spark)  # en: 1334, de: 2666
    fr = {
        r["lang"]: (r["n_rows"], r["keep_ppm"])
        for r in temperature_fractions(df, "lang", 0.3).collect()
    }
    n_en, n_de = 4000 // 3 + 1, 4000 - (4000 // 3 + 1)
    assert fr["en"] == (n_en, 1_000_000)  # smallest stratum keeps all
    want_de = round((n_de / n_en) ** (0.3 - 1.0) * 1_000_000)
    assert fr["de"] == (n_de, want_de)
    # alpha = 1: natural mixing, everything kept
    fr1 = {
        r["lang"]: r["keep_ppm"]
        for r in temperature_fractions(df, "lang", 1.0).collect()
    }
    assert set(fr1.values()) == {1_000_000}
    with _pt.raises(ValueError):
        temperature_fractions(df, "lang", 0.0)
    with _pt.raises(ValueError):
        temperature_fractions(df, "lang", 1.5)


def test_temperature_sample_matches_stratified_draws(spark):
    from pisa_spark.operators.sampling import (
        temperature_fractions,
        temperature_sample,
    )

    df = _docs(spark)
    fr = {
        r["lang"]: r["keep_ppm"] / 1_000_000
        for r in temperature_fractions(df, "lang", 0.5).collect()
    }
    want = {
        r["doc_id"]
        for r in sample_stratified(df, "lang", fr).collect()
    }
    got = {r["doc_id"] for r in temperature_sample(df, "lang", 0.5).collect()}
    assert got == want
    # flattening: kept de/en ratio shrinks toward 1 vs the natural 2:1
    en = sum(1 for d in got if d % 3 == 0)
    de = len(got) - en
    assert de / en < 2666 / 1334 * 0.85


def test_temperature_null_strata_pass_through(spark):
    from pisa_spark.operators.sampling import (
        temperature_fractions,
        temperature_sample,
    )

    base = _docs(spark, 300)
    nulls = spark.range(300, 303).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("lang")
    )
    df = base.union(nulls)
    # NULL stratum never influences n_min / the fractions table
    fr = {r["lang"] for r in temperature_fractions(df, "lang", 0.5).collect()}
    assert fr == {"en", "de"}
    # alpha=1 keeps EVERY row, including the NULL-stratum ones
    kept = {r["doc_id"] for r in temperature_sample(df, "lang", 1.0).collect()}
    assert kept == set(range(303))
