"""Deterministic sampling — the data-mixing operator of a training-
data pipeline (downsample over-represented strata, keep rare ones):
every keep/drop decision is a pure function of the row's key, so
samples are reproducible across runs, engines and partitionings
(unlike DataFrame.sample, whose output depends on partition layout),
and the DuckDB oracle replays them row for row.

Keep rule: row survives iff pmod(hash64('samp:' || key), 10^6) <
round(fraction * 10^6) for its stratum — an exact-integer threshold
on a uniform deterministic draw. A row's fate never changes when data
around it moves, which also makes the sample STABLE under corpus
growth: new rows get sampled, old decisions stand (the property
incremental pipelines need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import hash64

_DEN = 1_000_000


def sample_draw(key: Column) -> Column:
    """The uniform integer draw in [0, 10^6) for a key."""
    return F.pmod(hash64(key.cast("string"), "samp:"), F.lit(_DEN))


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by key."""
    return df.filter(sample_draw(F.col(key_col)) < int(round(fraction * _DEN)))


def temperature_fractions(
    df: DataFrame, strata_col: str, alpha: float
) -> DataFrame:
    """(stratum, n_rows, keep_ppm): deterministic per-stratum keep
    fractions implementing temperature-scaled mixture sampling (the
    multilingual-LM data-mixing rule of XLM-R / mBERT: sample strata
    with probability proportional to ``n_s**alpha``). With a fixed
    corpus and no duplication the realizable rendering is a keep
    fraction ``f_s = (n_s / n_min)**(alpha - 1)`` — the smallest
    stratum keeps everything, larger strata are downsampled toward
    the flattened target; ``alpha = 1`` keeps everything (natural
    mixing). Fractions are quantized to ppm integers so the DuckDB
    twin replays them exactly. The counts relation is
    strata-cardinality-sized; only the single ``n_min`` scalar
    touches the driver."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("temperature alpha must be in (0, 1]")
    counts = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    n_min = counts.agg(F.min("n_rows")).collect()[0][0]
    if n_min is None:
        return counts.withColumn("keep_ppm", F.lit(_DEN).cast("long"))
    return counts.withColumn(
        "keep_ppm",
        F.least(
            F.lit(_DEN).cast("long"),
            F.round(
                F.pow(F.col("n_rows") / F.lit(float(n_min)), alpha - 1.0)
                * _DEN
            ).cast("long"),
        ),
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    key_col: str = "doc_id",
    fractions: DataFrame | None = None,
) -> DataFrame:
    """Temperature-scaled mixture sample: ``temperature_fractions``
    broadcast-joined back and applied through the same deterministic
    ppm draw as every other sampler here — reproducible across runs,
    engines, partitionings, and stable under corpus growth within a
    stratum (a kept row only flips if its stratum's fraction moves).
    NULL-stratum rows pass through unsampled (fraction 1.0, matching
    ``sample_stratified``'s default-passthrough) and never influence
    ``n_min``. Pass a precomputed ``temperature_fractions`` result via
    ``fractions`` to avoid recounting."""
    fr = (
        temperature_fractions(df, strata_col, alpha)
        if fractions is None
        else fractions
    )
    return (
        df.join(F.broadcast(fr), strata_col, "left")
        .filter(
            sample_draw(F.col(key_col))
            < F.coalesce(F.col("keep_ppm"), F.lit(_DEN))
        )
        .drop("n_rows", "keep_ppm")
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum's rows (``default`` for unlisted strata) — e.g.
    {'en': 0.3} downsamples English to 30% while every other language
    passes through. Pure filter: no shuffle, pipelines into whatever
    follows."""
    thresh = None
    for val, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == val
        t = F.lit(int(round(frac * _DEN)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default * _DEN)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default * _DEN))))
    )
    return df.filter(sample_draw(F.col(key_col)) < thresh)
