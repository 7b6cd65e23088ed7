"""Validators — the reference's abort-on-NaN check as a first-class
operator (/root/reference/src/helpers/Runner.py:232-234:
``flag = np.isnan(prediction).any(); if flag: break``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nonfinite(col):
    c = F.col(col).cast("double")
    return F.isnan(c) | (c == float("inf")) | (c == float("-inf")) | c.isNull()


def nonfinite_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_nonfinite) — NaN/±Inf/NULL tally per column, one
    aggregation pass over the input (no per-column jobs)."""
    agg = df.agg(
        *[
            # coalesce: SUM over zero rows is NULL; an empty frame is
            # vacuously finite, not an error
            F.coalesce(F.sum(_nonfinite(c).cast("long")), F.lit(0)).alias(c)
            for c in cols
        ]
    )
    pieces = [
        agg.select(F.lit(c).alias("col_name"), F.col(c).alias("n_nonfinite"))
        for c in cols
    ]
    return reduce(lambda a, b: a.unionByName(b), pieces)


def nan_guard(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pass-through validator: returns df unchanged iff every value in
    ``cols`` is finite, else raises — the reference's break-on-NaN
    (Runner.py:232-234) with the check made explicit and distributed."""
    bad = {
        r["col_name"]: r["n_nonfinite"]
        for r in nonfinite_counts(df, cols).collect()
        if r["n_nonfinite"] > 0
    }
    if bad:
        raise ValueError(f"non-finite values detected: {bad}")
    return df
