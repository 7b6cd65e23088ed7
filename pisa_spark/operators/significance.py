"""Paired significance testing between retrieval runs — Fisher's
paired randomization test, the method the IR-evaluation literature
recommends for comparing systems on a query set (Smucker, Allan &
Carterette, CIKM 2007), derandomized with the engine's md5 draws so
two engines compute the IDENTICAL p-value.

Test contract (gate-pinned):

* inputs: two trec_eval outputs (query_id, metric, value) — per-query
  rows only (query_id >= 0); the test runs over the INNER join on
  query_id for one metric name;
* per-query differences are quantized to exact integers
  ``di = round((va - vb) * 10^4)`` — trec_eval values are 4-dp by
  contract, so this is lossless, and every statistic below becomes a
  function of INTEGER sums: order-free, bit-identical across engines
  (the same trick as the quantized index's int64 scores);
* replicate r flips query q's sign iff
  pmod(hash64('sig:' || r || ':' || q), 2) == 1 — the deterministic
  coin (operators/sampling.py's draw family);
* two-sided p = (#{r in [0, R): |S_r| >= |S_obs|} + 1) / (R + 1)
  with S the SUM of (signed) integer differences — the add-one is
  the permutation-test inclusion of the identity assignment;
* the paired t statistic rides along for reference:
  t = mean_d / (sd / sqrt(n)), sd^2 = (S2 - S^2/n) / (n-1), computed
  from the integer sums S = sum(di), S2 = sum(di^2) in a pinned
  operation order (no p-value from t — the randomization p IS the
  test; no incomplete-beta approximation to disagree over).

Scale shape: |Q| x R rows (a query SET times replicates — thousands
by hundreds, never corpus-sized), one partial-aggregated groupBy(r),
one scalar comparison pass. The metric tables themselves are
|Q|-sized trec_eval outputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import hash64

SIG_SALT = "sig:"
_SCALE = 10_000  # trec_eval emits 4-dp values; diffs are exact ints


def paired_randomization_test(
    metrics_a: DataFrame,
    metrics_b: DataFrame,
    metric: str = "ap",
    r: int = 1000,
) -> DataFrame:
    """One row: (metric, n_queries, mean_a, mean_b, mean_diff,
    t_stat, p_value) — two-sided paired randomization test of run A
    vs run B on ``metric``. Raises on an empty pairing or r < 1."""
    if r < 1:
        raise ValueError("need at least one replicate")
    a = metrics_a.filter(
        (F.col("metric") == metric) & (F.col("query_id") >= 0)
    ).select("query_id", F.col("value").alias("va"))
    b = metrics_b.filter(
        (F.col("metric") == metric) & (F.col("query_id") >= 0)
    ).select("query_id", F.col("value").alias("vb"))
    d = a.join(b, "query_id").select(
        "query_id",
        "va",
        "vb",
        F.round((F.col("va") - F.col("vb")) * F.lit(float(_SCALE)))
        .cast("long")
        .alias("di"),
    )
    rows = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("di").alias("s"),
        F.sum(F.col("di") * F.col("di")).alias("s2"),
        # run means from integer sums too — float accumulation order
        # must never reach a compared output
        F.sum(
            F.round(F.col("va") * F.lit(float(_SCALE))).cast("long")
        ).alias("sa"),
        F.sum(
            F.round(F.col("vb") * F.lit(float(_SCALE))).cast("long")
        ).alias("sb"),
    ).collect()[0]
    n = int(rows["n"])
    if n == 0:
        raise ValueError(
            f"no paired queries for metric {metric!r} — nothing to test"
        )
    s_obs = int(rows["s"])
    s2 = int(rows["s2"])
    mean_a = (int(rows["sa"]) / float(_SCALE)) / n
    mean_b = (int(rows["sb"]) / float(_SCALE)) / n
    mean_d = (s_obs / float(_SCALE)) / n
    if n > 1:
        var = (s2 - (s_obs * s_obs) / n) / (n - 1)
        sd = math.sqrt(var) / float(_SCALE)
        if sd > 0:
            t_stat = mean_d / (sd / math.sqrt(n))
        elif mean_d == 0:
            t_stat = 0.0
        else:
            t_stat = math.copysign(float("inf"), mean_d)
    else:
        t_stat = float("nan")
    spark = metrics_a.sparkSession
    reps = spark.range(int(r)).select(F.col("id").cast("int").alias("rep"))
    signed = (
        reps.crossJoin(F.broadcast(d.select("query_id", "di")))
        .select(
            "rep",
            (
                F.col("di")
                * F.when(
                    F.pmod(
                        hash64(
                            F.concat_ws(
                                ":",
                                F.col("rep").cast("string"),
                                F.col("query_id").cast("string"),
                            ),
                            SIG_SALT,
                        ),
                        F.lit(2),
                    )
                    == 1,
                    F.lit(-1),
                ).otherwise(F.lit(1))
            ).alias("sdi"),
        )
        .groupBy("rep")
        .agg(F.sum("sdi").alias("s_r"))
    )
    exceed = signed.filter(
        F.abs(F.col("s_r")) >= F.lit(abs(s_obs))
    ).count()
    p = (exceed + 1) / (int(r) + 1)
    out = [
        (
            metric,
            n,
            round(mean_a, 6),
            round(mean_b, 6),
            round(mean_d, 6),
            round(float(t_stat), 6) if math.isfinite(t_stat) else None,
            round(p, 6),
        )
    ]
    return spark.createDataFrame(
        out,
        "metric string, n_queries int, mean_a double, mean_b double,"
        " mean_diff double, t_stat double, p_value double",
    )
