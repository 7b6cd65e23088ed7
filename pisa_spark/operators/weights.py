"""Snapshot-divergence weighting — the Spark rendering of the
reference's deterministic JSD user weights
(/root/reference/src/models/PISA.py:137-161):

1. every row's vector is projected onto K cluster centroids
   (``Gu[i] = cent[i] @ h``) and softmaxed into a distribution over
   clusters (max-subtracted softmax, the numerically-stabilized form
   torch uses);
2. the per-row weight is the Jensen-Shannon divergence between the
   CURRENT and PREVIOUS snapshot's distributions, with the reference's
   eps (1e-10, PISA.py:19) inside every log;
3. weights are mean-centered and squashed: sigmoid(jsd - mean(jsd)).

Everything is array higher-order functions over a broadcast literal
centroid matrix — one narrow map per snapshot plus a 1-row global mean,
no UDF, no shuffle beyond the id-equi-join of the two snapshots. The
identical arithmetic runs in the DuckDB oracle (list_transform /
list_sum walk arrays left to right in both engines).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_EPS = 1e-10  # /root/reference/src/models/PISA.py:19


def cluster_affinity(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "p",
) -> DataFrame:
    """(id, p:array<double>[K]) — softmax over cluster-centroid dots
    (PISA.py:141-148), max-subtracted for stability."""
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    mx = F.array_max(dots)
    exps = F.transform(dots, lambda d: F.exp(d - mx))
    s = F.aggregate(exps, F.lit(0.0), lambda acc, v: acc + v)
    p = F.transform(exps, lambda e: e / s)
    return df.select(F.col(id_col).alias("id"), p.alias(out_col))


def jsd_expr(p, q, eps: float = DEFAULT_EPS):
    """0.5*(KL(p||m)+KL(q||m)) with m = (p+q)/2 and eps inside each log
    — verbatim the reference's jsd() (PISA.py:151-154)."""
    m = F.zip_with(p, q, lambda a, b: (a + b) * 0.5)
    kl_p = F.aggregate(
        F.zip_with(p, m, lambda a, b: a * (F.log(a + eps) - F.log(b + eps))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    kl_q = F.aggregate(
        F.zip_with(q, m, lambda a, b: a * (F.log(a + eps) - F.log(b + eps))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return 0.5 * (kl_p + kl_q)


def jsd_weights(
    cur: DataFrame,
    prev: DataFrame,
    centroids: np.ndarray,
    eps: float = DEFAULT_EPS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, jsd, weight) with weight = sigmoid(jsd - mean(jsd))
    (PISA.py:156-159). cur/prev: two snapshots of the same id space."""
    pc = cluster_affinity(cur, centroids, id_col, vec_col, out_col="pc")
    pp = cluster_affinity(prev, centroids, id_col, vec_col, out_col="pp")
    joined = pc.join(pp, "id")
    # reference arg order: jsd(Gu_prev, Gu) (PISA.py:156)
    scored = joined.select(
        "id", jsd_expr(F.col("pp"), F.col("pc"), eps).alias("jsd")
    )
    mean = scored.agg(F.avg("jsd").alias("mu"))
    return (
        scored.crossJoin(F.broadcast(mean))
        .select(
            "id",
            "jsd",
            (1.0 / (1.0 + F.exp(-(F.col("jsd") - F.col("mu"))))).alias("weight"),
        )
    )
