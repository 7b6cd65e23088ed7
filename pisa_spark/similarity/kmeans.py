"""Distributed k-means + IVF (inverted-file) ANN.

k-means is the reference's iterative clustering loop
(/root/reference/src/models/PISA.py:91-134: cdist -> argmin ->
group-mean with empty-cluster handling) re-expressed as a driver loop
over two DataFrame operations per iteration:

    assign:  broadcast centroids -> per-row argmin (array expressions)
    update:  groupBy(cluster).agg(avg of each vector component)

Determinism discipline (the reference pins RNG seeds,
/root/reference/src/utils/utils.py:82-87): initial centroids are the
vectors with the K smallest ids — no RNG at all — and iteration count
is fixed, so results are identical across runs, partitions and
parallelism levels.

IVF search: corpus vectors are bucketed by nearest centroid (the
"inverted file"); a query probes only its ``nprobe`` nearest
centroids' buckets and scores those exactly. This is the IVF scale
path requested alongside the LSH variant: at 10^12 vectors the bucket
join touches |corpus| * nprobe / K of the data instead of all of it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import cosine_expr

# Quantization contract that makes the whole IVF path replayable by an
# independent engine (the DuckDB gate twin): centroid components are
# rounded to CENTROID_DECIMALS after every update (so the
# order-dependent distributed float sums of the update step collapse to
# one canonical decimal per component), and squared distances are
# rounded to DIST_DECIMALS before every argmin (so sub-ULP summation
# differences can never flip an assignment). Ties after rounding break
# to the lowest cluster id in both engines. This is the reference's
# determinism discipline (/root/reference/src/utils/utils.py:82-87)
# extended across ENGINES, not just runs.
CENTROID_DECIMALS = 6
DIST_DECIMALS = 9


def quantize_half_away(x, decimals: int):
    """Round half away from zero — the rounding rule of Spark F.round
    (HALF_UP) and DuckDB round(), unlike NumPy/Python's half-to-even.
    Used by the NumPy twin in tests so all three agree."""
    s = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def _dist2_expr(vec_col, centroid: np.ndarray):
    """Squared L2 distance between an array<float> column and a literal
    centroid, as a JVM expression; rounded to DIST_DECIMALS (see the
    quantization contract above)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(vec_col, lit, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        DIST_DECIMALS,
    )


def assign_clusters(
    embeddings: DataFrame, centroids: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, embedding, cluster) by nearest (squared-L2) centroid;
    ties break to the lowest cluster id (least over structs)."""
    scored = [
        F.struct(
            _dist2_expr(F.col(vec_col), centroids[i]).alias("d"),
            F.lit(i).alias("c"),
        )
        for i in range(len(centroids))
    ]
    best = F.least(*scored)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        best["c"].alias("cluster"),
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fixed-iteration deterministic k-means; returns (k, dim) centroids.

    Empty clusters keep their previous centroid (the reference resets
    empties from data, PISA.py:105-110; keeping the old centroid is the
    partition-deterministic variant). Updated centroids are quantized
    to CENTROID_DECIMALS (half-away rounding) so results are identical
    not only across runs/partitions but across ENGINES — the DuckDB
    gate twin replays the full loop and lands on the same centroids
    bit-for-bit (init vectors are raw, exact float->double)."""
    init_rows = (
        embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = np.array([r[0] for r in init_rows], dtype=np.float64)
    for _ in range(n_iter):
        assigned = assign_clusters(embeddings, centroids, id_col, vec_col)
        sums = (
            assigned.select(
                "cluster",
                *[
                    F.element_at(F.col("embedding"), i + 1)
                    .cast("double")
                    .alias(f"x{i}")
                    for i in range(dim)
                ],
            )
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(f"x{i}").alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        new = centroids.copy()
        for r in sums:
            if r["n"] > 0:
                new[r["cluster"]] = quantize_half_away(
                    np.array([r[f"s{i}"] for i in range(dim)]) / float(r["n"]),
                    CENTROID_DECIMALS,
                )
        centroids = new
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k by cosine: probe the nprobe nearest
    centroids' buckets, exact-score candidates, window top-k."""
    corpus = assign_clusters(embeddings, centroids, id_col, vec_col)
    # query -> its nprobe nearest clusters (tiny side, exploded)
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
    )
    dists = [
        F.struct(
            _dist2_expr(F.col("_qv"), centroids[i]).alias("d"), F.lit(i).alias("c")
        )
        for i in range(len(centroids))
    ]
    probed = qrows.withColumn(
        "cluster",
        F.explode(
            F.slice(
                F.transform(F.array_sort(F.array(*dists)), lambda s: s["c"]),
                1,
                nprobe,
            )
        ),
    )
    cand = corpus.join(F.broadcast(probed), "cluster")
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("embedding"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
