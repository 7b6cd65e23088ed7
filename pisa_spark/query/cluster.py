"""Search-result clustering — the Scatter/Gather UI operation
(Cutting, Karger, Pedersen & Tukey, SIGIR 1992): group each query's
top-N result documents into themes by k-means over their embeddings,
so the UI can offer cluster labels/drill-down beside the ranked list.

This is the PER-QUERY rendering of similarity/kmeans.py's
deterministic k-means, under the IDENTICAL quantization contract
(squared distances rounded to 9 dp before every argmin with
lowest-cluster ties; updated centroid components rounded to 6 dp
half-away; init = the n_clusters smallest doc ids; empty clusters
keep their previous centroid; fixed iteration count; one FINAL
assignment under the final centroids is the output). The contract is
what lets the DuckDB twin replay every iteration per query and land
on identical clusters.

Spark shape: one broadcast join attaches embeddings to the
|queries| x N result rows (vec_id IS the doc id — the TESTDATA
contract, as in query/hybrid.py), then ONE applyInPandas over
groupBy(query_id) runs the bounded NumPy loop per group — each group
is <= N vectors, so this is exactly the "custom per-group stateful
kernel" shape applyInPandas exists for; no driver round-trips, every
query clusters in parallel. Result docs with no stored vector are
absent from the output (surfaced by the count, not silently
clustered).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.similarity.kmeans import (
    CENTROID_DECIMALS,
    DIST_DECIMALS,
    quantize_half_away,
)

_OUT_SCHEMA = "query_id int, doc_id long, cluster int"


def cluster_results(
    results: DataFrame,
    embeddings: DataFrame,
    n_clusters: int = 3,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, doc_id, cluster) for each result doc with a stored
    vector, clustered per query under the module contract."""
    if n_clusters < 1 or iters < 1:
        raise ValueError("n_clusters and iters must be >= 1")
    res = results.select("query_id", "doc_id")
    joined = embeddings.select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("emb")
    ).join(F.broadcast(res), "doc_id")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        qid = int(pdf["query_id"].iloc[0])
        ids = pdf["doc_id"].to_numpy()
        vecs = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
        )
        kk = min(n_clusters, len(ids))
        cents = vecs[:kk].copy()

        def assign(c):
            d2 = quantize_half_away(
                ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2),
                DIST_DECIMALS,
            )
            return d2.argmin(axis=1)  # first index = lowest cluster tie

        for _ in range(iters):
            a = assign(cents)
            new = cents.copy()
            for c in range(kk):
                m = a == c
                if m.any():
                    new[c] = quantize_half_away(
                        vecs[m].sum(axis=0) / float(m.sum()),
                        CENTROID_DECIMALS,
                    )
            cents = new
        final = assign(cents)
        return pd.DataFrame(
            {
                "query_id": np.full(len(ids), qid, dtype=np.int32),
                "doc_id": ids,
                "cluster": final.astype(np.int32),
            }
        )

    return joined.groupBy("query_id").applyInPandas(
        kernel, schema=_OUT_SCHEMA
    )


def cluster_labels(
    clusters: DataFrame,
    tf_df: DataFrame,
    stopwords: DataFrame | None = None,
    top: int = 3,
) -> DataFrame:
    """(query_id, cluster, rank, term, score) — the Scatter/Gather
    cluster LABELS: per (query, cluster), the ``top`` terms by summed
    tf over the cluster's documents, ranked (score DESC, term ASC),
    with an optional (term, ...) stop relation anti-joined away first
    (pass the query/stopwords.py negative-idf artifact — without it
    every label is a stop word, the same fluent-prose insight jusText
    uses). clusters: (query_id, doc_id, cluster); tf_df: (doc_id,
    term, tf). One broadcast join + one hash aggregate + the usual
    partial top-k window."""
    from pyspark.sql import Window

    tf = tf_df.select("doc_id", "term", "tf")
    if stopwords is not None:
        tf = tf.join(
            F.broadcast(stopwords.select("term")), "term", "left_anti"
        )
    lab = (
        tf.join(
            F.broadcast(clusters.select("query_id", "doc_id", "cluster")),
            "doc_id",
        )
        .groupBy("query_id", "cluster", "term")
        .agg(F.sum("tf").cast("long").alias("score"))
    )
    w = Window.partitionBy("query_id", "cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        lab.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("query_id", "cluster", "rank", "term", "score")
    )
