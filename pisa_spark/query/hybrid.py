"""Hybrid dense + sparse retrieval — BM25 and embedding-cosine runs
fused by weighted Reciprocal Rank Fusion, the standard first-stage
architecture of modern search stacks (lexical recall + semantic
recall, RRF the glue — the composition every 2020s engine ships).

This module is deliberately a COMPOSITION of already-verified parts:
the BM25 run comes from the exact/WAND kernels (rank-identical by the
suite's exactness gates), the dense run from similarity/ann.py
(brute-force cosine, or the multi-table LSH path at scale), and the
fuse from query/fusion.py's pinned-order RRF. Nothing here introduces
new numeric contracts beyond theirs: RRF consumes only the two runs'
RANKS (exact integers on both engines), so the fused score is an
exact rational and the DuckDB twin reproduces it bit-for-bit.

Scale shape: each run is depth-bounded per query before the fuse
(fusion joins tiny relations); the dense run's scale path is the
LSH-bucketed variant (`dense='lsh'`) — brute force is the oracle
baseline, exactly as in the ANN gates. Doc/vector ids are joined by
identity: the embeddings relation's vec_id IS the doc id (the
TESTDATA contract; real deployments key their vector store the same
way or pass a pre-joined embeddings frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import bm25_topk_dataframe
from pisa_spark.query.fusion import RRF_K, rrf_fuse
from pisa_spark.similarity.ann import cosine_topk_bruteforce, lsh_bucket_topk


def dense_run_as_docs(dense: DataFrame) -> DataFrame:
    """(query_id, rank, vec_id, cosine) -> the (query_id, rank,
    doc_id, score) run shape fusion consumes."""
    return dense.select(
        "query_id",
        "rank",
        F.col("vec_id").alias("doc_id"),
        F.col("cosine").alias("score"),
    )


def hybrid_rrf_topk(
    tf_df: DataFrame,
    queries_df: DataFrame,
    query_vecs: DataFrame,
    embeddings: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    depth: int = 50,
    k_rrf: float = RRF_K,
    weights: list[float] | None = None,
    dense: str = "brute",
    df_df: DataFrame | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Relation-path hybrid retrieval: BM25 over ``tf_df`` (doc_id,
    term, tf, doc_len [, df — derived when absent, or pass ``df_df``
    for the block-metadata side table]) for ``queries_df`` (query_id,
    term) + cosine over ``embeddings`` for ``query_vecs`` (query_id,
    query_vec), each cut at ``depth``, RRF-fused to (query_id, rank,
    doc_id, score). weights: [sparse, dense], default equal. dense:
    'brute' (exact) or 'lsh' (bucket-bounded, kwargs forwarded to
    lsh_bucket_topk)."""
    from pisa_spark.query.feedback import _with_df

    sparse = bm25_topk_dataframe(
        _with_df(tf_df, df_df), queries_df, n_docs, avgdl, k=depth
    )
    if dense == "brute":
        d = cosine_topk_bruteforce(embeddings, query_vecs, k=depth)
    elif dense == "lsh":
        d = lsh_bucket_topk(embeddings, query_vecs, k=depth, **lsh_kwargs)
    else:
        raise ValueError("dense must be 'brute' or 'lsh'")
    return rrf_fuse(
        [sparse, dense_run_as_docs(d)],
        k=k,
        depth=depth,
        k_rrf=k_rrf,
        weights=weights,
    )
