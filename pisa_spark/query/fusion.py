"""Rank fusion — RRF and CombSUM/CombMNZ over retrieval runs.

The standard way to combine rankings from different scorers or systems
(BM25 + a language model, lexical + dense, base + delta federations):

- **Reciprocal Rank Fusion** (Cormack, Clarke & Buettcher, SIGIR 2009):
  ``rrf(d) = sum_r w_r / (k_rrf + rank_r(d))`` with the canonical
  ``k_rrf = 60``. Rank-based, so it needs no score normalization and is
  robust to incomparable score scales.
- **CombSUM / CombMNZ** (Fox & Shaw, TREC-2) with per-query min-max
  score normalization over each run's retrieved list (Lee 1997):
  ``norm_r(d) = (s - min_r) / (max_r - min_r)`` (0 when the run's
  scores are constant), ``combsum(d) = sum_r norm_r(d)``, and CombMNZ
  multiplies by the number of runs that retrieved ``d``.

Documents missing from a run contribute 0 from that run (the standard
convention — fusion operates on the runs' top-``depth`` lists, not the
full corpus).

Determinism contract: runs are combined by pinned-order full outer
joins (run 0 leftmost), and the fused sum is written as a left-to-right
chained ``+`` — never a ``groupBy().sum()`` over a union — so float
accumulation order is identical on every partitioning, every
parallelism level, and in the DuckDB twin (gates ``fusion_rrf_topk``,
``fusion_combsum_topk``). Ties break (fused DESC, doc_id ASC) via
``topk_window``.

Scale shape: each run is already a top-``depth``-bounded relation
(<= |queries| * depth rows — the expensive work happened inside the
pruned kernels that produced it). Fusion joins and windows therefore
touch only tiny relations; with broadcast-size runs Catalyst picks
broadcast hash joins and the whole fuse is a few narrow stages. At
10^12 docs the cost of fused serving is the cost of the member runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import topk_window

RRF_K = 60.0


def _aligned(runs: list[DataFrame], depth: int) -> DataFrame:
    """Full-outer-join the runs' top-``depth`` lists on (query_id,
    doc_id) in pinned run order; run i contributes rank_i / score_i
    columns (NULL where the run missed the doc)."""
    if not runs:
        raise ValueError("fusion needs at least one run")
    parts = [
        r.filter(F.col("rank") <= depth).select(
            "query_id",
            "doc_id",
            F.col("rank").alias(f"rank_{i}"),
            F.col("score").cast("double").alias(f"score_{i}"),
        )
        for i, r in enumerate(runs)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.join(p, ["query_id", "doc_id"], "full_outer")
    return out


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    depth: int = 100,
    k_rrf: float = RRF_K,
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse (query_id, rank, doc_id, score) runs by weighted RRF ->
    (query_id, rank, doc_id, score) top-k. ``depth`` bounds how deep
    each run's list is read; ``weights`` defaults to all-1."""
    if weights is None:
        weights = [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError("one weight per run")
    aligned = _aligned(runs, depth)
    fused = F.lit(0.0)
    for i, w in enumerate(weights):
        fused = fused + F.coalesce(
            F.lit(float(w)) / (F.lit(float(k_rrf)) + F.col(f"rank_{i}")),
            F.lit(0.0),
        )
    return topk_window(
        aligned.select("query_id", "doc_id", fused.alias("score")), k
    )


def combsum_fuse(
    runs: list[DataFrame],
    k: int = 10,
    depth: int = 100,
    mnz: bool = False,
) -> DataFrame:
    """Fuse runs by CombSUM (CombMNZ when ``mnz``) with per-query
    min-max normalization over each run's retrieved list."""
    normed = []
    for i, r in enumerate(runs):
        lst = r.filter(F.col("rank") <= depth).select(
            "query_id", "doc_id", F.col("score").cast("double").alias("s")
        )
        ext = lst.groupBy("query_id").agg(
            F.min("s").alias("lo"), F.max("s").alias("hi")
        )
        normed.append(
            lst.join(ext, "query_id")
            .select(
                "query_id",
                "doc_id",
                F.when(
                    F.col("hi") > F.col("lo"),
                    (F.col("s") - F.col("lo")) / (F.col("hi") - F.col("lo")),
                )
                .otherwise(F.lit(0.0))
                .alias("norm"),
                F.lit(1).alias("hit"),
            )
            .withColumnsRenamed({"norm": f"norm_{i}", "hit": f"hit_{i}"})
        )
    out = normed[0]
    for p in normed[1:]:
        out = out.join(p, ["query_id", "doc_id"], "full_outer")
    fused = F.lit(0.0)
    hits = F.lit(0)
    for i in range(len(runs)):
        fused = fused + F.coalesce(F.col(f"norm_{i}"), F.lit(0.0))
        hits = hits + F.coalesce(F.col(f"hit_{i}"), F.lit(0))
    score = fused * hits.cast("double") if mnz else fused
    return topk_window(
        out.select("query_id", "doc_id", score.alias("score")), k
    )
