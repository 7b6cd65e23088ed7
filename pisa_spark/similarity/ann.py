"""Similarity search over an embedding column (array<float>).

Two physical strategies:

* ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set
  against the corpus, cosine via JVM array expressions (zip_with +
  aggregate — whole-stage codegen, no UDF), window top-k. The baseline
  every approximate path is tested against.
* ``lsh_bucket_topk`` — scale path: random-hyperplane LSH. Each vector
  gets an nbits-bit signature (sign of dot with deterministic
  md5-derived hyperplanes); candidates = vectors whose signature lies
  within ``probe_hamming`` of the query's (multi-probe), scored
  exactly, then top-k. Recall < 1 by construction; measured against
  brute force in tests (recall@10 asserted).

At 10^12 scale brute force is a full scan per query batch (fine for
offline joins: one pass scores every query via broadcast); LSH turns
it into a bucket-pruned scan. An IVF variant would swap the signature
for a nearest-centroid id — same plan shape (bucket join), different
bucketing function.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import cosine_expr


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, vec_id, cosine).

    queries is broadcast (small); ties (cosine DESC, vec_id ASC).
    Self-match (identical ids) is NOT excluded — callers filter."""
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_emb")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("_emb"), F.col("_qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplanes_salted(dim: int, nbits: int, salt: str = "") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: component (i, j) derives
    from md5(f"hp{salt}:{i}:{j}") — engine-, run- and
    partition-independent (the determinism discipline of
    /root/reference/src/utils/utils.py:82-87, without RNG state)."""
    import hashlib

    planes = np.empty((nbits, dim), dtype=np.float64)
    for i in range(nbits):
        for j in range(dim):
            h = hashlib.md5(f"hp{salt}:{i}:{j}".encode()).hexdigest()[:8]
            planes[i, j] = (int(h, 16) / float(0xFFFFFFFF)) * 2.0 - 1.0
    return planes


def _hyperplanes(dim: int, nbits: int) -> np.ndarray:
    return _hyperplanes_salted(dim, nbits, salt="")


def signature_col(vec_col, planes: np.ndarray):
    """nbits-bit signature as long: bit i = 1 iff dot(vec, plane_i) > 0.
    Built from array expressions over a literal plane matrix."""
    nbits, _ = planes.shape
    sig = None
    for i in range(nbits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    probe_hamming: int = 1,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: multi-table signature bucket join + multi-probe.

    Standard LSH amplification: n_tables independent nbits-bit
    hyperplane signatures per vector; a corpus vector is a candidate if
    ANY table's signature Hamming-matches the query's within
    probe_hamming (probe signatures enumerated by flipping bits on the
    tiny broadcast query side). Exact cosine on candidates, top-k.
    Cost ~ n_tables bucket joins, each a key-equi-join — no all-pairs.
    """
    corpus_cols = [
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_emb"),
    ]
    plane_sets = [
        _hyperplanes_salted(dim, nbits, salt=f"t{t}") for t in range(n_tables)
    ]
    for t in range(n_tables):
        corpus_cols.append(
            signature_col(F.col(vec_col), plane_sets[t]).alias(f"sig{t}")
        )
    corpus = embeddings.select(*corpus_cols)
    # probe masks (bit flips up to probe_hamming)
    probes = [0]
    if probe_hamming >= 1:
        probes += [1 << i for i in range(nbits)]
    if probe_hamming >= 2:
        probes += [
            (1 << i) | (1 << j) for i in range(nbits) for j in range(i + 1, nbits)
        ]
    pieces = []
    for t in range(n_tables):
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qv"),
            signature_col(F.col(query_vec_col), plane_sets[t]).alias("qsig"),
        ).withColumn(
            f"sig{t}",
            F.explode(
                F.transform(
                    F.array(*[F.lit(p) for p in probes]),
                    lambda m: F.col("qsig").bitwiseXOR(m.cast("long")),
                )
            ),
        )
        pieces.append(
            corpus.join(
                F.broadcast(q.select("query_id", "_qv", f"sig{t}")), f"sig{t}"
            ).select("query_id", "vec_id", "_emb", "_qv")
        )
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    scored = (
        cand.dropDuplicates(["query_id", "vec_id"])
        .select(
            "query_id",
            "vec_id",
            cosine_expr(F.col("_emb"), F.col("_qv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
