"""Subprocess worker for the scaling benchmark: one parallelism level.

Builds the index over a deterministically-amplified corpus (documents
replicated with shifted doc_ids — pure function of (doc_id, replica),
no randomness) and runs the batched WAND query suite; prints one JSON
line. Run via scripts/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import build_postings
from pisa_spark.query.bm25 import bm25_topk_wand
from pisa_spark.session import get_spark

_VOCAB = [
    "data", "join", "the", "spark", "query", "scan", "window", "merge",
    "table", "row", "hash", "sort", "group", "filter", "batch", "stream",
]


def make_queries(n: int) -> list[dict]:
    """n deterministic queries over the synthetic vocabulary (pairs and
    triples, alternating OR/AND) — a throughput-shaped batch."""
    out = []
    for i in range(n):
        a = _VOCAB[i % len(_VOCAB)]
        b = _VOCAB[(i * 7 + 3) % len(_VOCAB)]
        c = _VOCAB[(i * 5 + 11) % len(_VOCAB)]
        terms = [a, b] if i % 2 == 0 else [a, b, c]
        out.append(
            {"query_id": i, "terms": terms, "conjunctive": i % 4 == 3}
        )
    return out


def main() -> None:
    cores = int(os.environ["SCALING_CORES"])
    replicas = int(os.environ.get("SCALING_REPLICAS", "256"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_buckets = int(os.environ.get("SCALING_BUCKETS", "64"))
    n_queries = int(os.environ.get("SCALING_NQUERIES", "64"))

    spark = get_spark(
        app_name=f"scaling_{cores}", cores=cores, shuffle_partitions=2 * cores
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).withColumnRenamed("id", "rep")
    amplified = (
        docs.crossJoin(reps)
        .select((F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"), "text")
        # input splits: a real corpus arrives in many files; the tiny
        # test parquet is one split, which would serialize the scan
        .repartition(cores * 4)
    )
    toks = amplified.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens")).cache()
    row = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a"),
        F.max("doc_id").alias("m"),
    ).collect()[0]
    n_docs, avgdl, mx = int(row["n"]), float(row["a"]), int(row["m"])

    # warm the Python worker pool (fork + pandas/numpy import is paid
    # once per reused worker; a serving cluster runs warm)
    import pandas as pd  # noqa: F401

    def _warm(it):
        import numpy  # noqa: F401
        for b in it:
            yield b

    spark.range(cores * 8, numPartitions=cores * 2).mapInPandas(
        _warm, schema="id long"
    ).count()

    t0 = time.perf_counter()
    postings = build_postings(
        toks, n_docs, avgdl, n_buckets=n_buckets, max_doc_id=mx
    ).cache()
    n_postings = int(postings.agg(F.sum("n")).collect()[0][0])
    t_build = time.perf_counter() - t0

    queries = make_queries(n_queries)
    t0 = time.perf_counter()
    bm25_topk_wand(postings, queries, n_docs, avgdl, k=10).collect()
    t_query = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "postings": n_postings,
                "build_s": round(t_build, 3),
                "docs_per_s": round(n_docs / t_build, 1),
                "postings_per_s": round(n_postings / t_build, 1),
                "query_batch_s": round(t_query, 3),
                "queries_per_s": round(n_queries / t_query, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
