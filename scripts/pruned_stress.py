"""Pruned-tier serving at scale: size + latency evidence (BENCH.md).

Uses the clustered synthetic corpus from scripts/reorder_stress.py
(512 host vocabularies — every host term has a healthy POSITIVE idf
and a realistic contribution spread; the doc-replica amplifier is the
wrong input here, its thousands of exact score ties make overlap@10
meaningless). Builds the exact index in memory, derives the per-term
top-K contribution tier (index/pruning.py), and measures the 64-query
WAND batch on both, plus payload bytes and overlap@10.

Usage: [PRUNED_DOCS=1024000] [PRUNED_KEEP=10000]
       python scripts/pruned_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pisa_spark.corpus import tokens_col  # noqa: E402
from pisa_spark.index.build import build_postings  # noqa: E402
from pisa_spark.index.pruning import prune_postings  # noqa: E402
from pisa_spark.index.reorder import payload_bytes  # noqa: E402
from pisa_spark.query.bm25 import bm25_topk_wand  # noqa: E402
from pisa_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_docs_in = int(os.environ.get("PRUNED_DOCS", "1024000"))
    keep = int(os.environ.get("PRUNED_KEEP", "10000"))
    spark = get_spark(app_name="pruned_stress", cores=cores)
    from scripts.reorder_stress import synth_docs

    # clustered host vocab + a skewed GLOBAL vocabulary: each doc adds
    # 4 of 16 global words (df ~ n/4, positive idf, realistic head
    # terms that the keep budget actually prunes)
    docs = synth_docs(spark, n_docs_in)
    gwords = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda j: F.concat(
            F.lit("g"),
            ((F.xxhash64(F.col("doc_id"), j, F.lit("gv")) % 16 + 16) % 16)
            .cast("string"),
        ),
    )
    docs = docs.select(
        "doc_id",
        F.concat_ws(" ", "text", F.array_join(gwords, " ")).alias("text"),
    )
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(
        F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")
    ).collect()[0]
    n, avgdl, mx = int(row[0]), float(row[1]), int(row[2])
    n_part = max(spark.sparkContext.defaultParallelism, 8)

    t0 = time.time()
    full = (
        build_postings(toks, n, avgdl, n_buckets=128, max_doc_id=mx)
        .repartition(n_part, "bucket")
        .cache()
    )
    bf = payload_bytes(full)
    build_s = time.time() - t0

    term_dfs = {
        r["term"]: int(r["df"])
        for r in full.groupBy("term").agg(F.sum("n").alias("df")).collect()
    }
    t0 = time.time()
    pruned = (
        prune_postings(full, keep, avgdl, n_docs=n)
        .repartition(n_part, "bucket")
        .cache()
    )
    bp = payload_bytes(pruned)
    prune_s = time.time() - t0

    # query mix: one global head term + one or two host terms — the
    # realistic shape (a selective term plus a frequent qualifier)
    heads = sorted(term_dfs, key=term_dfs.get, reverse=True)[:16]
    hosts = [t for t in ("h7w1", "h7w2", "h300w5", "h12w9", "h99w3",
                         "h200w7", "h5w0", "h411w2") if t in term_dfs]
    batch = [
        {
            "query_id": 100 + i,
            "terms": [heads[i % len(heads)], hosts[i % len(hosts)]]
            + ([hosts[(i * 3 + 1) % len(hosts)]] if i % 2 else []),
            "conjunctive": i % 4 == 3,
        }
        for i in range(64)
    ]

    def timed(postings):
        best = 1e18
        for _ in range(3):
            t0 = time.time()
            bm25_topk_wand(
                postings, batch, n, avgdl, k=10, term_dfs=term_dfs,
                pre_arranged=True,
            ).collect()
            best = min(best, time.time() - t0)
        return best

    t_full = timed(full)
    t_pruned = timed(pruned)
    # overlap@10 of the pruned tier vs the full answers
    f = {
        (r["query_id"], r["doc_id"])
        for r in bm25_topk_wand(
            full, batch, n, avgdl, k=10, term_dfs=term_dfs,
            pre_arranged=True,
        ).collect()
    }
    p = {
        (r["query_id"], r["doc_id"])
        for r in bm25_topk_wand(
            pruned, batch, n, avgdl, k=10, term_dfs=term_dfs,
            pre_arranged=True,
        ).collect()
    }
    print(json.dumps({
        "docs": n,
        "keep_per_term": keep,
        "cores": cores,
        "build_s": round(build_s, 2),
        "prune_s": round(prune_s, 2),
        "full_bytes": bf["total_bytes"],
        "pruned_bytes": bp["total_bytes"],
        "bytes_ratio": round(bp["total_bytes"] / bf["total_bytes"], 4),
        "batch64_full_s": round(t_full, 3),
        "batch64_pruned_s": round(t_pruned, 3),
        "speedup": round(t_full / t_pruned, 2),
        "overlap_at_10": round(len(f & p) / len(f), 4),
    }))


if __name__ == "__main__":
    main()
