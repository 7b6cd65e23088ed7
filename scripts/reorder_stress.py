"""Doc-id reordering at scale: compression + cost evidence (BENCH.md).

The driver testdata has a deliberately uniform vocabulary (every head
term hits ~every doc), where NO ordering can shrink doc-id deltas —
tests/test_reorder.py proves the gains on a small clustered fixture.
This stress measures the feature at its design point: a ~1M-doc corpus
with Common-Crawl-like vocabulary locality (per-host topic vocab),
ids assigned in crawl-arrival (hash-shuffled) order, then reordered by
(a) the host metadata key and (b) dominant tf-idf terms.

Reported per strategy: mapping-pass wall time, build wall time, docs
payload bytes vs the unordered build, and a serving spot-check (the
top-10 score multiset must be identical — permutation invariance).

Usage: python scripts/reorder_stress.py [n_docs] (default 1_024_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pisa_spark.corpus import tokens_col  # noqa: E402
from pisa_spark.index.build import build_postings  # noqa: E402
from pisa_spark.index.reorder import (  # noqa: E402
    apply_reorder,
    payload_bytes,
    reorder_by_dominant_terms,
    reorder_by_key,
)
from pisa_spark.query.bm25 import bm25_topk_wand  # noqa: E402
from pisa_spark.session import get_spark  # noqa: E402

N_HOSTS = 512
VOCAB_PER_HOST = 256
TERMS_PER_DOC = 24


def synth_docs(spark, n_docs: int):
    """Deterministic clustered corpus, ids in hash-shuffled order:
    host h uses vocabulary {h*VPH .. (h+1)*VPH}; every value is a pure
    function of doc_id (no RNG, partition-count invariant)."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    host = (F.xxhash64("doc_id") % N_HOSTS + N_HOSTS) % N_HOSTS
    # NB the numeric host column is named __h, NOT host: Spark's
    # lateral-column-alias resolution would otherwise bind the words
    # lambda to the STRING "hostN" alias in the same select, silently
    # producing "hhostNwJ" tokens (found when stress queries matched
    # nothing)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(TERMS_PER_DOC - 1)),
        lambda i: F.concat(
            F.lit("h"),
            F.col("__h").cast("string"),
            F.lit("w"),
            (
                (F.xxhash64(F.col("doc_id"), i) % VOCAB_PER_HOST
                 + VOCAB_PER_HOST) % VOCAB_PER_HOST
            ).cast("string"),
        ),
    )
    return base.withColumn("__h", host).select(
        "doc_id",
        F.concat(F.lit("host"), F.col("__h").cast("string")).alias("host"),
        F.array_join(words, " ").alias("text"),
    )


def build_from(docs, n, avgdl, mx, n_buckets):
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    return build_postings(toks, n, avgdl, n_buckets=n_buckets, max_doc_id=mx)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_024_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app_name="reorder_stress", cores=cores)
    n_buckets = 64
    docs = synth_docs(spark, n_docs).cache()
    docs.count()
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")).collect()[0]
    n, avgdl, mx = int(row[0]), float(row[1]), int(row[2])

    t0 = time.time()
    p0 = build_from(docs, n, avgdl, mx, n_buckets).cache()
    b0 = payload_bytes(p0)   # materializes the cache
    base_build = time.time() - t0
    out = {
        "n_docs": n,
        "cores": cores,
        "base_build_s": round(base_build, 2),
        "base_docs_bytes": b0["docs_bytes"],
        "base_total_bytes": b0["total_bytes"],
    }

    q = [{"query_id": 0, "terms": ["h7w1", "h7w2", "h300w5"],
          "conjunctive": False}]
    base_scores = sorted(
        r["score"] for r in bm25_topk_wand(p0, q, n, avgdl, k=10).collect()
    )
    p0.unpersist()

    from pisa_spark.index.bisection import reorder_by_bisection

    for name, fn in (
        ("key(host)", lambda d: reorder_by_key(d, ["host"])),
        ("dominant_terms", reorder_by_dominant_terms),
        # BP from crawl order: must REDISCOVER the host clusters from
        # the doc-term graph alone, within each 64k-doc range
        ("bisection", reorder_by_bisection),
        # BP refining a metadata presort — the production composition
        ("bisection+host", lambda d: reorder_by_bisection(
            d, presort=["host"])),
    ):
        t0 = time.time()
        mapping = fn(docs).cache()
        mapping.count()
        map_s = time.time() - t0
        re_docs = apply_reorder(docs, mapping)
        t0 = time.time()
        p1 = build_from(re_docs, n, avgdl, mx, n_buckets).cache()
        b1 = payload_bytes(p1)
        build_s = time.time() - t0
        scores = sorted(
            r["score"]
            for r in bm25_topk_wand(p1, q, n, avgdl, k=10).collect()
        )
        p1.unpersist()
        out[name] = {
            "map_pass_s": round(map_s, 2),
            "build_s": round(build_s, 2),
            "docs_bytes": b1["docs_bytes"],
            "docs_ratio": round(b1["docs_bytes"] / b0["docs_bytes"], 4),
            "total_ratio": round(b1["total_bytes"] / b0["total_bytes"], 4),
            "score_multiset_identical": [round(s, 9) for s in scores]
            == [round(s, 9) for s in base_scores],
        }
        mapping.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
