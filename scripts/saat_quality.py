"""SAAT budget-vs-quality study: overlap@k between rho-budgeted
anytime ranking and the exhaustive quantized ranking over the bench
query batch — the JASS-style evidence that a small postings budget
retains almost all of the exact top-k.

Usage: python scripts/saat_quality.py [sf_dir] [k]
Prints one line per rho: rho, mean overlap@k, postings budget as a
share of the batch's total candidate postings.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pisa_spark.corpus import tokens_col  # noqa: E402
from pisa_spark.index.quantized import (  # noqa: E402
    build_quantized_postings,
    quantized_topk,
)
from pisa_spark.query.saat import (  # noqa: E402
    impact_ordered_segments,
    saat_topk,
)
from pisa_spark.session import get_spark  # noqa: E402


def _zipf_docs(spark, n_docs=5000, vocab=5000, doc_len=80, seed=0):
    """Deterministic Zipf-vocabulary corpus: the realistic web shape
    (large vocabulary, mostly POSITIVE idf) that the testdata word
    soup (31 terms, 30 of them df > N/2) cannot provide — synthesized
    in-process per the brief's no-external-data rule."""
    import numpy as np

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()
    rows = []
    for d in range(n_docs):
        toks = rng.choice(vocab, size=doc_len, p=p)
        rows.append((d, " ".join(f"t{int(t)}" for t in toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="saat_quality", cores=8)
    if sf_dir == "zipf":
        docs = _zipf_docs(spark)
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["a"])
    n_part = max(spark.sparkContext.defaultParallelism, 8)
    postings = (
        build_quantized_postings(
            toks, n_docs, avgdl, n_buckets=32, max_doc_id=n_docs
        )
        .repartition(n_part, "bucket")
        .cache()
    )
    vocab = [
        r["term"]
        for r in postings.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .orderBy(F.col("df").desc())
        .limit(200)
        .collect()
    ]
    nv = len(vocab)
    batch = [
        {
            "query_id": i,
            "terms": [
                vocab[i % max(1, nv // 4)],
                vocab[(i * 7 + 3) % nv],
            ],
        }
        for i in range(64)
    ]
    segments = impact_ordered_segments(postings, pre_arranged=True).cache()
    segments.count()
    exact = {}
    for r in quantized_topk(postings, [dict(q, conjunctive=False) for q in batch],
                            n_docs, k=k, pre_arranged=True).collect():
        exact.setdefault(r["query_id"], set()).add(r["doc_id"])
    total_postings = postings.agg(F.sum("n")).collect()[0][0]
    for rho in (500, 1000, 2000, 5000, 10000, None):
        got = {}
        for r in saat_topk(
            segments, batch, n_docs, rho=rho, k=k, pre_arranged=True
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["doc_id"])
        overlaps = [
            len(exact[q] & got.get(q, set())) / max(1, len(exact[q]))
            for q in exact
        ]
        mean = sum(overlaps) / len(overlaps)
        share = "" if rho is None else f" (rho/total={rho/total_postings:.4f})"
        print(f"rho={rho}: overlap@{k}={mean:.4f}{share}")


if __name__ == "__main__":
    main()
