"""Benchmark decontamination: n-gram-overlap flagging of training docs.

The GPT-3-style eval-contamination filter every serious pretraining
pipeline runs (Brown et al. 2020 appendix C; the 13-gram rule): a
training document is CONTAMINATED if it shares at least one word
n-gram with any document of a held-out benchmark set, and is dropped
(or audited) before training.

Scale shape: the benchmark side is small by definition (eval sets are
thousands of documents, the corpus is billions), so its distinct
n-gram set BROADCASTS and the check is a broadcast semi/inner join
under the exploded doc n-grams — no shuffle of corpus data, pipelines
into the scan. Exact n-gram STRINGS are matched (not hashes): a hash
collision would wrongly drop a clean training doc, and the broadcast
side is small enough that exactness is free. Tokenization is the
build tokenizer (corpus.tokens_col via dedup.shingles_col), so
"same n-gram" means the same thing as everywhere else in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.dedup.dedup import shingles_col


def _doc_grams(df: DataFrame, n: int, text_col: str) -> DataFrame:
    return df.select(
        "doc_id",
        F.explode(shingles_col(F.col(text_col), n)).alias("gram"),
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits) for every training doc sharing >= 1 word
    n-gram with the benchmark; n_hits = DISTINCT overlapping n-grams
    (the audit count). Docs with no overlap are absent — the common
    case, kept off the output path entirely."""
    if n < 1:
        raise ValueError("n must be >= 1")
    bench = (
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    return (
        _doc_grams(docs, n, text_col)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("long").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """Training docs with the contaminated ones REMOVED — the drop
    filter itself: a broadcast left-anti join against the flagged ids
    (no corpus shuffle; the flag side is bounded by contaminated-doc
    count)."""
    flagged = contamination_report(
        docs, benchmark, n=n, text_col=text_col
    ).select("doc_id")
    return docs.join(F.broadcast(flagged), "doc_id", "left_anti")
