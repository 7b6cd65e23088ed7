"""More-Like-This: similar-document search served off the index.

Given source doc ids, select each source's most *interesting* terms —
Lucene-MLT-style tf·idf interestingness with ``idf = ln((N+1)/(df+1))
+ 1`` (always positive, so head terms rank low instead of flipping
sign) — then run those terms as a disjunctive BM25 query, excluding the
source doc itself from its own results. The reference workflow this
re-expresses is item-to-item retrieval: score a catalog against one
item's profile and mask the item itself
(/root/reference/src/Inference.py:233-238 masks seen items the same
way before torch.topk).

Two physical strategies, rank-identical by construction:

1. ``mlt_topk_dataframe`` — exhaustive relational path off the
   (doc_id, term, tf, doc_len, df) relation; every step is ANSI-SQL
   expressible, so it is the correctness-gate path with a DuckDB twin.
2. ``SearchEngine.search_similar`` (engine.py) — the serving path: the
   source doc's vector is decoded from ONLY its bucket's blocks (block
   metadata prunes the scan), term selection happens on that bounded
   vector, and scoring runs through the block-max WAND kernel.

Scale: term selection touches one doc's postings (≤ doc_len rows);
scoring is a |selected-terms| query through the same pruned path every
other query uses. Nothing here scans the corpus.

Determinism: interestingness ties break (interest DESC, term ASC);
result ties break (score DESC, doc_id ASC) like every other top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import score_expr, topk_window

MLT_MAX_TERMS = 10
MLT_MIN_DF = 2


def mlt_interest_expr(n_docs: float):
    """Interestingness of a (tf, df) pair: tf * (ln((N+1)/(df+1)) + 1).
    The +1 keeps idf positive for head terms (Lucene classic idf), so
    selection degrades gracefully instead of flipping order."""
    idf = F.log(
        (F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)
    ) + 1.0
    return F.col("tf").cast("double") * idf


def mlt_select_terms(
    tf_df: DataFrame,
    source_ids: list[int],
    n_docs: float,
    max_terms: int = MLT_MAX_TERMS,
    min_df: int = MLT_MIN_DF,
) -> DataFrame:
    """Pick each source doc's top-``max_terms`` query terms.

    tf_df: (doc_id, term, tf, df[, ...]). Returns (query_id int, term)
    — query_id is the source doc id, so results are self-describing.
    min_df drops hapax/noise terms that cannot retrieve anything else.
    """
    src = tf_df.filter(F.col("doc_id").isin([int(d) for d in source_ids]))
    src = src.filter(F.col("df") >= int(min_df))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("interest").desc(), F.col("term").asc()
    )
    return (
        src.withColumn("interest", mlt_interest_expr(n_docs))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= int(max_terms))
        .select(F.col("doc_id").cast("int").alias("query_id"), "term")
    )


def mlt_topk_dataframe(
    tf_df: DataFrame,
    source_ids: list[int],
    n_docs: float,
    avgdl: float,
    k: int = 10,
    max_terms: int = MLT_MAX_TERMS,
    min_df: int = MLT_MIN_DF,
) -> DataFrame:
    """Exhaustive MLT top-k. tf_df: (doc_id, term, tf, doc_len, df).

    The source doc is excluded from its own result list BEFORE the
    top-k window, so ranks are dense over the remaining docs — the
    seen-masking semantics of the reference, rendered as a filter.
    """
    qdf = mlt_select_terms(tf_df, source_ids, n_docs, max_terms, min_df)
    matched = tf_df.join(F.broadcast(qdf), "term").filter(
        F.col("doc_id") != F.col("query_id").cast("long")
    )
    scored = matched.withColumn("pscore", score_expr(n_docs, avgdl))
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("pscore").alias("score")
    )
    return topk_window(per_doc, k)
