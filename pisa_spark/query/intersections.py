"""Posting-list intersection statistics — PISA's
``compute_intersection`` tool.

Real PISA ships an offline tool that, for each evaluation query,
reports the cardinality and the maximum attainable score of every
term-subset intersection (singletons and pairs by default). The
numbers drive conjunctive-processing research and threshold studies:
max_score of a pair is a tight upper bound for docs matching both
terms, and the cardinalities say which intersections are selective
enough to lead query evaluation.

Re-expressed Spark-first: the decoded (term, doc_id, tf, doc_len)
relation is the seam (query/scorers.postings_to_tf — term-pruned scan,
the In(term, ...) filter reaches the parquet scan); singletons are one
hash aggregate; pairs are an equi-join of the relation with itself ON
doc_id through a small broadcast pair list, then one hash aggregate.
Everything stays JVM-side whole-stage codegen — no kernel, no UDF.
Output is bounded by |queries| x |term pairs|, never corpus-sized.

max_score is the exact max over matching docs of the summed BM25
partial scores (k1 = 0.9, b = 0.4, the serving constants) — the same
score_expr the engine serves with, so the bound is consistent with
search results by construction.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import score_expr
from pisa_spark.query.scorers import postings_to_tf


def term_intersections(
    postings: DataFrame,
    queries: list[dict],
    n_docs: float,
    avgdl: float,
    max_arity: int = 2,
) -> DataFrame:
    """(query_id, terms, n_docs, max_score) for every term subset of
    each query up to ``max_arity`` (PISA default: singletons + pairs).
    ``terms`` is the subset space-joined in sorted order; n_docs is
    the intersection cardinality; max_score the maximum summed BM25
    partial score over the intersection's documents. Subsets with an
    empty intersection emit no row (mirroring the tool's sparse
    output)."""
    if max_arity < 1 or max_arity > 2:
        raise ValueError("max_arity must be 1 or 2 (PISA tool shape)")
    spark = postings.sparkSession
    all_terms = sorted({t for q in queries for t in q["terms"]})
    pruned = postings.filter(F.col("term").isin(all_terms))
    dfs = pruned.groupBy("term").agg(F.sum("n").alias("df"))
    scored = (
        postings_to_tf(pruned)
        .join(dfs, "term")
        .select(
            "term",
            "doc_id",
            score_expr(float(n_docs), float(avgdl)).alias("score"),
        )
    )
    singles_list = sorted(
        {(q["query_id"], t) for q in queries for t in q["terms"]}
    )
    singles_df = spark.createDataFrame(
        singles_list, "query_id int, term string"
    )
    singles = (
        singles_df.join(scored, "term")
        .groupBy("query_id", "term")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("score").alias("max_score"),
        )
        .select(
            "query_id", F.col("term").alias("terms"), "n_docs", "max_score"
        )
    )
    if max_arity == 1:
        return singles
    pair_rows = sorted(
        {
            (q["query_id"], a, b)
            for q in queries
            for a, b in combinations(sorted(set(q["terms"])), 2)
        }
    )
    if not pair_rows:
        return singles
    pairs_df = spark.createDataFrame(
        pair_rows, "query_id int, term_a string, term_b string"
    )
    a = scored.select(
        F.col("term").alias("term_a"),
        "doc_id",
        F.col("score").alias("score_a"),
    )
    b = scored.select(
        F.col("term").alias("term_b"),
        "doc_id",
        F.col("score").alias("score_b"),
    )
    pairs = (
        F.broadcast(pairs_df)
        .join(a, "term_a")
        .join(b, ["term_b", "doc_id"])
        .groupBy("query_id", "term_a", "term_b")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.col("score_a") + F.col("score_b")).alias("max_score"),
        )
        .select(
            "query_id",
            F.concat_ws(" ", "term_a", "term_b").alias("terms"),
            "n_docs",
            "max_score",
        )
    )
    return singles.unionByName(pairs)
