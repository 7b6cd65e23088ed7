"""Synonym-expanded retrieval: morphology-derived synonym pairs
(terms sharing an S-stem) feeding the weighted-BM25 scorer.

The standard engine feature between exact matching and semantic
search: a query for "table" also retrieves "tables" at a discounted
weight, without changing the index. The reference has no query
processing at all (fixed learned scorer, Inference.py:227-240); this
is target-engine surface under the north rule's query-capability bar.

Design:
* Synonyms come from the CORPUS (no external resource in this
  sandbox): two distinct vocabulary terms are synonyms iff they share
  a Harman S-stem (corpus.stem_s — the published minimal plural
  stemmer already used by the stemmed index). A real deployment swaps
  in a curated thesaurus relation; everything downstream is shape-
  compatible ((term, synonym) rows).
* Expansion is a relation transform: originals keep weight 1.0,
  stem-mates enter at ``weight``; a term reached both ways keeps 1.0
  (max-merge, so expansion can never DEMOTE an original term).
* Scoring reuses query/feedback.weighted_bm25_topk — one scoring
  pass, the same broadcast-terms / partial-agg shuffle shape as plain
  BM25.

Scale: the synonym self-join is an equi-join on the stem key over the
TERM DICTIONARY (vocabulary-sized, orders of magnitude smaller than
the index); expansion touches only the query's terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import stem_s


def stem_synonym_pairs(vocab: DataFrame) -> DataFrame:
    """(term, synonym) — distinct vocabulary terms sharing an S-stem,
    identity excluded, both directions present (the join is symmetric).
    ``vocab``: any relation with a ``term`` column."""
    stemmed = (
        vocab.select("term").distinct()
        .select("term", stem_s(F.col("term")).alias("stem"))
    )
    other = stemmed.select(
        F.col("term").alias("synonym"), F.col("stem").alias("stem2")
    )
    return (
        stemmed.join(other, F.col("stem") == F.col("stem2"))
        .filter(F.col("term") != F.col("synonym"))
        .select("term", "synonym")
    )


def expand_with_synonyms(
    queries_df: DataFrame, synonyms: DataFrame, weight: float = 0.4
) -> DataFrame:
    """(query_id, term) + (term, synonym) -> weighted term relation
    (query_id, term, v): originals v=1.0, synonym-only terms
    v=``weight``, max-merged."""
    orig = (
        queries_df.select("query_id", "term").distinct()
        .withColumn("v", F.lit(1.0))
    )
    syn = (
        queries_df.select("query_id", "term").distinct()
        .join(synonyms, "term")
        .select("query_id", F.col("synonym").alias("term"))
        .distinct()
        .withColumn("v", F.lit(float(weight)))
    )
    return (
        orig.unionByName(syn)
        .groupBy("query_id", "term")
        .agg(F.max("v").alias("v"))
    )


def synonym_bm25_topk(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    weight: float = 0.4,
    synonyms: DataFrame | None = None,
    df_df: DataFrame | None = None,
) -> DataFrame:
    """Synonym-expanded BM25 top-k in one lazy plan: derive (or accept)
    the synonym relation, expand, score weighted. ``synonyms=None``
    derives stem-mates from the tf relation's own vocabulary."""
    from pisa_spark.query.feedback import weighted_bm25_topk

    if synonyms is None:
        synonyms = stem_synonym_pairs(tf_df.select("term"))
    v = expand_with_synonyms(queries_df, synonyms, weight)
    return weighted_bm25_topk(tf_df, v, n_docs, avgdl, k, df_df=df_df)
