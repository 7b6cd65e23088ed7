"""Percolation — reverse search: match a batch of NEW documents
against a table of STORED queries (Elasticsearch's percolator;
Lucene MemoryIndex alerting). The crawl-time use case: "which tracked
queries does this incoming page satisfy" — saved searches, topic
alerts, routing rules — evaluated for the whole ingest batch in one
relational pass instead of running every stored query per document.

Match contract (gate-pinned): a (query, doc) pair matches iff the
document contains at least ``min_match`` of the query's DISTINCT
terms; ``mode='all'`` (default) pins min_match to the query's term
count (pure conjunction), ``mode='any'`` to 1 (pure disjunction), an
explicit integer overrides both (the "minimum should match" knob).
Output: (query_id, doc_id, n_matched, n_terms) for matching pairs.

Scale shape (the inversion that makes this work at 10^12 stored
queries): the stored-QUERY relation is the big side — it shuffles by
term exactly like a posting build — while the incoming doc batch is
small; the per-doc distinct-term relation streams through one
term-keyed join and one (query_id, doc_id) hash aggregate with
map-side combine. No per-query execution, no index probe per doc:
alerting cost is one aggregation over term-hash buckets regardless of
how many queries are registered.

Reference parity note: the reference has no query store (one learned
scorer — src/Inference.py:227-240); percolation is target-engine
surface, the dual of the forward search path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col


def percolate(
    docs: DataFrame,
    queries_df: DataFrame,
    mode: str = "all",
    min_match: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, n_matched, n_terms) for matching pairs.

    docs: (doc_id, text); queries_df: (query_id, term). Duplicate
    query terms are counted once (distinct-term semantics on both
    sides). min_match overrides mode when given; it is clamped
    nowhere — a min_match larger than a query's term count simply
    never matches that query (deterministic, documented)."""
    if mode not in ("all", "any"):
        raise ValueError("mode must be 'all' or 'any'")
    qterms = queries_df.select("query_id", "term").distinct()
    qn = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    present = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(tokens_col(F.col("text")))
            ).alias("term"),
        )
    )
    # qn is one row per stored query — at the module's 10^12-query
    # contract that is NOT broadcastable; AQE picks the join strategy
    # from runtime sizes (broadcast when small, shuffle when not)
    matched = (
        qterms.join(present, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .join(qn, "query_id")
    )
    if min_match is not None:
        cond = F.col("n_matched") >= F.lit(int(min_match))
    elif mode == "all":
        cond = F.col("n_matched") == F.col("n_terms")
    else:
        cond = F.col("n_matched") >= F.lit(1)
    return matched.filter(cond).select(
        "query_id", "doc_id", "n_matched", "n_terms"
    )
