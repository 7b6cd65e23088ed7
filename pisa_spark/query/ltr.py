"""Learning-to-rank feature extraction off the index relations.

A training-data pipeline over a web corpus needs per-(query, doc)
feature vectors to train rankers on (the role of LETOR/MSLR-style
extraction jobs). Candidates come from the production first-stage
ranker — disjunctive BM25 top-k with the engine's exact tie-break
(score DESC, doc_id ASC) — and every candidate row carries features
computed from the same ``(doc_id, term, tf, doc_len, df)`` relation the
index serves from, so the extracted training set is consistent with
what the engine will score at serving time.

Plan shape: one broadcast join (query terms are tiny), ONE hash
aggregate producing the score and every feature in the same pass, one
partial top-k window (WindowGroupLimit). No second scan, no per-row
Python — at 10^12 docs this costs exactly what a BM25 query costs.

Reference parity: BM25 constants and tie-break as in
``pisa_spark.query.bm25`` (k1=0.9, b=0.4, FIXTURES.md §3); the feature
set mirrors the classic query-dependent LETOR block (matched-term
count, query length, doc length, tf aggregates, df extrema, idf sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import score_expr


def ltr_features_from_index(
    postings: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
    terms: list[str] | None = None,
) -> DataFrame:
    """The same feature vectors served off the compressed index.

    The posting blocks are pruned to the queries' terms BEFORE the
    decode (the filter sits below the mapInPandas kernel, so
    PushedFilters carries it into the scan — only queried terms'
    blocks are read), decoded back to (term, doc_id, tf, doc_len) with
    one vectorized varint pass, and df comes from block METADATA
    (sum of per-block posting counts — no second corpus pass). From
    there it is the identical one-aggregate plan as ``ltr_features``.
    """
    from pisa_spark.query.scorers import postings_to_tf

    if terms is None:
        # callers that already hold the term set (the facade does)
        # should pass it — this collect is one extra driver round-trip
        terms = [
            r["term"] for r in queries_df.select("term").distinct().collect()
        ]
    pruned = postings.filter(F.col("term").isin(list(terms)))
    df_df = pruned.groupBy("term").agg(F.sum("n").cast("bigint").alias("df"))
    tf_full = postings_to_tf(pruned).join(F.broadcast(df_df), "term")
    return ltr_features(tf_full, queries_df, n_docs, avgdl, k=k)

FEATURE_COLUMNS = [
    "query_id",
    "rank",
    "doc_id",
    "score",
    "matched",
    "n_terms",
    "doc_len",
    "sum_tf",
    "max_tf",
    "min_df",
    "max_df",
    "idf_sum",
]


def ltr_features(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    k: int = 10,
) -> DataFrame:
    """Per-(query, doc) LTR feature vectors for the BM25 top-k candidates.

    tf_df: (doc_id, term, tf, doc_len, df); queries_df: (query_id, term).
    Returns one row per candidate with ``FEATURE_COLUMNS``:

    * score   — BM25 (the first-stage ranker's score, also the label
                of the candidate-selection policy)
    * matched — distinct query terms present in the doc
    * n_terms — distinct terms in the query
    * doc_len — document length in tokens
    * sum_tf / max_tf — tf aggregates over the matched terms
    * min_df / max_df — document-frequency extrema over matched terms
                (rarest / commonest matched term)
    * idf_sum — sum of BM25 idf over matched terms

    Everything is exact integer or deterministic float64 off the same
    relation, so a SQL engine reproduces it bit-for-bit (modulo float
    summation order, same caveat as the BM25 score itself).
    """
    qterms = queries_df.select("query_id", "term").distinct()
    qsizes = qterms.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms")
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    matched = tf_df.join(F.broadcast(qterms), "term")
    per_doc = (
        matched.withColumn("pscore", score_expr(n_docs, avgdl))
        .withColumn("idf", idf)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("pscore").alias("score"),
            F.count(F.lit(1)).cast("int").alias("matched"),
            F.max("doc_len").cast("int").alias("doc_len"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
            F.max("tf").cast("int").alias("max_tf"),
            F.min("df").cast("bigint").alias("min_df"),
            F.max("df").cast("bigint").alias("max_df"),
            F.sum("idf").alias("idf_sum"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(qsizes), "query_id")
        .select(*FEATURE_COLUMNS)
    )
