"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship BM25 top-k over sf0.001.
queries()         — one callable per implemented operator (SURVEY §2).
oracle_sql()      — matching ANSI SQL for the DuckDB oracle.

Column-name parity rule: every computed column is aliased identically in
the Spark code and the SQL. Floating-point columns are rounded to 4
decimals on BOTH sides after ranking, so the order-insensitive value
hash is stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pisa_spark.corpus import tokens_col  # noqa: E402
from pisa_spark.index.build import (  # noqa: E402
    build_index_dataframes,
    corpus_stats,
    term_document_frequency,
    term_frequencies,
)
from pisa_spark.query.bm25 import bm25_topk_dataframe, bm25_topk_wand  # noqa: E402

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB) — tokenizer identical to pisa_spark.corpus
# ---------------------------------------------------------------------------

_SQL_BASE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS tokens
  FROM documents
),
doclen AS (SELECT doc_id, CAST(len(tokens) AS INTEGER) AS doc_len FROM toks),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(doc_len) AS avgdl FROM doclen)
"""

# fixed evaluation queries (terms exist in the synthetic vocabulary;
# include a stop-word-ish head term and an absent term)
_OR_QUERIES = [(0, ["data", "join"]), (1, ["the"]), (2, ["spark", "query", "scan"])]
_AND_QUERIES = [(10, ["window", "merge", "scan"]), (11, ["data", "table"])]


def _values_clause(qs: list[tuple[int, list[str]]]) -> str:
    pairs = [f"({qid}, '{t}')" for qid, terms in qs for t in sorted(set(terms))]
    return ", ".join(pairs)


def _bm25_sql(qs: list[tuple[int, list[str]]], conjunctive: bool, k: int = 10) -> str:
    conj_filter = "HAVING count(*) = max(qn.n_terms)" if conjunctive else ""
    return f"""
{_SQL_BASE},
q(query_id, term) AS (VALUES {_values_clause(qs)}),
qn AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY query_id),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * 1.9)
              / (tf.tf + 0.9 * (1 - 0.4 + 0.4 * doclen.doc_len / stats.avgdl)) )
           AS raw_score
  FROM tf
  JOIN q USING (term)
  JOIN dfreq USING (term)
  JOIN doclen USING (doc_id)
  JOIN qn USING (query_id)
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
  {conj_filter}
)
SELECT query_id, rank, doc_id, score FROM (
  SELECT query_id, doc_id, round(raw_score, 4) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY raw_score DESC, doc_id ASC) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))


def _tf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = term_frequencies(_tokens(spark, sf_dir))
    return tf.join(term_document_frequency(tf), "term")


def _stats(spark: SparkSession, sf_dir: str) -> tuple[int, float]:
    row = corpus_stats(_tokens(spark, sf_dir)).collect()[0]
    return int(row["n_docs"]), float(row["avgdl"])


def _bm25_df(
    spark: SparkSession, sf_dir: str, qs, conjunctive: bool, k: int = 10
) -> DataFrame:
    n_docs, avgdl = _stats(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in qs for t in terms], "query_id int, term string"
    )
    out = bm25_topk_dataframe(
        _tf_full(spark, sf_dir), qdf, n_docs, avgdl, k=k, conjunctive=conjunctive
    )
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 4).alias("score")
    )


def _bm25_wand(
    spark: SparkSession, sf_dir: str, qs, conjunctive: bool, k: int = 10
) -> DataFrame:
    postings, _, _, stats = build_index_dataframes(spark, sf_dir, n_buckets=16)
    queries = [
        {"query_id": qid, "terms": terms, "conjunctive": conjunctive}
        for qid, terms in qs
    ]
    out = bm25_topk_wand(
        postings, queries, stats["n_docs"], stats["avgdl"], k=k, two_phase=True
    )
    return out.select(
        "query_id", "rank", "doc_id", F.round("score", 4).alias("score")
    )


# ---------------------------------------------------------------------------
# driver surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: block-max WAND BM25 top-10 over the compressed index
    built from sf0.001 documents."""
    return _bm25_wand(spark, "/root/testdata/sf0.001", _OR_QUERIES, conjunctive=False)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_stats": lambda spark, sf: corpus_stats(_tokens(spark, sf)).select(
            "n_docs", F.round("avgdl", 6).alias("avgdl"), "total_terms"
        ),
        "doc_lengths": lambda spark, sf: _tokens(spark, sf).select("doc_id", "doc_len"),
        "term_df": lambda spark, sf: term_document_frequency(
            term_frequencies(_tokens(spark, sf))
        ).select("term", "df"),
        "term_tf": lambda spark, sf: term_frequencies(_tokens(spark, sf)).select(
            "doc_id", "term", "tf"
        ),
        "bm25_topk_or": lambda spark, sf: _bm25_df(spark, sf, _OR_QUERIES, False),
        "bm25_topk_and": lambda spark, sf: _bm25_df(spark, sf, _AND_QUERIES, True),
        "bm25_topk_or_wand": lambda spark, sf: _bm25_wand(spark, sf, _OR_QUERIES, False),
        "bm25_topk_and_wand": lambda spark, sf: _bm25_wand(spark, sf, _AND_QUERIES, True),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "corpus_stats": _SQL_BASE
        + """
SELECT n_docs, round(avgdl, 6) AS avgdl,
       CAST((SELECT sum(doc_len) FROM doclen) AS BIGINT) AS total_terms
FROM stats
""",
        "doc_lengths": _SQL_BASE + "SELECT doc_id, doc_len FROM doclen",
        "term_df": _SQL_BASE + "SELECT term, df FROM dfreq",
        "term_tf": _SQL_BASE + "SELECT doc_id, term, tf FROM tf",
        "bm25_topk_or": _bm25_sql(_OR_QUERIES, conjunctive=False),
        "bm25_topk_and": _bm25_sql(_AND_QUERIES, conjunctive=True),
        "bm25_topk_or_wand": _bm25_sql(_OR_QUERIES, conjunctive=False),
        "bm25_topk_and_wand": _bm25_sql(_AND_QUERIES, conjunctive=True),
    }
