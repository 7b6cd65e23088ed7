"""Passage retrieval with MaxP document aggregation.

Long web documents bury their relevant section: scoring fixed-length
token windows ("passages") and ranking each document by its BEST
passage (MaxP — Dai & Callan, SIGIR 2019; the classic passage-BM25 of
Callan 1994) consistently beats whole-document BM25 on long-document
web collections, and is the retrieval shape BERT-era rerankers expect.

Pinned semantics (the DuckDB twin of gate ``bm25_maxp_topk`` replays
each):

* passages are CONSECUTIVE non-overlapping windows of ``passage_len``
  tokens (the final window keeps its natural shorter length);
* the passage corpus is scored as if each passage were a document —
  df, N and avgdl are PASSAGE-level statistics (the standard
  treat-passages-as-documents convention), with the engine's BM25
  (k1=0.9, b=0.4) and per-passage length normalization;
* a document's score is the max over its passages, ties within a
  document by the EARLIEST passage; documents rank by
  (score DESC, doc_id ASC) like every other kernel here;
* passage scores are rounded to 4 decimals BEFORE any ranking: short
  fixed-length windows make exact cross-document score ties common
  (identical (tf, p_len) patterns), and ranking raw floats would let
  term-summation ulps order real ties differently across engines and
  partitionings — rounding pins every tie to the doc_id/pid rule.

Scale shape: the per-passage tf aggregate is partial (map-side
combine) keyed by (doc_id, pid, term) — no skew beyond ordinary head
terms, and the explode never shuffles raw positions (tf reduces them
before the exchange). Query scoring touches only matched passages
(broadcast term list), the per-document max is another partial
aggregate, and the final top-k is the shared window. At index scale
the same dataflow serves from a passage-level inverted index (build
with doc_id' = (doc_id, pid)); this module is the relational
rendering that defines the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import score_expr

PASSAGE_LEN = 64


def passage_relation(
    tokens_df: DataFrame, passage_len: int = PASSAGE_LEN
) -> tuple[DataFrame, DataFrame]:
    """(ptf, plen): per-passage term frequencies (doc_id, pid, term,
    tf) and passage lengths (doc_id, pid, p_len) from the (doc_id,
    tokens) relation."""
    if passage_len < 1:
        raise ValueError("passage_len must be >= 1")
    parts = tokens_df.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    ).withColumn(
        "pid", F.floor(F.col("pos") / F.lit(passage_len)).cast("int")
    )
    ptf = parts.groupBy("doc_id", "pid", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    plen = parts.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("p_len")
    )
    return ptf, plen


def bm25_maxp_topk(
    tokens_df: DataFrame,
    queries: list[dict],
    k: int = 10,
    passage_len: int = PASSAGE_LEN,
) -> DataFrame:
    """(query_id, rank, doc_id, best_pid, score) — top-k documents by
    their best passage's BM25 under passage-level statistics."""
    spark = tokens_df.sparkSession
    ptf, plen = passage_relation(tokens_df, passage_len)
    plen = plen.cache()
    row = plen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("p_len").alias("avg")
    ).collect()[0]
    n_pass, avg_pl = int(row["n"]), float(row["avg"])
    pdf = ptf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qdf = spark.createDataFrame(
        [(q["query_id"], t) for q in queries for t in sorted(set(q["terms"]))],
        "query_id int, term string",
    )
    scored = (
        ptf.join(F.broadcast(qdf), "term")
        .join(pdf, "term")
        .join(plen, ["doc_id", "pid"])
        # score_expr reads doc_len; the passage length IS the
        # document length under treat-passages-as-documents
        .withColumn("doc_len", F.col("p_len"))
        .select(
            "query_id",
            "doc_id",
            "pid",
            score_expr(float(n_pass), avg_pl).alias("s"),
        )
    )
    per_passage = scored.groupBy("query_id", "doc_id", "pid").agg(
        F.round(F.sum("s"), 4).alias("ps")
    )
    best = (
        per_passage.groupBy("query_id", "doc_id")
        .agg(
            F.max(
                F.struct(F.col("ps"), (-F.col("pid")).alias("npid"))
            ).alias("b")
        )
        .select(
            "query_id",
            "doc_id",
            F.col("b.ps").alias("score"),
            (-F.col("b.npid")).cast("int").alias("best_pid"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "best_pid", "score")
    )
