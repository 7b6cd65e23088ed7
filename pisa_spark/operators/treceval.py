"""TREC-style retrieval evaluation over run + graded qrels tables.

Generalizes the reference's binary Recall/NDCG/MRR/Precision family
(/root/reference/src/Inference.py:8-71, see snapshots.topn_metrics)
to the standard trec_eval measures a search engine ships with:
average precision (AP) and GRADED-relevance nDCG (Jarvelin &
Kekalainen gains 2^rel - 1), plus reciprocal rank, precision@k and
recall@k — per query and macro-averaged.

Inputs are plain relations, so the whole computation is joins +
window functions (JVM codegen, no UDFs):

- ``run``:   (query_id, rank, doc_id) — 1-based ranks from any top-k
  search (the engine's own output shape).
- ``qrels``: (query_id, doc_id, rel) — integer relevance grades,
  rel > 0 means relevant, rel = 0 is a judged non-relevant row.

Scale shape: one broadcast-or-shuffle equi-join of run against qrels
on (query_id, doc_id), one window per query over at most the run's k
rows, one hash-agg per query, one tiny macro-average agg. Nothing is
corpus-sized — the run is (n_queries x k) and qrels are the judged
pool — so the plan is identical at 10^12 docs: evaluation cost scales
with the query set, never the corpus.

trec_eval quirks kept intact:
- AP divides by num_rel (ALL relevant judged docs), not by the number
  retrieved, and sums precision@r only at ranks holding a relevant
  doc; a truncated run therefore lower-bounds the untruncated AP.
- IDCG ranks the judged grades descending, truncated at k; rel = 0
  rows contribute zero gain and never pad the ideal prefix.
- Queries with no rel > 0 judgment are excluded from per-query rows
  AND the macro average (trec_eval's ``-c`` off default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# integer Jarvelin gains for small grades keep both engines exact:
# 2^rel - 1 with rel in {0,1,2,3} -> {0,1,3,7}
_GAIN = {0: 0, 1: 1, 2: 3, 3: 7}


def _gain_col(rel):
    expr = F.lit(0)
    for r, g in sorted(_GAIN.items(), reverse=True):
        expr = F.when(rel == r, F.lit(g)).otherwise(expr)
    return expr


def trec_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    with_mean: bool = True,
) -> DataFrame:
    """Per-query (query_id, metric, value) rows for metrics
    ``ap  ndcg  p_at_k  rr  recall`` rounded to 4 decimals, for every
    query with >= 1 relevant qrel; ``with_mean`` appends macro-average
    rows under query_id = -1 (mean of the per-query ROUNDED values,
    re-rounded — keeps the average bit-identical across engines)."""
    rel_pos = qrels.filter(F.col("rel") > 0)

    # per-query relevant-set size (AP/recall denominator)
    nrel = rel_pos.groupBy("query_id").agg(
        F.countDistinct("doc_id").alias("num_rel")
    )

    # ideal DCG@k from the judged grades alone (run-independent)
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        rel_pos.withColumn("irank", F.row_number().over(w_ideal))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                _gain_col(F.col("rel"))
                / (F.log(F.col("irank") + 1.0) / F.log(F.lit(2.0)))
            ).alias("idcg")
        )
    )

    # judged run rows: left join keeps unjudged retrieved docs (gain 0)
    joined = (
        run.select("query_id", "rank", "doc_id")
        .filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("is_rel", (F.col("rel") > 0).cast("int"))
    )

    # cumulative hits up to each rank (window over <= k rows per query)
    w_run = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.withColumn("cum_hits", F.sum("is_rel").over(w_run))

    per_q = cum.groupBy("query_id").agg(
        # AP numerator: precision@r summed at relevant ranks
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.col("cum_hits").cast("double") / F.col("rank"),
            ).otherwise(0.0)
        ).alias("ap_num"),
        F.sum(
            _gain_col(F.col("rel"))
            / (F.log(F.col("rank") + 1.0) / F.log(F.lit(2.0)))
        ).alias("dcg"),
        F.sum("is_rel").alias("hits"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias(
            "first_hit"
        ),
    )

    scored = (
        per_q.join(nrel, "query_id")  # inner: drops no-relevant queries
        .join(idcg, "query_id")
        .select(
            "query_id",
            F.round(F.col("ap_num") / F.col("num_rel"), 4).alias("ap"),
            F.round(
                F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                .otherwise(0.0),
                4,
            ).alias("ndcg"),
            F.round(F.col("hits") / F.lit(float(k)), 4).alias("p_at_k"),
            F.round(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)), 4
            ).alias("rr"),
            F.round(F.col("hits") / F.col("num_rel"), 4).alias("recall"),
        )
    )

    metrics = ["ap", "ndcg", "p_at_k", "rr", "recall"]
    long = scored.select(
        "query_id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(m) for m in metrics]),
                F.array(*[F.col(m) for m in metrics]),
            )
        ).alias("metric", "value"),
    )
    if not with_mean:
        return long.select("query_id", "metric", "value")
    means = long.groupBy("metric").agg(
        F.round(F.avg("value"), 4).alias("value")
    ).select(F.lit(-1).alias("query_id"), "metric", "value")
    return long.select("query_id", "metric", "value").unionByName(means)
