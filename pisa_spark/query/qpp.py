"""Pre-retrieval query performance prediction (QPP).

Classic collection-statistics predictors of how well a query will
perform, computed BEFORE any posting is scored — the signals a serving
tier uses to route queries (prune depth, scorer choice, selective-
search n_select, timeout budgets) at 10^12-doc scale:

* **IDF family** (He & Ounis 2004): ``idf(t) = ln(N / df_t)``;
  avgIDF and maxIDF over the query's present terms.
* **SCQ** — collection-query similarity (Zhao, Scholer & Tsegay 2008):
  ``scq(t) = (1 + ln(cf_t)) * ln(1 + N / df_t)``; SumSCQ and MaxSCQ.
* **avgICTF** (Kwok / He & Ounis): ``ictf(t) = log2(total_cf / cf_t)``
  averaged over present terms.
* **SCS** — simplified clarity score (He & Ounis 2004): with each
  distinct query term weighted uniformly, the query-vs-collection KL
  divergence collapses to ``log2(1 / n_present) + avgICTF``.

Pinned conventions (the DuckDB twin of gate ``qpp_predictors`` mirrors
each): terms absent from the corpus are EXCLUDED from every statistic
(``n_terms`` still counts them; ``n_present`` counts contributors); a
query whose terms are all absent emits no row (sparse, like the
intersection tool); log2 routes through ``ln(x) * LOG2E`` on both
engines (see scorers._log2).

Scale shape: the stats relation is bounded to the query's terms by a
pushed ``In(term, ...)`` filter before any aggregate — the job touches
|terms| groups of a pre-aggregated tf relation (or a committed
term-stats catalog table), never the corpus; output is |queries| rows.
The per-term (df, cf) aggregate is partial (map-side combine) so head
terms cost one combiner row per task, not df rows on the wire.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.scorers import LOG2E, _log2


def qpp_predictors(
    tf_df: DataFrame,
    queries: list[dict],
    n_docs: float,
    total_cf: float,
) -> DataFrame:
    """(query_id, n_terms, n_present, avg_idf, max_idf, sum_scq,
    max_scq, avg_ictf, scs) — one row per query with >= 1 present term.

    tf_df: the (doc_id, term, tf) relation (from term_frequencies or
    postings_to_tf); n_docs / total_cf: corpus stats (caller-supplied
    so index-served and relational paths agree)."""
    spark = tf_df.sparkSession
    pairs = [
        (q["query_id"], t) for q in queries for t in sorted(set(q["terms"]))
    ]
    if not pairs:
        raise ValueError("qpp_predictors needs at least one query term")
    qdf = spark.createDataFrame(pairs, "query_id int, term string")
    nq = qdf.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    terms = sorted({t for _, t in pairs})
    stats = (
        tf_df.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
    )
    nd = F.lit(float(n_docs))
    tot = F.lit(float(total_cf))
    dfc = F.col("df").cast("double")
    cfc = F.col("cf").cast("double")
    per_term = qdf.join(stats, "term").select(
        "query_id",
        F.log(nd / dfc).alias("idf"),
        ((F.lit(1.0) + F.log(cfc)) * F.log(F.lit(1.0) + nd / dfc)).alias(
            "scq"
        ),
        _log2(tot / cfc).alias("ictf"),
    )
    agg = per_term.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.avg("idf").alias("avg_idf"),
        F.max("idf").alias("max_idf"),
        F.sum("scq").alias("sum_scq"),
        F.max("scq").alias("max_scq"),
        F.avg("ictf").alias("avg_ictf"),
    )
    scs = (
        F.log(F.lit(1.0) / F.col("n_present").cast("double")) * F.lit(LOG2E)
        + F.col("avg_ictf")
    )
    return agg.join(nq, "query_id").select(
        "query_id",
        "n_terms",
        "n_present",
        "avg_idf",
        "max_idf",
        "sum_scq",
        "max_scq",
        "avg_ictf",
        scs.alias("scs"),
    )


def qpp_witness(
    tok: dict[int, list[str]], queries: list[dict]
) -> dict[int, dict]:
    """Pure-Python twin (dict/Counter machinery) for tests."""
    n_docs = float(len(tok))
    total_cf = float(sum(len(v) for v in tok.values()))
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for ts in tok.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    out: dict[int, dict] = {}
    for q in queries:
        terms = sorted(set(q["terms"]))
        present = [t for t in terms if t in df]
        if not present:
            continue
        idfs = [math.log(n_docs / df[t]) for t in present]
        scqs = [
            (1.0 + math.log(cf[t])) * math.log(1.0 + n_docs / df[t])
            for t in present
        ]
        ictfs = [math.log(total_cf / cf[t]) * LOG2E for t in present]
        n = len(present)
        out[q["query_id"]] = {
            "n_terms": len(terms),
            "n_present": n,
            "avg_idf": sum(idfs) / n,
            "max_idf": max(idfs),
            "sum_scq": sum(scqs),
            "max_scq": max(scqs),
            "avg_ictf": sum(ictfs) / n,
            "scs": math.log(1.0 / n) * LOG2E + sum(ictfs) / n,
        }
    return out
