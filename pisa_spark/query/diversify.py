"""MMR result diversification (Carbonell & Goldstein, SIGIR'98).

Re-rank a bounded per-query candidate set so results cover different
content: greedily pick the doc maximizing

    O(c) = (10-L)·rn(c) - L·maxsim(c, selected)        (all int64)

where rn is the candidate's relevance min-max normalized to [0, 10^6]
(BM25 scores can be NEGATIVE — head terms with df > n/2 — so a plain
max-share would invert the direction; all-equal candidate scores pin
rn to 10^6) and maxsim the max token-set Jaccard (ppm)
against the already-selected docs; L is the diversity weight
(classic MMR lambda — the relevance weight — is (10-L)/10).

Determinism contract (the DuckDB-twin bar): every float op that feeds
a floor() happens in the SAME order in both engines —
rq = floor(score·10^6), rn = floor((rq-min_rq)·10^6 / (max_rq-min_rq)),
sim = floor(10^6·|A∩B| / |A∪B|) — and after the floors the objective
is pure int64 arithmetic (order-free), so selection, including ties
(doc_id ASC), is exactly reproducible. The twin unrolls the k greedy
steps as chained CTEs (the PageRank-twin pattern).

Scale shape: candidates are the per-query top-N of the index-serving
path (N bounded, default 20), so the quadratic similarity work is
N²·|queries| INSIDE an ``applyInPandas`` group kernel — distributed
across queries, never a corpus self-join. Token sets ride along via
one equi-join against the docs relation; at 10^12 docs you'd swap the
exact Jaccard for MinHash or embedding sims (dedup/, similarity/) —
same kernel, different sim column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col

MMR_SCHEMA = "query_id int, rank int, doc_id long, objective long"


def candidate_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, toks) — the doc's DISTINCT sorted token set, the exact
    shape the similarity kernel and the twin's list_intersect use."""
    return docs.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(tokens_col(F.col(text_col)))
        ).alias("toks"),
    )


def mmr_rerank(
    candidates: DataFrame,
    doc_tokens: DataFrame,
    k: int = 10,
    div10: int = 5,
) -> DataFrame:
    """candidates: (query_id, doc_id, score raw-double) bounded top-N
    per query. Returns (query_id, rank, doc_id, objective) — the k MMR
    picks per query in selection order; ``objective`` is the integer
    MMR value at pick time (first pick: (10-L)·rn, maxsim over the
    empty set being 0)."""
    if not (0 <= div10 <= 10):
        raise ValueError(
            "div10 must be in [0, 10] (MMR lambda = (10-div10)/10)"
        )
    w = Window.partitionBy("query_id")
    cand = (
        candidates.select("query_id", "doc_id", "score")
        .withColumn(
            "rq", F.floor(F.col("score") * F.lit(1000000.0)).cast("long")
        )
        .withColumn("mrq", F.max("rq").over(w))
        .withColumn("nrq", F.min("rq").over(w))
        .withColumn(
            "rn",
            F.when(
                F.col("mrq") == F.col("nrq"), F.lit(1000000).cast("long")
            ).otherwise(
                F.floor(
                    (F.col("rq") - F.col("nrq")).cast("double")
                    * F.lit(1000000.0)
                    / (F.col("mrq") - F.col("nrq"))
                ).cast("long")
            ),
        )
        .join(doc_tokens, "doc_id")
        .select("query_id", "doc_id", "rn", "toks")
    )
    kk, ll = int(k), int(div10)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n = len(pdf)
        qid = int(pdf["query_id"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        rn = pdf["rn"].to_numpy(np.int64)
        tok_sets = [set(t) for t in pdf["toks"]]
        sim = np.zeros((n, n), dtype=np.int64)
        for i in range(n):
            a = tok_sets[i]
            for j in range(i + 1, n):
                b = tok_sets[j]
                inter = len(a & b)
                uni = len(a) + len(b) - inter
                # identical op order to the twin: (1e6*inter)/uni, floor
                s = int(np.floor(1000000.0 * inter / uni)) if uni else 0
                sim[i, j] = sim[j, i] = s
        picked = np.zeros(n, dtype=bool)
        maxsim = np.zeros(n, dtype=np.int64)
        out = []
        for step in range(1, min(kk, n) + 1):
            obj = (10 - ll) * rn - ll * maxsim
            obj[picked] = np.iinfo(np.int64).min
            best = int(np.flatnonzero(obj == obj.max())[0])  # doc_id ASC
            out.append((qid, step, int(doc_ids[best]), int(obj[best])))
            picked[best] = True
            maxsim = np.maximum(maxsim, sim[best])
        return pd.DataFrame(
            out, columns=["query_id", "rank", "doc_id", "objective"]
        )

    return cand.groupBy("query_id").applyInPandas(kernel, schema=MMR_SCHEMA)
