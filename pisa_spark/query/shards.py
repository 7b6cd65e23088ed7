"""Selective search — topical shards + CORI resource selection.

The standard way a 10^12-document federation avoids touching every
index shard per query (Kulkarni & Callan's selective search; CORI is
Callan et al.'s resource-selection formula): the corpus is partitioned
into topical shards, each query RANKS the shards from per-shard term
statistics — pure metadata, no postings read — and only the top
``n_select`` shards execute the query. Scores still use GLOBAL corpus
statistics (the federated-serving contract), so results are
rank-identical to searching the full federation RESTRICTED to the
selected shards' documents — which is exactly what the DuckDB twin of
gate ``selective_shard_topk`` recomputes.

CORI, pinned exactly (the twin mirrors it op for op):

    T(t, s)   = df_ts / (df_ts + 50 + 150 * cw_s / avg_cw)
    I(t)      = ln((n_shards + 0.5) / cf_t) / ln(n_shards + 1.0)
    p(t, s)   = b + (1 - b) * T * I            (b = 0.4)
    belief(q, s) = mean over q's distinct terms of p(t, s)

df_ts = documents containing t in shard s; cw_s = shard s's total
token count; avg_cw = mean cw over shards; cf_t = number of shards
containing t (a term in NO shard contributes p = b: T = 0, I
coalesced to 0). Shards rank per query by (belief DESC, shard ASC) —
the name tiebreak makes all-absent-term queries deterministic.

Scale shape: selection inputs are per-shard BLOCK METADATA aggregates
(sum of per-block posting counts — no payload decode), bounded to the
query's terms by a pushed In(term, ...) filter; the driver sees
|shards| x |query terms| numbers, never a corpus-sized relation.
Serving fans each query out to n_select shards instead of all of them
— with 1000 topical shards and n_select=4 that is a 250x cut in
postings touched per query, the entire point of the architecture. The
selected shards score under combined stats exactly as federated
serving does (corner-stat blocks are valid under any global stats),
and the answer is one k-row window over the members' top-ks.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import bm25_topk_wand, topk_window

CORI_B = 0.4
CORI_K_DF = 50.0
CORI_K_CW = 150.0


def shard_term_stats(
    shards: list[tuple[str, DataFrame]], terms: list[str] | None = None
) -> DataFrame:
    """(shard, term, df) from block metadata only — one partial-agg
    pass per shard, no payload decode. terms bounds the scan with a
    pushed In(term, ...) filter (the per-query shape); None computes
    the full per-shard vocabulary (the build-time shape, committed as
    a catalog table in a persistent deployment)."""
    parts = []
    for name, postings in shards:
        rel = postings
        if terms is not None:
            rel = rel.filter(F.col("term").isin(sorted(set(terms))))
        parts.append(
            rel.groupBy("term")
            .agg(F.sum("n").alias("df"))
            .select(F.lit(name).alias("shard"), "term", "df")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cori_select(
    df_ts: dict[tuple[str, str], int],
    shard_cw: dict[str, int],
    queries: list[dict],
    n_select: int,
    b: float = CORI_B,
) -> dict[int, list[str]]:
    """{query_id: the n_select shard names to search}, CORI-ranked.

    df_ts: {(shard, term): df}; shard_cw: {shard: total tokens}. Pure
    closed-form arithmetic over |shards| x |terms| numbers — belief
    sums run over SORTED terms and shards so selection is bit-stable
    across runs and partitionings."""
    names = sorted(shard_cw)
    if n_select < 1:
        raise ValueError("n_select must be >= 1")
    n_shards = len(names)
    avg_cw = sum(shard_cw[s] for s in names) / float(n_shards)
    cf: dict[str, int] = {}
    for (s, t), d in df_ts.items():
        if d > 0:
            cf[t] = cf.get(t, 0) + 1
    out: dict[int, list[str]] = {}
    for q in queries:
        terms = sorted(set(q["terms"]))
        if not terms:
            out[q["query_id"]] = names[:n_select]
            continue
        beliefs = []
        for s in names:
            acc = 0.0
            for t in terms:
                d = float(df_ts.get((s, t), 0))
                tt = d / (d + CORI_K_DF + CORI_K_CW * shard_cw[s] / avg_cw)
                ii = (
                    math.log((n_shards + 0.5) / cf[t])
                    / math.log(n_shards + 1.0)
                    if t in cf
                    else 0.0
                )
                acc += b + (1.0 - b) * tt * ii
            beliefs.append((acc / len(terms), s))
        beliefs.sort(key=lambda x: (-x[0], x[1]))
        out[q["query_id"]] = [s for _, s in beliefs[:n_select]]
    return out


def selective_topk(
    shards: list[tuple[str, DataFrame, dict]],
    queries: list[dict],
    k: int = 10,
    n_select: int = 2,
    b: float = CORI_B,
    pre_arranged: bool = False,
) -> DataFrame:
    """Top-k over the CORI-selected shards of a named federation,
    scored under GLOBAL stats (rank-identical to full federated
    serving restricted to the selected shards' documents).

    shards: [(name, postings, stats)] — stats carries n_docs and
    total_terms (per the federated contract; doc-id spaces disjoint).
    One metadata aggregate per shard feeds BOTH the global term dfs
    and the CORI selection; only the selected shards' postings are
    ever decoded."""
    if not shards:
        raise ValueError("selective_topk needs at least one shard")
    n_docs = sum(int(st["n_docs"]) for _, _, st in shards)
    avgdl = sum(int(st["total_terms"]) for _, _, st in shards) / float(
        n_docs
    )
    all_terms = sorted(
        {t for q in queries for t in q["terms"]}
        | {t for q in queries for t in q.get("negated", [])}
    )
    df_ts: dict[tuple[str, str], int] = {}
    for r in shard_term_stats(
        [(name, p) for name, p, _ in shards], terms=all_terms
    ).collect():
        df_ts[(r["shard"], r["term"])] = int(r["df"])
    term_dfs: dict[str, int] = {t: 0 for t in all_terms}
    for (_, t), d in df_ts.items():
        term_dfs[t] += d
    shard_cw = {name: int(st["total_terms"]) for name, _, st in shards}
    selected = cori_select(df_ts, shard_cw, queries, n_select, b=b)
    parts = []
    for name, postings, _ in shards:
        qs = [q for q in queries if name in selected[q["query_id"]]]
        if not qs:
            continue
        parts.append(
            bm25_topk_wand(
                postings, qs, n_docs, avgdl, k=k, term_dfs=term_dfs,
                pre_arranged=pre_arranged,
            ).select("query_id", "doc_id", "score")
        )
    if not parts:
        spark = shards[0][1].sparkSession
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return topk_window(union, k)
