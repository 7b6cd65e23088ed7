"""Taily shard selection — score-distribution resource ranking.

Aly, Hiemstra & Demeester (SIGIR 2013): instead of CORI's df-based
beliefs (query/shards.py), model each shard's distribution of query
scores as a Gamma and estimate, per shard, HOW MANY documents would
score above the cutoff that yields the global top-``ntop`` — then
search only shards expected to contribute more than ``v`` of them.
This is the statistics-based half of PISA's selective-search tooling
(real PISA consumes taily stats files offline); the formulation below
is the taily library's disjoint-union rendering, pinned:

* per (shard, term): ``freq`` (df in the shard), ``s1``/``s2`` (sum
  and sum of squares of the term's single-doc scores, under the
  engine's GLOBAL BM25 per-term score so selection is consistent with
  serving);
* per (query, shard), summing over the query's terms: ``any = Σ freq``
  (each term's postings treated as distinct documents — the
  disjoint-union approximation), ``ev = Σ s1 / any``,
  ``var = Σ s2 / any - ev²``; Gamma moment fit ``k = ev²/var``,
  ``theta = var/ev`` (pinned 0 when ``ev <= 0`` or ``var <= 0`` —
  BM25 head terms can score negative, and a degenerate fit must never
  select);
* global cutoff ``s_c``: the score whose expected exceedance count
  over ALL shards combined equals ``ntop`` — the (1 - ntop/any_all)
  quantile of the all-shards Gamma; per shard
  ``n_i = any_i * (1 - P(k_i, s_c/theta_i))`` with ``P`` the
  regularized lower incomplete gamma; select shards with
  ``n_i > v`` (argmax fallback so every query searches >= 1 shard).

The incomplete gamma is implemented from the defining series /
continued fraction (no scipy in-sandbox) and cross-checked in tests
against direct numeric integration of the Gamma pdf.

Scale shape: the stats relation is one decode pass bounded to the
query's terms by a pushed ``In(term, ...)`` filter (the per-query
shape) or the full vocabulary once at build time (the taily-stats
tool shape — committed as a catalog table alongside term_thresholds);
either way the driver sees |shards| x |terms| rows, never postings.
Selection itself is closed-form arithmetic over those rows, and the
selected shards execute under GLOBAL stats exactly like CORI's
``selective_topk`` — rank-identical to federated serving restricted
to the selected members.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import bm25_topk_wand, score_expr, topk_window
from pisa_spark.query.scorers import postings_to_tf
from pisa_spark.query.shards import shard_term_stats

TAILY_NTOP = 100
TAILY_V = 1.0


# ---------------------------------------------------------------------------
# regularized lower incomplete gamma + quantile (pure stdlib)
# ---------------------------------------------------------------------------


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) = γ(a, x) / Γ(a),
    from the defining power series (x < a + 1) and the Legendre
    continued fraction for Q (x >= a + 1), modified-Lentz evaluated.
    Deterministic: fixed tolerances, no platform special functions
    beyond lgamma."""
    if a <= 0.0:
        raise ValueError("a must be > 0")
    if x < 0.0:
        raise ValueError("x must be >= 0")
    if x == 0.0:
        return 0.0
    lead = math.exp(-x + a * math.log(x) - math.lgamma(a))
    if x < a + 1.0:
        # γ(a,x) = x^a e^-x Σ_{n>=0} x^n / (a (a+1) ... (a+n))
        term = 1.0 / a
        total = term
        den = a
        for _ in range(1000):
            den += 1.0
            term *= x / den
            total += term
            if abs(term) < abs(total) * 1e-16:
                break
        return min(1.0, lead * total)
    # Q(a,x) = x^a e^-x / Γ(a) * 1/(x+1-a- 1·(1-a)/(x+3-a- 2·(2-a)/…))
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b if b != 0.0 else 1.0 / tiny
    h = d
    for i in range(1, 1000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return max(0.0, 1.0 - lead * h)


def gamma_quantile(p: float, k: float, theta: float) -> float:
    """x such that P(k, x/theta) = p, by deterministic bisection (the
    CDF is monotone; 200 halvings of a doubling-grown bracket)."""
    if not 0.0 <= p < 1.0:
        raise ValueError("p must be in [0, 1)")
    if k <= 0.0 or theta <= 0.0:
        raise ValueError("k and theta must be > 0")
    if p == 0.0:
        return 0.0
    hi = k * theta + theta  # start past the mean
    for _ in range(200):
        if gammainc_p(k, hi / theta) >= p:
            break
        hi *= 2.0
    lo = 0.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if gammainc_p(k, mid / theta) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# statistics (Spark) and selection (driver closed form)
# ---------------------------------------------------------------------------


def taily_term_stats(
    shards: list[tuple[str, DataFrame]],
    n_docs: float,
    avgdl: float,
    terms: list[str] | None = None,
) -> DataFrame:
    """(shard, term, freq, s1, s2) — per-shard per-term score moments
    under the GLOBAL single-term BM25 score (global df aggregated from
    block metadata across shards; one bounded decode pass per shard)."""
    gdf = (
        shard_term_stats(shards, terms)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    parts = []
    for name, postings in shards:
        rel = postings
        if terms is not None:
            rel = rel.filter(F.col("term").isin(sorted(set(terms))))
        scored = postings_to_tf(rel).join(F.broadcast(gdf), "term").select(
            "term",
            score_expr(float(n_docs), float(avgdl)).alias("s"),
        )
        parts.append(
            scored.groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("freq"),
                F.sum("s").alias("s1"),
                F.sum(F.col("s") * F.col("s")).alias("s2"),
            )
            .select(F.lit(name).alias("shard"), "term", "freq", "s1", "s2")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def taily_query_stats(term_stats: DataFrame, queries: list[dict]) -> DataFrame:
    """(query_id, shard, n_any, ev, var, k, theta) — the Gamma moment
    fit per (query, shard), emitted only where the shard contains >= 1
    query term (sparse). Degenerate fits (ev <= 0 or var <= 0) pin
    k = theta = 0. (named n_any, not any — ANY is reserved SQL.)"""
    spark = term_stats.sparkSession
    pairs = [
        (q["query_id"], t) for q in queries for t in sorted(set(q["terms"]))
    ]
    qdf = spark.createDataFrame(pairs, "query_id int, term string")
    agg = (
        term_stats.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "shard")
        .agg(
            F.sum("freq").alias("n_any"),
            F.sum("s1").alias("t1"),
            F.sum("s2").alias("t2"),
        )
    )
    anyd = F.col("n_any").cast("double")
    ev = F.col("t1") / anyd
    var = F.col("t2") / anyd - ev * ev
    fit_ok = (ev > 0.0) & (var > 0.0)
    return agg.select(
        "query_id",
        "shard",
        "n_any",
        ev.alias("ev"),
        var.alias("var"),
        F.when(fit_ok, (ev * ev) / var).otherwise(F.lit(0.0)).alias("k"),
        F.when(fit_ok, var / ev).otherwise(F.lit(0.0)).alias("theta"),
    )


def taily_select(
    moments: dict[tuple[int, str], tuple[int, float, float]],
    queries: list[dict],
    ntop: int = TAILY_NTOP,
    v: float = TAILY_V,
) -> dict[int, list[str]]:
    """{query_id: selected shard names}, by estimated above-cutoff doc
    counts. moments: {(query_id, shard): (any, s1, s2)} — the RAW sums
    (taily_term_stats rows reduced per query), so the all-shards fit
    composes exactly. Shards rank by (n_i DESC, name ASC); shards with
    n_i <= v drop; the best shard always survives."""
    if ntop < 1:
        raise ValueError("ntop must be >= 1")
    out: dict[int, list[str]] = {}
    for q in queries:
        qid = q["query_id"]
        rows = sorted(
            (s, m) for (i, s), m in moments.items() if i == qid and m[0] > 0
        )
        if not rows:
            out[qid] = []
            continue
        a_all = sum(m[0] for _, m in rows)
        t1 = sum(m[1] for _, m in rows)
        t2 = sum(m[2] for _, m in rows)
        ev_all = t1 / a_all
        var_all = t2 / a_all - ev_all * ev_all
        if ntop >= a_all or ev_all <= 0.0 or var_all <= 0.0:
            # fewer candidates than wanted (or no global fit): no
            # cutoff can exclude anything — keep every candidate shard
            est = [(float(m[0]), s) for s, m in rows]
        else:
            k_all = ev_all * ev_all / var_all
            th_all = var_all / ev_all
            s_c = gamma_quantile(1.0 - ntop / a_all, k_all, th_all)
            est = []
            for s, (any_i, s1, s2) in rows:
                ev = s1 / any_i
                var = s2 / any_i - ev * ev
                if ev <= 0.0 or var <= 0.0:
                    est.append((0.0, s))
                    continue
                n_i = any_i * (
                    1.0 - gammainc_p(ev * ev / var, s_c / (var / ev))
                )
                est.append((n_i, s))
        est.sort(key=lambda x: (-x[0], x[1]))
        keep = [s for n_i, s in est if n_i > v]
        out[qid] = keep if keep else [est[0][1]]
    return out


def taily_topk(
    shards: list[tuple[str, DataFrame, dict]],
    queries: list[dict],
    k: int = 10,
    ntop: int = TAILY_NTOP,
    v: float = TAILY_V,
    pre_arranged: bool = False,
) -> DataFrame:
    """Top-k over the Taily-selected shards, scored under GLOBAL
    federation stats — the taily twin of shards.selective_topk."""
    if not shards:
        raise ValueError("taily_topk needs at least one shard")
    n_docs = sum(int(st["n_docs"]) for _, _, st in shards)
    avgdl = sum(int(st["total_terms"]) for _, _, st in shards) / float(n_docs)
    all_terms = sorted(
        {t for q in queries for t in q["terms"]}
        | {t for q in queries for t in q.get("negated", [])}
    )
    stats_rows = taily_term_stats(
        [(name, p) for name, p, _ in shards], n_docs, avgdl, terms=all_terms
    ).collect()
    per_shard_term = {
        (r["shard"], r["term"]): (int(r["freq"]), float(r["s1"]), float(r["s2"]))
        for r in stats_rows
    }
    term_dfs: dict[str, int] = {t: 0 for t in all_terms}
    for (_, t), (freq, _, _) in per_shard_term.items():
        term_dfs[t] += freq
    moments: dict[tuple[int, str], tuple[int, float, float]] = {}
    for q in queries:
        for name, _, _ in shards:
            acc = [0, 0.0, 0.0]
            for t in sorted(set(q["terms"])):
                m = per_shard_term.get((name, t))
                if m:
                    acc[0] += m[0]
                    acc[1] += m[1]
                    acc[2] += m[2]
            if acc[0] > 0:
                moments[(q["query_id"], name)] = tuple(acc)
    selected = taily_select(moments, queries, ntop=ntop, v=v)
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
