"""Pluggable ranking scorers beyond BM25: QLD, PL2 and DPH — the
classic full-text scorer set (language-model and divergence-from-
randomness families) served off the SAME tf relation / compressed
index as BM25, mirroring the scorer-vs-index separation of real
search engines (the scorer is a function of per-posting (tf, dl) and
per-term (df, cf) statistics; the index stores only the statistics).

Published formulas, pinned deterministically (the DuckDB oracle twins
mirror each pin verbatim):

* **QLD** — Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001),
  per matched term: ``ln(1 + tf/(mu*cf/total_cf)) + ln(mu/(dl+mu))``,
  mu = 1000. The doc-length normalizer is folded per matched term
  (term-at-a-time rendering), so only docs matching >=1 term score.
* **PL2** — DFR Poisson/Laplace/2nd-normalization (Amati & van
  Rijsbergen 2002, Terrier rendering), c = 1:
  ``tfn = tf*log2(1 + c*avgdl/dl)``, ``lambda = cf/N``, score =
  ``(tfn*log2(tfn/lambda) + (lambda + 1/(12*tfn) - tfn)*log2(e)
  + 0.5*log2(2*pi*tfn)) / (tfn + 1)``.
* **DPH** — parameter-free DFR hypergeometric (Amati et al. 2008,
  Terrier rendering): ``f = tf/dl``, norm = ``(1-f)^2/(tf+1)``, score =
  ``norm * (tf*log2((tf*avgdl/dl)*(N/cf)) + 0.5*log2(2*pi*tf*(1-f)))``;
  pinned edge: ``tf >= dl`` (a one-term document) scores 0.0 — the
  norm factor is 0 there and the log term would be -inf, so the product
  is defined to its limit.

Compositions are sums over matched query terms with the engine's
shared top-k tie rule (score DESC, doc_id ASC). All scorer math is
pure column expressions (whole-stage codegen); numeric constants
(log2(e), 2*pi) are pinned as literals so Spark and the oracle use
bit-identical inputs.

Reference parity note: the reference ranks by a learned dot product
(/root/reference/src/Inference.py:227-240) — one fixed scoring
function. The pluggable-scorer registry is target-engine surface:
same top-k machinery, swappable per-term score.

Scale: identical dataflow to ``bm25_topk_dataframe`` — broadcast the
query terms, one partial-aggregated (query, doc) shuffle, window
top-k. ``postings_to_tf`` decodes the compressed index back to the tf
relation with one vectorized varint pass per Arrow batch (no
per-posting Python), so any scorer serves off the stored index
without a rebuild.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pisa_spark.index import codec
from pisa_spark.query.bm25 import score_expr as bm25_expr
from pisa_spark.query.bm25 import topk_window

QLD_MU = 1000.0
PL2_C = 1.0
BM25PLUS_DELTA = 1.0  # Lv & Zhai's lower-bounding shift
JM_LAMBDA = 0.15  # Hiemstra_LM / Terrier default document-model weight
LOG2E = 1.4426950408889634  # log2(e), pinned literal shared with oracles
TWO_PI = 6.283185307179586


def _log2(col):
    """log2 pinned as ln(x)*LOG2E — platform log2 implementations differ
    by an ulp between engines; routing BOTH Spark and the DuckDB twins
    through natural log times the same literal keeps the float paths
    bit-comparable."""
    return F.log(col) * F.lit(LOG2E)


def _log2_np(x):
    return np.log(x) * LOG2E


def qld_expr(total_cf: float, mu: float = QLD_MU):
    """QLD partial score over (tf, doc_len, cf) columns."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    p_c = F.col("cf").cast("double") / F.lit(float(total_cf))
    return F.log(1.0 + tf / (F.lit(float(mu)) * p_c)) + F.log(
        F.lit(float(mu)) / (dl + F.lit(float(mu)))
    )


def bm25plus_expr(n_docs: float, avgdl: float, delta: float = BM25PLUS_DELTA):
    """BM25+ (Lv & Zhai, CIKM 2011): BM25 with a per-matched-term
    lower bound — score_t = idf * (tf_saturation + delta), delta = 1 —
    fixing BM25's over-penalization of very long documents (a long
    doc matching a term can otherwise score arbitrarily close to a
    non-matching one). Same (k1=0.9, b=0.4) literals as the engine's
    BM25; same monotonicity (+tf, -dl per term, sign carried by idf),
    so the pruned kernel's corner bounds stay exact."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    df = F.col("df").cast("double")
    idf = F.log(
        (F.lit(float(n_docs)) - df + 0.5) / (df + 0.5)
    )
    sat = (tf * 1.9) / (
        tf + 0.9 * (1.0 - 0.4 + 0.4 * dl / F.lit(float(avgdl)))
    )
    return idf * (sat + F.lit(float(delta)))


def qljm_expr(total_cf: float, lam: float = JM_LAMBDA):
    """Jelinek-Mercer smoothed query likelihood (Hiemstra_LM shape) —
    matched-term contribution relative to the background model:
    ln(1 + lam * tf * total_cf / ((1 - lam) * cf * doc_len)). Strictly
    positive and corner-monotone (+tf, -dl), so the kernel's corner
    block bounds prune it soundly under OR and AND."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    cf = F.col("cf").cast("double")
    return F.log(
        1.0
        + F.lit(float(lam))
        * tf
        * F.lit(float(total_cf))
        / (F.lit(1.0 - float(lam)) * cf * dl)
    )


def inl2_expr(n_docs: float, avgdl: float, c: float = PL2_C):
    """InL2 (Amati & van Rijsbergen 2002, Terrier rendering): inverse
    document frequency model with Laplace after-effect and 2nd
    normalization — score_t = (tfn * log2((N+1)/(df+0.5))) / (tfn+1),
    tfn = tf*log2(1 + c*avgdl/dl). Strictly positive and per-term
    monotone (+tf, -dl through tfn; df fixed), so the pruned kernel's
    corner bounds are exact and WAND-style skipping applies."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    df = F.col("df").cast("double")
    tfn = tf * _log2(1.0 + F.lit(float(c)) * F.lit(float(avgdl)) / dl)
    return (
        tfn * _log2((F.lit(float(n_docs)) + 1.0) / (df + 0.5))
    ) / (tfn + 1.0)


def pl2_expr(n_docs: float, avgdl: float, c: float = PL2_C):
    """PL2 partial score over (tf, doc_len, cf) columns."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    tfn = tf * _log2(1.0 + F.lit(float(c)) * F.lit(float(avgdl)) / dl)
    lam = F.col("cf").cast("double") / F.lit(float(n_docs))
    return (
        tfn * _log2(tfn / lam)
        + (lam + 1.0 / (12.0 * tfn) - tfn) * F.lit(LOG2E)
        + 0.5 * _log2(F.lit(TWO_PI) * tfn)
    ) / (tfn + 1.0)


def dph_expr(n_docs: float, avgdl: float):
    """DPH partial score over (tf, doc_len, cf) columns."""
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    f = tf / dl
    norm = (1.0 - f) * (1.0 - f) / (tf + 1.0)
    raw = norm * (
        tf
        * _log2(
            (tf * F.lit(float(avgdl)) / dl)
            * (F.lit(float(n_docs)) / F.col("cf").cast("double"))
        )
        + 0.5 * _log2(F.lit(TWO_PI) * tf * (1.0 - f))
    )
    return F.when(F.col("tf") >= F.col("doc_len"), F.lit(0.0)).otherwise(raw)


# NumPy twins (independent machinery for tests; same pinned constants)


def qld_np(tf, dl, cf, total_cf, mu: float = QLD_MU):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    p_c = np.asarray(cf, np.float64) / total_cf
    return np.log(1.0 + tf / (mu * p_c)) + np.log(mu / (dl + mu))


def bm25plus_np(tf, dl, df, n_docs, avgdl, delta: float = BM25PLUS_DELTA):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    df = np.asarray(df, np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5))
    sat = (tf * 1.9) / (tf + 0.9 * (1.0 - 0.4 + 0.4 * dl / avgdl))
    return idf * (sat + delta)


def qljm_np(tf, dl, cf, total_cf, lam: float = JM_LAMBDA):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    cf = np.asarray(cf, np.float64)
    return np.log(1.0 + lam * tf * total_cf / ((1.0 - lam) * cf * dl))


def inl2_np(tf, dl, df, n_docs, avgdl, c: float = PL2_C):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    df = np.asarray(df, np.float64)
    tfn = tf * _log2_np(1.0 + c * avgdl / dl)
    return (tfn * _log2_np((n_docs + 1.0) / (df + 0.5))) / (tfn + 1.0)


def pl2_np(tf, dl, cf, n_docs, avgdl, c: float = PL2_C):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    tfn = tf * _log2_np(1.0 + c * avgdl / dl)
    lam = np.asarray(cf, np.float64) / n_docs
    return (
        tfn * _log2_np(tfn / lam)
        + (lam + 1.0 / (12.0 * tfn) - tfn) * LOG2E
        + 0.5 * _log2_np(TWO_PI * tfn)
    ) / (tfn + 1.0)


def dph_np(tf, dl, cf, n_docs, avgdl):
    tf = np.asarray(tf, np.float64)
    dl = np.asarray(dl, np.float64)
    out = np.zeros(tf.shape, np.float64)
    ok = tf < dl
    f = tf[ok] / dl[ok]
    norm = (1.0 - f) ** 2 / (tf[ok] + 1.0)
    out[ok] = norm * (
        tf[ok]
        * _log2_np(
            (tf[ok] * avgdl / dl[ok]) * (n_docs / np.asarray(cf, np.float64)[ok])
        )
        + 0.5 * _log2_np(TWO_PI * tf[ok] * (1.0 - f))
    )
    return out


def scorer_expr(name: str, n_docs: float, avgdl: float, total_cf: float):
    """Column expression for a registered scorer over the tf relation
    (columns tf, doc_len, df, cf)."""
    if name == "bm25":
        return bm25_expr(n_docs, avgdl)
    if name == "bm25plus":
        return bm25plus_expr(n_docs, avgdl)
    if name == "qld":
        return qld_expr(total_cf)
    if name == "qljm":
        return qljm_expr(total_cf)
    if name == "inl2":
        return inl2_expr(n_docs, avgdl)
    if name == "pl2":
        return pl2_expr(n_docs, avgdl)
    if name == "dph":
        return dph_expr(n_docs, avgdl)
    raise ValueError(f"unknown scorer: {name!r}")


SCORERS = ("bm25", "bm25plus", "qld", "qljm", "inl2", "pl2", "dph")


def term_stats_full(tf_df: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency and collection frequency —
    the per-term side table every scorer draws from. One aggregation
    over the tf relation; output is vocabulary-sized (broadcastable)."""
    return tf_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def scored_topk_dataframe(
    tf_df: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    total_cf: float,
    scorer: str = "bm25",
    k: int = 10,
    conjunctive: bool = False,
    priors: DataFrame | None = None,
    prior_weight: float = 0.1,
    prior_scale: int = 10**12,
) -> DataFrame:
    """Exhaustive top-k under any registered scorer — the scorer-generic
    sibling of ``bm25_topk_dataframe`` (same dataflow: broadcast query
    terms, partial-aggregated (query, doc) shuffle, window top-k).

    tf_df: (doc_id, term, tf, doc_len) plus (df, cf) — join
    :func:`term_stats_full` if absent.

    priors: optional static query-independent document prior
    (doc_id, prior_units) — e.g. integer fixed-point PageRank units
    from operators/linkgraph (click-graph or link-graph mass). Blended
    the standard web-ranking way, post-aggregation and pre-top-k:

        score' = score + prior_weight * ln((prior_units + 1) / scale)

    Docs absent from ``priors`` take units 0 (the ln(1/scale) floor).
    The join keys on doc_id and touches only docs that matched a query
    term — at 10^12 docs it is a co-partitionable equi-join on the
    bounded matched set, never a full-corpus pass.
    """
    if "cf" not in tf_df.columns:
        stats = term_stats_full(tf_df.select("term", "tf"))
        if "df" in tf_df.columns:
            stats = stats.drop("df")
        tf_df = tf_df.join(F.broadcast(stats), "term")
    qterms = queries_df.select("query_id", "term").distinct()
    qsizes = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    matched = tf_df.join(F.broadcast(qterms), "term")
    scored = matched.withColumn(
        "pscore", scorer_expr(scorer, n_docs, avgdl, total_cf)
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("pscore").alias("score"), F.count(F.lit(1)).alias("n_matched")
    )
    if conjunctive:
        per_doc = per_doc.join(F.broadcast(qsizes), "query_id").filter(
            F.col("n_matched") == F.col("n_terms")
        )
    per_doc = per_doc.select("query_id", "doc_id", "score")
    if priors is not None:
        per_doc = blend_with_prior(per_doc, priors, prior_weight, prior_scale)
    return topk_window(per_doc, k)


def blend_with_prior(
    scored: DataFrame,
    priors: DataFrame,
    prior_weight: float = 0.1,
    prior_scale: int = 10**12,
) -> DataFrame:
    """The one static-prior blend, shared by the exhaustive path and
    the two-stage rerank (engine.search_reranked):

        score' = score + prior_weight * ln((prior_units + 1) / scale)

    Docs absent from ``priors`` take units 0 — the ln(1/scale) floor."""
    return scored.join(
        priors.select("doc_id", "prior_units"), "doc_id", "left"
    ).select(
        "query_id",
        "doc_id",
        (
            F.col("score")
            + F.lit(prior_weight)
            * F.log(
                (F.coalesce(F.col("prior_units"), F.lit(0)) + F.lit(1))
                / F.lit(float(prior_scale))
            )
        ).alias("score"),
    )


_TF_RELATION_SCHEMA = "term string, doc_id long, tf int, doc_len int"


def postings_to_tf(postings: DataFrame) -> DataFrame:
    """Decode the compressed posting blocks back to the logical
    (term, doc_id, tf, doc_len) relation — the seam that serves ANY
    scorer off the stored index.

    Vectorized: per Arrow batch, each payload column decodes with ONE
    varint pass over the concatenated block bytes (block byte-strings
    concatenate losslessly; doc-ids rebuild by segmented cumsum), and
    term labels are np.repeat'ed per block — no per-posting Python.
    At scale the decode is embarrassingly parallel over block rows and
    carries no shuffle; downstream scoring shuffles only matched rows.
    """

    def _decode(it):
        for pdf in it:
            if not len(pdf):
                continue
            ns = pdf["n"].to_numpy(np.int64)
            deltas = codec.varint_decode(b"".join(pdf["docs"])).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
            adj = deltas + 1
            adj[starts] = deltas[starts]
            cs = np.cumsum(adj)
            seg_prefix = (
                np.concatenate(([0], cs[starts[1:] - 1]))
                if starts.size > 1
                else np.zeros(1, np.int64)
            )
            docs = cs - np.repeat(seg_prefix, ns)
            tfs = codec.varint_decode(b"".join(pdf["tfs"])).astype(np.int64) + 1
            dls = codec.varint_decode(b"".join(pdf["dls"])).astype(np.int64)
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(object), ns),
                    "doc_id": docs,
                    "tf": tfs.astype(np.int32),
                    "doc_len": dls.astype(np.int32),
                }
            )

    return postings.select("term", "n", "docs", "tfs", "dls").mapInPandas(
        _decode, schema=_TF_RELATION_SCHEMA
    )


def explain_contributions(
    postings: DataFrame,
    queries_df: DataFrame,
    n_docs: float,
    avgdl: float,
    doc_ids: list[int] | None = None,
) -> DataFrame:
    """Score EXPLAIN: one row per (query_id, doc_id, term) with the
    full BM25 anatomy — tf, doc_len, df, idf and the term's
    contribution — so a ranking can be audited term by term
    (sum(contrib) over a doc == its search() score exactly: same
    score_expr, same float association).

    queries_df: (query_id, term) exploded. doc_ids: restrict to these
    docs (the common 'why is THIS doc ranked here' case — the id
    filter lands before the decode via block skip metadata).
    Relational path off the compressed index: term-pruned scan ->
    decode -> broadcast query join -> codegen score expression. No
    kernel state; at scale it is one narrow pass over the queried
    terms' blocks."""
    from pisa_spark.query.bm25 import score_expr

    qterms = queries_df.select("query_id", "term").distinct()
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    pruned = postings.filter(F.col("term").isin(terms))
    if doc_ids is not None:
        # block skip: (first_doc, max_doc) bound each block's doc range
        # (an explicit empty list means 'no docs' -> empty result)
        conds = [
            (F.col("first_doc") <= int(d)) & (F.col("max_doc") >= int(d))
            for d in doc_ids
        ]
        keep = conds[0] if conds else F.lit(False)
        for c in conds[1:]:
            keep = keep | c
        pruned = pruned.filter(keep)
    tf_rel = postings_to_tf(pruned)
    if doc_ids is not None:
        tf_rel = tf_rel.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
    # df from block METADATA of the full pruned term set (never from
    # the decoded relation, which may be doc-restricted)
    df_df = (
        postings.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("n").alias("df"))
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        tf_rel.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_df), "term")
        .select(
            "query_id",
            "doc_id",
            "term",
            "tf",
            "doc_len",
            "df",
            F.round(idf, 4).alias("idf"),
            F.round(score_expr(n_docs, avgdl), 4).alias("contrib"),
        )
    )
