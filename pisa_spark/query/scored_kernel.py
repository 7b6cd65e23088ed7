"""Scorer-generic pruned serving: QLD / PL2 / DPH (and BM25) through
the same bucket-local kernel dataflow as block-max WAND.

Why this exists (r4 verdict item #2): ``scored_topk_dataframe``
(query/scorers.py) serves alternative scorers relationally — decode the
queried terms' blocks to a tf relation, join, then a (query, doc)
hash-aggregate SHUFFLE of every matched posting, then the top-k window.
At 10^12 docs a stop-wordy term shuffles billions of matched rows per
query. BM25 avoids that with the per-bucket NumPy kernel
(query/bm25.py wand_kernel): decode inside the bucket, bincount-sum
locally, emit <= k candidate rows per bucket — only n_buckets*|q|*k
rows ever cross an exchange. This module gives every registered scorer
that dataflow.

Dynamic pruning is scorer-aware, exactness first (the same
scorer/pruning split PISA itself makes — impact layouts and bound
metadata are per-scorer):

* **QLD** (and **QLJM**, whose score is strictly +tf/-dl and always
  positive) is corner-monotone like BM25 (score rises with tf, falls
  with dl — d/dtf ln(1+tf/(mu*p_c)) > 0, d/ddl ln(mu/(dl+mu)) < 0), so
  the stored (tf_max, tf_min, dl_min, dl_max) corner stats yield exact
  attainable block bounds: ub = qld(tf_max, dl_min), lb =
  qld(tf_min, dl_max), computed by the SAME NumPy function as the
  scorer (bit-identical at the corners — the _block_bounds soundness
  rule). A term whose lb can go negative (common term + long doc: the
  ln(mu/(dl+mu)) normalizer dominates) is undroppable under OR,
  exactly like negative-idf BM25 terms.
* **PL2 / DPH** are NOT corner-monotone (PL2's score is non-monotone
  in tfn; DPH's (1-f)^2/(tf+1) norm falls while the log term rises),
  so no sound corner bound exists without per-block score metadata.
  Their block upper bounds are +inf — blocks are never skipped, the
  ranking stays exact, and the win is the dataflow (no per-posting
  shuffle), which dominates at every scale measured.

Results are rank- and score-identical to ``scored_topk_dataframe``
(same per-posting float math via the shared NumPy twins, bincount
accumulation — gates qld/pl2/dph_topk_pruned replay the exhaustive
oracle SQL against this path).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.query.bm25 import (
    _accumulate_topk,
    _bm25_np,
    _bucket_exclusion,
    _bucket_inclusion,
    _decode_blocks_vectorized,
    _EMPTY_TOPK_FRAME,
    _flat_filters,
    _two_phase_topk,
)
from pisa_spark.query.scorers import (
    bm25plus_np,
    dph_np,
    inl2_np,
    pl2_np,
    qld_np,
    qljm_np,
)


def _score_fn(scorer: str, n_docs: float, avgdl: float, total_cf: float):
    """(tf, dl, df, cf) -> per-posting partial score, NumPy arrays.
    Routed through the same NumPy twins the tests pin against the
    column expressions, so the kernel and the relational path share
    float math per posting."""
    if scorer == "bm25":
        return lambda tf, dl, df, cf: _bm25_np(tf, dl, df, n_docs, avgdl)
    if scorer == "bm25plus":
        return lambda tf, dl, df, cf: bm25plus_np(tf, dl, df, n_docs, avgdl)
    if scorer == "inl2":
        return lambda tf, dl, df, cf: inl2_np(tf, dl, df, n_docs, avgdl)
    if scorer == "qld":
        return lambda tf, dl, df, cf: qld_np(
            tf, dl, np.full(tf.shape, cf, np.float64), total_cf
        )
    if scorer == "qljm":
        return lambda tf, dl, df, cf: qljm_np(
            tf, dl, np.full(tf.shape, cf, np.float64), total_cf
        )
    if scorer == "pl2":
        return lambda tf, dl, df, cf: pl2_np(
            tf, dl, np.full(tf.shape, cf, np.float64), n_docs, avgdl
        )
    if scorer == "dph":
        return lambda tf, dl, df, cf: dph_np(
            tf, dl, np.full(tf.shape, cf, np.float64), n_docs, avgdl
        )
    raise ValueError(f"unknown scorer: {scorer!r}")


# bm25plus: per-term monotone (+tf, -dl) with the sign carried by idf,
# exactly like bm25 — the direction-agnostic corner evaluation below
# is exact for any scorer monotone in each of (tf, dl) separately
_CORNER_MONOTONE = {"bm25", "bm25plus", "qld", "qljm", "inl2"}


def _scored_block_bounds(
    by_term: dict[str, pd.DataFrame],
    terms: list[str],
    score_fn,
    scorer: str,
    term_stats: dict[str, tuple[int, int]],
) -> tuple[dict[str, np.ndarray], dict[str, bool]]:
    """Per-block upper-bound arrays + per-term may-be-negative flags.

    Corner-monotone scorers (bm25/qld/qljm) bound from the stored (tf, dl)
    corners with the scorer's own function; BM25's direction flips
    with the idf sign (the _block_bounds rule), QLD's never does
    (always +tf/-dl). Non-monotone scorers get +inf bounds — sound,
    never skipped."""
    ub: dict[str, np.ndarray] = {}
    neg: dict[str, bool] = {}
    for t in terms:
        g = by_term[t]
        dfreq, cf = term_stats[t]
        if scorer not in _CORNER_MONOTONE:
            ub[t] = np.full(len(g), np.inf)
            neg[t] = True
            continue
        hi = score_fn(
            g["tf_max"].to_numpy(np.float64),
            g["dl_min"].to_numpy(np.float64),
            float(dfreq),
            float(cf),
        )
        lo = score_fn(
            g["tf_min"].to_numpy(np.float64),
            g["dl_max"].to_numpy(np.float64),
            float(dfreq),
            float(cf),
        )
        # a corner-monotone score's box max/min sit at one of the two
        # opposite corners; which one flips with BM25's idf sign (QLD
        # never flips), so the elementwise max/min is the sound,
        # direction-agnostic choice — and bit-identical to an attaining
        # posting's score (same function, same floats)
        ub[t] = np.maximum(hi, lo)
        lb = np.minimum(hi, lo)
        neg[t] = bool(lb.size and float(lb.min()) < 0.0)
    return ub, neg


def _keep_masks(
    present: list[str],
    conjunctive: bool,
    neg: dict[str, bool],
    ub: dict[str, np.ndarray],
    threshold: float,
) -> dict[str, np.ndarray] | None:
    """Block keep masks for one query, or None when the bucket provably
    can't reach ``threshold``. Structure and soundness contract are
    bm25._query_keep_masks with the negative-idf test generalized to a
    per-term may-be-negative flag: under OR a term whose contribution
    can be negative always decodes fully (skipping it would inflate
    other-match docs' scores); under AND skipping is sound because a
    pruned doc loses a REQUIRED term."""
    term_max = {t: float(ub[t].max()) for t in present}
    if conjunctive:
        others = {
            t: sum(term_max[u] for u in present if u != t) for t in present
        }
        best_bound = sum(term_max.values())
    else:
        pos = {t: max(term_max[t], 0.0) for t in present}
        pos_sum = sum(pos.values())
        others = {t: pos_sum - pos[t] for t in present}
        best_bound = max(term_max[t] + others[t] for t in present)
    eps = 1e-9 * max(1.0, abs(threshold)) if np.isfinite(threshold) else 0.0
    if best_bound < threshold - eps:
        return None
    masks: dict[str, np.ndarray] = {}
    for t in present:
        if not conjunctive and neg[t]:
            masks[t] = np.ones(len(ub[t]), bool)
            continue
        m = ub[t] + others[t] >= threshold - eps
        if conjunctive and not m.any():
            return None
        masks[t] = m
    return masks


def scored_kernel(
    queries: list[dict],
    scorer: str,
    n_docs: float,
    avgdl: float,
    total_cf: float,
    k: int,
    term_stats: dict[str, tuple[int, int]],
    thresholds: dict[int, float] | None = None,
):
    """Per-bucket scorer-generic top-k closure (mapInPandas).

    Per term, the UNION of the batch's kept blocks decodes ONCE; each
    query then accumulates the decoded arrays in full — extra blocks
    (kept for another query) only move a doc's score toward exact,
    always sound (the quantized_kernel sharing rule). Docs absent from
    every decoded block of a pruned term lose only contributions the
    masks proved couldn't lift them past the threshold."""
    thresholds = thresholds or {}
    fn = _score_fn(scorer, float(n_docs), float(avgdl), float(total_cf))

    def kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in pdf_iter if not pdf.empty]
        if not chunks:
            return
        all_blocks = pd.concat(chunks, ignore_index=True)
        out_frames = []
        for _, bucket_blocks in all_blocks.groupby("bucket", sort=False):
            by_term = dict(tuple(bucket_blocks.groupby("term", sort=False)))
            fx_cache: dict[str, np.ndarray] = {}
            needed = [
                t
                for t in dict.fromkeys(t for q in queries for t in q["terms"])
                if t in by_term
            ]
            ub, neg = _scored_block_bounds(
                by_term, needed, fn, scorer, term_stats
            )
            plans = []
            for q in queries:
                terms = list(dict.fromkeys(q["terms"]))
                present = [t for t in terms if t in by_term]
                if not present or (
                    q["conjunctive"] and len(present) < len(terms)
                ):
                    continue
                masks = _keep_masks(
                    present, q["conjunctive"], neg, ub,
                    thresholds.get(q["query_id"], -np.inf),
                )
                if masks is not None:
                    plans.append((q, terms, present, masks))
            if not plans:
                continue
            union: dict[str, np.ndarray] = {}
            for _, _, present, masks in plans:
                for t in present:
                    union[t] = (
                        masks[t] if t not in union else union[t] | masks[t]
                    )
            decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for t, um in union.items():
                if not um.any():
                    continue
                docs, tfs, dls = _decode_blocks_vectorized(by_term[t][um])
                dfreq, cf = term_stats[t]
                decoded[t] = (docs, fn(tfs, dls, float(dfreq), float(cf)))
            for q, terms, present, masks in plans:
                doc_parts, score_parts = [], []
                for t in present:
                    if t not in decoded:
                        continue
                    docs, scores = decoded[t]
                    doc_parts.append(docs)
                    score_parts.append(scores)
                docs, scores = _accumulate_topk(
                    doc_parts, score_parts, len(terms), q["conjunctive"], k,
                    exclude=_bucket_exclusion(
                        by_term, q.get("negated", []), fx_cache
                    ),
                    include=_bucket_inclusion(
                        by_term, q.get("filter", []), fx_cache
                    ),
                )
                if docs.size:
                    out_frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(
                                    docs.size, q["query_id"], np.int32
                                ),
                                "doc_id": docs,
                                "score": scores,
                            }
                        )
                    )
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)
        else:
            yield pd.DataFrame(_EMPTY_TOPK_FRAME)

    return kernel


def term_stats_from_blocks(
    postings: DataFrame, terms: list[str]
) -> dict[str, tuple[int, int]]:
    """{term: (df, cf)} for the queried terms off the stored index:
    df from block metadata (sum n — no decode), cf from ONE vectorized
    tf-decode pass over the term-pruned blocks, partial-aggregated so
    only |terms| rows reach the driver. This is the scorer-side
    analogue of engine._term_dfs; callers should cache per generation
    (cf, like df, cannot drift under an immutable snapshot)."""
    from pisa_spark.query.scorers import postings_to_tf

    pruned = postings.filter(F.col("term").isin(list(terms)))
    rows = (
        postings_to_tf(pruned)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("long").alias("cf"),
        )
        .collect()
    )
    out = {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}
    for t in terms:
        out.setdefault(t, (0, 0))
    return out


def scored_topk_pruned(
    postings: DataFrame,
    queries: list[dict],
    n_docs: float,
    avgdl: float,
    total_cf: float,
    scorer: str = "qld",
    k: int = 10,
    term_stats: dict[str, tuple[int, int]] | None = None,
    pre_arranged: bool = False,
    two_phase: bool = False,
    sample_buckets: int = 2,
) -> DataFrame:
    """Top-k under any registered scorer served off the compressed
    index through the bucket-local kernel: (query_id, rank, doc_id,
    score). queries: [{query_id, terms, conjunctive, negated?,
    filter?}] — '-term' exclusion (incl. the deletes layer's
    __deleted__ pseudo-term) and attribute-filter inclusion compose,
    applied bucket-locally before the top-k trim exactly as in the
    WAND kernel.

    Plan shape == bm25_topk_wand: term-pruned scan (PushedFilters) ->
    one bucket repartition (elided when pre_arranged) -> per-bucket
    vectorized kernel -> global top-k window over <=
    n_buckets*|queries|*k rows. two_phase bootstraps per-query
    thresholds from ``sample_buckets`` exactly like the BM25 driver —
    thresholds only prune where the scorer has sound block bounds
    (bm25/qld); pl2/dph run exhaustively with the same dataflow.
    Exclusion keeps pruning sound: dropping docs only lowers scores,
    and a skipped block's docs provably sat below the threshold
    already."""
    from pisa_spark.query.bm25 import _arrange_pruned

    all_terms = sorted(
        {t for q in queries for t in q["terms"]}
        | {t for q in queries for t in q.get("negated", [])}
        | {t for q in queries for t in _flat_filters(q)}
    )
    arranged, _ = _arrange_pruned(postings, all_terms, {}, pre_arranged)
    if term_stats is None:
        term_stats = term_stats_from_blocks(postings, all_terms)

    def factory(queries_, n_docs_, avgdl_, k_, _dfs, thresholds=None):
        return scored_kernel(
            queries_, scorer, n_docs_, avgdl_, float(total_cf), k_,
            term_stats, thresholds,
        )

    return _two_phase_topk(
        factory, arranged, queries, n_docs, avgdl, k,
        two_phase, sample_buckets, {},
    )
