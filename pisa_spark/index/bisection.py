"""Recursive graph bisection doc-id reordering (PISA's ``recursive_graph_bisection``).

The real algorithm behind PISA's reorder-docids --bp (Dhulipala et al.,
KDD'16 "Compressing graphs and indexes via recursive graph bisection"),
complementing the one-pass locality keys in index/reorder.py. Documents
are vertices of the bipartite doc-term graph; the order is refined by
recursively splitting a doc range into halves and iteratively swapping
docs between the halves to minimize the delta-encoding cost model

    B(n, d) = d * log2(n / (d + 1))

summed over every term's degree d in each half of size n — the standard
proxy for the bits a d-entry posting list costs inside an n-doc id
range. The move gain of a doc is the exact cost delta of flipping it,
summed over its terms; each iteration sorts both halves by gain and
swaps the top pairs while the pair's combined gain is positive (both
sequences are sorted descending, so the swap benefit is monotone and
the cut index is a single count).

Spark-first decomposition — BP at 10^12 docs cannot hold the corpus in
one task, and production deployments don't try: they run BP per shard
over a cheap global pre-order (URL sort). Mirrored here:

1. **Provisional order** (distributed): the existing two-phase
   ``global_positions`` under a presort key — explicit metadata columns
   (URL-ordering analogue), 'dominant_terms' (content clustering — buys
   CROSS-range locality for one extra tf pass), or plain doc_id order
   (zero extra passes; BP then only clusters within ranges).
2. **Range chunking**: contiguous ``max_range``-doc ranges
   (range_id = pos // max_range). Ranges are independent — the memory
   unit of one BP task, embarrassingly parallel across executors.
3. **Per-range BP** (``applyInPandas``): the full recursive
   swap-refinement above, vectorized NumPy over a local CSR —
   per-iteration degrees are two bincounts over the node's postings,
   gains one gather + one weighted bincount; no Python per-posting
   loops. Terms with global df < 2 are dropped first (a singleton
   posting list has no gaps to shrink), cutting the BP payload without
   touching the cost model.
4. **Id assembly**: new_id = range_id * max_range + local BP rank
   (ranges are dense and contiguous by construction, so offsets are
   closed-form — no extra pass).

Determinism (the crash/rerun idempotence bar of the resumable build):
no RNG anywhere — halves initialize as first/second half of the
incoming order, sorts are stable with position tiebreaks, iteration
count is fixed with a deterministic early-stop (zero swaps). The
mapping is a pure function of (corpus, parameters), invariant to
partition count (asserted in tests/test_bisection.py).

Serving semantics are unchanged: BM25 inputs are permutation-invariant,
so a BP-reordered index returns identical scores; only same-score ties
resolve in new-id order (same contract as reorder_by_key, and the same
``restore()`` boundary maps results back to original ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pisa_spark.index.reorder import reorder_map

# ---------------------------------------------------------------------------
# in-range kernel (pure NumPy — unit-testable without Spark)
# ---------------------------------------------------------------------------


def _half_cost(deg: np.ndarray, n: int) -> np.ndarray:
    """B(n, d) = d * log2(n / (d+1)) per term (vectorized)."""
    return deg * np.log2(n / (deg + 1.0))


def bp_order(
    indptr: np.ndarray,
    indices: np.ndarray,
    iters: int = 8,
    leaf: int = 16,
    max_depth: int | None = None,
) -> np.ndarray:
    """Recursive-bisection permutation of docs 0..n-1 (CSR doc->term,
    local term ids 0..T-1). Returns ``order`` such that ``order[r]`` is
    the doc placed at rank r. Deterministic: stable sorts, position
    tiebreaks, no RNG.
    """
    n = int(len(indptr)) - 1
    order = np.arange(n, dtype=np.int64)
    if n <= 1:
        return order
    n_terms = int(indices.max()) + 1 if len(indices) else 0
    doc_len = np.diff(indptr).astype(np.int64)
    # per-doc content signature (order-free term-set hash, float is
    # fine — it's only a tie-break): docs sharing vocabulary get close
    # signatures, which the swap pairing below exploits
    mixed = (
        (indices.astype(np.uint64) + np.uint64(1))
        * np.uint64(0x9E3779B97F4A7C15)
    ).astype(np.float64)
    sig = np.bincount(
        np.repeat(np.arange(n, dtype=np.int64), doc_len),
        weights=mixed,
        minlength=n,
    )
    # explicit stack instead of recursion: (lo, hi, depth)
    stack = [(0, n, 0)]
    while stack:
        lo, hi, depth = stack.pop()
        m = hi - lo
        if m <= leaf or (max_depth is not None and depth >= max_depth):
            continue
        mid = lo + m // 2
        n1, n2 = mid - lo, hi - mid
        sel = order[lo:hi]
        # node-local postings: doc_of[p] in 0..m-1 (position in sel)
        lens = doc_len[sel]
        doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
        total = int(lens.sum())
        if total:
            # vectorized multi-slice gather: posting p of local doc d
            # reads indices[starts[d] + (p - first_p_of_d)]
            starts = indptr[sel]
            cum = np.concatenate(([0], np.cumsum(lens)))
            idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(cum[:-1], lens)
                + np.repeat(starts, lens)
            )
            term_of = indices[idx]
        else:
            term_of = np.empty(0, dtype=np.int64)
        # half[i]: side of local doc i; first half -> 0, second -> 1
        half = np.zeros(m, dtype=np.int8)
        half[n1:] = 1
        for _ in range(iters):
            side_of = half[doc_of]
            deg0 = np.bincount(
                term_of[side_of == 0], minlength=n_terms
            ).astype(np.float64)
            deg1 = np.bincount(
                term_of[side_of == 1], minlength=n_terms
            ).astype(np.float64)
            base = _half_cost(deg0, n1) + _half_cost(deg1, n2)
            # gain per term of moving one containing doc 0->1 / 1->0;
            # deg-1 clamps never feed a real gain (a side-0 doc's term
            # has deg0 >= 1), they only keep the vector math finite
            g0 = base - (
                _half_cost(np.maximum(deg0 - 1.0, 0.0), n1)
                + _half_cost(deg1 + 1.0, n2)
            )
            g1 = base - (
                _half_cost(deg0 + 1.0, n1)
                + _half_cost(np.maximum(deg1 - 1.0, 0.0), n2)
            )
            per_post = np.where(side_of == 0, g0[term_of], g1[term_of])
            gains = np.bincount(doc_of, weights=per_post, minlength=m)
            left = np.flatnonzero(half == 0)
            right = np.flatnonzero(half == 1)
            # desc-by-gain; gain TIES break on a content signature with
            # OPPOSITE orientation on the two sides (then position, for
            # strict determinism). A perfectly symmetric state — equal
            # gains everywhere, e.g. two interleaved vocabulary cliques
            # split 50/50 — would otherwise pair same-clique docs and
            # oscillate forever: the opposed content keys align
            # cross-clique pairs instead, so swaps actually move
            # vocabulary between the halves (lexsort keys: last is
            # primary)
            lsort = left[np.lexsort((left, sig[left], -gains[left]))]
            rsort = right[np.lexsort((right, -sig[right], -gains[right]))]
            k = min(len(lsort), len(rsort))
            if k == 0:
                break
            pair_gain = gains[lsort[:k]] + gains[rsort[:k]]
            nswap = int(np.sum(pair_gain > 1e-12))
            if nswap == 0:
                break
            # never exchange EVERY pair: when both halves hold the same
            # vocabulary mix a full exchange preserves the composition
            # exactly (a no-op that burns the iteration budget); capping
            # at k-1 makes the worst symmetric case strictly asymmetric
            # after one pass, and only ever drops the least-gain pair
            nswap = min(nswap, k - 1) if k > 1 else nswap
            half[lsort[:nswap]] = 1
            half[rsort[:nswap]] = 0
        # rebuild the node's order: side-0 docs first, each side in its
        # previous relative order (stable partition)
        new_local = np.concatenate(
            [np.flatnonzero(half == 0), np.flatnonzero(half == 1)]
        )
        order[lo:hi] = sel[new_local]
        stack.append((lo, mid, depth + 1))
        stack.append((mid, hi, depth + 1))
    return order


def _bp_pandas(pdf: pd.DataFrame, iters: int, leaf: int, max_range: int) -> pd.DataFrame:
    """One range's BP: rows (doc_id, pos, range_id, terms) ->
    (doc_id, new_id)."""
    pdf = pdf.sort_values("pos", kind="mergesort").reset_index(drop=True)
    term_lists = [
        np.asarray(t, dtype=np.int64) if t is not None and len(t) else
        np.empty(0, dtype=np.int64)
        for t in pdf["terms"]
    ]
    lens = np.array([len(t) for t in term_lists], dtype=np.int64)
    flat = (
        np.concatenate(term_lists) if lens.sum() else np.empty(0, dtype=np.int64)
    )
    # local term encoding (hashed ids -> dense 0..T-1)
    if len(flat):
        _, flat = np.unique(flat, return_inverse=True)
        flat = flat.astype(np.int64)
    indptr = np.zeros(len(pdf) + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    order = bp_order(indptr, flat, iters=iters, leaf=leaf)
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    base = int(pdf["range_id"].iloc[0]) * max_range
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "new_id": base + rank,
        }
    )


# ---------------------------------------------------------------------------
# distributed driver
# ---------------------------------------------------------------------------

_MAP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("new_id", LongType()),
    ]
)


def reorder_by_bisection(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    presort: list[str] | str | None = None,
    max_range: int = 1 << 16,
    iters: int = 8,
    leaf: int = 16,
) -> DataFrame:
    """(doc_id, new_id) mapping via per-range recursive graph bisection
    over a provisional presort (see module doc). ``presort``: None (id
    order), 'dominant_terms', or explicit metadata columns."""
    from pisa_spark.corpus import tokens_col

    if presort == "dominant_terms":
        from pisa_spark.index.reorder import reorder_by_dominant_terms

        pos = reorder_by_dominant_terms(docs, text_col=text_col, id_col=id_col)
        pos = pos.withColumnRenamed("new_id", "pos")
    elif presort:
        pos = reorder_map(docs, list(presort), id_col=id_col, out_col="pos")
    else:
        pos = reorder_map(docs, [id_col], id_col=id_col, out_col="pos")

    toks = docs.select(
        id_col, F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term")
    )
    multi = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 2)
        .select("term")
    )
    terms_by_doc = (
        toks.join(multi, "term", "left_semi")
        .select(id_col, F.xxhash64("term").alias("tid"))
        .groupBy(id_col)
        .agg(F.collect_list("tid").alias("terms"))
    )
    rel = (
        pos.join(terms_by_doc, id_col, "left")
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col("pos"),
            (F.col("pos") / F.lit(max_range)).cast("long").alias("range_id"),
            F.coalesce(F.col("terms"), F.array().cast("array<long>")).alias(
                "terms"
            ),
        )
    )
    mapping = rel.groupBy("range_id").applyInPandas(
        lambda pdf: _bp_pandas(pdf, iters=iters, leaf=leaf, max_range=max_range),
        schema=_MAP_SCHEMA,
    )
    if id_col != "doc_id":
        mapping = mapping.withColumnRenamed("doc_id", id_col)
    return mapping
