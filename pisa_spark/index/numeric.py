"""Numeric range filtering as precision-step pseudo-terms.

The classic trie-encoded numeric scheme (Lucene's pre-BKD
NumericRangeQuery, precisionStep=4): a non-negative integer value v
indexes one pseudo-term per precision level,

    '<col>#<shift>:<v >> shift>'   for shift = 0, STEP, 2*STEP, ...

so an arbitrary inclusive range [lo, hi] decomposes into at most
2*(2^STEP - 1) terms per level (range_terms below) — O(log range)
dictionary lookups instead of one term per distinct value. The terms
live in the SAME posting blocks as text terms and attribute filters
(build.attribute_tokens_col), so a range filter is served as a
bucket-local UNION of the covering terms' doc ids, intersected with
the query's other filter groups — no doc-values store, no documents-
table join at query time.

Cost: MAX_BITS/STEP = 8 extra pseudo-terms per doc per indexed
numeric column at build; a range query touches <= 2*15*8 = 240 terms
worst-case (typically a handful). Values must be non-negative ints
below 2^MAX_BITS; NULLs index nothing and never match a range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STEP = 4          # bits per precision level (Lucene precisionStep)
MAX_BITS = 32     # value domain: [0, 2^32)


def numeric_tokens_col(col_name: str) -> Column:
    """array<string> of precision-step pseudo-terms for one numeric
    document column — pure codegen (shiftright + concat), appended to
    the token array AFTER doc_len like attribute pseudo-terms (never
    scored, never counted in avgdl). NULL values produce an empty
    array."""
    v = F.col(col_name).cast("long")
    terms = F.array(
        *[
            F.concat(
                F.lit(f"{col_name}#{shift}:"),
                F.shiftright(v, shift).cast("string"),
            )
            for shift in range(0, MAX_BITS, STEP)
        ]
    )
    return F.when(v.isNull() | (v < 0), F.array().cast("array<string>")).otherwise(
        terms
    )


def _cover(lo: int, hi: int, shift: int) -> list[tuple[int, int]]:
    """Minimal-ish (shift, cell) cover of the inclusive value range
    [lo, hi]: front/back partial runs emit at the current precision,
    the fully-aligned middle recurses one level coarser. Every emitted
    cell (shift, c) covers values [c << shift, ((c+1) << shift) - 1];
    cells are disjoint and their union is exactly [lo, hi]
    (fuzz-verified against brute force in tests/test_numeric_range.py)."""
    if lo > hi:
        return []
    if shift + STEP >= MAX_BITS:
        return [(shift, c) for c in range(lo >> shift, (hi >> shift) + 1)]
    parent = 1 << (shift + STEP)
    out: list[tuple[int, int]] = []
    if lo % parent != 0:
        end = min(hi, ((lo // parent) + 1) * parent - 1)
        out += [(shift, c) for c in range(lo >> shift, (end >> shift) + 1)]
        lo = end + 1
        if lo > hi:
            return out
    if (hi + 1) % parent != 0:
        start = max(lo, (hi // parent) * parent)
        out += [(shift, c) for c in range(start >> shift, (hi >> shift) + 1)]
        hi = start - 1
        if lo > hi:
            return out
    return out + _cover(lo, hi, shift + STEP)


def range_terms(col_name: str, lo: int, hi: int) -> list[str]:
    """The pseudo-terms whose posting unions cover exactly the docs
    with col value in [lo, hi] (inclusive). Bounds clamp to the
    non-negative MAX_BITS domain; an empty range yields []."""
    lo = max(int(lo), 0)
    hi = min(int(hi), (1 << MAX_BITS) - 1)
    return [
        f"{col_name}#{shift}:{cell}" for shift, cell in _cover(lo, hi, 0)
    ]
