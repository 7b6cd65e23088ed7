"""Doc-id reordering for index compression (PISA's ``reorder-docids``).

Real engines reassign document identifiers before the build so that
similar documents receive NEARBY ids — URL ordering and recursive graph
bisection (Dhulipala et al., KDD'16) are the standard strategies. The
payoff is purely physical: posting lists store doc-id DELTAS (the T9
delta+varint codec), and clustering similar docs shrinks the gaps
inside every term they share, so the same postings compress into fewer
bytes and block-max ranges tighten. BM25 semantics are untouched —
tf/doc_len/df/avgdl are all permutation-invariant — so serving over a
reordered index returns the SAME scores; only same-score ties resolve
in the new id order.

Re-expressed Spark-first: reordering IS dense-id assignment under a
locality sort key, so this module composes the existing two-phase
``global_positions`` (operators/ids.py — a range exchange plus a tiny
per-partition count job; never a single-task ``row_number`` funnel)
with the unchanged standard build. The (doc_id, new_id) mapping is a
corpus-sized relation — never collected, never broadcast; remapping and
the result-side map-back are plain equi-joins AQE can plan.

Strategies:

- ``reorder_by_key``: sort by explicit metadata columns — the
  URL-ordering analogue (for a Common-Crawl corpus: host-reversed url;
  for the testdata corpus: lang, source). Zero extra passes over text.
- ``reorder_by_simhash``: sort by the 64-bit SimHash of the token
  stream (dedup/dedup.py) — content-locality clustering, a one-pass
  bisection-flavoured stand-in: near-duplicate and shared-vocabulary
  docs land adjacent. Costs one narrow hash-agg chain over tokens.

Both keys append doc_id as the final tiebreak, so the total order (and
therefore the assigned ids) is unique and partition-count invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pisa_spark.operators.ids import global_positions

# catalog table (under the index root) holding the persisted
# (doc_id, new_id) mapping of a reorder_by= build — see
# lineage.build_index_resumable and SearchEngine.restore
REORDER_TABLE = "reorder_map"


def reorder_map(
    docs: DataFrame,
    order_cols: list[str],
    id_col: str = "doc_id",
    out_col: str = "new_id",
) -> DataFrame:
    """(doc_id, new_id) mapping: new_id = dense 0-based rank of the doc
    in the total order of ``order_cols`` (+ id_col tiebreak appended
    automatically unless already present, making the key unique)."""
    cols = list(order_cols)
    if id_col not in cols:
        cols.append(id_col)
    proj = docs.select(id_col, *[c for c in cols if c != id_col])
    keyed = global_positions(proj, cols, out_col)
    return keyed.select(id_col, out_col)


def reorder_by_key(
    docs: DataFrame, cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """URL-ordering analogue: locality = explicit metadata columns."""
    return reorder_map(docs, list(cols), id_col=id_col)


def reorder_by_dominant_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_keys: int = 2,
) -> DataFrame:
    """Content-locality ordering without metadata: sort docs by their
    ``n_keys`` most DISTINCTIVE terms (tf·idf argmax, ties to the
    lexicographically smaller term). Docs about the same thing share
    their dominant terms, so they receive nearby ids — the poor-man's
    recursive bisection: the first key partitions the corpus into
    vocabulary clusters, the second refines within each. (Two weaker
    keys were measured on a vocabulary-clustered corpus and rejected:
    numeric SimHash order — one flipped high bit separates Hamming
    neighbours, ratio ~1.0 — and MinHash-prefix grouping, ratio ~0.95
    because a short doc's min-hashed token rarely agrees across the
    cluster. Dominant-term order matches explicit metadata keys.)

    Cost: one (doc,term) tf hash-agg, one term df hash-agg, a
    broadcast-free df join back (term-keyed), a per-doc top-``n_keys``
    window, then the standard two-phase id assignment. All shuffles are
    key-hash or range exchanges — nothing quadratic, nothing driver-
    side. Docs with no tokens get NULL keys and sort together."""
    from pisa_spark.corpus import tokens_col
    from pyspark.sql import Window

    toks = docs.select(
        id_col, F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    scored = tf.join(dfreq, "term").select(
        id_col,
        "term",
        (
            F.col("tf")
            * F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + 0.5))
        ).alias("w"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    top = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_keys)
        .groupBy(id_col)
        .pivot("r", list(range(1, n_keys + 1)))
        .agg(F.first("term"))
    )
    keys = [f"__k{i}" for i in range(1, n_keys + 1)]
    top = top.select(
        id_col, *[F.col(str(i + 1)).alias(k) for i, k in enumerate(keys)]
    )
    keyed = docs.join(top, id_col, "left").select(docs["*"], *keys)
    return reorder_map(keyed, keys + [id_col], id_col=id_col)


def apply_reorder(
    df: DataFrame,
    mapping: DataFrame,
    id_col: str = "doc_id",
    new_col: str = "new_id",
) -> DataFrame:
    """Swap ``id_col`` for the reordered id (inner equi-join; docs
    absent from the mapping are dropped — the mapping is total over the
    corpus by construction)."""
    others = [c for c in df.columns if c != id_col]
    return (
        df.join(mapping, id_col)
        .select(F.col(new_col).alias(id_col), *others)
    )


def restore_ids(
    results: DataFrame,
    mapping: DataFrame,
    id_col: str = "doc_id",
    new_col: str = "new_id",
) -> DataFrame:
    """Map result rows (keyed by reordered ids) back to original ids.
    The k-row result side is tiny next to the corpus-sized mapping, so
    broadcast IT and let the mapping stream (no mapping-side shuffle)."""
    others = [c for c in results.columns if c != id_col]
    renamed = results.withColumnRenamed(id_col, new_col)
    return (
        mapping.join(F.broadcast(renamed), new_col)
        .select(id_col, *others)
    )


def payload_bytes(postings: DataFrame) -> dict:
    """Compressed payload accounting for reorder evidence: total bytes
    per payload column plus their sum (docs/tfs/dls [+poss]) — the
    number doc-id reordering exists to shrink is ``docs_bytes``."""
    pay = [c for c in ("docs", "tfs", "dls", "poss") if c in postings.columns]
    row = postings.agg(
        *[F.sum(F.octet_length(c)).alias(c) for c in pay]
    ).collect()[0]
    out = {f"{c}_bytes": int(row[c] or 0) for c in pay}
    out["total_bytes"] = sum(out.values())
    return out
