"""Inverted-index construction: tf -> postings -> compressed blocks.

Layout decision (drives everything at 10^12-doc scale)
------------------------------------------------------
The serving index is **document-range partitioned**: every doc belongs
to one of ``n_buckets`` contiguous doc-id ranges, and each bucket holds
the posting blocks of *all* terms for its range. Consequences:

* **Skew is handled structurally** (SURVEY T8): a stop-word's 10^11
  postings never land in one task's ``collect_list`` — they are split
  across buckets by doc range, and concatenating buckets in bucket
  order restores global doc-id order without re-sorting.
* **Block-max WAND runs per bucket** (SURVEY T16): WAND needs all of a
  query's terms co-located in doc order; doc-partitioning gives exactly
  that, and the global answer is a cheap top-k merge of per-bucket
  top-ks (SURVEY T17) — the textbook distributed-search layout.
* **Rows stay small**: one output row per 128-posting block, never one
  giant array cell per term, so no executor OOM on head terms.

Index tables (parquet directory standing in for Iceberg — the write/read
surface is confined to pisa_spark.sources.catalog so a real Iceberg
catalog is a drop-in):

    postings(bucket, term, block_idx, first_doc, max_doc, n,
             tf_max:int, tf_min:int, dl_min:int, dl_max:int,
             docs:binary, tfs:binary, dls:binary)
        partitioned by bucket  (partition pruning on doc ranges)
    corpus_stats(n_docs, avgdl, total_terms)  -- 1 row

Block metadata doubles as the skip structure: (first_doc, max_doc) per
128-posting block are the skip pointers (a traversal skips a block
whose doc range can't intersect), and the (tf, dl) corner stats are the
raw material for query-time block-max score bounds (see
bm25_tf_factor) — df- AND avgdl-independent, so blocks stay valid as
an incremental index grows. Per-posting doc_len rides inside the block (``dls``)
so scoring is self-contained — no 10^12-row doc_len side join at query
time; term document frequency is recoverable as sum(n) over a term's
blocks, so no df side table is needed either.

Reference semantics carried over: posting-list construction is the
Spark-native analog of the reference's per-user neighbor lists
(groupby collect, /root/reference/src/models/Dataloader.py:44-46);
dense deterministic ids mirror its max+1 dense id space
(/root/reference/src/helpers/Reader.py:62).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index import codec

BLOCK_SIZE = 128
BM25_K1 = 0.9
BM25_B = 0.4

POSTINGS_SCHEMA = (
    "bucket int, term string, block_idx int, first_doc long, max_doc long, "
    "n int, tf_max int, tf_min int, dl_min int, dl_max int, "
    "docs binary, tfs binary, dls binary"
)

# positional layout (with_positions=True): one extra payload column.
# ``poss`` concatenates each posting's within-doc token positions in
# doc order; per posting the first position is absolute and later ones
# are stored as diff-1 (strictly increasing); segment lengths are the
# (decoded) tfs, so no extra count column is needed.
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", poss binary"


def term_frequencies(tokens_df: DataFrame) -> DataFrame:
    """(doc_id, tokens, doc_len) -> (doc_id, term, tf, doc_len).

    posexplode + hash aggregate; Spark plans a partial (map-side) agg
    before the shuffle, so the shuffle carries (doc, term) partial
    counts, not raw tokens.
    """
    return (
        tokens_df.select(
            "doc_id", "doc_len", F.explode("tokens").alias("term")
        )
        .groupBy("doc_id", "term", "doc_len")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def term_frequencies_with_positions(tokens_df: DataFrame) -> DataFrame:
    """(doc_id, tokens, doc_len) -> (doc_id, term, tf, doc_len,
    positions:array<int> sorted) — the positional variant: posexplode
    keeps the 0-based token offset, sort_array makes the per-(doc,term)
    position list deterministic."""
    return (
        tokens_df.select(
            "doc_id", "doc_len", F.posexplode("tokens").alias("pos", "term")
        )
        .groupBy("doc_id", "term", "doc_len")
        .agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
                "positions"
            ),
        )
    )


def corpus_stats(tokens_df: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl, total_terms). Cheap global agg; broadcast
    to scorers as plain Python floats."""
    return tokens_df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_terms"),
    )


def term_document_frequency(tf_df: DataFrame) -> DataFrame:
    """(term, df) — document frequency per term."""
    return tf_df.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def bm25_idf(df: np.ndarray | float, n_docs: float):
    """ln((N - df + 0.5) / (df + 0.5)) — the classic (possibly negative)
    BM25 idf mandated by FIXTURES.md §3."""
    return np.log((n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf, dl, df, n_docs: float, avgdl: float):
    """Vectorized BM25 per-(term,doc) partial score, float64 throughout
    (rank-identity demands a fixed summation dtype)."""
    idf = bm25_idf(df, n_docs)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    return idf * (tf * (BM25_K1 + 1.0)) / denom


_OUT_COLS = [
    "bucket", "term", "block_idx", "first_doc", "max_doc", "n",
    "tf_max", "tf_min", "dl_min", "dl_max", "docs", "tfs", "dls",
]


def bm25_tf_factor(tf, dl, avgdl: float):
    """The df- and corpus-free factor of the BM25 partial score:
    (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl)), always > 0; monotone
    increasing in tf and decreasing in dl.

    Full score = idf(df) * factor. Blocks store the CORNER STATS
    (tf_max, tf_min, dl_min, dl_max) rather than any precomputed
    factor, because both global inputs of the score — df and avgdl —
    drift as an incremental index grows; bounds are derived query-time:
    upper factor bound = factor(tf_max, dl_min, avgdl_now) (attained
    exactly when one posting holds both corners, never below any
    actual factor by monotonicity), lower bound symmetric. So
    block_max_score = idf * fmax_bound if idf>0 else idf * fmin_bound
    stays an exact upper bound under ANY later corpus state."""
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


def _encode_positions(pos_lists: list) -> bytes:
    """Per-posting position arrays -> one varint byte string: each
    posting's first position absolute, later ones diff-1 (strictly
    increasing). Segment lengths = tfs, so decode needs no counts."""
    deltas = []
    for p in pos_lists:
        a = np.asarray(p, dtype=np.int64)
        d = a.copy()
        d[1:] = np.diff(a) - 1
        deltas.append(d)
    return codec.varint_encode(
        np.concatenate(deltas).astype(np.uint64) if deltas else
        np.empty(0, np.uint64)
    )


def _encode_one_group(
    out: dict[str, list],
    g: pd.DataFrame,
    block_size: int,
    with_positions: bool = False,
) -> None:
    bucket = int(g["bucket"].iloc[0])
    term = g["term"].iloc[0]
    g = g.sort_values("doc_id")
    doc_ids = g["doc_id"].to_numpy(np.int64)
    tfs = g["tf"].to_numpy(np.int64)
    dls = g["doc_len"].to_numpy(np.int64)
    for bi in range(0, len(doc_ids), block_size):
        sl = slice(bi, bi + block_size)
        d = doc_ids[sl]
        out["bucket"].append(bucket)
        out["term"].append(term)
        out["block_idx"].append(bi // block_size)
        out["first_doc"].append(int(d[0]))
        out["max_doc"].append(int(d[-1]))
        out["n"].append(int(d.size))
        # corner stats: exact ints, bounds derived query-time under the
        # CURRENT avgdl/df (see bm25_tf_factor doc)
        out["tf_max"].append(int(tfs[sl].max()))
        out["tf_min"].append(int(tfs[sl].min()))
        out["dl_min"].append(int(dls[sl].min()))
        out["dl_max"].append(int(dls[sl].max()))
        out["docs"].append(codec.delta_encode_docids(d))
        out["tfs"].append(codec.encode_payload(tfs[sl], minus_one=True))
        out["dls"].append(codec.encode_payload(dls[sl]))
        if with_positions:
            out["poss"].append(
                _encode_positions(list(g["positions"].iloc[sl]))
            )


def _encode_groups(
    pdf_iter: Iterator[pd.DataFrame],
    block_size: int,
    with_positions: bool = False,
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: rows (bucket, term, doc_id, tf, doc_len)
    sorted by (bucket, term, doc_id) within the partition -> one row per
    <=block_size posting block, payloads delta+varint compressed, with
    exact (tf, dl) corner stats for query-time WAND bounds.

    Arrow may split one (bucket, term) group across input batches, so
    the tail group of every batch is carried over and prepended to the
    next batch (partition-sorted input makes groups contiguous). Memory
    stays O(one group) = O(docs in one bucket), which the bucket span
    bounds by construction.
    """
    cols = _OUT_COLS + ["poss"] if with_positions else _OUT_COLS
    leftover: pd.DataFrame | None = None
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        if leftover is not None:
            pdf = pd.concat([leftover, pdf], ignore_index=True)
            leftover = None
        # hold back the final group — it may continue in the next batch
        last_b = pdf["bucket"].iloc[-1]
        last_t = pdf["term"].iloc[-1]
        tail_mask = (pdf["bucket"] == last_b) & (pdf["term"] == last_t)
        leftover = pdf[tail_mask]
        head = pdf[~tail_mask]
        if head.empty:
            continue
        out: dict[str, list] = {c: [] for c in cols}
        for _, g in head.groupby(["bucket", "term"], sort=False):
            _encode_one_group(out, g, block_size, with_positions)
        yield pd.DataFrame(out)
    if leftover is not None and not leftover.empty:
        out = {c: [] for c in cols}
        _encode_one_group(out, leftover, block_size, with_positions)
        yield pd.DataFrame(out)


def build_postings(
    tokens_df: DataFrame,
    n_docs: int,
    avgdl: float,
    n_buckets: int = 32,
    max_doc_id: int | None = None,
    block_size: int = BLOCK_SIZE,
    span: int | None = None,
    with_positions: bool = False,
) -> DataFrame:
    """tokens -> compressed posting-block DataFrame (see module doc).

    One shuffle on (bucket, term) does all the work: repartition so each
    task sees whole (bucket, term) groups, sort within partitions, then
    a mapInPandas encoder streams blocks out. Blocks are df-free (see
    bm25_tf_factor) so no df join touches the big relation — document
    frequency lives in the small term_stats side table.

    with_positions: additionally carry each posting's within-doc token
    positions (``poss`` payload column) — the positional index phrase
    queries need. Same single shuffle; the shuffle rows carry the
    per-(doc,term) position arrays instead of bare counts.
    """
    if max_doc_id is None:
        max_doc_id = n_docs
    if span is None:
        span = max(1, math.ceil((max_doc_id + 1) / n_buckets))
    if with_positions:
        tf = term_frequencies_with_positions(tokens_df)
    else:
        tf = term_frequencies(tokens_df)
    return _postings_from_tf(tf, span, block_size, with_positions)


def build_postings_from_tf(
    tf_df: DataFrame,
    n_docs: int,
    n_buckets: int = 32,
    max_doc_id: int | None = None,
    block_size: int = BLOCK_SIZE,
    span: int | None = None,
) -> DataFrame:
    """Compressed posting blocks straight from an already-materialized
    tf relation (doc_id, term, tf, doc_len) — the bridge a CIFF import
    (sources/ciff.py) or any external term-frequency table uses to
    become a serving index without re-tokenizing. Identical bucket
    assignment, shuffle shape, and encode kernel as build_postings."""
    if max_doc_id is None:
        max_doc_id = n_docs
    if span is None:
        span = max(1, math.ceil((max_doc_id + 1) / n_buckets))
    return _postings_from_tf(
        tf_df.select("doc_id", "term", "tf", "doc_len"),
        span,
        block_size,
        with_positions=False,
    )


def _postings_from_tf(
    tf: DataFrame, span: int, block_size: int, with_positions: bool
) -> DataFrame:
    schema = POSTINGS_POS_SCHEMA if with_positions else POSTINGS_SCHEMA
    tf_b = tf.withColumn("bucket", (F.col("doc_id") / F.lit(span)).cast("int"))
    # explicit partition count: the encode stage is the Python-side hot
    # path — AQE must not coalesce it below the core count (it would,
    # for small shuffle volumes, and serialize the Arrow kernels)
    spark = tf.sparkSession
    n_part = max(2 * spark.sparkContext.defaultParallelism, 8)
    arranged = tf_b.repartition(n_part, "bucket", "term").sortWithinPartitions(
        "bucket", "term", "doc_id"
    )
    bs = int(block_size)
    wp = bool(with_positions)
    return arranged.mapInPandas(
        lambda it: _encode_groups(it, bs, wp), schema=schema
    )


def attribute_tokens_col(attribute_cols: list[str]) -> F.Column:
    """array<string> of attribute pseudo-terms for filtered search:
    column 'lang' with value 'en' -> 'lang:en'. The ':' separator can
    never collide with real terms (the tokenizer strips non-alnum), so
    attributes live in the SAME posting-block relation as text terms —
    the classic filter-as-postings design (Lucene filter terms): a
    metadata predicate becomes a bucket-local doc-id intersection at
    query time, no side join against a 10^12-row documents table.
    Null attribute values index as '<col>:null'."""
    return F.array(
        *[
            F.concat(
                F.lit(c + ":"),
                F.coalesce(F.lower(F.col(c).cast("string")), F.lit("null")),
            )
            for c in attribute_cols
        ]
    )


def build_index_dataframes(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 32,
    block_size: int = BLOCK_SIZE,
    with_positions: bool = False,
    attribute_cols: list[str] | None = None,
    numeric_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """documents.parquet -> (postings, term_stats, corpus_stats, stats_dict).

    attribute_cols: document metadata columns to index as filter
    pseudo-terms ('lang:en'); numeric_cols: non-negative integer
    columns to index as precision-step range pseudo-terms
    (index/numeric.py — serves BETWEEN filters). doc_len / avgdl /
    total_terms count REAL tokens only, so BM25 scores are identical
    with or without indexed attributes — pseudo-terms are matched
    (filtered on), never scored.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = ["doc_id"] + list(attribute_cols or []) + list(numeric_cols or [])
    toks = docs.select(
        *sel, tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    if attribute_cols or numeric_cols:
        # appended AFTER doc_len so scoring stats ignore pseudo-terms
        from pisa_spark.index.numeric import numeric_tokens_col

        extra = (
            [attribute_tokens_col(list(attribute_cols))]
            if attribute_cols
            else []
        ) + [numeric_tokens_col(c) for c in (numeric_cols or [])]
        toks = toks.withColumn(
            "tokens", F.concat("tokens", *extra)
        ).select("doc_id", "tokens", "doc_len")
    toks = toks.cache()
    # one pass collects every global stat the build needs
    stats_row = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_terms"),
        F.max("doc_id").alias("max_doc"),
    ).collect()[0]
    stats = {
        "n_docs": stats_row["n_docs"],
        "avgdl": float(stats_row["avgdl"]),
        "total_terms": stats_row["total_terms"],
    }
    postings = build_postings(
        toks, stats["n_docs"], stats["avgdl"], n_buckets=n_buckets,
        max_doc_id=stats_row["max_doc"], block_size=block_size,
        with_positions=with_positions,
    )
    tstats = term_document_frequency(term_frequencies(toks))
    return postings, tstats, corpus_stats(toks), stats
