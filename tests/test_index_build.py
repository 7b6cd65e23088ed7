"""Index construction invariants: block alignment, df correctness,
decode round-trip, and invariance under bucket count / parallelism
(SURVEY §5.2 items 1 and 5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index import codec
from pisa_spark.index.build import (
    BLOCK_SIZE,
    build_index_dataframes,
    build_postings,
)
from tests.oracle import Bm25Oracle


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    postings, tstats, cstats, stats = build_index_dataframes(spark, sf_dir, n_buckets=8)
    return postings.cache(), stats


def decode_index(rows):
    """rows -> {term: sorted [(doc_id, tf, dl)]} concatenating buckets/blocks."""
    out = {}
    for r in sorted(rows, key=lambda r: (r["term"], r["bucket"], r["block_idx"])):
        docs = codec.delta_decode_docids(r["docs"])
        tfs = codec.decode_payload(r["tfs"], minus_one=True)
        dls = codec.decode_payload(r["dls"])
        out.setdefault(r["term"], []).extend(zip(docs.tolist(), tfs.tolist(), dls.tolist()))
    return {t: sorted(v) for t, v in out.items()}


def test_blocks_well_formed(built):
    postings, _ = built
    for r in postings.collect():
        docs = codec.delta_decode_docids(r["docs"])
        assert r["n"] == docs.size <= BLOCK_SIZE
        assert r["first_doc"] == docs[0] and r["max_doc"] == docs[-1]
        assert (np.diff(docs) > 0).all()
        assert codec.decode_payload(r["tfs"], minus_one=True).size == r["n"]
        assert codec.decode_payload(r["dls"]).size == r["n"]


def test_postings_match_term_frequencies(spark, sf_dir, built):
    postings, _ = built
    idx = decode_index(postings.collect())
    oracle = Bm25Oracle(sf_dir)
    import collections

    expect = {}
    for d, ts in oracle.tok.items():
        c = collections.Counter(ts)
        for t, tf in c.items():
            expect.setdefault(t, []).append((d, tf, len(ts)))
    expect = {t: sorted(v) for t, v in expect.items()}
    assert idx == expect


def test_blockmeta_df_is_document_frequency(spark, sf_dir, built):
    """df is derivable from block metadata: sum(n) per term == oracle df."""
    postings, _ = built
    rows = postings.groupBy("term").agg(F.sum("n").alias("df")).collect()
    oracle = Bm25Oracle(sf_dir)
    assert {r["term"]: r["df"] for r in rows} == dict(oracle.df)


def test_corner_stats_bound_factors_under_any_avgdl(built):
    from pisa_spark.index.build import bm25_tf_factor

    postings, stats = built
    rows = postings.collect()
    # bounds must hold under the build avgdl AND under drifted values
    # (the incremental-growth scenario the corner-stat design exists for)
    for avgdl in (stats["avgdl"], stats["avgdl"] * 0.5, stats["avgdl"] * 3.0):
        for r in rows:
            tfs = codec.decode_payload(r["tfs"], minus_one=True)
            dls = codec.decode_payload(r["dls"])
            assert r["tf_max"] == tfs.max() and r["tf_min"] == tfs.min()
            assert r["dl_min"] == dls.min() and r["dl_max"] == dls.max()
            factors = bm25_tf_factor(
                tfs.astype(np.float64), dls.astype(np.float64), avgdl
            )
            fmax = bm25_tf_factor(float(r["tf_max"]), float(r["dl_min"]), avgdl)
            fmin = bm25_tf_factor(float(r["tf_min"]), float(r["dl_max"]), avgdl)
            assert fmax >= factors.max() and fmin <= factors.min()
            assert fmin > 0


def test_invariance_under_buckets_and_parallelism(spark, sf_dir, built):
    """Same logical index regardless of n_buckets or shuffle partitions
    (the reference's determinism discipline, utils.py:82-87, made
    structural)."""
    postings8, _ = built
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("tokens")).withColumn(
        "doc_len", F.size("tokens")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("a")
    ).collect()[0]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        postings3 = build_postings(
            toks.repartition(3), int(stats["n"]), float(stats["a"]), n_buckets=3
        )
        assert decode_index(postings3.collect()) == decode_index(postings8.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_empty_and_single_token_docs(spark):
    """Edge docs: empty text, single token, all one repeated token."""
    from pisa_spark.index.build import build_postings
    from pisa_spark.query.bm25 import bm25_topk_wand
    from pisa_spark.corpus import tokens_col

    docs = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "rep rep rep rep"), (3, "solo rep")],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")).collect()[0]
    postings = build_postings(toks, int(row[0]), float(row[1]), n_buckets=2,
                              max_doc_id=int(row[2]))
    idx = decode_index(postings.collect())
    assert idx == {
        "solo": [(1, 1, 1), (3, 1, 2)],
        "rep": [(2, 4, 4), (3, 1, 2)],
    }
    got = bm25_topk_wand(
        postings,
        [{"query_id": 0, "terms": ["rep"], "conjunctive": False}],
        int(row[0]), float(row[1]), k=10,
    ).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [2, 3]


def test_head_term_skew_bounded_per_task(spark):
    """T8 skew evidence: a stop-word occurring in EVERY doc never
    concentrates in one (bucket, term) group — doc-range bucketing
    splits its postings structurally, so the largest group (= the unit
    one task's collect must hold) is bounded by the bucket span, not
    the term's document frequency."""
    from pyspark.sql import functions as F

    from pisa_spark.index.build import build_postings

    n_docs = 4000
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("everywhere filler"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    from pisa_spark.corpus import tokens_col

    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    n_buckets = 16
    blocks = build_postings(
        toks, n_docs, 2.0, n_buckets=n_buckets, max_doc_id=n_docs - 1
    ).toPandas()
    head = blocks[blocks["term"] == "everywhere"]
    per_bucket = head.groupby("bucket")["n"].sum()
    # the head term (df == n_docs) is split across ALL buckets...
    assert len(per_bucket) == n_buckets
    # ...and no bucket holds more than the bucket span
    assert per_bucket.max() <= -(-n_docs // n_buckets)
    # global df is still exactly recoverable from block metadata
    assert head["n"].sum() == n_docs
