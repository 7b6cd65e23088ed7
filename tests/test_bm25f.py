"""BM25F fielded ranking: hand-computed pseudo-tf on a tiny corpus,
title-boost ordering, and the single-saturation property."""

import math

from pyspark.sql import functions as F

from pisa_spark.query.bm25f import (
    avg_field_lengths,
    bm25f_topk,
    fielded_tf,
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_fielded_tf_split_and_lengths(spark):
    rows = [(0, [f"w{i}" for i in range(12)]), (1, ["a", "b", "a"])]
    out = fielded_tf(_toks(spark, rows), title_len=8).collect()
    by = {(r["doc_id"], r["field"], r["term"]): r for r in out}
    # doc 0: 8 title tokens, 4 body tokens
    assert by[(0, "title", "w0")]["field_len"] == 8
    assert by[(0, "body", "w8")]["field_len"] == 4
    assert (0, "body", "w0") not in by
    # doc 1 fits entirely in the title; body empty -> no body rows
    assert by[(1, "title", "a")]["tf"] == 2
    assert not any(k[0] == 1 and k[1] == "body" for k in by)


def test_avg_field_lengths_counts_empty_bodies(spark):
    rows = [(0, [f"w{i}" for i in range(12)]), (1, ["a", "b"])]
    afl = avg_field_lengths(_toks(spark, rows), title_len=8)
    assert afl == {"title": (8 + 2) / 2, "body": (4 + 0) / 2}


def test_title_match_outranks_body_match(spark):
    # same term, same tf, same total length: title hit must score higher
    # filler docs keep df < n_docs/2 so idf stays positive
    rows = [
        (0, ["hit"] + [f"f{i}" for i in range(9)]),          # hit in title
        (1, [f"g{i}" for i in range(9)] + ["hit"]),          # hit in body
        (2, [f"h{i}" for i in range(10)]),
        (3, [f"k{i}" for i in range(10)]),
        (4, [f"m{i}" for i in range(10)]),
    ]
    toks = _toks(spark, rows)
    q = spark.createDataFrame([(0, "hit")], "query_id int, term string")
    out = bm25f_topk(
        fielded_tf(toks), q, 5, avg_field_lengths(toks), k=10
    ).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == [0, 1]


def test_pseudo_tf_hand_computed(spark):
    # doc 0: 'x' once in title (len 2), once in body (len 3)
    rows = [(0, ["x", "t", "x", "b", "c"])]
    toks = _toks(spark, rows)  # title_len=2 below
    ftf = fielded_tf(toks, title_len=2)
    afl = avg_field_lengths(toks, title_len=2)  # title 2, body 3
    q = spark.createDataFrame([(0, "x")], "query_id int, term string")
    out = bm25f_topk(ftf, q, 1, afl, k=1).collect()
    # B_title = 1-0.5+0.5*2/2 = 1; B_body = 1-0.4+0.4*3/3 = 1
    # ptf = 2*1/1 + 1*1/1 = 3; idf = ln((1-1+0.5)/(1+0.5)) = ln(1/3)
    want = math.log(0.5 / 1.5) * 3.0 / (0.9 + 3.0)
    assert abs(out[0]["score"] - want) < 1e-9


def test_single_saturation_not_per_field_sum(spark):
    # matching in BOTH fields must score LESS than the sum of two
    # independent per-field BM25 scores would (saturation applies once
    # to the combined pseudo-tf) — guards against the naive rendering
    rows = [
        (0, ["x", "pad", "x", "pad2", "pad3"]),
        (1, ["x", "pad", "q", "pad2", "pad3"]),
        (2, ["a", "b", "c", "d", "e"]),
        (3, ["f", "g", "h", "i", "j"]),
        (4, ["k", "l", "m", "n", "o"]),
    ]
    toks = _toks(spark, rows)
    ftf = fielded_tf(toks, title_len=2)
    afl = avg_field_lengths(toks, title_len=2)
    q = spark.createDataFrame([(0, "x")], "query_id int, term string")
    rows_out = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(ftf, q, 5, afl, k=10).collect()
    }
    # doc 0 (title+body hit) beats doc 1 (title only), but by less
    # than 2x even though its raw field contribution is ~2x
    assert rows_out[0] > rows_out[1]
    assert rows_out[0] < 2 * rows_out[1]


def test_indexed_bm25f_matches_relation_path(spark, sf_dir):
    """Per-field compressed indexes + pruned decode == the relation
    path, rank for rank and score for score (codec round-trip under
    fielded serving)."""
    from pisa_spark.corpus import tokens_col
    from pisa_spark.query.bm25f import build_fielded_indexes, bm25f_topk_indexed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("tokens"))
    q = spark.createDataFrame(
        [(0, "data"), (0, "join"), (1, "the")], "query_id int, term string"
    )
    n_docs = toks.count()
    afl = avg_field_lengths(toks)
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in bm25f_topk(fielded_tf(toks), q, n_docs, afl, k=10).collect()
    )
    built = build_fielded_indexes(toks, n_buckets=8)
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in bm25f_topk_indexed(
            built, q, k=10, terms=["data", "join", "the"]
        ).collect()
    )
    assert got == want


def test_unlisted_field_raises_not_silently_skipped(spark):
    """A field value absent from field_params must ERROR at execution
    — the when-chain must not yield NULL that F.sum silently drops
    (a custom relation with an unlisted field would otherwise
    contribute nothing to pseudo-tf)."""
    import pytest

    rows = [(0, ["x", "t", "x", "b", "c"])]
    toks = _toks(spark, rows)
    ftf = fielded_tf(toks, title_len=2).withColumn(
        "field", F.lit("anchor")  # not in default FIELD_PARAMS
    )
    afl = avg_field_lengths(toks, title_len=2)
    afl["anchor"] = 1.0  # length known, weight/b NOT configured
    q = spark.createDataFrame([(0, "x")], "query_id int, term string")
    with pytest.raises(Exception, match="field_params"):
        bm25f_topk(ftf, q, 1, afl, k=1).collect()
