"""Static index pruning (index/pruning.py).

The histogram-threshold + bounded-tie plan must select EXACTLY the
row_number()<=K set (imp DESC, doc_id ASC per term); survivors keep
bit-identical payloads/scores; keep >= df is the identity; the pruned
relation serves through the unchanged WAND path with original dfs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import build_postings
from pisa_spark.index.pruning import (
    impact_col,
    postings_rows,
    prune_postings,
)
from pisa_spark.query.bm25 import bm25_topk_wand

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(
        F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")
    ).collect()[0]
    n, avgdl, mx = int(row[0]), float(row[1]), int(row[2])
    postings = build_postings(
        toks, n, avgdl, n_buckets=8, max_doc_id=mx
    ).cache()
    return postings, n, avgdl


def _rows_pdf(postings):
    return postings_rows(postings).toPandas()


def test_selection_is_exactly_rownumber_rule(spark, built):
    postings, n, avgdl = built
    k = 7
    pruned = prune_postings(postings, k, avgdl)
    got = _rows_pdf(pruned)
    full = _rows_pdf(postings)
    imp = np.floor(
        255.0 * full.tf
        / (full.tf + (0.54 + 0.36 * full.doc_len / avgdl))
    ).astype(np.int64)
    dfs = full.groupby("term")["doc_id"].transform("size")
    sign = np.where(dfs < n / 2.0, 1, -1)
    full = full.assign(imp=imp * sign)
    keep = (
        full.sort_values(["term", "imp", "doc_id"],
                         ascending=[True, False, True])
        .groupby("term")
        .head(k)
    )
    a = {(r.term, r.doc_id, r.tf, r.doc_len) for r in got.itertuples()}
    b = {(r.term, r.doc_id, r.tf, r.doc_len) for r in keep.itertuples()}
    assert a == b
    # per-term cap respected with ties broken by doc_id ASC
    assert got.groupby("term").size().max() <= k


def test_keep_ge_df_is_identity(spark, built):
    postings, n, avgdl = built
    pruned = prune_postings(postings, 10**6, avgdl)
    a = _rows_pdf(pruned).sort_values(["term", "doc_id"]).reset_index(drop=True)
    b = _rows_pdf(postings).sort_values(["term", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)
    # and the re-encoded blocks are byte-identical to the originals
    pa = postings.orderBy("bucket", "term", "block_idx").collect()
    pb = pruned.orderBy("bucket", "term", "block_idx").collect()
    assert pa == pb


def test_pruned_serving_scores_survivors_exactly(spark, built):
    postings, n, avgdl = built
    full_dfs = {
        r["term"]: int(r["df"])
        for r in postings.groupBy("term").agg(F.sum("n").alias("df")).collect()
    }
    pruned = prune_postings(postings, 25, avgdl).cache()
    qs = [{"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
          {"query_id": 1, "terms": ["the"], "conjunctive": False}]
    full = bm25_topk_wand(
        postings, qs, n, avgdl, k=50, term_dfs=full_dfs
    ).toPandas()
    # original dfs passed: survivors score EXACTLY their unpruned value
    pr = bm25_topk_wand(
        pruned, qs, n, avgdl, k=10, term_dfs=full_dfs
    ).toPandas()
    full_scores = {
        (r.query_id, r.doc_id): round(r.score, 9) for r in full.itertuples()
    }
    for r in pr.itertuples():
        key = (r.query_id, r.doc_id)
        if key in full_scores:  # doc inside the full top-50 window
            assert round(r.score, 9) == full_scores[key]
    # pruning shrinks the payload
    def bytes_of(p):
        return p.agg(
            F.sum(F.octet_length("docs") + F.octet_length("tfs")
                  + F.octet_length("dls"))
        ).collect()[0][0]
    assert bytes_of(pruned) < bytes_of(postings)


def test_validation(built):
    postings, n, avgdl = built
    with pytest.raises(ValueError, match="keep_per_term"):
        prune_postings(postings, 0, avgdl)


def test_facade_search_pruned(spark, sf_dir, tmp_path):
    from pisa_spark.engine import SearchEngine

    eng = SearchEngine.build(
        spark, sf_dir, str(tmp_path / "idx"), n_buckets=8, wave_size=8
    )
    full = eng.search("the", k=10).toPandas()
    # a generous tier reproduces the full answer exactly
    pr = eng.search_pruned("the", k=10, keep_per_term=10**6).toPandas()
    assert pr.sort_values("rank").values.tolist() == (
        full.sort_values("rank").values.tolist()
    )
    # a tight tier returns survivors scored exactly as the full index
    tight = eng.search_pruned("the", k=5, keep_per_term=25).toPandas()
    full_by_doc = dict(zip(full.doc_id, full.score.round(9)))
    for r in tight.itertuples():
        if r.doc_id in full_by_doc:
            assert round(r.score, 9) == full_by_doc[r.doc_id]
    # guarded under deletes
    eng.delete_docs([1], persist=False)
    with pytest.raises(ValueError, match="tombstone"):
        eng.search_pruned("the")


def test_tiered_router_exact_cover(spark, sf_dir, tmp_path):
    """search_tiered: covered queries serve from the tier and equal
    search() exactly; head-term queries fall back; the routing rule is
    the df <= keep metadata decision."""
    from pisa_spark.engine import SearchEngine

    eng = SearchEngine.build(
        spark, sf_dir, str(tmp_path / "idx_t"), n_buckets=8, wave_size=8
    )
    dfs = eng._term_dfs({"dup", "the", "data"})
    assert dfs["dup"] < dfs["the"]  # rare vs head term in the fixture
    keep = dfs["dup"]  # tier exactly covers 'dup', not 'the'/'data'
    assert eng._tier_covers(["dup"], keep)
    assert not eng._tier_covers(["dup", "the"], keep)

    # covered: tier answer == full answer, identically
    got = eng.search_tiered("dup", k=10, keep_per_term=keep).toPandas()
    want = eng.search("dup", k=10).toPandas()
    assert got.sort_values("rank").values.tolist() == (
        want.sort_values("rank").values.tolist()
    )
    # covered incl. a negated rare term (negations must be covered too)
    got2 = eng.search_tiered("dup -dup", k=10, keep_per_term=keep)
    assert got2.count() == 0  # self-negation empties; routed, not wrong

    # fallback: head terms -> full index, still exact
    got3 = eng.search_tiered("the data", k=10, keep_per_term=keep).toPandas()
    want3 = eng.search("the data", k=10).toPandas()
    assert got3.sort_values("rank").values.tolist() == (
        want3.sort_values("rank").values.tolist()
    )

    # phrases always fall back (tier is non-positional) — and since
    # this engine has no positional index, both raise identically
    with pytest.raises(Exception):
        eng.search_tiered('"data join"', k=5, keep_per_term=keep)

    # guarded under deletes
    eng.delete_docs([1], persist=False)
    with pytest.raises(ValueError, match="tombstone"):
        eng.search_tiered("dup")
