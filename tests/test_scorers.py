"""Pluggable scorers (QLD / PL2 / DPH): Spark column expressions vs
the independent NumPy twins, index-decode round-trip, and scorer
sanity on hand-built corpora. The DuckDB gates (`qld_topk` etc.) cover
the same scorers at corpus scale."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.index.build import build_postings, term_frequencies
from pisa_spark.query.scorers import (
    SCORERS,
    bm25plus_np,
    dph_np,
    inl2_np,
    pl2_np,
    postings_to_tf,
    qld_np,
    qljm_np,
    scored_topk_dataframe,
    term_stats_full,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "data join data scan merge"),
        (1, "the the the the the the the the"),
        (2, "spark query scan window data"),
        (3, "solo"),  # one-term doc: tf == dl, the DPH pinned edge
        (4, "data data data join window query table scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks)
    stats = toks.agg(
        F.count(F.lit(1)), F.avg("doc_len"), F.sum("doc_len")
    ).collect()[0]
    return toks, tf, int(stats[0]), float(stats[1]), int(stats[2])


def _np_scores(tf_rows, stats_rows, scorer, n_docs, avgdl, total_cf):
    cf = {r["term"]: r["cf"] for r in stats_rows}
    dfreq = {r["term"]: r["df"] for r in stats_rows}
    out = {}
    for r in tf_rows:
        t, d = r["term"], r["doc_id"]
        args = (
            np.array([r["tf"]]),
            np.array([r["doc_len"]]),
            np.array([cf[t]]),
        )
        if scorer == "inl2":
            s = inl2_np(
                np.array([r["tf"]]), np.array([r["doc_len"]]),
                np.array([dfreq[t]]), n_docs, avgdl,
            )[0]
        elif scorer == "bm25plus":
            s = bm25plus_np(
                np.array([r["tf"]]), np.array([r["doc_len"]]),
                np.array([dfreq[t]]), n_docs, avgdl,
            )[0]
        elif scorer == "qld":
            s = qld_np(*args, total_cf)[0]
        elif scorer == "qljm":
            s = qljm_np(*args, total_cf)[0]
        elif scorer == "pl2":
            s = pl2_np(*args, n_docs, avgdl)[0]
        else:
            s = dph_np(*args, n_docs, avgdl)[0]
        out[(t, d)] = s
    return out


@pytest.mark.parametrize("scorer", ["bm25plus", "inl2", "qld", "qljm", "pl2", "dph"])
def test_expr_matches_numpy_twin(spark, corpus, scorer):
    toks, tf, n_docs, avgdl, total_cf = corpus
    stats = term_stats_full(tf)
    full = tf.join(stats, "term")
    from pisa_spark.query.scorers import scorer_expr

    got = {
        (r["term"], r["doc_id"]): r["s"]
        for r in full.withColumn(
            "s", scorer_expr(scorer, n_docs, avgdl, total_cf)
        ).collect()
    }
    want = _np_scores(
        full.collect(), stats.collect(), scorer, n_docs, avgdl, total_cf
    )
    assert set(got) == set(want)
    for key in got:
        assert got[key] == pytest.approx(want[key], rel=1e-12), (key, scorer)


def test_dph_one_term_doc_scores_zero(spark, corpus):
    toks, tf, n_docs, avgdl, total_cf = corpus
    qdf = spark.createDataFrame([(0, "solo")], "query_id int, term string")
    out = scored_topk_dataframe(
        tf, qdf, n_docs, avgdl, total_cf, scorer="dph"
    ).collect()
    assert len(out) == 1 and out[0]["score"] == 0.0
    assert math.isfinite(out[0]["score"])


@pytest.mark.parametrize("scorer", ["bm25plus", "inl2", "qld", "qljm", "pl2", "dph"])
def test_topk_ranks_match_numpy(spark, corpus, scorer):
    toks, tf, n_docs, avgdl, total_cf = corpus
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "scan"), (1, "the")], "query_id int, term string"
    )
    got = scored_topk_dataframe(
        tf, qdf, n_docs, avgdl, total_cf, scorer=scorer, k=10
    ).collect()
    stats = term_stats_full(tf)
    per = _np_scores(
        tf.join(stats, "term").collect(),
        stats.collect(),
        scorer,
        n_docs,
        avgdl,
        total_cf,
    )
    for qid, terms in [(0, ["data", "scan"]), (1, ["the"])]:
        docs = {}
        for (t, d), s in per.items():
            if t in terms:
                docs[d] = docs.get(d, 0.0) + s
        want = sorted(docs.items(), key=lambda x: (-x[1], x[0]))
        rows = sorted(
            [r for r in got if r["query_id"] == qid], key=lambda r: r["rank"]
        )
        assert [r["doc_id"] for r in rows] == [d for d, _ in want]
        for r, (_, s) in zip(rows, want):
            assert r["score"] == pytest.approx(s, rel=1e-12)


def test_conjunctive_filters_partial_matches(spark, corpus):
    toks, tf, n_docs, avgdl, total_cf = corpus
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "query")], "query_id int, term string"
    )
    out = scored_topk_dataframe(
        tf, qdf, n_docs, avgdl, total_cf, scorer="qld", conjunctive=True
    ).collect()
    # only docs 2 and 4 contain both 'data' and 'query'
    assert sorted(r["doc_id"] for r in out) == [2, 4]


def test_postings_to_tf_roundtrip(spark, corpus):
    toks, tf, n_docs, avgdl, total_cf = corpus
    postings = build_postings(toks, n_docs, avgdl, n_buckets=3, max_doc_id=4)
    decoded = postings_to_tf(postings)
    want = {
        (r["term"], r["doc_id"], r["tf"], r["doc_len"]) for r in tf.collect()
    }
    got = {
        (r["term"], r["doc_id"], r["tf"], r["doc_len"])
        for r in decoded.collect()
    }
    assert got == want


@pytest.mark.parametrize("scorer", SCORERS)
def test_index_served_equals_relation_served(spark, corpus, scorer):
    """Any scorer off the decoded index == the same scorer off the
    direct tf relation — the scorer/index separation contract."""
    toks, tf, n_docs, avgdl, total_cf = corpus
    postings = build_postings(toks, n_docs, avgdl, n_buckets=3, max_doc_id=4)
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "window"), (1, "the")], "query_id int, term string"
    )
    a = scored_topk_dataframe(
        tf, qdf, n_docs, avgdl, total_cf, scorer=scorer
    ).collect()
    b = scored_topk_dataframe(
        postings_to_tf(postings), qdf, n_docs, avgdl, total_cf, scorer=scorer
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in a]
    ) == sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in b]
    )
