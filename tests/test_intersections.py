"""Posting-list intersection statistics (query/intersections.py) —
PISA's offline ``compute_intersection`` tool.

Contracts: singleton rows carry each query term's posting count and
max single-term BM25 score; pair rows carry the exact intersection
cardinality and the exact max of the SUMMED partial scores over the
intersection (a tight upper bound for conjunctive processing); empty
intersections and absent terms emit no row (sparse output, like the
tool); max_arity=1 drops pairs; arity outside {1,2} is refused.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import build_postings
from pisa_spark.index.pruning import postings_rows
from pisa_spark.query.intersections import term_intersections

SF = "/root/testdata/sf0.001"

QUERIES = [
    {"query_id": 0, "terms": ["data", "join"]},
    {"query_id": 1, "terms": ["dup", "query", "the"]},
    {"query_id": 2, "terms": ["spark", "zzzzzz"]},
]


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


@pytest.fixture(scope="module")
def naive(built):
    postings, n, avgdl = built
    full = postings_rows(postings).toPandas()
    df = full.groupby("term")["doc_id"].transform("size")
    idf = np.log((n - df + 0.5) / (df + 0.5))
    tf = full.tf.to_numpy(float)
    score = idf * (tf * 1.9) / (tf + 0.9 * (0.6 + 0.4 * full.doc_len / avgdl))
    return full.assign(score=score)


@pytest.fixture(scope="module")
def got(built):
    postings, n, avgdl = built
    out = term_intersections(postings, QUERIES, n, avgdl).toPandas()
    return out.set_index(["query_id", "terms"]).sort_index()


def _want_single(naive, term):
    sub = naive[naive.term == term]
    return len(sub), sub.score.max()


def _want_pair(naive, ta, tb):
    a = naive[naive.term == ta].set_index("doc_id").score
    b = naive[naive.term == tb].set_index("doc_id").score
    common = a.index.intersection(b.index)
    if not len(common):
        return 0, None
    return len(common), (a[common] + b[common]).max()


def test_singletons_match_naive(naive, got):
    for q in QUERIES:
        for t in q["terms"]:
            n_docs, mx = _want_single(naive, t)
            key = (q["query_id"], t)
            if n_docs == 0:
                assert key not in got.index
                continue
            row = got.loc[key]
            assert int(row.n_docs) == n_docs
            assert row.max_score == pytest.approx(mx, rel=1e-9)


def test_pairs_match_naive(naive, got):
    from itertools import combinations

    seen_pair_rows = 0
    for q in QUERIES:
        for ta, tb in combinations(sorted(set(q["terms"])), 2):
            n_docs, mx = _want_pair(naive, ta, tb)
            key = (q["query_id"], f"{ta} {tb}")
            if n_docs == 0:
                assert key not in got.index
                continue
            seen_pair_rows += 1
            row = got.loc[key]
            assert int(row.n_docs) == n_docs
            assert row.max_score == pytest.approx(mx, rel=1e-9)
    assert seen_pair_rows > 0  # the corpus must exercise the pair path


def test_pair_bound_never_exceeds_sum_of_singles(got):
    for (qid, terms), row in got.iterrows():
        parts = terms.split(" ")
        if len(parts) != 2:
            continue
        singles = sum(got.loc[(qid, t)].max_score for t in parts)
        assert row.max_score <= singles + 1e-9


def test_absent_term_emits_no_row(got):
    labels = [t for _, t in got.index]
    assert not any("zzzzzz" in t for t in labels)


def test_max_arity_one_is_singletons_only(built):
    postings, n, avgdl = built
    out = term_intersections(
        postings, QUERIES, n, avgdl, max_arity=1
    ).toPandas()
    assert not out.terms.str.contains(" ").any()
    assert len(out) > 0


def test_arity_validation(built):
    postings, n, avgdl = built
    with pytest.raises(ValueError):
        term_intersections(postings, QUERIES, n, avgdl, max_arity=0)
    with pytest.raises(ValueError):
        term_intersections(postings, QUERIES, n, avgdl, max_arity=3)
