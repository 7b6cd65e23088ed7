"""FastText-style NB quality classifier (functions/classifier.py).

Contracts: scores equal the pinned closed form (pure-Python witness);
the classifier separates reference-like from crawl-like text; unseen
terms fall through smoothing; empty/untrainable slices raise; the
filter applies absolute and exact-quantile cuts and preserves doc
columns."""

import math

import pytest

from pisa_spark.functions.classifier import (
    ADD_K,
    classifier_filter,
    nb_classifier_scores,
)

POS = [
    (100, "the study of science and careful evidence"),
    (101, "evidence and careful analysis of science"),
    (102, "the analysis of study method and evidence"),
]
NEG = [
    (200, "click now win prize free prize click"),
    (201, "free win now click the prize"),
]
DOCS = [
    (0, "careful science evidence study"),
    (1, "click free prize win"),
    (2, "the evidence of prize"),
    (3, "unseenwordz onlyhere"),
    (4, "science evidence careful analysis method study the of and"),
]


def _witness():
    tok = lambda s: [w for w in s.lower().split() if w]
    pos_counts, neg_counts = {}, {}
    for _, t in POS:
        for w in tok(t):
            pos_counts[w] = pos_counts.get(w, 0) + 1
    for _, t in NEG:
        for w in tok(t):
            neg_counts[w] = neg_counts.get(w, 0) + 1
    v = len(set(pos_counts) | set(neg_counts))
    n_pos = sum(pos_counts.values())
    n_neg = sum(neg_counts.values())
    prior = math.log(len(POS) / len(NEG))
    out = {}
    for did, t in DOCS:
        ws = tok(t)
        s = sum(
            math.log(
                (pos_counts.get(w, 0) + ADD_K) / (n_pos + ADD_K * v)
            )
            - math.log(
                (neg_counts.get(w, 0) + ADD_K) / (n_neg + ADD_K * v)
            )
            for w in ws
        )
        logit = prior + s
        out[did] = (
            len(ws),
            s / len(ws),
            logit,
            1.0 / (1.0 + math.exp(-logit)),
        )
    return out


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(DOCS), mk(POS), mk(NEG)


def test_scores_match_closed_form(spark, frames):
    docs, pos, neg = frames
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["llr_per_token"], r["logit"], r["p_ref"]
        )
        for r in nb_classifier_scores(docs, pos, neg).collect()
    }
    want = _witness()
    assert set(got) == set(want)
    for did, (n, llr, logit, p) in want.items():
        gn, gllr, glogit, gp = got[did]
        assert gn == n
        assert gllr == pytest.approx(llr, rel=0, abs=1e-12)
        assert glogit == pytest.approx(logit, rel=0, abs=1e-12)
        assert gp == pytest.approx(p, rel=0, abs=1e-12)


def test_separates_reference_like_from_crawl_like(spark, frames):
    docs, pos, neg = frames
    got = {
        r["doc_id"]: r["p_ref"]
        for r in nb_classifier_scores(docs, pos, neg).collect()
    }
    assert got[0] > 0.5 > got[1]  # science-y keeps, spam drops
    assert got[4] > got[2]  # more reference mass ranks higher


def test_unseen_terms_fall_through_smoothing(spark, frames):
    docs, pos, neg = frames
    r = (
        nb_classifier_scores(docs, pos, neg)
        .filter("doc_id = 3")
        .collect()[0]
    )
    # both classes equally smoothed per token: llr reduces to the
    # class-size ratio term, identical for every unseen token
    v = len(
        {w for _, t in POS for w in t.split()}
        | {w for _, t in NEG for w in t.split()}
    )
    per_tok = math.log(
        (0 + ADD_K) / (sum(len(t.split()) for _, t in POS) + ADD_K * v)
    ) - math.log(
        (0 + ADD_K) / (sum(len(t.split()) for _, t in NEG) + ADD_K * v)
    )
    assert r["llr_per_token"] == pytest.approx(per_tok, abs=1e-9)


def test_filter_absolute_and_quantile_cuts(spark, frames):
    docs, pos, neg = frames
    kept = classifier_filter(docs, pos, neg, min_llr=0.0)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    scores = {
        r["doc_id"]: r["llr_per_token"]
        for r in nb_classifier_scores(docs, pos, neg).collect()
    }
    assert ids == {d for d, s in scores.items() if s >= 0.0}
    assert set(kept.columns) == {"doc_id", "text"}
    # exact-quantile cut: keep the upper half by llr_per_token
    top = classifier_filter(docs, pos, neg, quantile=0.5)
    cut = sorted(scores.values())[len(scores) // 2]
    assert {r["doc_id"] for r in top.select("doc_id").collect()} == {
        d for d, s in scores.items() if s >= cut
    }


def test_untrainable_slices_raise(spark, frames):
    docs, pos, neg = frames
    empty = docs.filter("doc_id < 0")
    with pytest.raises(ValueError, match="cannot be trained"):
        nb_classifier_scores(docs, empty, neg).collect()
    with pytest.raises(ValueError, match="k > 0"):
        nb_classifier_scores(docs, pos, neg, k=0.0)
