"""CCNet-style bigram LM perplexity (functions/lm_quality.py):
pure-Python witness, reference-slice training, filter semantics."""

import math
import re

import pytest

from pisa_spark.functions.lm_quality import lm_perplexity, perplexity_filter

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sleeps near the lazy dog"),
    (2, "zzz qqq xxx vvv kkk www yyy"),
    (3, "the the the the the the the the"),
    (4, ""),
    (5, "Quick, QUICK: brown fox! over the DOG?"),
]


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _witness(train_texts, score_texts, k=0.5):
    uni, bi = {}, {}
    for _, s in train_texts:
        toks = _tok(s)
        for i, w in enumerate(toks):
            uni[w] = uni.get(w, 0) + 1
            if i > 0:
                bi[(toks[i - 1], w)] = bi.get((toks[i - 1], w), 0) + 1
    n, v = sum(uni.values()), len(uni)
    out = {}
    for d, s in score_texts:
        toks = _tok(s)
        if not toks:
            continue
        lp = math.log((uni.get(toks[0], 0) + k) / (n + k * v))
        for i in range(1, len(toks)):
            lp += math.log(
                (bi.get((toks[i - 1], toks[i]), 0) + k)
                / (uni.get(toks[i - 1], 0) + k * v)
            )
        avg = lp / len(toks)
        out[d] = (len(toks), avg, math.exp(-avg))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_self_perplexity_matches_witness(docs):
    want = _witness(TEXTS, TEXTS)
    rows = lm_perplexity(docs).collect()
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["perplexity"])
        for r in rows
    }
    assert set(got) == set(want)  # doc 4 (empty) omitted
    for d in want:
        assert got[d][0] == want[d][0], d
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-9), d
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-9), d


def test_reference_slice_training(docs):
    from pyspark.sql import functions as F

    ref_rows = [t for t in TEXTS if t[0] in (0, 1)]
    want = _witness(ref_rows, TEXTS)
    ref = docs.filter(F.col("doc_id").isin(0, 1))
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"], r["perplexity"])
        for r in lm_perplexity(docs, reference=ref).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d
    # gibberish doc must look far worse under the clean-reference LM
    assert got[2][2] > 3 * got[1][2]


def test_gibberish_scores_worse_than_fluent(docs):
    got = {
        r["doc_id"]: r["perplexity"] for r in lm_perplexity(docs).collect()
    }
    # repeated-bigram spam is the most predictable; gibberish the least
    assert got[3] < got[0] < got[2]


def test_filter_absolute_cut(docs):
    want = _witness(TEXTS, TEXTS)
    cut = (want[0][2] + want[2][2]) / 2
    kept = {
        r["doc_id"]
        for r in perplexity_filter(docs, max_perplexity=cut).collect()
    }
    assert kept == {d for d, (_, _, p) in want.items() if p <= cut}
    assert 2 not in kept


def test_filter_quantile_cut(docs):
    import numpy as np

    want = _witness(TEXTS, TEXTS)
    perps = sorted(p for _, _, p in want.values())
    cut = float(np.percentile(perps, 60, method="linear"))
    kept = {
        r["doc_id"] for r in perplexity_filter(docs, quantile=0.6).collect()
    }
    assert kept == {d for d, (_, _, p) in want.items() if p <= cut + 1e-12}


def test_bad_k_raises(docs):
    with pytest.raises(ValueError):
        lm_perplexity(docs, k=0.0)


def test_empty_reference_raises_cleanly(spark, docs):
    ref = spark.createDataFrame([(9, ""), (10, "!!! ...")],
                                "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        lm_perplexity(docs, reference=ref).collect()
