"""DSIR importance resampling (functions/dsir.py): pure-Python
witness of the full hashing/training/scoring/Gumbel contract,
separation sanity, refusals, one-call parity."""

import hashlib
import math

import pytest

from pisa_spark.functions.dsir import (
    dsir_resample,
    dsir_scores,
    dsir_select,
    dsir_train,
)

TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (10, "a quick brown dog naps in the warm sun"),
]
RAW = [
    (9, "buy cheap pills now best price pills now"),
    (19, "click here free money click here now"),
]
CORPUS = TARGET + RAW + [
    (3, "the brown fox naps in the sun"),        # target-like
    (4, "cheap pills free money best price"),    # raw-like
    (5, "completely unrelated words entirely"),  # neither
]

B = 8
S = 1.0


def _toks(text):
    import re

    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _feats(text):
    ts = _toks(text)
    return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]


def _bucket(g):
    h = int(hashlib.md5(("dsir:" + g).encode()).hexdigest()[:8], 16)
    return h % B


def _witness_model():
    tc, rc = {}, {}
    nt = nr = 0
    for _, text in TARGET:
        for g in _feats(text):
            tc[_bucket(g)] = tc.get(_bucket(g), 0) + 1
            nt += 1
    for _, text in RAW:
        for g in _feats(text):
            rc[_bucket(g)] = rc.get(_bucket(g), 0) + 1
            nr += 1
    lam = {
        b: math.log((tc.get(b, 0) + S) / (nt + S * B))
        - math.log((rc.get(b, 0) + S) / (nr + S * B))
        for b in set(tc) | set(rc)
    }
    lam0 = math.log(S / (nt + S * B)) - math.log(S / (nr + S * B))
    return lam, lam0


def _witness_scores():
    lam, lam0 = _witness_model()
    out = {}
    for d, text in CORPUS:
        cnt = {}
        for g in _feats(text):
            cnt[_bucket(g)] = cnt.get(_bucket(g), 0) + 1
        out[d] = (
            sum(cnt.values()),
            sum(c * lam.get(b, lam0) for b, c in sorted(cnt.items())),
        )
    return out


def _gumbel(d):
    h = int(
        hashlib.md5(f"dsir:g:{d}".encode()).hexdigest()[:8], 16
    ) % 1_000_000
    u = (h + 0.5) / 1_000_000.0
    return -math.log(-math.log(u))


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(CORPUS), mk(TARGET), mk(RAW)


def test_scores_match_witness(frames):
    docs, target, raw = frames
    lam, lam0 = dsir_train(target, raw, n_buckets=B)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in dsir_scores(docs, lam, lam0, n_buckets=B).collect()
    }
    want = _witness_scores()
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert math.isclose(got[d][1], want[d][1], rel_tol=1e-9), d


def test_target_like_beats_raw_like(frames):
    docs, target, raw = frames
    lam, lam0 = dsir_train(target, raw, n_buckets=B)
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_scores(docs, lam, lam0, n_buckets=B).collect()
    }
    assert got[3] > got[4]   # target-like > raw-like
    assert got[0] > got[9]   # the slices themselves separate


def test_resample_matches_gumbel_witness(frames):
    docs, target, raw = frames
    lam, lam0 = dsir_train(target, raw, n_buckets=B)
    scored = dsir_scores(docs, lam, lam0, n_buckets=B)
    got = [r["doc_id"] for r in dsir_resample(scored, 3).collect()]
    want_scores = _witness_scores()
    keyed = sorted(
        ((w + _gumbel(d), d) for d, (_, w) in want_scores.items()),
        key=lambda x: (-x[0], x[1]),
    )
    assert got == [d for _, d in keyed[:3]]


def test_select_one_call_parity(frames):
    docs, target, raw = frames
    lam, lam0 = dsir_train(target, raw, n_buckets=B)
    manual = sorted(
        r["doc_id"]
        for r in dsir_resample(
            dsir_scores(docs, lam, lam0, n_buckets=B), 3
        ).collect()
    )
    onecall = sorted(
        r["doc_id"]
        for r in dsir_select(docs, target, raw, 3, n_buckets=B).collect()
    )
    assert manual == onecall


def test_untrainable_slice_raises(frames, spark):
    docs, target, _ = frames
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        dsir_train(target, empty, n_buckets=B)
