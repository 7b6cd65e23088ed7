"""Paired randomization significance test (operators/significance.py):
pure-Python witness of the full contract, degenerate cases."""

import hashlib
import math

import pytest

from pisa_spark.operators.significance import paired_randomization_test

A = [(0, 0.5), (1, 0.8), (2, 0.3), (3, 0.9), (4, 0.6), (5, 0.7)]
B = [(0, 0.4), (1, 0.6), (2, 0.3), (3, 0.5), (4, 0.2), (5, 0.4)]
R = 100


def _mdf(spark, rows, metric="ap"):
    return spark.createDataFrame(
        [(q, metric, v) for q, v in rows],
        "query_id int, metric string, value double",
    )


def _coin(rep, q):
    h = int(
        hashlib.md5(f"sig:{rep}:{q}".encode()).hexdigest()[:8], 16
    )
    return -1 if h % 2 == 1 else 1


def _witness(a, b, r):
    di = {q: round((va - dict(b)[q]) * 10000) for q, va in a}
    n = len(di)
    s_obs = sum(di.values())
    s2 = sum(v * v for v in di.values())
    exceed = 0
    for rep in range(r):
        s_r = sum(v * _coin(rep, q) for q, v in sorted(di.items()))
        if abs(s_r) >= abs(s_obs):
            exceed += 1
    p = (exceed + 1) / (r + 1)
    mean_d = (s_obs / 10000.0) / n
    var = (s2 - (s_obs * s_obs) / n) / (n - 1)
    sd = math.sqrt(var) / 10000.0
    t = mean_d / (sd / math.sqrt(n))
    return n, round(mean_d, 6), round(t, 6), round(p, 6)


def test_matches_witness(spark):
    out = paired_randomization_test(
        _mdf(spark, A), _mdf(spark, B), metric="ap", r=R
    ).collect()[0]
    n, mean_d, t, p = _witness(A, B, R)
    assert out["n_queries"] == n
    assert out["mean_diff"] == mean_d
    assert out["t_stat"] == t
    assert out["p_value"] == p
    assert out["mean_a"] == round(sum(v for _, v in A) / n, 6)


def test_identical_runs_p_is_one(spark):
    out = paired_randomization_test(
        _mdf(spark, A), _mdf(spark, A), metric="ap", r=50
    ).collect()[0]
    assert out["p_value"] == 1.0
    assert out["mean_diff"] == 0.0
    assert out["t_stat"] == 0.0


def test_pairs_on_intersection_and_refusals(spark):
    a = _mdf(spark, A)
    b_partial = _mdf(spark, B[:4])
    out = paired_randomization_test(a, b_partial, metric="ap", r=20)
    assert out.collect()[0]["n_queries"] == 4
    with pytest.raises(ValueError, match="no paired"):
        paired_randomization_test(
            a, _mdf(spark, B, metric="ndcg"), metric="ap", r=20
        )
    with pytest.raises(ValueError, match="replicate"):
        paired_randomization_test(a, _mdf(spark, B), r=0)
