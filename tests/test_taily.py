"""Taily shard selection (query/taily.py): incomplete-gamma numerics
pinned against direct numeric integration, closed-form selection
behavior, the full-selection serving identity, engine routing, and the
driver gate replayed against the DuckDB twin."""

import math

import duckdb
import pytest

import __spark_entry__ as E
from pisa_spark.query.taily import (
    gamma_quantile,
    gammainc_p,
    taily_select,
    taily_topk,
)


def _pdf(a, x):
    return math.exp(-x + (a - 1) * math.log(x) - math.lgamma(a)) if x > 0 else 0.0


def _simpson_cdf(a, x, n=20000):
    """Independent witness: Simpson's rule over the Gamma pdf."""
    h = x / n
    total = _pdf(a, 0.0) + _pdf(a, x)
    for i in range(1, n):
        total += _pdf(a, i * h) * (4 if i % 2 else 2)
    return total * h / 3.0


@pytest.mark.parametrize(
    "a,x",
    [(2.5, 1.0), (2.5, 6.0), (10.0, 3.0),
     (10.0, 25.0), (37.4, 40.1)],
)
def test_gammainc_matches_numeric_integration(a, x):
    # Simpson needs pdf(0) = 0, so a > 1 here; a = 1 is pinned by the
    # exact exponential identity and a < 1 by the erf identity below
    assert gammainc_p(a, x) == pytest.approx(_simpson_cdf(a, x), abs=1e-8)


@pytest.mark.parametrize("x", [0.05, 0.2, 1.0, 4.0])
def test_gammainc_half_matches_erf(x):
    # P(1/2, x) = erf(sqrt(x)) — exact witness for the a < 1 series
    assert gammainc_p(0.5, x) == pytest.approx(
        math.erf(math.sqrt(x)), abs=1e-12
    )


def test_gammainc_edges():
    assert gammainc_p(3.0, 0.0) == 0.0
    assert gammainc_p(1.0, 1e9) == pytest.approx(1.0)
    # a=1 is the exponential distribution: P(1, x) = 1 - e^-x
    assert gammainc_p(1.0, 2.0) == pytest.approx(1 - math.exp(-2.0), abs=1e-14)
    with pytest.raises(ValueError):
        gammainc_p(0.0, 1.0)
    with pytest.raises(ValueError):
        gammainc_p(1.0, -1.0)


def test_gamma_quantile_inverts_cdf():
    for k, theta, p in [(2.0, 3.0, 0.5), (0.7, 1.0, 0.9), (15.0, 0.2, 0.01)]:
        x = gamma_quantile(p, k, theta)
        assert gammainc_p(k, x / theta) == pytest.approx(p, abs=1e-10)
    assert gamma_quantile(0.0, 2.0, 1.0) == 0.0
    with pytest.raises(ValueError):
        gamma_quantile(1.0, 2.0, 1.0)


def _moments(any_, mean, var):
    """Back out (any, s1, s2) from target mean/variance."""
    return (any_, any_ * mean, any_ * (var + mean * mean))


def test_select_prefers_heavy_tail_shard():
    # shard 'a': many docs, high mean/variance; 'b': few low-scoring docs
    moments = {
        (0, "a"): _moments(1000, 5.0, 4.0),
        (0, "b"): _moments(50, 0.5, 0.01),
    }
    sel = taily_select(moments, [{"query_id": 0, "terms": ["x"]}], ntop=100, v=1.0)
    assert sel[0][0] == "a"
    # the low shard's estimate is ~0 above the global cutoff -> dropped
    assert "b" not in sel[0]


def test_select_keeps_all_when_ntop_exceeds_candidates():
    moments = {
        (0, "a"): _moments(30, 2.0, 1.0),
        (0, "b"): _moments(20, 1.0, 0.5),
    }
    sel = taily_select(moments, [{"query_id": 0, "terms": ["x"]}], ntop=100)
    assert sel[0] == ["a", "b"]  # ranked by candidate count


def test_select_always_returns_at_least_one_shard():
    # per-shard fits degenerate (var = 0) while the global fit is fine
    # (means differ across shards) -> every estimate is 0 -> the
    # argmax fallback still answers from exactly one shard
    moments = {
        (0, "a"): (10, 20.0, 40.0),
        (0, "b"): (5, 5.0, 5.0),
    }
    sel = taily_select(moments, [{"query_id": 0, "terms": ["x"]}], ntop=5)
    assert len(sel[0]) == 1
    with pytest.raises(ValueError):
        taily_select(moments, [{"query_id": 0, "terms": ["x"]}], ntop=0)


def test_select_no_global_fit_keeps_all_candidates():
    # all-negative scores (pathological stop-term query): estimation is
    # impossible, so selection must not false-negative any shard
    moments = {
        (0, "a"): (10, -5.0, 30.0),
        (0, "b"): (5, -1.0, 3.0),
    }
    sel = taily_select(moments, [{"query_id": 0, "terms": ["x"]}], ntop=5)
    assert sel[0] == ["a", "b"]


def test_full_selection_matches_federated_serving(spark, sf_dir):
    """ntop >= every candidate count -> all shards selected -> the
    result must equal federated serving over all members."""
    from pisa_spark.query.bm25 import bm25_topk_federated

    shards = E._built_lang_shards(spark, sf_dir)
    queries = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["dup", "query"], "conjunctive": False},
    ]
    got = taily_topk(shards, queries, k=10, ntop=10**9).collect()
    want = bm25_topk_federated(
        [(p, st) for _, p, st in shards], queries, k=10
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    got = sorted(((r["query_id"], r["rank"], r["doc_id"]) for r in got))
    want = sorted(((r["query_id"], r["rank"], r["doc_id"]) for r in want))
    assert got == want


def test_engine_method_routing(spark, sf_dir):
    from pisa_spark.engine import FederatedEngine

    shards = E._built_lang_shards(spark, sf_dir)
    fed = FederatedEngine(
        spark,
        [(p, st) for _, p, st in shards],
        names=[n for n, _, _ in shards],
    )
    out = fed.search_selective(
        ["data join"], k=5, method="taily", taily_ntop=20
    ).collect()
    assert len(out) == 5
    with pytest.raises(ValueError):
        fed.search_selective(["data"], method="nope")


def test_gate_matches_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    got = E.queries()["taily_shard_stats"](spark, sf_dir).toPandas()
    want = con.execute(E.oracle_sql()["taily_shard_stats"]).df()
    key = ["query_id", "shard"]
    got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert got["shard"].tolist() == want["shard"].tolist()
    for c in ("n_any", "ev", "var", "k", "theta"):
        assert got[c].astype(float).tolist() == pytest.approx(
            want[c].astype(float).tolist(), abs=1e-9
        ), c
