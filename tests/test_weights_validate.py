"""JSD snapshot weights (ref #41) vs a NumPy reimplementation, and the
NaN-guard validator (ref #14)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.operators.validate import nan_guard, nonfinite_counts
from pisa_spark.operators.weights import DEFAULT_EPS, jsd_weights


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def _numpy_jsd_weights(X, Xp, C, eps=DEFAULT_EPS):
    def aff(M):
        G = M @ C.T  # (n, K)
        G = G - G.max(axis=1, keepdims=True)
        E = np.exp(G)
        return E / E.sum(axis=1, keepdims=True)

    p, q = aff(Xp), aff(X)  # reference order: jsd(prev, cur)
    m = 0.5 * (p + q)
    j = 0.5 * (
        (p * (np.log(p + eps) - np.log(m + eps))).sum(axis=1)
        + (q * (np.log(q + eps) - np.log(m + eps))).sum(axis=1)
    )
    return 1.0 / (1.0 + np.exp(-(j - j.mean()))), j


def test_jsd_weights_match_numpy(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xp = X[:, ::-1].copy()
    rng = np.random.default_rng(7)
    C = rng.standard_normal((8, X.shape[1]))
    prev = emb.select("vec_id", F.reverse("embedding").alias("embedding"))
    got = {
        r["id"]: (r["jsd"], r["weight"])
        for r in jsd_weights(emb, prev, C).collect()
    }
    w_np, j_np = _numpy_jsd_weights(X, Xp, C)
    for i, r in enumerate(rows):
        j, w = got[r["vec_id"]]
        assert abs(j - j_np[i]) < 1e-9
        assert abs(w - w_np[i]) < 1e-9
    # weights are sigmoid-centered: mean-centering puts them around 0.5
    ws = np.array([w for _, w in got.values()])
    assert 0.3 < ws.mean() < 0.7
    assert np.all((ws > 0) & (ws < 1))


def test_nan_guard(spark):
    clean = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    assert nan_guard(clean, ["a", "b"]) is clean
    dirty = spark.createDataFrame(
        [(1.0, float("nan")), (float("inf"), 4.0), (None, 5.0)],
        "a double, b double",
    )
    counts = {
        r["col_name"]: r["n_nonfinite"]
        for r in nonfinite_counts(dirty, ["a", "b"]).collect()
    }
    assert counts == {"a": 2, "b": 1}
    with pytest.raises(ValueError, match="non-finite"):
        nan_guard(dirty, ["a", "b"])


def test_nan_guard_empty_frame_passes(spark):
    empty = spark.createDataFrame([], "a double, b double")
    assert nan_guard(empty, ["a", "b"]) is empty
