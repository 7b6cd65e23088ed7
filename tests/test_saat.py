"""Score-at-a-time anytime serving (query/saat.py): segment layout
round-trip, pinned selection semantics vs a pure-Python witness,
full-budget identity with exhaustive quantized ranking, engine
routing/refusals, layout invariance."""

import math

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.engine import SearchEngine
from pisa_spark.index.codec import delta_decode_docids
from pisa_spark.index.quantized import (
    IDF_SCALE,
    IMPACT_SCALE,
    build_quantized_postings,
    idf_quantized,
    quantized_topk,
)
from pisa_spark.query.saat import (
    impact_ordered_segments,
    saat_topk,
    select_segments,
)

DOCS = [
    (0, "data join data table"),
    (1, "the the the the data"),
    (2, "query scan spark join"),
    (3, "spark query scan data join"),
    (4, "scan"),
    (5, "data data data data data data"),
    (6, "join the query"),
    (7, ""),
]


@pytest.fixture(scope="module")
def toks(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return (
        docs.select("doc_id", tokens_col(F.col("text")).alias("tokens"))
        .withColumn("doc_len", F.size("tokens"))
        .cache()
    )


@pytest.fixture(scope="module")
def stats(toks):
    r = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(r["n"]), float(r["avgdl"])


@pytest.fixture(scope="module")
def quant(toks, stats):
    n_docs, avgdl = stats
    return build_quantized_postings(
        toks, n_docs, avgdl, n_buckets=4, block_size=3
    ).cache()


@pytest.fixture(scope="module")
def segments(quant):
    return impact_ordered_segments(quant).cache()


# ---------------------------------------------------------------------------
# pure-Python witness of the whole contract
# ---------------------------------------------------------------------------

def _witness(n_docs, avgdl):
    """(tf, dl, df) tables plus per-(term, imp) doc lists over DOCS."""
    tf, dl = {}, {}
    for d, text in DOCS:
        ts = [t for t in text.split() if t]
        dl[d] = len(ts)
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    seg = {}
    for (d, t), f in tf.items():
        imp = math.floor(
            IMPACT_SCALE * f / (f + (0.54 + 0.36 * dl[d] / avgdl))
        )
        seg.setdefault((t, imp), []).append(d)
    return df, seg


def _witness_topk(terms, rho, n_docs, avgdl, k=10):
    df, seg = _witness(n_docs, avgdl)
    terms = [t for t in dict.fromkeys(terms) if t in df]
    idf_q = {t: idf_quantized(df[t], n_docs) for t in terms}
    rows = sorted(
        (
            (t, imp, len(docs))
            for (t, imp), docs in seg.items()
            if t in idf_q
        ),
        key=lambda r: (-(r[1] * idf_q[r[0]]), r[0], -r[1]),
    )
    sel, cum = [], 0
    for t, imp, n in rows:
        if rho is not None and cum >= rho:
            break
        sel.append((t, imp))
        cum += n
    scores = {}
    for (t, imp) in sel:
        for d in seg[(t, imp)]:
            scores[d] = scores.get(d, 0) + imp * idf_q[t]
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]


def _collect(df):
    return [
        (r["rank"], r["doc_id"], r["score_q"])
        for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"]))
    ]


# ---------------------------------------------------------------------------
# layout
# ---------------------------------------------------------------------------

def test_segment_layout_roundtrip(segments, stats):
    n_docs, avgdl = stats
    df, seg_w = _witness(n_docs, avgdl)
    rows = segments.collect()
    # one row per (bucket, term, imp)
    keys = [(r["bucket"], r["term"], r["imp"]) for r in rows]
    assert len(keys) == len(set(keys))
    # docs decode ascending, n matches, and the union over buckets is
    # exactly the witness's per-(term, imp) doc set
    got = {}
    for r in rows:
        docs = delta_decode_docids(bytes(r["docs"])).tolist()
        assert docs == sorted(docs)
        assert len(docs) == r["n"]
        got.setdefault((r["term"], r["imp"]), []).extend(docs)
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in seg_w.items()
    }
    # per-term sum(n) is df (one posting per doc)
    per_term = {}
    for r in rows:
        per_term[r["term"]] = per_term.get(r["term"], 0) + r["n"]
    assert per_term == df


# ---------------------------------------------------------------------------
# selection + serving semantics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rho", [1, 3, 6, 100])
def test_budgeted_matches_witness(segments, stats, rho):
    n_docs, avgdl = stats
    queries = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["the", "scan", "query"], "conjunctive": False},
    ]
    out = saat_topk(segments, queries, n_docs, rho=rho, k=10)
    rows = {qid: [] for qid in (0, 1)}
    for r in out.collect():
        rows[r["query_id"]].append((r["rank"], r["doc_id"], r["score_q"]))
    for q in queries:
        expect = _witness_topk(q["terms"], rho, n_docs, avgdl)
        assert sorted(rows[q["query_id"]]) == expect, (q, rho)


def test_full_budget_equals_quantized(segments, quant, stats):
    n_docs, _ = stats
    queries = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["the"], "conjunctive": False},
    ]
    exhaustive = quantized_topk(quant, queries, n_docs, k=10)
    anytime = saat_topk(segments, queries, n_docs, rho=None, k=10)
    assert _collect(exhaustive) == _collect(anytime)


def test_selection_prefix_and_crossing_segment():
    idf_q = {"a": 100, "b": 50}
    meta = [("a", 10, 4), ("a", 5, 2), ("b", 30, 3), ("b", 1, 5)]
    # pinned order: b/30 (1500), a/10 (1000), a/5 (500), b/1 (50)
    assert select_segments(meta, idf_q, None) == set(
        (t, i) for t, i, _ in meta
    )
    # rho=1 -> first segment only
    assert select_segments(meta, idf_q, 1) == {("b", 30)}
    # rho=4: cum before a/10 is 3 < 4 -> crossing segment included
    assert select_segments(meta, idf_q, 4) == {("b", 30), ("a", 10)}
    # rho=7: cum before a/5 is 7 -> excluded
    assert select_segments(meta, idf_q, 7) == {("b", 30), ("a", 10)}


def test_absent_terms_and_empty_query(segments, stats):
    n_docs, _ = stats
    out = saat_topk(
        segments,
        [{"query_id": 0, "terms": ["zzzz", "data"], "conjunctive": False}],
        n_docs,
        rho=None,
        k=10,
    )
    assert out.count() > 0
    with pytest.raises(ValueError):
        saat_topk(segments, [{"query_id": 0, "terms": []}], n_docs, rho=None)


def test_layout_invariance(toks, stats, segments):
    """Different bucket/block geometry -> identical ranking."""
    n_docs, avgdl = stats
    other = impact_ordered_segments(
        build_quantized_postings(toks, n_docs, avgdl, n_buckets=2, block_size=2)
    )
    queries = [{"query_id": 0, "terms": ["data", "the", "scan"]}]
    a = saat_topk(segments, queries, n_docs, rho=4, k=10)
    b = saat_topk(other, queries, n_docs, rho=4, k=10)
    assert _collect(a) == _collect(b)


# ---------------------------------------------------------------------------
# engine routing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("saat_engine") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)


def test_engine_full_budget_identity(eng):
    quant = eng.search_quantized(["data join", "the"], k=10)
    anytime = eng.search_saat(["data join", "the"], k=10, rho=None)
    assert _collect(quant) == _collect(anytime)


def test_engine_budgeted_runs(eng):
    out = eng.search_saat("data join table", k=5, rho=50).collect()
    assert len(out) > 0
    for r in out:
        assert r["rank"] <= 5


def test_engine_refusals(eng):
    with pytest.raises(ValueError, match="no positions"):
        eng.search_saat('"data join"')
    with pytest.raises(ValueError, match="disjunctive-only"):
        eng.search_saat("+data join")
    with pytest.raises(ValueError, match="negation"):
        eng.search_saat("data -join")
    with pytest.raises(ValueError, match="negation|filters"):
        eng.search_saat({"terms": ["data"], "filter": [["lang:en"]]})


def test_engine_deletes_guard(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("saat_del") / "idx")
    e = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    e.delete_docs([0], persist=False)
    with pytest.raises(ValueError, match="tombstone"):
        e.search_saat("data")
