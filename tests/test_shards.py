"""Selective search (query/shards.py) — topical shards + CORI
resource selection.

Contracts: cori_select is exactly the pinned formula (pure-Python
witness); selective_topk equals the full federation RESTRICTED to the
selected shards' documents, scored under GLOBAL stats; n_select >=
n_shards degrades to exact federated serving; all-absent-term queries
select deterministically by name and return empty; the FederatedEngine
facade routes and refuses phrases/filters."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.engine import FederatedEngine
from pisa_spark.index.build import build_postings
from pisa_spark.index.pruning import postings_rows
from pisa_spark.query.bm25 import bm25_topk_federated
from pisa_spark.query.shards import (
    CORI_B,
    cori_select,
    selective_topk,
    shard_term_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shards(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    langs = sorted(
        r["lang"] for r in docs.select("lang").distinct().collect()
    )
    out = []
    for lang in langs:
        toks = docs.filter(F.col("lang") == lang).select(
            "doc_id", tokens_col(F.col("text")).alias("tokens")
        ).withColumn("doc_len", F.size("tokens"))
        r = toks.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total"),
            F.max("doc_id").alias("mx"),
        ).collect()[0]
        postings = build_postings(
            toks, int(r["n"]), float(r["avgdl"]), n_buckets=4,
            max_doc_id=int(r["mx"]),
        ).cache()
        out.append(
            (lang, postings, {"n_docs": int(r["n"]),
                              "avgdl": float(r["avgdl"]),
                              "total_terms": int(r["total"])})
        )
    return out


QS = [
    {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
    {"query_id": 1, "terms": ["the"], "conjunctive": False},
    {"query_id": 2, "terms": ["dup", "query"], "conjunctive": False},
    {"query_id": 3, "terms": ["window", "merge"], "conjunctive": True},
]


def test_cori_select_is_the_pinned_formula():
    df_ts = {("s1", "a"): 10, ("s2", "a"): 2, ("s2", "b"): 5}
    cw = {"s1": 1000, "s2": 500}
    qs = [{"query_id": 7, "terms": ["a", "b"]}]
    got = cori_select(df_ts, cw, qs, n_select=1)
    # witness: closed form by hand
    avg_cw = 750.0
    n_shards = 2

    def p(d, cwv, cf):
        t = d / (d + 50.0 + 150.0 * cwv / avg_cw)
        i = math.log((n_shards + 0.5) / cf) / math.log(n_shards + 1.0)
        return CORI_B + (1.0 - CORI_B) * t * i

    b1 = (p(10, 1000, 2) + p(0, 1000, 1)) / 2  # 'b' absent from s1
    b2 = (p(2, 500, 2) + p(5, 500, 1)) / 2
    assert got == {7: ["s2" if b2 > b1 else "s1"]}
    assert b2 > b1  # s2 holds 'b' exclusively and is smaller


def test_absent_terms_tiebreak_by_name_and_empty_result(spark, shards):
    qs = [{"query_id": 0, "terms": ["qqqzzz"], "conjunctive": False}]
    names = sorted(n for n, _, _ in shards)
    df_ts = {}
    cw = {n: st["total_terms"] for n, _, st in shards}
    assert cori_select(df_ts, cw, qs, 2) == {0: names[:2]}
    out = selective_topk(shards, qs, k=5, n_select=2)
    assert out.count() == 0


def _naive_restricted_topk(shards, queries, selected, k):
    """Pandas witness: global-stats BM25 over the union tf relation,
    restricted per query to docs of its selected shards."""
    import pandas as pd

    frames = []
    for name, postings, _ in shards:
        pdf = postings_rows(postings).toPandas()
        pdf["shard"] = name
        frames.append(pdf)
    full = pd.concat(frames, ignore_index=True)
    n = full.doc_id.nunique()
    doclen = full.drop_duplicates("doc_id")[["doc_id", "doc_len", "shard"]]
    avgdl = doclen.doc_len.mean()
    dfs = full.groupby("term")["doc_id"].transform("size")
    idf = np.log((n - dfs + 0.5) / (dfs + 0.5))
    tf = full.tf.to_numpy(float)
    full = full.assign(
        score=idf * (tf * 1.9)
        / (tf + 0.9 * (0.6 + 0.4 * full.doc_len / avgdl))
    )
    rows = []
    for q in queries:
        sub = full[
            full.term.isin(q["terms"])
            & full.shard.isin(selected[q["query_id"]])
        ]
        agg = sub.groupby("doc_id").agg(
            score=("score", "sum"), nt=("term", "nunique")
        )
        if q.get("conjunctive"):
            agg = agg[agg.nt == len(set(q["terms"]))]
        agg = agg.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k)
        for rank, (doc, r) in enumerate(agg.iterrows(), 1):
            rows.append((q["query_id"], rank, doc, round(r.score, 9)))
    return rows


def test_selective_equals_restricted_global_scoring(spark, shards):
    all_terms = sorted({t for q in QS for t in q["terms"]})
    df_ts = {
        (r["shard"], r["term"]): int(r["df"])
        for r in shard_term_stats(
            [(n, p) for n, p, _ in shards], terms=all_terms
        ).collect()
    }
    cw = {n: st["total_terms"] for n, _, st in shards}
    selected = cori_select(df_ts, cw, QS, 2)
    assert all(len(v) == 2 for v in selected.values())
    got = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(
            selective_topk(shards, QS, k=10, n_select=2).collect(),
            key=lambda r: (r["query_id"], r["rank"]),
        )
    ]
    assert got == _naive_restricted_topk(shards, QS, selected, 10)


def test_selecting_all_shards_degrades_to_federated(spark, shards):
    members = [(p, st) for _, p, st in shards]
    want = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(
            bm25_topk_federated(members, QS, k=10).collect(),
            key=lambda r: (r["query_id"], r["rank"]),
        )
    ]
    got = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(
            selective_topk(shards, QS, k=10, n_select=len(shards)).collect(),
            key=lambda r: (r["query_id"], r["rank"]),
        )
    ]
    assert got == want


def test_facade_routes_and_refuses(spark, shards):
    fed = FederatedEngine(
        spark,
        [(p, st) for _, p, st in shards],
        names=[n for n, _, _ in shards],
    )
    got = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(
            fed.search_selective(["data join", "the"], k=10).collect(),
            key=lambda r: (r["query_id"], r["rank"]),
        )
    ]
    qs = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["the"], "conjunctive": False},
    ]
    want = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(
            selective_topk(shards, qs, k=10, n_select=2).collect(),
            key=lambda r: (r["query_id"], r["rank"]),
        )
    ]
    assert got == want
    with pytest.raises(ValueError, match="selective"):
        fed.search_selective(['"data join"'], k=10)
    with pytest.raises(ValueError, match="names must match"):
        FederatedEngine(spark, [(None, None)], names=["a", "b"])
