"""Best-window snippets vs a naive Python reference."""

import re

from pisa_spark.query.snippets import best_window_snippets

TOKEN_RE = re.compile("[^a-z0-9]+")


def _naive_best(text, terms, width):
    toks = [t for t in TOKEN_RE.split(text.lower()) if t]
    ts = set(terms)
    best = (-1, 0)  # (hits, -start) maximized -> earliest on ties
    for i in range(len(toks)):
        hits = sum(1 for t in toks[i : i + width] if t in ts)
        if hits > best[0]:
            best = (hits, i)
    return best[1], best[0], " ".join(toks[best[1] : best[1] + width])


def test_best_window_matches_naive(spark):
    rows = [
        (0, "The data keeps data join data moving while join tables wait"),
        (1, "nothing relevant here at all just filler words and more filler"),
        (2, "join " * 3 + "x " * 20 + "data join data join data"),
        (3, "data"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    results = spark.createDataFrame(
        [(7, i) for i, _ in rows], "query_id int, doc_id long"
    )
    qterms = spark.createDataFrame(
        [(7, "data"), (7, "join")], "query_id int, term string"
    )
    got = {
        r["doc_id"]: (r["best_start"], r["n_hits"], r["snippet"])
        for r in best_window_snippets(results, docs, qterms, width=6).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _naive_best(text, ["data", "join"], 6), doc_id


def test_snippets_only_for_result_docs_and_empty_docs_omitted(spark):
    docs = spark.createDataFrame(
        [(0, "data here"), (1, "also data"), (2, "...!!!")],
        "doc_id long, text string",
    )
    results = spark.createDataFrame(
        [(0, 0), (0, 2)], "query_id int, doc_id long"
    )
    qterms = spark.createDataFrame([(0, "data")], "query_id int, term string")
    out = best_window_snippets(results, docs, qterms, width=4).collect()
    # doc 1 not in results; doc 2 tokenizes empty -> omitted
    assert {r["doc_id"] for r in out} == {0}
    assert out[0]["n_hits"] == 1 and out[0]["snippet"].startswith("data")


def test_snippets_partition_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    results = docs.select("doc_id").limit(20).selectExpr(
        "1 as query_id", "doc_id"
    )
    qterms = spark.createDataFrame(
        [(1, "data"), (1, "join")], "query_id int, term string"
    )
    a = sorted(
        map(tuple, best_window_snippets(results, docs, qterms, 12).collect())
    )
    b = sorted(
        map(
            tuple,
            best_window_snippets(
                results.repartition(7), docs.repartition(5), qterms, 12
            ).collect(),
        )
    )
    assert a == b and len(a) == 20
