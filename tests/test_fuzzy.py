"""Fuzzy term matching: deletion-neighborhood completeness vs a
brute-force Levenshtein sweep, correction tie rules, and the engine's
did-you-mean path."""

import itertools

import pytest
from pyspark.sql import functions as F

from pisa_spark.query.fuzzy import (
    best_corrections,
    deletion_variants,
    fuzzy_term_matches,
)


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (classic DP) — independent machinery."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


VOCAB = [
    "data", "date", "dart", "join", "query", "queue", "window", "widow",
    "spark", "spar", "spare", "scan", "scans", "a", "ab",
]


@pytest.fixture(scope="module")
def vocab_df(spark):
    rows = [(t, (i + 1) * 10) for i, t in enumerate(VOCAB)]
    return spark.createDataFrame(rows, "term string, df long")


def test_deletion_variants_contents(spark):
    got = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc"), 1).alias("v"))
        .collect()[0]["v"]
    )
    assert sorted(got) == ["ab", "abc", "ac", "bc"]
    got2 = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc"), 2).alias("v"))
        .collect()[0]["v"]
    )
    assert set(got2) == {"abc", "ab", "ac", "bc", "a", "b", "c"}


@pytest.mark.parametrize("d", [1, 2])
def test_matches_equal_bruteforce(spark, vocab_df, d):
    """The deletion join + verify must reproduce the exact brute-force
    all-pairs-within-distance set."""
    probes = ["dat", "spakr", "querry", "windoow", "scan", "xyzzy", "b"]
    qdf = spark.createDataFrame([(p,) for p in probes], "qterm string")
    got = {
        (r["qterm"], r["term"], r["dist"])
        for r in fuzzy_term_matches(vocab_df, qdf, max_dist=d).collect()
    }
    want = {
        (q, t, _lev(q, t))
        for q, t in itertools.product(probes, VOCAB)
        if _lev(q, t) <= d
    }
    assert got == want


def test_best_corrections_tie_rules(spark, vocab_df):
    # 'spakr': dist-2 candidates incl. spark/spar/spare -> all dist 2?
    qdf = spark.createDataFrame(
        [("dat",), ("quer",), ("xyzzy",)], "qterm string"
    )
    got = {
        r["qterm"]: (r["term"], r["dist"])
        for r in best_corrections(vocab_df, qdf, max_dist=2).collect()
    }
    # 'dat': dist-1 candidates data/date/dart -> df desc wins: dart(30)
    assert got["dat"] == ("dart", 1)
    # 'quer': query(50) and queue(60) both dist... quer->query=1, queue=2
    assert got["quer"] == ("query", 1)
    assert "xyzzy" not in got  # nothing within distance 2


def test_engine_search_fuzzy(spark, sf_dir, tmp_path_factory):
    from pisa_spark.engine import SearchEngine
    from tests.oracle import Bm25Oracle

    root = str(tmp_path_factory.mktemp("fuzzy_eng") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    oracle = Bm25Oracle(sf_dir)
    # misspelled 'dataa joinn' must serve the corrected exact query
    got = eng.search_fuzzy("dataa joinn", k=5, max_dist=1).collect()
    expect = oracle.topk(["data", "join"], k=5)
    assert [
        (r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])
    ] == [(r, d) for r, d, _ in expect]


def test_suggest_prefix_orders_by_df_then_term(spark):
    from pisa_spark.query.fuzzy import suggest_prefix

    vocab = spark.createDataFrame(
        [("data", 50), ("database", 90), ("dart", 90), ("query", 10)],
        "term string, df long",
    )
    prefixes = spark.createDataFrame([("da",), ("x",)], "prefix string")
    rows = suggest_prefix(vocab, prefixes, n=2).collect()
    got = sorted((r["prefix"], r["rank"], r["term"]) for r in rows)
    # df desc, term asc: dart (90) before database (90) — term tie-break
    assert got == [("da", 1, "dart"), ("da", 2, "database")]


def test_engine_search_fuzzy_forwards_negation(spark, sf_dir, tmp_path_factory):
    """search_fuzzy('dataa -spam') must EXCLUDE docs containing
    'spam' (negated terms forwarded verbatim to the batch kernel) —
    previously they were silently dropped, returning spam docs."""
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("fuzzy_neg") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=4, wave_size=8
    ).with_corpus(sf_dir)
    # pick a negated term that actually co-occurs with 'data'
    plain = eng.search_fuzzy("dataa", k=10, max_dist=1).collect()
    assert plain, "fixture must match 'data'"
    doc0 = plain[0]["doc_id"]
    text0 = (
        eng._docs_df().filter(F.col("doc_id") == doc0).select("text").collect()
    )
    neg_term = next(
        w for w in text0[0]["text"].lower().split() if w.isalpha()
    )
    got = eng.search_fuzzy(f"dataa -{neg_term}", k=10, max_dist=1)
    assert doc0 not in {r["doc_id"] for r in got.collect()}


def test_engine_search_fuzzy_rejects_phrases(spark, sf_dir, tmp_path_factory):
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("fuzzy_ph") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    import pytest

    with pytest.raises(ValueError, match="phrase"):
        eng.search_fuzzy('"data joinn"', k=5)
