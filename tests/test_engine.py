"""SearchEngine facade: build/load/search parity with the direct API."""

import pytest
from pyspark.sql import functions as F


from pisa_spark.engine import SearchEngine
from tests.oracle import Bm25Oracle


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("engine") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return Bm25Oracle(sf_dir)


def test_search_string_queries(eng, oracle):
    rows = eng.search("data join", k=10).collect()
    expect = oracle.topk(["data", "join"], k=10)
    assert [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])] \
        == [(r, d) for r, d, _ in expect]
    # '+' makes it conjunctive
    rows_and = eng.search("+window merge scan", k=10).collect()
    expect_and = oracle.topk(["window", "merge", "scan"], k=10, conjunctive=True)
    assert [(r["rank"], r["doc_id"]) for r in sorted(rows_and, key=lambda r: r["rank"])] \
        == [(r, d) for r, d, _ in expect_and]


def test_search_batch(eng, oracle):
    got = eng.search_batch(["data join", "the"], k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert sorted(by_q[0]) == [(r, d) for r, d, _ in oracle.topk(["data", "join"], k=5)]
    assert sorted(by_q[1]) == [(r, d) for r, d, _ in oracle.topk(["the"], k=5)]


def test_search_with_docs(eng, sf_dir, spark):
    eng.with_corpus(sf_dir)
    rows = eng.search_with_docs("data join", k=5).collect()
    assert len(rows) == 5
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in rows:
        assert r["text"] == texts[r["doc_id"]]
    ids = [r["doc_id"] for r in rows]
    fetched = eng.fetch_docs(ids).collect()
    assert sorted(r["doc_id"] for r in fetched) == sorted(ids)


def test_load_and_metadata(spark, eng, sf_dir, tmp_path_factory):
    stats = eng.corpus_stats()
    assert stats["n_docs"] == 500 and stats["avgdl"] > 0
    ts = {r["term"]: r["df"] for r in eng.term_stats(["data", "zzz"]).collect()}
    assert ts.get("data", 0) > 0 and "zzz" not in ts


def test_missing_corpus_raises_clearly(eng):
    import pytest as _pytest

    from pisa_spark.engine import SearchEngine

    fresh = SearchEngine(eng.spark, eng.postings, eng.stats, pre_arranged=True)
    with _pytest.raises(ValueError, match="with_corpus"):
        fresh.fetch_docs([1, 2])


def test_edge_queries(eng):
    # empty query -> empty result, no error
    assert eng.search("").count() == 0
    # absent term OR -> empty; absent term AND with present term -> empty
    assert eng.search("zzzabsent").count() == 0
    assert eng.search("+data zzzabsent").count() == 0
    # duplicate terms score once (same as the single-term query)
    a = sorted(map(tuple, eng.search("data data data", k=5).collect()))
    b = sorted(map(tuple, eng.search("data", k=5).collect()))
    assert a == b


def test_snippets(eng, sf_dir):
    eng.with_corpus(sf_dir)
    rows = eng.search_with_docs("data join", k=5, snippet_window=6).collect()
    assert len(rows) == 5
    for r in rows:
        words = r["snippet"].split(" ")
        assert len(words) <= 6
        # the snippet window contains a query term (hits always match)
        assert any(w in ("data", "join") for w in words), r["snippet"]


def test_load_uncached_shuffle_free_and_identical(spark, eng, sf_dir, tmp_path_factory):
    """cache=False serving: the stored one-file-per-bucket layout is
    detected, queries skip the bucket repartition entirely (no bucket
    Exchange in the plan), and results are identical to cached mode."""
    root = str(tmp_path_factory.mktemp("engine_uc") / "idx")
    cached = SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)
    uncached = SearchEngine.load(spark, root, cache=False)
    assert uncached._pre_arranged, "stored layout should satisfy the invariant"

    a = sorted(map(tuple, cached.search("data join", k=10).collect()))
    b = sorted(map(tuple, uncached.search("data join", k=10).collect()))
    assert a == b

    plan = uncached.search("data join", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bucket" not in plan, plan


def test_search_algorithm_maxscore(eng, oracle):
    rows = eng.search("data join", k=10, algorithm="maxscore").collect()
    expect = oracle.topk(["data", "join"], k=10)
    assert [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])] \
        == [(r, d) for r, d, _ in expect]
    with pytest.raises(ValueError, match="algorithm"):
        eng.search("data", algorithm="nope")


def test_search_batch_reroutes_large_maxscore_batch(eng):
    """maxscore is single-query latency mode: a batch beyond
    MAXSCORE_BATCH_LIMIT reroutes to WAND with a warning (identical
    ranks); strict_algorithm=True keeps the requested kernel silently."""
    import warnings

    qs = [f"data join q{i}" for i in range(eng.MAXSCORE_BATCH_LIMIT + 1)]
    with pytest.warns(UserWarning, match="rerouting"):
        rerouted = eng.search_batch(qs, k=5, algorithm="maxscore").collect()
    wand = eng.search_batch(qs, k=5, algorithm="wand").collect()
    assert sorted(map(tuple, rerouted)) == sorted(map(tuple, wand))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        forced = eng.search_batch(
            qs, k=5, algorithm="maxscore", strict_algorithm=True
        ).collect()
    assert sorted(map(tuple, forced)) == sorted(map(tuple, wand))
    # small batches keep the requested kernel without noise
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng.search_batch(["data join"], k=5, algorithm="maxscore").collect()


def test_term_df_cache_populates_and_serves(eng, oracle):
    eng._df_cache.clear()
    first = eng.search("data join", k=5).collect()
    assert eng._df_cache.get("data", 0) > 0 and eng._df_cache.get("join", 0) > 0
    # second search hits the cache (no state change) and stays correct
    again = eng.search("data join", k=5).collect()
    assert sorted((r["rank"], r["doc_id"]) for r in first) \
        == sorted((r["rank"], r["doc_id"]) for r in again) \
        == [(r, d) for r, d, _ in oracle.topk(["data", "join"], k=5)]
    # absent terms cache as 0 and don't break the query
    rows = eng.search("zzzabsent", k=5).collect()
    assert rows == [] and eng._df_cache["zzzabsent"] == 0


def test_search_scored_off_loaded_index(eng, oracle, spark, sf_dir):
    """search_scored serves any registered scorer off the loaded
    compressed index; bm25 mode must agree with the pruned search path
    and the independent oracle, alternative scorers with the direct
    tf-relation path."""
    from pyspark.sql import functions as F

    from pisa_spark.corpus import tokenize_documents
    from pisa_spark.index.build import term_frequencies
    from pisa_spark.query.scorers import scored_topk_dataframe

    got = eng.search_scored(["data join"], scorer="bm25", k=10).collect()
    expect = oracle.topk(["data", "join"], k=10)
    assert [
        (r["rank"], r["doc_id"]) for r in sorted(got, key=lambda r: r["rank"])
    ] == [(r, d) for r, d, _ in expect]

    stats = eng.corpus_stats()
    tf = term_frequencies(tokenize_documents(spark, sf_dir))
    qdf = spark.createDataFrame(
        [(0, "data"), (0, "join")], "query_id int, term string"
    )
    for scorer in ("qld", "pl2", "dph"):
        a = eng.search_scored(["data join"], scorer=scorer, k=10).collect()
        b = scored_topk_dataframe(
            tf, qdf, stats["n_docs"], stats["avgdl"],
            float(stats["total_terms"]), scorer=scorer, k=10,
        ).collect()
        key = lambda r: (r["rank"], r["doc_id"], round(r["score"], 9))
        assert sorted(map(key, a)) == sorted(map(key, b)), scorer


def test_search_scored_mixed_conjunctive_served(eng):
    """The kernel path carries conjunctive-ness per query, so mixed
    OR/AND batches serve in one pass (the relational path's shared-flag
    restriction is gone — full parity in test_scored_kernel.py)."""
    rows = eng.search_scored(
        ["data join", "+data join"], scorer="qld"
    ).collect()
    assert {r["query_id"] for r in rows} == {0, 1}


def test_search_negation_string_syntax(eng, spark, sf_dir):
    """'-term' through the facade: no result doc contains the negated
    term; scores equal the positive-terms-only query on the same docs."""
    from pisa_spark.corpus import tokens_col

    rows = eng.search("data join -the", k=10, two_phase=False).collect()
    assert rows
    docs_with_the = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", tokens_col(F.col("text")).alias("t"))
        .filter(F.array_contains("t", "the"))
        .collect()
    }
    assert all(r["doc_id"] not in docs_with_the for r in rows)
    plain = {
        r["doc_id"]: r["score"]
        for r in eng.search("data join", k=500, two_phase=False).collect()
    }
    for r in rows:
        assert abs(plain[r["doc_id"]] - r["score"]) < 1e-9
