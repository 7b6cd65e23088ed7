"""Stopword artifact + stopped serving (query/stopwords.py): cut
boundary == the idf sign, strip/fallback pins, persistence pickup,
serving identities."""

import math

import pytest
from pyspark.sql import functions as F

from pisa_spark.engine import SearchEngine
from pisa_spark.query.stopwords import (
    stopword_cut,
    stopword_list,
    strip_stopwords,
)


def test_cut_matches_idf_sign():
    # stopword iff df > cut iff BM25 idf < 0, for even and odd N
    for n in (500, 501, 7):
        cut = stopword_cut(n)
        for df in range(1, n + 1):
            idf = math.log((n - df + 0.5) / (df + 0.5))
            assert (df > cut) == (idf < 0), (n, df)


def test_strip_and_fallback_pins():
    stop = {"the", "of"}
    qs = [
        {"query_id": 0, "terms": ["data", "the"], "conjunctive": False},
        {"query_id": 1, "terms": ["the", "of"], "conjunctive": False},
        {
            "query_id": 2,
            "terms": ["zzzz", "the"],
            "negated": ["of"],
            "conjunctive": False,
        },
    ]
    out = strip_stopwords(qs, stop)
    assert out[0]["terms"] == ["data"]
    # all-stop -> fallback to the original terms
    assert out[1]["terms"] == ["the", "of"]
    # absent term is NOT a stopword: kept, no fallback
    assert out[2]["terms"] == ["zzzz"]
    # negation rides through untouched
    assert out[2]["negated"] == ["of"]
    # inputs not mutated
    assert qs[0]["terms"] == ["data", "the"]


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stopw") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)


def test_list_is_negative_idf_set(eng):
    n = int(eng.stats["n_docs"])
    sw = {
        r["term"]: r["df"]
        for r in stopword_list(eng.postings, n).collect()
    }
    all_df = {
        r["term"]: r["df"]
        for r in eng.postings.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .collect()
    }
    for t, df in all_df.items():
        idf = math.log((n - df + 0.5) / (df + 0.5))
        assert (t in sw) == (idf < 0), t


def test_search_stopped_identities(eng):
    # mixed query: stripping 'the' leaves 'dup' — identical to
    # searching 'dup' directly
    a = sorted(
        (r["rank"], r["doc_id"])
        for r in eng.search_stopped("dup the", k=10).collect()
    )
    b = sorted(
        (r["rank"], r["doc_id"])
        for r in eng.search("dup", k=10).collect()
    )
    assert a == b and a
    # all-stop query falls back to unstripped serving
    c = sorted(
        (r["rank"], r["doc_id"])
        for r in eng.search_stopped("the", k=10).collect()
    )
    d = sorted(
        (r["rank"], r["doc_id"])
        for r in eng.search("the", k=10).collect()
    )
    assert c == d and c
    # absent + stop: absent term kept, matches nothing
    assert eng.search_stopped("zzzzzz the", k=10).count() == 0


def test_persisted_table_pickup(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stopw_p") / "idx")
    e1 = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    tbl = e1.precompute_stopwords(persist=True)
    want = {r["term"] for r in tbl.select("term").collect()}
    fresh = SearchEngine.load(spark, root)
    assert fresh._stopword_set() == want
    # serving through the persisted set matches the derived set
    a = sorted(
        (r["rank"], r["doc_id"])
        for r in fresh.search_stopped("dup the", k=10).collect()
    )
    b = sorted(
        (r["rank"], r["doc_id"])
        for r in e1.search_stopped("dup the", k=10).collect()
    )
    assert a == b


def test_deleted_pseudo_term_never_in_dictionaries(spark, sf_dir, tmp_path_factory):
    """The '__deleted__' tombstone pseudo-term must not leak into the
    suggest/autocomplete dictionary or the stopword list."""
    root = str(tmp_path_factory.mktemp("delveto") / "idx")
    e = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    e.delete_docs(list(range(0, 400)), persist=False)  # df('__deleted__') > N/2
    sw = {
        r["term"]
        for r in stopword_list(e.postings, int(e.stats["n_docs"])).collect()
    }
    assert "__deleted__" not in sw
    assert all(
        r["term"] != "__deleted__"
        for r in e.autocomplete("_", n=10).collect()
    )
    assert all(
        r["term"] != "__deleted__"
        for r in e.suggest(["_deleted_"], n=10, max_dist=2).collect()
    )
