"""k-gram general wildcards: gram extraction, candidate-conjunction
equivalence with the brute-force regex scan, leading/infix parity with
the manually-expanded disjunction, cap determinism, fallback path."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import build_postings
from pisa_spark.query.bm25 import bm25_topk_wand
from pisa_spark.query.fuzzy import wildcard_topk
from pisa_spark.query.kgram import (
    expand_patterns,
    kgram_table,
    pattern_grams,
    pattern_regex,
)

DOCS = [
    (0, "data database join customer"),
    (1, "date data dawn order"),
    (2, "join merge scan filter"),
    (3, "database date scan join sort"),
    (4, "dawn dawn dawn salt"),
    (5, "merge data filter"),
]

VOCAB = sorted({t for _, text in DOCS for t in text.split()})


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    r = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    postings = build_postings(
        toks, int(r["n"]), float(r["avgdl"]), n_buckets=3, block_size=2
    ).cache()
    return postings, int(r["n"]), float(r["avgdl"])


@pytest.fixture(scope="module")
def vocab(spark, built):
    postings, _, _ = built
    return (
        postings.filter(~F.col("term").contains(":"))
        .groupBy("term")
        .agg(F.sum("n").alias("df"))
        .cache()
    )


def test_pattern_grams_forms():
    assert pattern_grams("red*", 2) == ["$r", "ed", "re"]
    assert pattern_grams("*tion", 3) == ["ion", "on$", "tio"]
    assert pattern_grams("s*t", 2) == ["$s", "t$"]
    assert pattern_grams("*a*", 2) == []  # all segments shorter than k
    with pytest.raises(ValueError):
        pattern_grams("plain", 2)


def test_kgram_table_anchored(spark):
    v = spark.createDataFrame([("ab",)], "term string")
    got = {r["gram"] for r in kgram_table(v, 2).collect()}
    assert got == {"$a", "ab", "b$"}


def _brute(pat):
    import re

    rx = re.compile(pattern_regex(pat))
    return [t for t in VOCAB if rx.match(t)]


@pytest.mark.parametrize(
    "pat", ["*er", "s*t", "da*", "*a*", "*ta", "d*a*e", "*merge*"]
)
def test_expand_patterns_equals_brute_force(vocab, pat):
    got = set(expand_patterns(vocab, [pat], max_expand=64)[pat])
    assert got == set(_brute(pat)), pat


def test_expand_patterns_cap_order(vocab):
    # df order: data=3 > database=2 = date=2 = dawn=2 (term ASC ties)
    full = expand_patterns(vocab, ["d*"], max_expand=64)["d*"]
    assert full == ["data", "database", "date", "dawn"]
    assert expand_patterns(vocab, ["d*"], max_expand=2)["d*"] == [
        "data",
        "database",
    ]


def test_leading_wildcard_topk_equals_manual(built):
    postings, n_docs, avgdl = built
    got = wildcard_topk(
        postings,
        [{"query_id": 0, "terms": [], "wildcards": ["*er"]}],
        n_docs,
        avgdl,
        k=10,
    ).collect()
    want = bm25_topk_wand(
        postings,
        [{
            "query_id": 0,
            "terms": _brute("*er"),  # customer, filter, order
            "conjunctive": False,
        }],
        n_docs,
        avgdl,
        k=10,
    ).collect()
    key = lambda rows: [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    ]
    assert key(got) == key(want)
    assert len(got) > 0


def test_infix_and_prefix_mix_in_one_query(built):
    postings, n_docs, avgdl = built
    got = wildcard_topk(
        postings,
        [{"query_id": 1, "terms": ["join"], "wildcards": ["s*t", "da*"]}],
        n_docs,
        avgdl,
        k=10,
    ).collect()
    want = bm25_topk_wand(
        postings,
        [{
            "query_id": 1,
            "terms": list(
                dict.fromkeys(
                    ["join"] + _brute("s*t") + ["data", "database", "date", "dawn"]
                )
            ),
            "conjunctive": False,
        }],
        n_docs,
        avgdl,
        k=10,
    ).collect()
    key = lambda rows: [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    ]
    assert key(got) == key(want)


def test_bare_star_raises(built):
    postings, n_docs, avgdl = built
    with pytest.raises(ValueError):
        wildcard_topk(
            postings,
            [{"query_id": 0, "terms": [], "wildcards": ["*"]}],
            n_docs,
            avgdl,
        )


def test_engine_facade_leading_wildcard(spark, built):
    from pisa_spark.engine import SearchEngine

    postings, n_docs, avgdl = built
    eng = SearchEngine(
        spark, postings, {"n_docs": n_docs, "avgdl": avgdl}
    )
    got = eng.search_wildcard("*er join", k=5).collect()
    assert len(got) > 0
    # docs 0/1 match the rare '*er' expansions (customer, order) and
    # outrank the join-only docs (df(join)=3 of 6 -> idf exactly 0)
    assert {got[0]["doc_id"], got[1]["doc_id"]} == {0, 1}
    assert got[0]["score"] > 0


def test_expand_patterns_with_precomputed_table(spark, vocab):
    from pisa_spark.query.kgram import KGRAM_K

    kt = kgram_table(vocab, KGRAM_K).select("gram", "term", "df").cache()
    for pat in ["*er", "s*t", "d*a*e"]:
        a = expand_patterns(vocab, [pat], max_expand=64)[pat]
        b = expand_patterns(None, [pat], max_expand=64, kgrams=kt)[pat]
        assert a == b, pat
    # gram-less pattern without vocab must refuse, with vocab must work
    import pytest as _pt

    with _pt.raises(ValueError, match="gram-less"):
        expand_patterns(None, ["*a*"], kgrams=kt)
    assert set(expand_patterns(vocab, ["*a*"], kgrams=kt)["*a*"]) == set(
        _brute("*a*")
    )


def test_engine_precomputed_kgrams_serving(spark, sf_dir, tmp_path):
    from pisa_spark.engine import SearchEngine
    from pisa_spark.query.kgram import KGRAM_TABLE
    from pisa_spark.sources import catalog

    root = str(tmp_path / "idx_kg")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)
    base = eng.search_wildcard("*up", k=5).toPandas()  # vocab path
    kt = eng.precompute_kgrams()
    assert catalog.table_exists(root, KGRAM_TABLE)
    assert {"gram", "term", "df"} <= set(kt.columns)
    primed = eng.search_wildcard("*up", k=5).toPandas()  # table path
    assert primed.values.tolist() == base.values.tolist()
    # a FRESH load picks the table up automatically
    fresh = SearchEngine.load(spark, root)
    again = fresh.search_wildcard("*up", k=5).toPandas()
    assert fresh._kgram_df is not None
    assert again.values.tolist() == base.values.tolist()
