"""Phrase/proximity x attribute-filter/negation composition (r4
verdict item #5): the positional kernels gate the candidate set with
the same bucket-local include/exclude machinery as the term kernels.
Every test checks BOTH membership (filtered == unfiltered ∩ allowed)
and score identity (pseudo-terms never score)."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import attribute_tokens_col, build_postings
from pisa_spark.query.bm25 import (
    bm25_mixed_topk,
    bm25_near_topk,
    bm25_phrase_topk,
)

DOCS = [
    # (doc_id, text, lang)
    (0, "order fast data join order fast", "en"),
    (1, "order fast the data", "de"),
    (2, "data order fast join query", "en"),
    (3, "order slow data fast order", "en"),   # no exact phrase
    (4, "the order fast", "fr"),
    (5, "order fast order fast data", "de"),
    (6, "join order fast data the", "en"),
]


@pytest.fixture(scope="module")
def built(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    toks = docs.select(
        "doc_id", "lang", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    toks = toks.withColumn(
        "tokens", F.concat("tokens", attribute_tokens_col(["lang"]))
    ).select("doc_id", "tokens", "doc_len")
    r = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    postings = build_postings(
        toks, int(r["n"]), float(r["avgdl"]), n_buckets=3, block_size=2,
        with_positions=True,
    ).cache()
    return postings, int(r["n"]), float(r["avgdl"])


def _by_doc(rows):
    return {r["doc_id"]: round(r["score"], 9) for r in rows}


def _ids(pred):
    return {d for d, _, lang in DOCS if pred(lang)}


def test_phrase_filter_and_negation(built):
    postings, n_docs, avgdl = built
    base_q = {"query_id": 0, "terms": ["order", "fast"]}
    base = _by_doc(
        bm25_phrase_topk(postings, [dict(base_q)], n_docs, avgdl, k=10)
        .collect()
    )
    assert set(base) == {0, 1, 2, 4, 5, 6}  # doc 3 has no exact phrase
    filt = _by_doc(
        bm25_phrase_topk(
            postings, [dict(base_q, filter=["lang:en"])], n_docs, avgdl,
            k=10,
        ).collect()
    )
    assert set(filt) == set(base) & _ids(lambda l: l == "en")
    assert all(filt[d] == base[d] for d in filt)
    neg = _by_doc(
        bm25_phrase_topk(
            postings, [dict(base_q, negated=["the"])], n_docs, avgdl, k=10
        ).collect()
    )
    has_the = {d for d, txt, _ in DOCS if "the" in txt.split()}
    assert set(neg) == set(base) - has_the
    assert all(neg[d] == base[d] for d in neg)
    # filter + negation together
    both = _by_doc(
        bm25_phrase_topk(
            postings,
            [dict(base_q, filter=["lang:en"], negated=["the"])],
            n_docs, avgdl, k=10,
        ).collect()
    )
    assert set(both) == (set(base) & _ids(lambda l: l == "en")) - has_the
    assert all(both[d] == base[d] for d in both)


def test_near_and_mixed_filtered(built):
    postings, n_docs, avgdl = built
    nq = {"query_id": 0, "terms": ["order", "data"]}
    base = _by_doc(
        bm25_near_topk(
            postings, [dict(nq)], n_docs, avgdl, k=10, window=4
        ).collect()
    )
    filt = _by_doc(
        bm25_near_topk(
            postings, [dict(nq, filter=["lang:en"])], n_docs, avgdl,
            k=10, window=4,
        ).collect()
    )
    assert filt and set(filt) == set(base) & _ids(lambda l: l == "en")
    assert all(filt[d] == base[d] for d in filt)
    mq = {"query_id": 0, "terms": ["order", "fast"], "extra_terms": ["data"]}
    mbase = _by_doc(
        bm25_mixed_topk(postings, [dict(mq)], n_docs, avgdl, k=10).collect()
    )
    mfilt = _by_doc(
        bm25_mixed_topk(
            postings, [dict(mq, filter=["lang:de"])], n_docs, avgdl, k=10
        ).collect()
    )
    assert mfilt and set(mfilt) == set(mbase) & _ids(lambda l: l == "de")
    assert all(mfilt[d] == mbase[d] for d in mfilt)


def test_facade_phrase_filtered_end_to_end(spark, sf_dir, tmp_path_factory):
    """search_filtered('\"…\"', {…}) and search('\"…\" lang-dict') route
    through the positional kernel with the include intersection; parity
    against the unfiltered phrase restricted to matching docs."""
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("pf") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=8, wave_size=8,
        with_positions=True, attribute_cols=["lang"],
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    en_ids = set(docs[docs.lang == "en"].doc_id)
    base = _by_doc(eng.search_phrase("order fast", k=100).collect())
    got = _by_doc(
        eng.search_filtered('"order fast"', {"lang": "en"}, k=100).collect()
    )
    assert got and set(got) == set(base) & en_ids
    assert all(got[d] == base[d] for d in got)
    # dict-query form through search() directly
    via_search = _by_doc(
        eng.search(
            {"phrases": [["order", "fast"]], "terms": [],
             "filter": ["lang:en"]},
            k=100,
        ).collect()
    )
    assert via_search == got
    # negation beside a phrase through the string syntax
    neg = _by_doc(eng.search('"order fast" -the', k=100).collect())
    base_mixed = _by_doc(eng.search('"order fast"', k=100).collect())
    the_ids = {
        r["doc_id"]
        for r in eng.search("the", k=10000).collect()
    }
    assert set(neg) == set(base_mixed) - the_ids
    assert all(neg[d] == base_mixed[d] for d in neg)
