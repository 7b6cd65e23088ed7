"""jusText-lite boilerplate classification (functions/boilerplate.py):
class rules, context propagation, strip reassembly."""

import pytest

from pisa_spark.functions.boilerplate import (
    boilerplate_strip,
    justext_classify,
    paragraph_features,
)

STOP = ["the", "a", "of", "and", "is"]

DOCS = [
    # doc 0: good (long, stopwordy) / short-next-to-good / bad (no stops)
    (0, "the cat sat on the mat and the dog is under a tree today\n"
        "the cat is happy\n"
        "menu login signup"),
    # doc 1: short between two bads -> bad; trailing good
    (1, "nav bar\n"
        "the dog\n"
        "click here now\n"
        "the quick brown fox and the lazy dog of the farm is running far"),
    # doc 2: empty paragraph classifies bad
    (2, "\nthe bird is in the sky and the sun is high above of it all"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _classes(df):
    out = {}
    for r in df.collect():
        out[(r["doc_id"], r["pos"])] = (r["core"], r["final"])
    return out


def test_features(spark, docs):
    feats = {
        (r["doc_id"], r["pos"]): (r["n_words"], round(r["stop_ratio"], 4))
        for r in paragraph_features(docs, STOP).collect()
    }
    assert feats[(0, 2)] == (3, 0.0)          # no stopwords
    assert feats[(2, 0)] == (0, 0.0)          # empty paragraph
    n, ratio = feats[(0, 0)]
    assert n == 14 and ratio == round(6 / 14, 4)


def test_classes_and_context(spark, docs):
    got = _classes(justext_classify(docs, STOP, s_low=0.25, l_long=10))
    # doc 0: long stopwordy -> good; 'the cat is happy' short, next to
    # good -> good; no-stopword menu line -> bad
    assert got[(0, 0)] == ("good", "good")
    assert got[(0, 1)] == ("short", "good")
    assert got[(0, 2)] == ("bad", "bad")
    # doc 1: 'the dog' is short between bads... but its NEXT core is
    # bad and prev core is bad -> bad; final long line -> good
    assert got[(1, 0)] == ("bad", "bad")
    assert got[(1, 1)][0] == "short"
    assert got[(1, 1)][1] == "bad"
    assert got[(1, 3)] == ("good", "good")
    # doc 2: empty paragraph bad; long line good
    assert got[(2, 0)] == ("bad", "bad")
    assert got[(2, 1)] == ("good", "good")


def test_strip_reassembles_in_order(spark, docs):
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_strip(
            docs, STOP, s_low=0.25, l_long=10
        ).collect()
    }
    assert out[0] == (
        "the cat sat on the mat and the dog is under a tree today\n"
        "the cat is happy"
    )
    assert out[1] == (
        "the quick brown fox and the lazy dog of the farm is running far"
    )
    # every doc survives, even if emptied
    assert set(out) == {0, 1, 2}
