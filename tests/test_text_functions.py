"""Text-analysis function unit tests on hand-built rows."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.functions.text import (
    content_fingerprint,
    doc_profile,
    langid_heuristic,
    quality_score,
    subword_count_estimate,
    token_count,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "The cat and the dog, of course!"),
        (1, "der hund und die katze ist von den"),
        (2, "xyzzy qwerty plugh"),
        (3, ""),
        (4, "el perro y la casa es para los gatos"),
        (5, "internationalization antidisestablishmentarianism"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(tiny):
    got = {r["doc_id"]: r["n"] for r in tiny.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert got == {0: 7, 1: 8, 2: 3, 3: 0, 4: 9, 5: 2}


def test_subword_estimate_exceeds_tokens_for_long_words(tiny):
    got = {r["doc_id"]: r["n"] for r in tiny.select(
        "doc_id", subword_count_estimate(F.col("text")).alias("n")).collect()}
    # "internationalization"(20) -> +4, "antidisestablishmentarianism"(28) -> +6
    assert got[5] == 2 + 4 + 6
    assert got[3] == 0


def test_langid(tiny):
    got = {r["doc_id"]: r["l"] for r in tiny.select(
        "doc_id", langid_heuristic(F.col("text")).alias("l")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[4] == "es"
    assert got[2] == "und"
    assert got[3] == "und"


def test_quality_bounds_and_empty(tiny):
    got = {r["doc_id"]: r["q"] for r in tiny.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    for v in got.values():
        assert 0.0 <= v <= 1.0
    # empty text: every component zero (rep defined as 1 for n=0)
    assert got[3] == pytest.approx(0.0)


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello,   World!"), (1, "hello world"), (2, "hello  world.")],
        "doc_id long, text string",
    )
    fps = [r["f"] for r in df.select(content_fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_doc_profile_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = doc_profile(docs)
    assert [f.name for f in prof.schema.fields] == [
        "doc_id", "n_tokens", "n_subwords", "lang_guess", "quality", "fingerprint"
    ]
    assert prof.count() == docs.count()


def test_winnowing_guarantee_and_compression(spark):
    """Winnowing contract: docs sharing a token run of >= k+w-1 share
    at least one fingerprint; the selected set is ~1/w of all k-grams."""
    from pisa_spark.functions.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = k+w-1
    docs = spark.createDataFrame(
        [
            (0, "one two three " + shared + " four five six"),
            (1, "seven eight nine ten " + shared + " eleven"),
            (2, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared run produced no common fingerprint"
    assert not (by_doc[0] & by_doc[2])
    # compression: far fewer fingerprints than k-grams
    n_tokens = 14
    n_grams = n_tokens - 4
    assert len(by_doc[0]) < n_grams


def test_collocations_pmi_hand_computed(spark):
    from pyspark.sql import functions as F

    from pisa_spark.functions.text import collocations_pmi

    # 'new york' always adjacent (5x); 'the cat' adjacent 5x but both
    # words are common elsewhere -> lower PMI
    docs = [
        (i, ["new", "york", "the", "cat", "the", "dog"]) for i in range(5)
    ]
    toks = spark.createDataFrame(docs, "doc_id long, tokens array<string>")
    rows = {
        (r["a"], r["b"]): r for r in collocations_pmi(toks, min_count=5).collect()
    }
    import math

    n_tok = 30
    n_big = 25
    ny = rows[("new", "york")]
    assert ny["n_ab"] == 5
    want = math.log((5 / n_big) / ((5 / n_tok) * (5 / n_tok)))
    assert abs(ny["pmi"] - round(want, 6)) < 1e-9
    # 'the cat' PMI < 'new york' PMI ('the' appears 10x)
    assert rows[("the", "cat")]["pmi"] < ny["pmi"]
