"""Numeric range filters: precision-step cover correctness (fuzzed),
index round-trip, WAND include semantics, facade ranges."""

import random

import pytest
from pyspark.sql import functions as F

from pisa_spark.index.numeric import (
    MAX_BITS,
    STEP,
    _cover,
    numeric_tokens_col,
    range_terms,
)


def _decode_cover(cells):
    vals = set()
    for shift, c in cells:
        vals.update(range(c << shift, ((c + 1) << shift)))
    return vals


def test_cover_fuzz_exact_and_disjoint():
    rng = random.Random(7)
    cases = [(0, 0), (0, 15), (1, 16), (5, 5), (0, 255), (17, 4097)]
    for _ in range(300):
        lo = rng.randrange(0, 5000)
        hi = lo + rng.randrange(0, 5000)
        cases.append((lo, hi))
    for lo, hi in cases:
        cells = _cover(lo, hi, 0)
        total = sum(1 << s for s, _ in cells)
        vals = _decode_cover(cells)
        assert len(vals) == total, (lo, hi)      # disjoint
        assert vals == set(range(lo, hi + 1)), (lo, hi)  # exact
        assert len(cells) <= 2 * ((1 << STEP) - 1) * (MAX_BITS // STEP)


def test_cover_full_domain_and_clamp():
    assert range_terms("x", -5, -1) == []
    full = _cover(0, (1 << MAX_BITS) - 1, 0)
    # full domain = the 2^STEP coarsest cells, no per-value explosion
    assert sum(1 << s for s, _ in full) == 1 << MAX_BITS
    assert len(full) == 1 << STEP
    # clamping: hi above the domain behaves as the domain max
    assert range_terms("x", 0, 1 << 40) == [
        f"x#{s}:{c}" for s, c in full
    ]


def test_numeric_tokens_round_trip(spark):
    """Every value's pseudo-terms intersect a range's terms iff the
    value is in the range — checked exhaustively on a value grid."""
    rows = [(i, v) for i, v in enumerate([0, 1, 7, 16, 99, 100, 255,
                                          256, 4095, 4096, 70000])]
    df = spark.createDataFrame(rows, "doc_id long, nv long")
    toks = {
        r["doc_id"]: set(r["t"])
        for r in df.select(
            "doc_id", numeric_tokens_col("nv").alias("t")
        ).collect()
    }
    vals = dict(rows)
    for lo, hi in [(0, 0), (1, 100), (100, 4096), (256, 69999),
                   (70000, 70000), (4097, 4100)]:
        cover = set(range_terms("nv", lo, hi))
        matched = {d for d, ts in toks.items() if ts & cover}
        want = {d for d, v in vals.items() if lo <= v <= hi}
        assert matched == want, (lo, hi)


def test_null_and_negative_index_nothing(spark):
    df = spark.createDataFrame(
        [(0, None), (1, -3), (2, 5)], "doc_id long, nv long"
    )
    got = df.select(
        "doc_id", F.size(numeric_tokens_col("nv")).alias("n")
    ).collect()
    assert {r["doc_id"]: r["n"] for r in got} == {0: 0, 1: 0, 2: MAX_BITS // STEP}


@pytest.fixture(scope="module")
def built(spark):
    from pisa_spark.corpus import tokens_col
    from pisa_spark.index.build import build_postings

    docs = spark.createDataFrame(
        [
            (0, "data join table", 10),
            (1, "data join scan", 120),
            (2, "data query", 121),
            (3, "join data data", 4000),
            (4, "data", 65536),
            (5, "join data", None),
        ],
        "doc_id long, text string, n_chars long",
    )
    toks = docs.select(
        "doc_id", "n_chars", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    toks = toks.withColumn(
        "tokens", F.concat("tokens", numeric_tokens_col("n_chars"))
    ).select("doc_id", "tokens", "doc_len")
    r = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    postings = build_postings(
        toks, int(r["n"]), float(r["avgdl"]), n_buckets=3, block_size=2
    ).cache()
    return postings, int(r["n"]), float(r["avgdl"])


@pytest.mark.parametrize(
    "lo,hi,want",
    [
        (0, 100, {0}),
        (100, 200, {1, 2}),
        (121, 121, {2}),
        (10, 65536, {0, 1, 2, 3, 4}),
        (65537, 10**6, set()),
        (0, 10**6, {0, 1, 2, 3, 4}),  # null n_chars never matches
    ],
)
def test_range_include_in_wand(built, lo, hi, want):
    from pisa_spark.query.bm25 import bm25_topk_wand

    postings, n_docs, avgdl = built
    got = bm25_topk_wand(
        postings,
        [{"query_id": 0, "terms": ["data", "join"], "conjunctive": False,
          "filter": [range_terms("n_chars", lo, hi)]}],
        n_docs, avgdl, k=10,
    ).collect()
    assert {r["doc_id"] for r in got} == want, (lo, hi)


def test_facade_range_filter(spark, sf_dir, tmp_path_factory):
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("nidx"))
    eng = SearchEngine.build(
        spark, sf_dir, root, attribute_cols=["lang"],
        numeric_cols=["n_chars"],
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    lo, hi = 200, 900
    want_ids = set(
        docs[(docs.n_chars >= lo) & (docs.n_chars <= hi)
             & (docs.lang == "en")].doc_id
    )
    got = eng.search_filtered(
        "data join", {"lang": "en", "n_chars": (lo, hi)}, k=100
    ).toPandas()
    assert len(got) > 0 and set(got.doc_id) <= want_ids
    # scores untouched by filtering
    base = eng.search("data join", k=1000).toPandas().set_index("doc_id")
    for r in got.itertuples():
        assert r.score == base.loc[r.doc_id, "score"]
    # range over a column not indexed numerically raises
    with pytest.raises(ValueError, match="not indexed"):
        eng.search_filtered("data", {"doc_id": (0, 5)})
