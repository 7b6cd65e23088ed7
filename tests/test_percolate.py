"""Percolation / reverse search (query/percolate.py): hand-corpus
witness across all three match modes, distinct-term semantics,
never-matching shapes."""

import pytest

from pisa_spark.query.percolate import percolate

DOCS = [
    (0, "data join data table"),
    (1, "the the the"),
    (2, "query scan spark join"),
    (3, ""),
]
QUERIES = [
    (0, "data"), (0, "join"),       # conjunctive pair -> doc 0 only
    (1, "the"),                      # singleton -> doc 1
    (2, "scan"), (2, "zzz"),         # half-present pair
    (3, "data"), (3, "data"),        # duplicate term counts once
]


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        spark.createDataFrame(QUERIES, "query_id int, term string"),
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["n_matched"], r["n_terms"])
        for r in df.collect()
    )


def test_all_mode_matches_witness(frames):
    docs, qdf = frames
    assert _rows(percolate(docs, qdf, mode="all")) == [
        (0, 0, 2, 2),   # data+join both in doc 0
        (1, 1, 1, 1),   # the in doc 1
        (3, 0, 1, 1),   # duplicate 'data data' counted once
    ]


def test_any_mode_and_min_match(frames):
    docs, qdf = frames
    any_rows = _rows(percolate(docs, qdf, mode="any"))
    # q2 now matches doc 2 on 'scan' alone
    assert (2, 2, 1, 2) in any_rows
    # explicit min_match=2 keeps only fully-matched pairs of q0
    mm = _rows(percolate(docs, qdf, min_match=2))
    assert mm == [(0, 0, 2, 2)]
    # min_match above any query size matches nothing
    assert _rows(percolate(docs, qdf, min_match=9)) == []


def test_mode_validation(frames):
    docs, qdf = frames
    with pytest.raises(ValueError):
        percolate(docs, qdf, mode="some")
