"""Keyset pagination (engine.search_after): continuation identity
with the global order, tie-cursor correctness, deletes/negation
composition, refusals."""

import pytest

from pisa_spark.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("after") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)


def _rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(df.collect(), key=lambda r: r["rank"])
    ]


def test_pages_tile_the_global_order(eng):
    full = _rows(eng.search("data join", k=30))
    page = _rows(eng.search_after("data join", k=10))
    assert [(d, s) for _, d, s in page] == [(d, s) for _, d, s in full[:10]]
    # walk three pages by cursor (passing back exactly what the engine
    # returned) and compare to the full order
    seen = []
    after = None
    for _ in range(3):
        rows = sorted(
            eng.search_after("data join", k=10, after=after).collect(),
            key=lambda r: r["rank"],
        )
        if not rows:
            break
        seen.extend((r["doc_id"], round(r["score"], 6)) for r in rows)
        after = (rows[-1]["score"], rows[-1]["doc_id"])
    assert seen == [(d, s) for _, d, s in full[: len(seen)]]


def test_tie_cursor_advances_by_doc_id(spark, tmp_path_factory):
    # identical docs -> identical scores; the cursor must advance
    # through the tie block by doc_id
    docs = spark.createDataFrame(
        [(i, "same words here") for i in range(7)] + [(9, "other text")],
        "doc_id long, text string",
    )
    import os

    d = str(tmp_path_factory.mktemp("tie"))
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    root = os.path.join(d, "idx")
    e = SearchEngine.build(spark, d, root, n_buckets=2, wave_size=8)
    p1 = sorted(
        e.search_after("same words", k=3).collect(), key=lambda r: r["rank"]
    )
    after = (p1[-1]["score"], p1[-1]["doc_id"])
    p2 = sorted(
        e.search_after("same words", k=3, after=after).collect(),
        key=lambda r: r["rank"],
    )
    ids = [r["doc_id"] for r in p1] + [r["doc_id"] for r in p2]
    assert ids == [0, 1, 2, 3, 4, 5]


def test_negation_and_deletes_compose(eng, spark, sf_dir, tmp_path_factory):
    res = eng.search_after("data -join", k=20).collect()
    joined = {r["doc_id"] for r in eng.search("join", k=1000).collect()}
    assert res and all(r["doc_id"] not in joined for r in res)
    root = str(tmp_path_factory.mktemp("after_del") / "idx")
    e = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    top = sorted(
        e.search_after("data", k=1).collect(), key=lambda r: r["rank"]
    )[0]["doc_id"]
    e.delete_docs([int(top)], persist=False)
    assert top not in {
        r["doc_id"] for r in e.search_after("data", k=10).collect()
    }


def test_refusals(eng):
    with pytest.raises(ValueError, match="filter"):
        eng.search_after({"terms": ["data"], "filter": [["lang:en"]]})
    with pytest.raises(ValueError, match="at least one term"):
        eng.search_after({"terms": []})


def test_conjunctive_and_phrase_refusals(eng):
    with pytest.raises(ValueError, match="disjunctive-only"):
        eng.search_after("+data join")
    with pytest.raises(ValueError, match="quoted"):
        eng.search_after('"data join"')
