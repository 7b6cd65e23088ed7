"""Facet aggregation over result sets."""

from pisa_spark.query.facets import facet_counts


def test_facet_counts_melts_all_dims_and_keeps_nulls(spark):
    results = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 1)], "query_id int, doc_id long"
    )
    meta = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", None), (3, "de", "web")],
        "doc_id long, lang string, source string",
    )
    rows = {
        (r["query_id"], r["facet"], r["value"]): r["n"]
        for r in facet_counts(results, meta, ["lang", "source"]).collect()
    }
    assert rows[(0, "lang", "en")] == 2
    assert rows[(0, "lang", "de")] == 1
    assert rows[(0, "source", "web")] == 2
    assert rows[(0, "source", None)] == 1  # NULL facet kept as a bucket
    assert rows[(1, "lang", "en")] == 1
    assert len([k for k in rows if k[0] == 1]) == 2


def test_engine_search_faceted(spark, sf_dir, tmp_path_factory):
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path_factory.mktemp("facets") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=8, wave_size=8
    ).with_corpus(sf_dir)
    rows = eng.search_faceted("data join", ["lang"], k=10).collect()
    assert sum(r["n"] for r in rows) == 10
    assert all(r["facet"] == "lang" for r in rows)


# ---------------------------------------------------------------------------
# numeric histogram facet
# ---------------------------------------------------------------------------

def test_histogram_facet_bins_and_nulls(spark):
    from pisa_spark.query.facets import histogram_facet

    res = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 1)],
        "query_id int, doc_id long",
    )
    meta = spark.createDataFrame(
        [(1, 50), (2, 199), (3, 200), (4, None)],
        "doc_id long, n_chars int",
    )
    got = {
        (r["query_id"], r["bin_lo"]): r["n"]
        for r in histogram_facet(res, meta, "n_chars", 200).collect()
    }
    # [0,200) holds 50 and 199; [200,400) holds 200; NULL surfaced
    assert got == {(0, 0): 2, (0, 200): 1, (0, None): 1, (1, 0): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_facet(res, meta, "n_chars", 0)


def test_histogram_fractional_width_refuses(spark):
    from pisa_spark.query.facets import histogram_facet

    res = spark.createDataFrame([(0, 1)], "query_id int, doc_id long")
    meta = spark.createDataFrame([(1, 50)], "doc_id long, n_chars int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integer"):
        histogram_facet(res, meta, "n_chars", 0.5)
