"""Spell-corrected serving (engine.search_corrected): replacement,
control, uncorrectable-kept and collision-dedupe identities."""

import pytest

from pisa_spark.engine import SearchEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corrected") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


def test_oov_terms_get_corrected(eng):
    got = _rows(eng.search_corrected("dta join", k=10))
    want = _rows(eng.search_batch(["data join"], k=10))
    assert got == want and got


def test_in_vocabulary_never_touched(eng):
    # 'dup' is close to plenty of terms but IS in the dictionary
    got = _rows(eng.search_corrected("dup", k=10))
    want = _rows(eng.search_batch(["dup"], k=10))
    assert got == want


def test_uncorrectable_term_is_kept(eng):
    got = _rows(eng.search_corrected("data zzzzzzqq", k=10))
    want = _rows(eng.search_batch(["data"], k=10))
    # the garbage term matches nothing, so the ranking equals 'data'
    assert got == want


def test_correction_collision_dedupes(eng):
    got = _rows(eng.search_corrected("dta data", k=10))
    want = _rows(eng.search_batch(["data"], k=10))
    assert got == want
