"""Spelling suggestion (query/spell.py): brute-force Levenshtein
witness, gram-bound soundness across path shapes, table-vs-derived
gram parity, engine facade + pseudo-term exclusion."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.engine import SearchEngine
from pisa_spark.query.kgram import kgram_table
from pisa_spark.query.spell import anchored_grams, spell_suggestions

VOCAB = [
    ("data", 40),
    ("date", 12),
    ("dart", 3),
    ("gate", 12),  # df-tie with 'date' at dist 2 from 'dta' paths
    ("join", 25),
    ("joint", 7),
    ("coin", 7),
    ("query", 30),
    ("quarry", 2),
    ("spark", 20),
    ("spar", 4),
    ("stark", 4),
    ("the", 99),
    ("db", 5),
    ("dab", 1),
]


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def _witness(words, n=5, max_dist=2):
    out = {}
    for w in dict.fromkeys(words):
        cands = [
            (_lev(t, w), -df, t, df)
            for t, df in VOCAB
            if _lev(t, w) <= max_dist
        ]
        cands.sort()
        out[w] = [
            (i + 1, t, d, df)
            for i, (d, _, t, df) in enumerate(cands[:n])
        ]
    return out


@pytest.fixture(scope="module")
def vocab(spark):
    return spark.createDataFrame(VOCAB, "term string, df long").cache()


def _collect(df):
    got = {}
    for r in df.collect():
        got.setdefault(r["word"], []).append(
            (r["rank"], r["term"], r["dist"], r["df"])
        )
    return {w: sorted(rows) for w, rows in got.items()}


def test_matches_bruteforce_witness(vocab):
    # 'quary' and 'jion' ride the gram path (bound >= 1); 'db' and
    # 'xy' fall back to the length-banded scan; 'zzz' yields nothing
    words = ["quary", "jion", "dta", "db", "xy", "zzz", "data"]
    got = _collect(spell_suggestions(vocab, words, n=5, max_dist=2))
    want = {w: rows for w, rows in _witness(words).items() if rows}
    assert got == want


def test_exact_word_is_dist_zero_rank_one(vocab):
    got = _collect(spell_suggestions(vocab, ["spark"], n=3, max_dist=1))
    assert got["spark"][0] == (1, "spark", 0, 20)


def test_df_breaks_distance_ties_then_term(vocab):
    # 'qoin' -> dist 1 to both 'join'(25) and 'coin'(7): df DESC pins
    got = _collect(spell_suggestions(vocab, ["qoin"], n=2, max_dist=1))
    assert [t for _, t, _, _ in sorted(got["qoin"])] == ["join", "coin"]


def test_kgram_table_path_equals_derived(vocab):
    kt = kgram_table(vocab).select("gram", "term", "df")
    words = ["quary", "jion", "sparc", "db"]
    a = _collect(spell_suggestions(vocab, words, n=5, max_dist=2))
    b = _collect(
        spell_suggestions(vocab, words, n=5, max_dist=2, kgrams=kt)
    )
    assert a == b


def test_max_dist_one_shrinks_candidates(vocab):
    wide = _collect(spell_suggestions(vocab, ["quary"], n=10, max_dist=2))
    narrow = _collect(spell_suggestions(vocab, ["quary"], n=10, max_dist=1))
    assert set(t for _, t, _, _ in narrow.get("quary", [])) <= set(
        t for _, t, _, _ in wide["quary"]
    )
    for _, t, d, _ in narrow.get("quary", []):
        assert d <= 1


def test_anchored_grams_mirror():
    # same anchoring + distinctness as kgram_col
    assert anchored_grams("red") == ["$r", "re", "ed", "d$"]
    assert anchored_grams("aaa") == ["$a", "aa", "a$"]


def test_empty_words_raise(vocab):
    with pytest.raises(ValueError):
        spell_suggestions(vocab, [])


def test_engine_suggest_and_kgram_reuse(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spell") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    base = _collect(eng.suggest(["dta", "quary"], n=5, max_dist=2))
    # brute force over the engine's own dictionary
    vocab_rows = (
        eng.postings.groupBy("term")
        .agg(F.sum("n").alias("df"))
        .collect()
    )
    for w in ("dta", "quary"):
        cands = sorted(
            (_lev(r["term"], w), -r["df"], r["term"], int(r["df"]))
            for r in vocab_rows
            if _lev(r["term"], w) <= 2
        )[:5]
        want = sorted(
            (i + 1, t, d, df) for i, (d, _, t, df) in enumerate(cands)
        )
        assert base.get(w, []) == want
    # persisted k-gram table path serves identical suggestions
    eng.precompute_kgrams(persist=True)
    fresh = SearchEngine.load(spark, root)
    fresh.search_wildcard("dat*", k=1)  # trigger table pickup
    again = _collect(fresh.suggest(["dta", "quary"], n=5, max_dist=2))
    assert again == base


def test_engine_suggest_excludes_pseudo_terms(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spell_attr") / "idx")
    eng = SearchEngine.build(
        spark, sf_dir, root, n_buckets=4, wave_size=8,
        attribute_cols=["lang"],
    )
    # 'lang:en'-shaped pseudo-terms are in postings but never suggested
    got = eng.suggest(["lang"], n=10, max_dist=3).collect()
    assert all(":" not in r["term"] for r in got)


# ---------------------------------------------------------------------------
# autocomplete
# ---------------------------------------------------------------------------

def test_complete_prefix_semantics(vocab):
    from pisa_spark.query.spell import complete_prefix

    got = {}
    for r in complete_prefix(vocab, ["da", "q", "zz"], n=2).collect():
        got.setdefault(r["prefix"], []).append(
            (r["rank"], r["term"], r["df"])
        )
    # df DESC then term ASC within prefix
    assert sorted(got["da"]) == [(1, "data", 40), (2, "date", 12)]
    assert sorted(got["q"]) == [(1, "query", 30), (2, "quarry", 2)]
    assert "zz" not in got  # no matches -> no rows
    # duplicates collapse, empty prefixes raise
    assert (
        complete_prefix(vocab, ["da", "da"], n=2).count() == 2
    )
    with pytest.raises(ValueError):
        complete_prefix(vocab, [""])
    with pytest.raises(ValueError):
        complete_prefix(vocab, [])


def test_engine_autocomplete(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ac") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)
    rows = eng.autocomplete("da", n=3).collect()
    assert rows and all(r["term"].startswith("da") for r in rows)
    # matches the dictionary brute force
    vocab_rows = sorted(
        (
            (-r["df"], r["term"])
            for r in eng.postings.groupBy("term")
            .agg(F.sum("n").alias("df"))
            .collect()
            if r["term"].startswith("da")
        ),
    )[:3]
    want = [t for _, t in vocab_rows]
    got = [r["term"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == want
