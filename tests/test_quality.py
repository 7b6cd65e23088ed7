"""Unit tests for the web-curation quality operators (Gopher signals,
n-gram repetition, C4 line filter) and URL canonicalization, on
hand-built rows whose expected values are computed by eye — the
DuckDB gate covers the same operators at corpus scale."""

import datetime
import hashlib

import pytest
from pyspark.sql import functions as F

from pisa_spark.functions.quality import (
    c4_line_stats,
    gopher_signals,
    ngram_repetition,
)
from pisa_spark.functions.urls import (
    host_stats,
    registered_domain,
    url_canonical,
    url_dedup_latest,
    url_host,
)


@pytest.fixture(scope="module")
def webdocs(spark):
    good = (
        "The quick brown fox jumps over the lazy dog and runs to be "
        "free of that old fence with great joy. " * 4
    ).strip()
    rows = [
        (0, good),
        # bullet/ellipsis heavy, short
        (1, "- first item\n- second item\nmaybe more...\nand on…"),
        # symbol heavy
        (2, "## ## heading ... and more ... dots #"),
        # repetition heavy
        (3, "spam ham spam ham spam ham spam ham"),
        (4, ""),
        # C4-friendly page
        (
            5,
            "This is a proper sentence with an end.\n"
            "short line\n"
            "Please enable javascript to continue browsing now.\n"
            "Another good sentence follows right here!\n"
            "And a third one to clear the bar.",
        ),
        # brace + lorem page
        (6, "body { color: red }\nLorem ipsum dolor sit amet friends."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_signals(webdocs):
    got = _by_id(gopher_signals(webdocs))
    g0 = got[0]
    assert g0["n_words"] == 84 and g0["gopher_pass"] is True
    assert g0["frac_alpha_words"] == 1.0
    assert 3.0 <= g0["mean_word_len"] <= 10.0
    g1 = got[1]
    assert g1["frac_bullet_lines"] == 0.5
    assert g1["frac_ellipsis_lines"] == 0.5
    assert g1["gopher_pass"] is False  # too short, too many ellipses
    g2 = got[2]
    # 5 '#' chars + 2 '...' over the 4 alnum tokens (heading/and/more/dots)
    assert g2["symbol_word_ratio"] == round(7 / 4, 6)
    assert g2["gopher_pass"] is False
    g4 = got[4]
    assert g4["n_words"] == 0 and g4["gopher_pass"] is False
    # required-stopword rule: doc 0 has the/to/be/of/that/and/with
    assert g0["n_required_stopwords"] >= 6


def test_ngram_repetition(webdocs):
    got = _by_id(ngram_repetition(webdocs))
    # doc 3: "spam ham" x4 -> tc = 35 chars; top bigram "spam ham"
    # (8 chars) occurs 4x -> top2 = 32/35. 5-grams: "spam ham spam ham
    # spam" (22 chars) x2 and "ham spam ham spam ham" (21 chars) x2,
    # all duplicated -> dup5 = (2*22 + 2*21)/35 (overlaps counted per
    # occurrence, so > 1 by design)
    d3 = got[3]
    assert d3["top2_char_frac"] == round(4 * 8 / 35, 6)
    assert d3["dup5_char_frac"] == round((2 * 22 + 2 * 21) / 35, 6)
    assert d3["dup10_char_frac"] == 0.0  # only 8 tokens
    # empty doc scores zeros, present in output
    assert got[4]["top2_char_frac"] == 0.0
    # doc 0 repeats a 21-token sentence 4x: heavy dup10
    assert got[0]["dup10_char_frac"] > 0.9


def test_c4_line_stats(webdocs):
    got = _by_id(c4_line_stats(webdocs))
    d5 = got[5]
    # kept: lines 1, 4, 5 (short line: <3 words+no punct; javascript
    # line: dropped by keyword)
    assert d5["n_lines"] == 5 and d5["n_kept"] == 3
    assert d5["n_sentences"] == 3 and d5["c4_pass"] is True
    cleaned = (
        "This is a proper sentence with an end.\n"
        "Another good sentence follows right here!\n"
        "And a third one to clear the bar."
    )
    assert d5["cleaned_md5"] == hashlib.md5(cleaned.encode()).hexdigest()
    d6 = got[6]
    assert d6["has_brace"] is True and d6["has_lorem"] is True
    assert d6["c4_pass"] is False
    assert got[4]["n_lines"] == 0 and got[4]["n_kept"] == 0


@pytest.fixture(scope="module")
def crawl(spark):
    ts = datetime.datetime(2018, 1, 1)
    rows = [
        ("https://example1.test/p/a", ts, "one one", "en"),
        # same page, recrawled later via a messier URL
        (
            "http://WWW.Example1.test/p/a?utm_source=x#frag",
            ts + datetime.timedelta(hours=1),
            "one two",
            "en",
        ),
        ("https://example2.test/p/b/", ts, "three", "en"),
        ("https://example2.test/p/b", ts, "three", "en"),  # ts tie
        ("https://sub.example2.test/p/c", ts, "four", "en"),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )


def test_url_canonical_and_host(crawl):
    got = crawl.select(
        "url",
        url_canonical(F.col("url")).alias("c"),
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()
    by_url = {r["url"]: r for r in got}
    messy = by_url["http://WWW.Example1.test/p/a?utm_source=x#frag"]
    assert messy["c"] == "example1.test/p/a"
    assert messy["h"] == "example1.test"
    sub = by_url["https://sub.example2.test/p/c"]
    assert sub["h"] == "sub.example2.test"
    assert sub["d"] == "example2.test"
    assert by_url["https://example2.test/p/b/"]["c"] == "example2.test/p/b"


def test_url_dedup_latest(crawl):
    kept = {
        r["canonical_url"]: r for r in url_dedup_latest(crawl).collect()
    }
    assert len(kept) == 3
    # newest crawl wins for the recrawled page
    assert kept["example1.test/p/a"]["url"].startswith("http://WWW.")
    # warc_ts tie broken by url asc: no-trailing-slash sorts first
    assert kept["example2.test/p/b"]["url"] == "https://example2.test/p/b"


def test_host_stats(crawl):
    got = {r["host"]: r.asDict() for r in host_stats(crawl).collect()}
    assert got["example1.test"]["n_pages"] == 2
    assert got["example1.test"]["n_urls"] == 1  # same canonical url
    assert got["example2.test"]["n_urls"] == 1  # slash variants collapse
    assert got["sub.example2.test"]["n_pages"] == 1
    assert got["example1.test"]["total_chars"] == len("one one") + len(
        "one two"
    )
