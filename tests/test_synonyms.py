"""Synonym expansion: stem-mate derivation, weighted expansion
semantics, and facade == relation-path parity."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.query.synonyms import (
    expand_with_synonyms,
    stem_synonym_pairs,
    synonym_bm25_topk,
)


def test_stem_synonym_pairs_symmetric_no_identity(spark):
    vocab = spark.createDataFrame(
        [("table",), ("tables",), ("query",), ("queries",), ("spark",)],
        "term string",
    )
    pairs = {(r["term"], r["synonym"]) for r in stem_synonym_pairs(vocab).collect()}
    assert ("table", "tables") in pairs and ("tables", "table") in pairs
    assert ("query", "queries") in pairs and ("queries", "query") in pairs
    assert not any(a == b for a, b in pairs)
    assert not any("spark" in p for p in pairs)


def test_expand_max_merges_originals(spark):
    q = spark.createDataFrame(
        [(0, "table"), (0, "tables")], "query_id int, term string"
    )
    syn = spark.createDataFrame(
        [("table", "tables"), ("tables", "table")], "term string, synonym string"
    )
    got = {
        r["term"]: r["v"]
        for r in expand_with_synonyms(q, syn, weight=0.3).collect()
    }
    # both are originals AND each other's synonyms -> weight stays 1.0
    assert got == {"table": 1.0, "tables": 1.0}


def test_expansion_recalls_plural_only_docs(spark):
    docs = spark.createDataFrame(
        [(0, "the table is set"), (1, "many tables were set"), (2, "nothing")],
        "doc_id long, text string",
    )
    from pisa_spark.corpus import tokens_col
    from pisa_spark.index.build import term_frequencies

    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    tf = term_frequencies(toks)
    q = spark.createDataFrame([(0, "table")], "query_id int, term string")
    hits = {
        r["doc_id"]
        for r in synonym_bm25_topk(
            tf, q, int(row[0]), float(row[1]), k=10, weight=0.5
        ).collect()
    }
    assert hits == {0, 1}  # plain BM25 for 'table' would miss doc 1


def test_facade_matches_relation_path(spark, sf_dir, tmp_path_factory):
    from pisa_spark.corpus import tokens_col
    from pisa_spark.engine import SearchEngine
    from pisa_spark.index.build import term_frequencies

    root = str(tmp_path_factory.mktemp("syn") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    row = toks.agg(F.count(F.lit(1)), F.avg("doc_len")).collect()[0]
    tf = term_frequencies(toks)
    q = spark.createDataFrame(
        [(0, "data"), (0, "table")], "query_id int, term string"
    )
    want = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in synonym_bm25_topk(
            tf, q, int(row[0]), float(row[1]), k=10, weight=0.4
        ).collect()
    )
    got = sorted(
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in eng.search_synonyms("data table", k=10, weight=0.4).collect()
    )
    assert got == want
    with pytest.raises(ValueError, match="disjunctive"):
        eng.search_synonyms("data +table")
    # a quoted phrase must raise, not silently degrade to loose
    # synonym-expanded terms (same guard discipline as search_fuzzy)
    with pytest.raises(ValueError, match="phrase"):
        eng.search_synonyms('"data table" fast')

def test_stem_mates_table_committed_and_fallback_parity(
    spark, sf_dir, tmp_path_factory
):
    """The build commits the stem_mates dictionary (classes >= 2, no
    pseudo-terms) and the engine serves synonym expansion from it;
    an engine without an index root falls back to the postings-derived
    vocabulary with identical results."""
    from pisa_spark.engine import SearchEngine
    from pisa_spark.index.lineage import SYNONYMS_TABLE
    from pisa_spark.sources import catalog

    root = str(tmp_path_factory.mktemp("synidx") / "idx")
    eng = SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)
    assert catalog.table_exists(root, SYNONYMS_TABLE)
    dict_df = catalog.read_table(spark, root, SYNONYMS_TABLE)
    assert sorted(dict_df.columns) == ["stem", "term"]
    assert dict_df.filter(F.col("term").contains(":")).count() == 0
    assert (
        dict_df.groupBy("stem").count().filter("count < 2").count() == 0
    )

    def norm(rows):
        return sorted(
            (r["rank"], r["doc_id"], round(r["score"], 9)) for r in rows
        )

    via_table = norm(eng.search_synonyms("data table", k=10).collect())
    eng._index_root = None  # force the relation-vocabulary fallback
    via_fallback = norm(eng.search_synonyms("data table", k=10).collect())
    assert via_table == via_fallback
