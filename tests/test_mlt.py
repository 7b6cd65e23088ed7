"""More-Like-This (query/mlt.py + SearchEngine.search_similar).

Three contracts:
1. mlt_select_terms picks EXACTLY the row_number()<=max_terms set under
   (tf*(ln((N+1)/(df+1))+1) DESC, term ASC) with df>=min_df — checked
   against a pandas witness.
2. mlt_topk_dataframe never returns the source doc, and its scores are
   the plain BM25 scores of the selected terms (cross-checked against
   bm25_topk_dataframe on the same query terms).
3. The facade path (search_similar, served off the compressed index
   through WAND) is rank-identical to the exhaustive DataFrame path.
"""

import math

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import (
    corpus_stats,
    term_document_frequency,
    term_frequencies,
)
from pisa_spark.query.bm25 import bm25_topk_dataframe
from pisa_spark.query.mlt import (
    mlt_select_terms,
    mlt_topk_dataframe,
)

SF = "/root/testdata/sf0.001"
SOURCES = [3, 17, 41]


@pytest.fixture(scope="module")
def rel(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks)
    rel = tf.join(term_document_frequency(tf), "term").cache()
    row = corpus_stats(toks).collect()[0]
    return rel, int(row["n_docs"]), float(row["avgdl"])


def test_term_selection_matches_witness(spark, rel):
    rel_df, n_docs, _ = rel
    got = (
        mlt_select_terms(rel_df, SOURCES, n_docs, max_terms=5, min_df=2)
        .toPandas()
        .groupby("query_id")["term"]
        .apply(set)
        .to_dict()
    )
    pdf = rel_df.filter(F.col("doc_id").isin(SOURCES)).toPandas()
    for src in SOURCES:
        sub = pdf[(pdf.doc_id == src) & (pdf.df >= 2)].copy()
        sub["interest"] = sub.tf * (
            (sub.df + 1.0).rdiv(n_docs + 1.0).map(math.log) + 1.0
        )
        want = set(
            sub.sort_values(["interest", "term"], ascending=[False, True])
            .head(5)["term"]
        )
        assert got[src] == want, src


def test_source_doc_never_in_own_results(spark, rel):
    rel_df, n_docs, avgdl = rel
    out = mlt_topk_dataframe(rel_df, SOURCES, n_docs, avgdl, k=10).toPandas()
    assert not ((out.query_id.astype("int64") == out.doc_id).any())
    # dense ranks 1..k per query
    for qid, grp in out.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(grp) + 1)
        )


def test_scores_are_plain_bm25_of_selected_terms(spark, rel):
    rel_df, n_docs, avgdl = rel
    qdf = mlt_select_terms(rel_df, [SOURCES[0]], n_docs)
    mlt = (
        mlt_topk_dataframe(rel_df, [SOURCES[0]], n_docs, avgdl, k=5)
        .toPandas()
        .set_index("doc_id")["score"]
    )
    plain = (
        bm25_topk_dataframe(rel_df, qdf, n_docs, avgdl, k=6)
        .filter(F.col("doc_id") != SOURCES[0])
        .toPandas()
        .set_index("doc_id")["score"]
    )
    for d, s in mlt.items():
        assert plain[d] == pytest.approx(s, abs=1e-12)


def test_facade_matches_dataframe_path(spark, rel, tmp_path):
    from pisa_spark.engine import SearchEngine

    rel_df, n_docs, avgdl = rel
    eng = SearchEngine.build(
        spark, SF, str(tmp_path / "idx"), n_buckets=8
    )
    for src in SOURCES:
        got = (
            eng.search_similar(src, k=10)
            .withColumn("score", F.round("score", 6))
            .toPandas()
        )
        want = (
            mlt_topk_dataframe(rel_df, [src], n_docs, avgdl, k=10)
            .withColumn("score", F.round("score", 6))
            .toPandas()
        )
        assert got[["query_id", "rank", "doc_id", "score"]].values.tolist() == \
            want[["query_id", "rank", "doc_id", "score"]].values.tolist(), src


def test_min_df_and_max_terms_bounds(spark, rel):
    rel_df, n_docs, _ = rel
    sel = mlt_select_terms(
        rel_df, SOURCES, n_docs, max_terms=3, min_df=3
    ).toPandas()
    assert sel.groupby("query_id").size().max() <= 3
    dfs = rel_df.select("term", "df").distinct().toPandas().set_index("term")
    assert (dfs.loc[sel.term, "df"] >= 3).all()
