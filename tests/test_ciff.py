"""CIFF export/import (sources/ciff.py).

Contracts:
1. Wire codec: hand-rolled protobuf messages round-trip exactly —
   PostingsList (gap-encoded docids), DocRecord, Header — including
   the canonical omitted-default form a foreign (Anserini/PISA)
   exporter would produce for a first posting with docid 0.
2. Hypothesis: encode/decode of random strictly-increasing docid
   arrays with random tfs and unicode terms is an identity.
3. Spark round trip: export_ciff at sf0.001 (single file AND sharded)
   re-imports to the exact tf relation and doc records
   (exceptAll-empty both ways), and the header's corpus stats match.
4. Serving equivalence: an index built from the CIFF re-import serves
   BM25 top-k rank-identical to the index built from the original
   corpus — the "carry an index across engines" promise.
"""

import tempfile

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import term_frequencies
from pisa_spark.sources import ciff

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------
# 1-2: wire codec, no Spark
# ------------------------------------------------------------------


def _roundtrip_list(term, doc_ids, tfs):
    payload = ciff.encode_postings_list(term, doc_ids, tfs)
    buf = ciff._varint_one(len(payload)) + payload
    t, df, cf, d2, t2, end = ciff.decode_postings_list(memoryview(buf), 0)
    assert end == len(buf)
    return t, df, cf, d2, t2


def test_postings_list_roundtrip():
    doc_ids = np.array([0, 3, 4, 10, 500, 10**9], dtype=np.int64)
    tfs = np.array([1, 2, 128, 1, 7, 300], dtype=np.int64)
    t, df, cf, d2, t2 = _roundtrip_list("hello", doc_ids, tfs)
    assert t == "hello" and df == 6 and cf == int(tfs.sum())
    assert (d2 == doc_ids).all() and (t2 == tfs).all()


def test_foreign_omitted_default_first_posting():
    # canonical proto3 encoder omits docid=0 on the first posting:
    # [0x22, len=2, 0x10, tf] then a full posting
    foreign = bytes([0x22, 2, 0x10, 5, 0x22, 4, 0x08, 3, 0x10, 2])
    gaps, tfs = ciff._decode_postings_blob(memoryview(foreign))
    assert list(gaps) == [0, 3] and list(tfs) == [5, 2]


def test_header_roundtrip():
    hb = ciff.encode_header(42, 1000, 123456, 37.25, "desc x")
    h, pos = ciff.decode_header(memoryview(hb))
    assert pos == len(hb)
    assert h["version"] == ciff.CIFF_VERSION
    assert h["num_postings_lists"] == 42 and h["num_docs"] == 1000
    assert h["total_terms_in_collection"] == 123456
    assert h["average_doclength"] == 37.25 and h["description"] == "desc x"


def test_doc_records_roundtrip():
    blob = ciff.encode_doc_records(
        np.array([0, 1, 7]),
        pd.Series(["a", "b-b", "c/c?x=1"]),
        np.array([5, 0, 99]),
    )
    mv = memoryview(blob)
    out, pos = [], 0
    for _ in range(3):
        did, coll, dlen, pos = ciff.decode_doc_record(mv, pos)
        out.append((did, coll, dlen))
    assert pos == len(blob)
    assert out == [(0, "a", 5), (1, "b-b", 0), (7, "c/c?x=1", 99)]


@settings(max_examples=60, deadline=None)
@given(
    gaps=st.lists(
        st.integers(min_value=1, max_value=2**40), min_size=1, max_size=80
    ),
    first=st.integers(min_value=0, max_value=2**40),
    term=st.text(min_size=1, max_size=12),
    tf_seed=st.integers(min_value=1, max_value=2**31 - 1),
)
def test_postings_fuzz_roundtrip(gaps, first, term, tf_seed):
    doc_ids = first + np.cumsum(np.array([0] + gaps[1:], dtype=np.int64))
    rng = np.random.RandomState(tf_seed % (2**31))
    tfs = rng.randint(1, 1000, size=doc_ids.size).astype(np.int64)
    t, df, cf, d2, t2 = _roundtrip_list(term, doc_ids, tfs)
    assert t == term
    assert df == doc_ids.size and cf == int(tfs.sum())
    assert (d2 == doc_ids).all() and (t2 == tfs).all()


# ------------------------------------------------------------------
# 3-4: Spark round trips
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))
    tf = term_frequencies(toks).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf")
    )
    docs_meta = toks.select(
        "doc_id",
        F.col("doc_id").cast("string").alias("collection_docid"),
        F.col("doc_len").cast("long").alias("doc_len"),
    )
    return tf.cache(), docs_meta.cache()


@pytest.fixture(scope="module", params=[1, 4], ids=["single", "sharded"])
def exported(request, spark, corpus):
    tf, docs_meta = corpus
    out = tempfile.mkdtemp(prefix=f"ciff_t{request.param}_")
    manifest = ciff.export_ciff(tf, docs_meta, out, n_files=request.param)
    return out, manifest


def test_spark_roundtrip_tf_exact(spark, corpus, exported):
    tf, _ = corpus
    path, _ = exported
    back = ciff.read_ciff_postings(spark, path).select(
        "doc_id", "term", "tf"
    )
    assert tf.exceptAll(back).count() == 0
    assert back.exceptAll(tf).count() == 0


def test_spark_roundtrip_docs_exact(spark, corpus, exported):
    _, docs_meta = corpus
    path, _ = exported
    back = ciff.read_ciff_docs(spark, path)
    assert docs_meta.exceptAll(back).count() == 0
    assert back.exceptAll(docs_meta).count() == 0


def test_header_and_manifest_stats(spark, corpus, exported):
    tf, docs_meta = corpus
    path, manifest = exported
    hdr = ciff.read_ciff_header(path)
    n_terms = tf.select("term").distinct().count()
    n_docs = docs_meta.count()
    assert manifest["num_postings_lists"] == n_terms
    assert manifest["num_docs"] == n_docs
    total = docs_meta.agg(F.sum("doc_len")).collect()[0][0]
    assert hdr["total_terms_in_collection"] == total
    # sharded headers carry only their shard's list count; the
    # manifest carries the global one
    if manifest["n_files"] == 1:
        assert hdr["num_postings_lists"] == n_terms
        assert hdr["num_docs"] == n_docs


def test_df_cf_fields_consistent(spark, exported):
    path, _ = exported
    back = ciff.read_ciff_postings(spark, path)
    bad = (
        back.groupBy("term", "df", "cf")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tf").alias("s"))
        .filter((F.col("n") != F.col("df")) | (F.col("s") != F.col("cf")))
        .count()
    )
    assert bad == 0


def test_bm25_serving_off_reimport_rank_identical(spark, corpus):
    """Build a compressed index from the CIFF re-import
    (build_postings_from_tf) and serve the query set — ranks and
    rounded scores must match serving off the index built straight
    from the corpus — the "carry an index across engines" promise."""
    from pisa_spark.index.build import build_postings_from_tf
    from pisa_spark.query.bm25 import bm25_topk_wand

    tf, docs_meta = corpus
    out = tempfile.mkdtemp(prefix="ciff_serve_")
    ciff.export_ciff(tf, docs_meta, out, n_files=2)
    back_tf = ciff.read_ciff_postings(spark, out)
    back_docs = ciff.read_ciff_docs(spark, out)
    rebuilt_rel = back_tf.select("doc_id", "term", "tf").join(
        back_docs.select("doc_id", "doc_len"), "doc_id"
    )
    orig_rel = tf.join(docs_meta.select("doc_id", "doc_len"), "doc_id")

    stats = back_docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    queries = [
        {"query_id": 0, "terms": ["data", "spark"], "conjunctive": False},
        {
            "query_id": 1,
            "terms": ["index", "query", "search"],
            "conjunctive": False,
        },
    ]

    def serve(rel):
        postings = build_postings_from_tf(rel, n_docs, n_buckets=4)
        return (
            bm25_topk_wand(postings, queries, n_docs, avgdl, k=10)
            .select(
                "query_id",
                "rank",
                "doc_id",
                F.round("score", 6).alias("score"),
            )
            .orderBy("query_id", "rank")
            .collect()
        )

    got, want = serve(rebuilt_rel), serve(orig_rel)
    assert got == want and len(got) > 0
