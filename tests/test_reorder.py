"""Doc-id reordering (index/reorder.py — PISA reorder-docids parity).

Three contracts:
- the mapping is a permutation, invariant to partition count;
- serving over a reordered index is score-identical (and therefore
  rank-identical up to same-score ties resolved in new-id order);
- on a vocabulary-clustered corpus with scattered ids, reordering
  shrinks the compressed doc-id payload (the entire point of the op).
"""

import random

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import tokens_col
from pisa_spark.index.build import build_postings
from pisa_spark.index.reorder import (
    apply_reorder,
    payload_bytes,
    reorder_by_key,
    reorder_by_dominant_terms,
    reorder_map,
    restore_ids,
)
from pisa_spark.query.bm25 import bm25_topk_wand

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _tokens(docs):
    return docs.select(
        "doc_id", tokens_col(F.col("text")).alias("tokens")
    ).withColumn("doc_len", F.size("tokens"))


def _build(toks):
    row = toks.agg(
        F.count(F.lit(1)), F.avg("doc_len"), F.max("doc_id")
    ).collect()[0]
    n, avgdl, mx = int(row[0]), float(row[1]), int(row[2])
    return (
        build_postings(toks, n, avgdl, n_buckets=8, max_doc_id=mx),
        n,
        avgdl,
    )


def test_mapping_is_permutation_and_partition_invariant(spark):
    docs = _docs(spark)
    n = docs.count()
    m2 = reorder_map(docs, ["lang", "source"], out_col="new_id")
    ids = [r["new_id"] for r in m2.collect()]
    assert sorted(ids) == list(range(n))
    # partition-count invariance: same mapping at a different layout
    m8 = reorder_map(
        docs.repartition(17), ["lang", "source"], out_col="new_id"
    )
    a = {(r["doc_id"], r["new_id"]) for r in m2.collect()}
    b = {(r["doc_id"], r["new_id"]) for r in m8.collect()}
    assert a == b


def test_reordered_serving_score_identical(spark):
    docs = _docs(spark)
    mapping = reorder_by_key(docs, ["lang", "source"]).cache()
    base_toks = _tokens(docs)
    re_toks = apply_reorder(_tokens(docs), mapping)
    p0, n, avgdl = _build(base_toks)
    p1, n1, avgdl1 = _build(re_toks)
    assert (n, round(avgdl, 9)) == (n1, round(avgdl1, 9))
    queries = [
        {"query_id": 0, "terms": ["data", "join"], "conjunctive": False},
        {"query_id": 1, "terms": ["the"], "conjunctive": False},
        {"query_id": 2, "terms": ["window", "merge"], "conjunctive": True},
    ]
    k = 10
    base = bm25_topk_wand(p0, queries, n, avgdl, k=k).toPandas()
    reo = bm25_topk_wand(p1, queries, n, avgdl, k=k)
    back = restore_ids(reo, mapping).toPandas()
    for qid in (0, 1, 2):
        bs = sorted(
            base[base.query_id == qid].score.round(6).tolist(), reverse=True
        )
        rs = sorted(
            back[back.query_id == qid].score.round(6).tolist(), reverse=True
        )
        # score multisets identical: BM25 is permutation-invariant
        assert bs == rs
        # and wherever scores are unique, the same original doc wins
        bm = base[base.query_id == qid]
        rm = back[back.query_id == qid]
        b_by_doc = dict(zip(bm.doc_id, bm.score.round(6)))
        r_by_doc = dict(zip(rm.doc_id, rm.score.round(6)))
        uniq = {s for s in bs if bs.count(s) == 1}
        assert {d for d, s in b_by_doc.items() if s in uniq} == {
            d for d, s in r_by_doc.items() if s in uniq
        }


def _clustered_docs(spark, n_docs=2048, n_topics=8, vocab_per_topic=128,
                    terms_per_doc=8, seed=7):
    """Vocabulary-clustered corpus with SCATTERED ids: topic t draws
    from its own 128-term slice; ids are assigned in hash-shuffled
    order so same-topic docs start far apart."""
    rng = random.Random(seed)
    order = list(range(n_docs))
    rng.shuffle(order)
    rows = []
    for i, doc_id in enumerate(order):
        topic = i % n_topics
        vocab = [f"t{topic}w{j}" for j in range(vocab_per_topic)]
        words = [vocab[rng.randrange(vocab_per_topic)]
                 for _ in range(terms_per_doc)]
        rows.append((doc_id, f"topic{topic}", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, topic string, text string")


@pytest.mark.parametrize("strategy", ["key", "dominant"])
def test_clustered_corpus_compresses_smaller(spark, strategy):
    docs = _clustered_docs(spark)
    if strategy == "key":
        mapping = reorder_by_key(docs, ["topic"])
    else:
        mapping = reorder_by_dominant_terms(docs)
    base_toks = _tokens(docs)
    re_toks = apply_reorder(_tokens(docs), mapping)
    p0, _, _ = _build(base_toks)
    p1, _, _ = _build(re_toks)
    b0 = payload_bytes(p0)
    b1 = payload_bytes(p1)
    # tf/dl payloads are permutation-invariant in SIZE; doc-id deltas
    # are what shrink. Require a real gain, not a rounding artifact.
    assert b1["docs_bytes"] < b0["docs_bytes"] * 0.9, (b0, b1)


def test_restore_ids_roundtrip(spark):
    docs = _docs(spark)
    mapping = reorder_by_key(docs, ["lang", "source"])
    remapped = apply_reorder(docs.select("doc_id", "n_chars"), mapping)
    back = restore_ids(remapped, mapping)
    orig = {(r["doc_id"], r["n_chars"])
            for r in docs.select("doc_id", "n_chars").collect()}
    assert {(r["doc_id"], r["n_chars"]) for r in back.collect()} == orig


def test_persistent_reordered_build_end_to_end(spark, tmp_path):
    """reorder_by= build: persisted mapping, id-coherent doc store,
    restore() at the boundary, deletes in original ids."""
    from pisa_spark.engine import SearchEngine

    root = str(tmp_path / "ridx")
    eng = SearchEngine.build(
        spark, SF, root, n_buckets=8, wave_size=8,
        reorder_by=["lang", "source"],
    ).with_corpus(SF)
    plain = SearchEngine.build(
        spark, SF, str(tmp_path / "pidx"), n_buckets=8, wave_size=8
    )
    got = eng.search("data join", k=10)
    back = eng.restore(got).toPandas()
    base = plain.search("data join", k=10).toPandas()
    # same scores; same original docs wherever scores are unique
    bs = sorted(base.score.round(6)); rs = sorted(back.score.round(6))
    assert bs == rs
    uniq = {s for s in bs if bs.count(s) == 1}
    assert {d for d, s in zip(base.doc_id, base.score.round(6)) if s in uniq} \
        == {d for d, s in zip(back.doc_id, back.score.round(6)) if s in uniq}
    # restore() on a plain engine is a passthrough
    assert plain.restore(plain.search("the", k=3)).count() == 3
    # doc-store joins are id-coherent: the text returned for a hit is
    # the text of the ORIGINAL doc the hit maps back to
    hit = eng.search_with_docs("data join", k=1).collect()[0]
    orig_id = eng.restore(got).toPandas().sort_values("rank").doc_id.iloc[0]
    orig_text = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") == int(orig_id)).collect()[0]["text"]
    )
    assert hit["text"] == orig_text
    # deletes take ORIGINAL ids and exclude the right docs
    eng.delete_docs([int(orig_id)], persist=False)
    back2 = eng.restore(eng.search("data join", k=10)).toPandas()
    assert int(orig_id) not in set(back2.doc_id)
    # a fresh load keeps the reordered wiring
    fresh = SearchEngine.load(spark, root).with_corpus(SF)
    assert fresh._reordered
    assert sorted(
        fresh.restore(fresh.search("data join", k=10)).toPandas()
        .score.round(6)
    ) == bs
