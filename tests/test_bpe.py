"""Distributed BPE trainer (functions/bpe.py) vs an independent
sequential Sennrich-style trainer, plus the driver gates vs DuckDB."""

import collections

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from pisa_spark.functions.bpe import (
    END,
    bpe_learn,
    encode_token_counts,
    subword_stats,
    word_frequencies,
)


def py_bpe(wfd: dict, n: int, min_count: int = 2):
    """Deliberately different machinery: in-memory dict/Counter loop."""
    vocab = {w: list(w) + [END] for w in wfd}
    out = []
    for step in range(1, n + 1):
        counts = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += wfd[w]
        if not counts:
            break
        mx = max(counts.values())
        if mx < min_count:
            break
        a, b = min(p for p, c in counts.items() if c == mx)
        out.append((step, a, b, a + b, mx))
        for w, syms in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out, vocab


WF = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("wide", 4), ("new", 7), ("a", 4), ("aaaa", 2),
]


def _spark_merges(spark, wf, n, min_count=2, partitions=None):
    words = spark.createDataFrame(wf, "word string, freq long")
    if partitions:
        words = words.repartition(partitions)
    merges, final = bpe_learn(words, n, min_count=min_count)
    got = [
        (m["step"], m["lhs"], m["rhs"], m["merged"], m["pair_count"])
        for m in merges
    ]
    return got, final


def test_matches_sequential_trainer(spark):
    got, final = _spark_merges(spark, WF, 10, min_count=1)
    want, pv = py_bpe(dict(WF), 10, min_count=1)
    assert got == want
    # final per-word symbol state matches too (greedy overlap included)
    state = {r["word"]: r["syms"] for r in final.collect()}
    assert state == pv
    final.unpersist()


def test_overlap_greedy_left_to_right(spark):
    got, final = _spark_merges(spark, [("aaaa", 1)], 1, min_count=1)
    # three adjacent (a,a) positions, applied at 1 and 3 -> count 3
    assert got == [(1, "a", "a", "aa", 3)]
    assert final.select("syms").collect()[0]["syms"] == ["aa", "aa", END]
    final.unpersist()


def test_min_count_early_stop(spark):
    got, final = _spark_merges(spark, [("ab", 1), ("cd", 1)], 5, min_count=2)
    assert got == []  # every pair occurs once
    final.unpersist()


def test_partition_count_invariance(spark):
    a, f1 = _spark_merges(spark, WF, 6, partitions=1)
    b, f2 = _spark_merges(spark, WF, 6, partitions=7)
    assert a == b
    f1.unpersist()
    f2.unpersist()


def test_encode_token_counts(spark):
    docs = spark.createDataFrame(
        [(1, "new new wide"), (2, "newest")], "doc_id int, text string"
    )
    words = word_frequencies(docs)
    merges, final = bpe_learn(words, 3, min_count=1)
    out = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in encode_token_counts(docs, final).collect()
    }
    state = {r["word"]: len(r["syms"]) for r in final.collect()}
    assert out[1] == (3, 2 * state["new"] + state["wide"])
    assert out[2] == (1, state["newest"])
    final.unpersist()


def test_gates_match_duckdb_oracle(spark, sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    for name in ("bpe_merge_table", "bpe_subword_stats"):
        got = E.queries()[name](spark, sf_dir).toPandas()
        want = con.execute(E.oracle_sql()[name]).df()
        got = got[sorted(got.columns)].sort_values("step" if "step" in got else "rank").reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values("step" if "step" in want else "rank").reset_index(drop=True)
        assert got.equals(want), (name, got.to_dict(), want.to_dict())
