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


def _enc_py(word, merges):
    """Independent sequential-by-rank reference encoder."""
    syms = list(word) + [END]
    for _, a, b, _, _ in merges:
        new, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                new.append(a + b)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        syms = new
    return syms


def test_encode_seen_words_match_final_vocab(spark):
    from pisa_spark.functions.bpe import bpe_encode_words

    merges, final = _spark_merges(spark, WF, 8, min_count=1)
    mlist = [
        {"step": s, "lhs": a, "rhs": b, "merged": m, "pair_count": c}
        for s, a, b, m, c in merges
    ]
    words = spark.createDataFrame([(w,) for w, _ in WF], "word string")
    got = {
        r["word"]: r["syms"]
        for r in bpe_encode_words(words, mlist).collect()
    }
    want = {r["word"]: r["syms"] for r in final[1].collect()} if isinstance(
        final, tuple
    ) else {r["word"]: r["syms"] for r in final.collect()}
    assert got == want
    final.unpersist()


def test_encode_kernel_equals_expression_chain(spark):
    import random

    from pisa_spark.functions.bpe import bpe_encode_words

    merges, final = _spark_merges(spark, WF, 8, min_count=1)
    final.unpersist()
    mlist = [
        {"step": s, "lhs": a, "rhs": b, "merged": m, "pair_count": c}
        for s, a, b, m, c in merges
    ]
    rng = random.Random(5)
    # unseen words, prefixes, garbage, and the seen vocabulary
    pool = [w for w, _ in WF] + [
        "".join(rng.choice("abcdehilnorstw") for _ in range(rng.randrange(1, 12)))
        for _ in range(200)
    ]
    words = spark.createDataFrame([(w,) for w in set(pool)], "word string")
    via_expr = {
        r["word"]: r["syms"]
        for r in bpe_encode_words(words, mlist, max_expr_chain=64).collect()
    }
    via_kernel = {
        r["word"]: r["syms"]
        for r in bpe_encode_words(words, mlist, max_expr_chain=0).collect()
    }
    assert via_expr == via_kernel
    # and both equal the independent sequential-by-rank reference
    for w in set(pool):
        assert via_expr[w] == _enc_py(w, merges), w


def test_encode_docs_order_and_stats(spark):
    from pisa_spark.functions.bpe import bpe_encode_docs, bpe_encode_stats

    docs = spark.createDataFrame(
        [(1, "new wide new"), (2, "newest zzz")], "doc_id int, text string"
    )
    words = word_frequencies(docs)
    merges, final = bpe_learn(words, 3, min_count=1)
    final.unpersist()
    seq = {
        r["doc_id"]: r["subwords"]
        for r in bpe_encode_docs(docs, merges).collect()
    }
    assert seq[1] == (
        _enc_py("new", [tuple(m.values()) for m in merges])
        + _enc_py("wide", [tuple(m.values()) for m in merges])
        + _enc_py("new", [tuple(m.values()) for m in merges])
    )
    st = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["n_unmerged"])
        for r in bpe_encode_stats(docs, merges).collect()
    }
    assert st[1][0] == 3 and st[1][1] == len(seq[1])
    assert st[2][0] == 2 and st[2][1] == len(seq[2])
    # 'zzz' shares no learned merge: its 3 chars + END all stay unmerged
    zz = _enc_py("zzz", [tuple(m.values()) for m in merges])
    assert zz == ["z", "z", "z", END]
