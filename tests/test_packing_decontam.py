"""Sequence packing (operators/packing.py) and benchmark
decontamination (functions/decontam.py): pandas/pure-Python witnesses,
parallelism invariance, edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pisa_spark.functions.decontam import contamination_report, decontaminate
from pisa_spark.operators.packing import (
    pack_sequences,
    packed_offsets,
    packing_stats,
)

LENS = [(0, 7), (1, 300), (2, 0), (3, 12), (4, 256), (5, 1), (6, 199)]


@pytest.fixture(scope="module")
def docs_len(spark):
    return spark.createDataFrame(LENS, "doc_id long, n_tokens int")


def test_offsets_match_cumsum_and_parallelism_invariant(docs_len):
    want = {}
    acc = 0
    for d, ln in sorted(LENS):
        want[d] = acc
        acc += ln
    for np_ in (1, 2, 5):
        got = {
            r["doc_id"]: r["offset"]
            for r in packed_offsets(docs_len, n_partitions=np_).collect()
        }
        assert got == want, np_


def test_pack_sequences_witness(docs_len):
    L = 64
    got = {
        r["doc_id"]: (
            r["offset"], r["first_seq"], r["last_seq"], r["n_seqs"]
        )
        for r in pack_sequences(docs_len, L).collect()
    }
    acc = 0
    for d, ln in sorted(LENS):
        first = acc // L
        last = (acc + max(ln - 1, 0)) // L
        if ln == 0:
            assert got[d] == (acc, first, first, 0), d
        else:
            assert got[d] == (acc, first, last, last - first + 1), d
        acc += ln
    # doc 1 (300 tokens) must straddle >= 4 sequences of 64
    assert got[1][3] >= 4
    stats = packing_stats(docs_len, L).collect()[0]
    total = sum(ln for _, ln in LENS)
    n_seq = -(-total // L)
    assert (
        stats["total_tokens"], stats["n_sequences"], stats["tail_padding"]
    ) == (total, n_seq, n_seq * L - total)
    assert stats["docs_straddling"] == sum(
        1 for d in got if got[d][3] > 1
    )
    with pytest.raises(ValueError):
        pack_sequences(docs_len, 0)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "completely unrelated text about spark query engines"),
    (2, "we say the quick brown fox jumps over fences often"),
    (3, "another clean document with no benchmark overlap at all"),
]
BENCH = [
    (100, "watch the quick brown fox jumps over everything"),
]


def test_contamination_exact_ngrams(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_report(docs, bench, n=5).collect()
    }
    # 5-grams of bench: 'watch the quick brown fox', 'the quick brown
    # fox jumps', 'quick brown fox jumps over', ...
    # doc 0 shares 'the quick brown fox jumps' and 'quick brown fox
    # jumps over'; doc 2 shares the same two; docs 1/3 share none
    assert got == {0: 2, 2: 2}
    clean = decontaminate(docs, bench, n=5)
    assert {r["doc_id"] for r in clean.collect()} == {1, 3}
    # n larger than any shared span -> nothing flagged, nothing dropped
    assert contamination_report(docs, bench, n=8).count() == 0
    assert decontaminate(docs, bench, n=8).count() == 4
    with pytest.raises(ValueError):
        contamination_report(docs, bench, n=0)


def test_contamination_plan_broadcasts_benchmark(spark):
    """The benchmark side must broadcast: no shuffle of corpus grams."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    plan = contamination_report(docs, bench, n=5)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
