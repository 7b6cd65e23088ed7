"""Extended boolean retrieval (SearchEngine.search_boolean).

CNF of term groups: docs matching >=1 term of EVERY group, ranked by
BM25 over all matched query terms. Checked against an independent
dict/Counter oracle built on tests/oracle.py, plus degeneracy cases
(one group == OR; singleton groups == AND) and composition with
negation and tombstone deletes."""

import collections
import math

import pytest

from pisa_spark.engine import SearchEngine
from pisa_spark.index.build import BM25_B, BM25_K1
from tests.oracle import Bm25Oracle


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boolean") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=8, wave_size=8)


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return Bm25Oracle(sf_dir)


def _cnf_topk(oracle, groups, k=10, negated=()):
    terms = sorted({t for g in groups for t in g})
    out = {}
    for d, ts in oracle.tok.items():
        c = collections.Counter(ts)
        if not all(any(c[t] for t in g) for g in groups):
            continue
        if any(c[t] for t in negated):
            continue
        s = 0.0
        for t in terms:
            if c[t]:
                idf = math.log(
                    (oracle.n_docs - oracle.df[t] + 0.5)
                    / (oracle.df[t] + 0.5)
                )
                s += (
                    idf * c[t] * (BM25_K1 + 1)
                    / (c[t] + BM25_K1
                       * (1 - BM25_B + BM25_B * len(ts) / oracle.avgdl))
                )
        out[d] = s
    ranked = sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, d, round(s, 6)) for i, (d, s) in enumerate(ranked)]


def _rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 6))
        for r in sorted(df.collect(), key=lambda r: r["rank"])
    ]


def test_cnf_matches_independent_oracle(eng, oracle):
    groups = [["data", "join"], ["spark", "scan"]]
    got = _rows(eng.search_boolean(groups, k=10))
    assert got == _cnf_topk(oracle, groups, k=10)
    # string form, same answer
    got_s = _rows(eng.search_boolean("(data join) (spark scan)", k=10))
    assert got_s == got


def test_single_group_is_or_and_singletons_are_and(eng, oracle):
    or_like = _rows(eng.search_boolean([["data", "join"]], k=10))
    assert or_like == [
        (r, d, round(s, 6)) for r, d, s in oracle.topk(["data", "join"], k=10)
    ]
    and_like = _rows(
        eng.search_boolean([["window"], ["merge"], ["scan"]], k=10)
    )
    assert and_like == [
        (r, d, round(s, 6))
        for r, d, s in oracle.topk(
            ["window", "merge", "scan"], k=10, conjunctive=True
        )
    ]


def test_negation_composes(eng, oracle):
    groups = [["data", "join"], ["table", "merge"]]
    got = _rows(eng.search_boolean("(data join) (table merge) -spark", k=10))
    assert got == _cnf_topk(oracle, groups, k=10, negated=["spark"])


def test_unmatchable_group_returns_empty_and_validation(eng):
    assert eng.search_boolean([["data"], ["zzzznotaterm"]], k=10).count() == 0
    with pytest.raises(ValueError, match="group"):
        eng.search_boolean([], k=10)
    with pytest.raises(ValueError, match="ambiguous"):
        eng.search_boolean("(data join) loose", k=10)


def test_deletes_compose(spark, sf_dir, tmp_path):
    eng = SearchEngine.build(
        spark, sf_dir, str(tmp_path / "idx"), n_buckets=8, wave_size=8
    )
    groups = [["data", "join"], ["spark", "scan"]]
    before = eng.search_boolean(groups, k=5).collect()
    victims = [r["doc_id"] for r in before[:2]]
    eng.delete_docs(victims, persist=False)
    after = {r["doc_id"] for r in eng.search_boolean(groups, k=10).collect()}
    assert not set(victims) & after
