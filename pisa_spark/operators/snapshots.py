"""Reference-semantic operators: incremental snapshot processing and
exact top-k recommendation with ranking metrics.

These re-express, Spark-first, the transferable dataflow semantics of
the reference (hsyoo32/pisa):

* positional prefix/delta snapshot split of a time-ordered interaction
  log — /root/reference/src/helpers/Reader.py:81-93 (boundaries) and
  :148-178 (hist/incre/val/test block materialization)
* per-user seen-set construction —
  /root/reference/src/helpers/Reader.py:185-191
* exact top-k per user over all candidate items with seen-items masked
  out — /root/reference/src/Inference.py:227-240 (torch.topk after
  -inf scatter, :233-238); here the scorer is item popularity (the
  engine is model-free) and masking is a left_anti join
* Recall/NDCG/MRR/Precision@K over users with non-empty ground truth,
  4-decimal rounding — /root/reference/src/Inference.py:8-71 with its
  quirks preserved: metrics average only over users whose ground truth
  is non-empty (:25,:57), IDCG uses min(|GT|, K) ideal hits (:33-48),
  MRR is the reciprocal rank of the FIRST hit (:44-46)

The interaction log derives from the driver's events table:
(user_id, item_id = props.k, ts) — the same (user, item, time) triple
shape as the reference's freq.csv (data/Amazon-cds/pisa/freq.csv:1-3).
Ordering is explicit (ts, event_id) — the reference trusts file order
(src/helpers/Reader.py:154); we never trust partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def interactions_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> (user_id, item_id, ts, pos) with pos = global
    0-based position in (ts, event_id) order."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    inter = ev.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item_id"),
        "ts",
        "event_id",
    )
    # two-phase global position (operators/ids.py): rank in (ts,
    # event_id) order without the single-partition sort a global
    # row_number() Window would plan
    from pisa_spark.operators.ids import global_positions

    return global_positions(inter, ["ts", "event_id"], "pos").drop("event_id")


def snapshot_boundaries(size: int, n_snapshots: int, train_ratio: float) -> list[int]:
    """Reference boundary rule (src/helpers/Reader.py:81-93): train
    prefix = int(size*train_ratio), remainder in n equal increments,
    the last boundary absorbing the remainder."""
    train = int(size * train_ratio)
    incre = (size - train) // n_snapshots
    bounds = [train + i * incre for i in range(n_snapshots)]
    bounds.append(size)
    return bounds


def split_blocks(
    inter: DataFrame, n_snapshots: int, train_ratio: float, val_ratio: float = 0.5
) -> DataFrame:
    """Tag every interaction with its block memberships per snapshot:
    rows (snapshot_idx, block_type, user_id, item_id, pos).

    block_type semantics per reference src/helpers/Reader.py:148-178:
    hist{i}  = positions [0, b_i)          (prefix view)
    incre{i} = positions [b_{i-1}, b_i)    (delta view; b_{-1} = 0 ...
               for i=0 incre == hist == train prefix)
    val{i}/test{i} = next window [b_i, b_{i+1}) split at val_ratio.
    One row per (snapshot, block) membership — a flat relation instead
    of materialized files."""
    size = inter.count()
    bounds = snapshot_boundaries(size, n_snapshots, train_ratio)
    pieces = []
    for i in range(n_snapshots):
        b_lo = bounds[i - 1] if i > 0 else 0
        b_hi = bounds[i]
        nxt = bounds[i + 1]
        vboundary = b_hi + int((nxt - b_hi) * val_ratio)
        tag = lambda t: F.lit(t)  # noqa: E731
        pieces.append(
            inter.filter(F.col("pos") < b_hi).select(
                F.lit(i).alias("snapshot_idx"), tag("hist").alias("block_type"),
                "user_id", "item_id", "pos",
            )
        )
        pieces.append(
            inter.filter((F.col("pos") >= b_lo) & (F.col("pos") < b_hi)).select(
                F.lit(i).alias("snapshot_idx"), tag("incre").alias("block_type"),
                "user_id", "item_id", "pos",
            )
        )
        pieces.append(
            inter.filter((F.col("pos") >= b_hi) & (F.col("pos") < vboundary)).select(
                F.lit(i).alias("snapshot_idx"), tag("val").alias("block_type"),
                "user_id", "item_id", "pos",
            )
        )
        pieces.append(
            inter.filter((F.col("pos") >= vboundary) & (F.col("pos") < nxt)).select(
                F.lit(i).alias("snapshot_idx"), tag("test").alias("block_type"),
                "user_id", "item_id", "pos",
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def seen_sets(hist: DataFrame) -> DataFrame:
    """(user_id, items:array<long> sorted, n_items) — the clicked-set
    groupBy of the reference (Reader.py:185-191), order made explicit."""
    return hist.groupBy("user_id").agg(
        F.sort_array(F.collect_set("item_id")).alias("items"),
        F.countDistinct("item_id").alias("n_items"),
    )


def popularity_topk(
    hist: DataFrame,
    users: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k unseen items per user by hist popularity:
    (user_id, rank, item_id, cnt).

    The reference's inference shape (Inference.py:227-240) with a
    popularity scorer: all items scored, per-user seen set masked via
    left_anti (the -inf scatter of :233-238), deterministic ties
    (cnt DESC, item_id ASC). Cold-start users (absent from hist) get an
    empty mask, not exclusion (:217-221).

    Candidate pruning (provably rank-identical): a user's k-th unseen
    item sits at global popularity rank <= k + |seen_u|, so only the
    global top-(k + max_u |seen_u|) items can ever appear in any user's
    answer — the broadcast side shrinks from |I| to that bound, which
    at web scale is orders of magnitude smaller than the item
    universe."""
    counts = hist.groupBy("item_id").agg(F.count(F.lit(1)).alias("cnt"))
    max_seen_row = (
        hist.groupBy("user_id")
        .agg(F.countDistinct("item_id").alias("n_seen"))
        .agg(F.max("n_seen").alias("m"))
        .collect()
    )
    max_seen = int(max_seen_row[0]["m"] or 0)
    top_items = counts.orderBy(
        F.col("cnt").desc(), F.col("item_id").asc()
    ).limit(k + max_seen)
    cand = users.select("user_id").distinct().crossJoin(F.broadcast(top_items))
    seen = hist.select("user_id", "item_id").distinct()
    unseen = cand.join(seen, ["user_id", "item_id"], "left_anti")
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("item_id").asc()
    )
    return (
        unseen.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("user_id", "rank", "item_id", "cnt")
    )


def topn_metrics(
    recommendations: DataFrame,
    ground_truth: DataFrame,
    ks: list[int] = (5, 10, 20),
) -> DataFrame:
    """Recall/NDCG/MRR/Precision@K -> rows (metric, k, value), rounded
    to 4 decimals, averaged over users with non-empty ground truth.

    recommendations: (user_id, rank, item_id); ground_truth:
    (user_id, item_id). Reference semantics (Inference.py:8-71):
    DCG gain 1/log2(rank+1) for 1-based ranks (:37-43 with 0-based
    j -> 1/log2(j+2)); IDCG over min(|GT|, K) ideal prefix; MRR =
    1/(first hit rank); precision = hits/K; recall = hits/|GT|."""
    out = _topn_metrics_by(
        recommendations,
        ground_truth.withColumn("grp", F.lit("_all")),
        ks,
    )
    # the grouped kernel emits no rows for an empty ground truth (its
    # groupBy sees zero groups); the ungrouped contract is one row per
    # (metric, k) with a null value — global .agg() semantics — so
    # callers like per_snapshot_recall keep a visible (null) row for
    # snapshots whose test block is empty instead of silently losing
    # the snapshot from downstream means/trends
    spark = recommendations.sparkSession
    grid = spark.createDataFrame(
        [(m, int(k)) for k in ks
         for m in ("recall", "precision", "ndcg", "mrr")],
        "metric string, k int",
    )
    return grid.join(
        out.select("metric", "k", "value"), ["metric", "k"], "left"
    ).select("metric", "k", "value")


def topn_metrics_grouped(
    recommendations: DataFrame,
    ground_truth: DataFrame,
    groups: DataFrame,
    ks: list[int] = (5, 10, 20),
) -> DataFrame:
    """Group-wise Recall/NDCG/MRR/Precision@K -> rows
    (grp, metric, k, value): the reference's Test_group
    (/root/reference/src/Inference.py:74-152) — metrics computed
    independently per user cohort (e.g. dynamic/static/intermediate
    user files, :87-88), with the standard quirks intact.

    groups: (user_id, grp). Per reference :116-118, the evaluated
    users of a group are (test users) INTERSECT (group users) and a
    group matching no test user is omitted entirely (no zero rows) —
    hence the inner join. A user present in several groups
    contributes to each independently (group files may overlap).
    Averaging stays per-group over users with non-empty GT."""
    gt_g = ground_truth.join(
        groups.select("user_id", "grp").distinct(), "user_id"
    )
    return _topn_metrics_by(recommendations, gt_g, ks)


def _topn_metrics_by(
    recommendations: DataFrame,
    ground_truth_g: DataFrame,
    ks,
) -> DataFrame:
    """Shared metrics kernel over ground truth carrying a `grp`
    dimension column; returns (grp, metric, k, value)."""
    gt_sizes = ground_truth_g.groupBy("grp", "user_id").agg(
        F.countDistinct("item_id").alias("n_gt")
    )
    hits = recommendations.join(
        ground_truth_g.select("grp", "user_id", "item_id").distinct(),
        ["user_id", "item_id"],
    ).select("grp", "user_id", "rank")
    pieces = []
    for k in ks:
        hk = hits.filter(F.col("rank") <= k)
        per_user = hk.groupBy("grp", "user_id").agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum(1.0 / F.log2(F.col("rank") + 1)).alias("dcg"),
            F.min("rank").alias("first_hit"),
        )
        # every GT user participates (zero if no hits) — ref averages
        # over users with non-empty GT, hit or not
        base = gt_sizes.join(per_user, ["grp", "user_id"], "left").fillna(
            {"n_hits": 0, "dcg": 0.0}
        )
        ideal_n = F.least(F.col("n_gt"), F.lit(k))
        # IDCG = sum_{j=1..ideal_n} 1/log2(j+1), via a sequence expr
        idcg = F.aggregate(
            F.sequence(F.lit(1), ideal_n),
            F.lit(0.0),
            lambda acc, j: acc + 1.0 / F.log2(j.cast("double") + 1.0),
        )
        agg = base.select(
            "grp",
            (F.col("n_hits") / F.col("n_gt")).alias("recall"),
            (F.col("n_hits") / F.lit(float(k))).alias("precision"),
            (F.col("dcg") / idcg).alias("ndcg"),
            F.when(F.col("first_hit").isNotNull(), 1.0 / F.col("first_hit"))
            .otherwise(0.0)
            .alias("mrr"),
        ).groupBy("grp").agg(
            F.round(F.avg("recall"), 4).alias("recall"),
            F.round(F.avg("precision"), 4).alias("precision"),
            F.round(F.avg("ndcg"), 4).alias("ndcg"),
            F.round(F.avg("mrr"), 4).alias("mrr"),
        )
        row = agg.select(
            "grp", F.lit(k).alias("k"), "recall", "precision", "ndcg", "mrr"
        )
        pieces.append(row)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    melted = out.select(
        "grp",
        "k",
        F.explode(
            F.create_map(
                F.lit("recall"), F.col("recall"),
                F.lit("precision"), F.col("precision"),
                F.lit("ndcg"), F.col("ndcg"),
                F.lit("mrr"), F.col("mrr"),
            )
        ).alias("metric", "value"),
    )
    return melted.select("grp", "metric", "k", "value")


def groups_by_activity(
    hist: DataFrame,
    test_users: DataFrame,
    light_max: int = 2,
) -> DataFrame:
    """Deterministic user cohorts from hist activity — the Spark
    rendering of the reference's dynamic/static/intermediate group
    files (/root/reference/src/Inference.py:87-88, which ships them as
    precomputed user-id lists): 'cold' = test user absent from hist
    (the cold-start cohort of :136-138), 'light' = 1..light_max hist
    interactions, 'heavy' = more. Returns (user_id, grp)."""
    counts = hist.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hist")
    )
    return (
        test_users.select("user_id")
        .distinct()
        .join(counts, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("n_hist").isNull(), "cold")
            .when(F.col("n_hist") <= light_max, "light")
            .otherwise("heavy")
            .alias("grp"),
        )
    )


def per_snapshot_recall(
    spark: SparkSession,
    sf_dir: str,
    n_snapshots: int = 5,
    train_ratio: float = 0.6,
    k: int = 10,
) -> DataFrame:
    """Recall@k per snapshot: rows (snapshot_idx, metric, k, value) —
    the per-snapshot result table the reference aggregates with
    `_test_mean`/`_test_trend` (src/main.py:40-64)."""
    inter = interactions_from_events(spark, sf_dir).cache()
    blocks = split_blocks(inter, n_snapshots, train_ratio).cache()
    pieces = []
    for i in range(n_snapshots):
        hist = blocks.filter(
            (F.col("snapshot_idx") == i) & (F.col("block_type") == "hist")
        )
        test = blocks.filter(
            (F.col("snapshot_idx") == i) & (F.col("block_type") == "test")
        )
        recs = popularity_topk(hist, test.select("user_id"), k=k)
        m = topn_metrics(recs, test.select("user_id", "item_id"), ks=[k])
        pieces.append(
            m.filter(F.col("metric") == "recall").select(
                F.lit(i).alias("snapshot_idx"), "metric", "k", "value"
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def snapshot_recommendation_metrics(
    spark: SparkSession,
    sf_dir: str,
    snapshot_idx: int = 0,
    n_snapshots: int = 5,
    train_ratio: float = 0.6,
    k: int = 10,
) -> DataFrame:
    """End-to-end reference pipeline for one snapshot: split -> hist
    popularity ranking masked by seen -> metrics vs test block."""
    inter = interactions_from_events(spark, sf_dir).cache()
    blocks = split_blocks(inter, n_snapshots, train_ratio)
    hist = blocks.filter(
        (F.col("snapshot_idx") == snapshot_idx) & (F.col("block_type") == "hist")
    )
    test = blocks.filter(
        (F.col("snapshot_idx") == snapshot_idx) & (F.col("block_type") == "test")
    )
    recs = popularity_topk(hist, test.select("user_id"), k=k)
    return topn_metrics(recs, test.select("user_id", "item_id"), ks=[k])
