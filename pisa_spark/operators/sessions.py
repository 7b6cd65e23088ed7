"""Sessionization + cross-snapshot aggregation operators.

* ``sessionize`` — classic gap-based session assignment over an event
  stream, pure window algebra: a session breaks where the gap from the
  previous event of the same user exceeds ``gap``; session ids are the
  running count of breaks (lag + cumulative sum — no UDF, one shuffle
  on user_id).
* ``session_stats`` — per-session aggregates.
* ``mean_skip_first`` / ``trend`` — the reference's cross-snapshot
  result aggregation, quirks preserved: `_test_mean` DROPS the first
  snapshot's value before averaging (/root/reference/src/main.py:55-57)
  and `_test_trend` reports the per-snapshot sequence
  (/root/reference/src/main.py:40-64).

The streaming twin of ``sessionize`` uses
``applyInPandasWithState`` (see pisa_spark.streaming.ingest tests);
the batch version here is the oracle-checked semantic anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Events -> events + (session_seq, session_id).

    session_seq: 1-based per-user session ordinal; session_id: globally
    unique string f"{user}:{seq}". Deterministic: ordering key is
    (ts, event_id)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = int(gap_minutes * 60.0 * 1_000_000)  # microsecond-exact
    prev_ts = F.lag(ts_col).over(w)
    is_break = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))) > gap_us)
    ).cast("int")
    seq = F.sum(is_break).over(
        Window.partitionBy(user_col)
        .orderBy(ts_col, "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = events.withColumn("session_seq", seq)
    return out.withColumn(
        "session_id",
        F.concat(F.col(user_col).cast("string"), F.lit(":"), F.col("session_seq")),
    )


def session_stats(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-session: n_events, duration_s, total_value."""
    return sessions.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("duration_us"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def mean_skip_first(per_snapshot: DataFrame, value_col: str = "value") -> DataFrame:
    """Reference `_test_mean`: average over snapshots EXCLUDING the
    first (src/main.py:55-57), per metric, rounded to 4 decimals."""
    return (
        per_snapshot.filter(F.col("snapshot_idx") > 0)
        .groupBy("metric", "k")
        .agg(F.round(F.avg(value_col), 4).alias("mean_value"))
    )


def trend(per_snapshot: DataFrame, value_col: str = "value") -> DataFrame:
    """Reference `_test_trend`: the per-snapshot value sequence as an
    ordered array per metric (src/main.py:40-64)."""
    return per_snapshot.groupBy("metric", "k").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("snapshot_idx"), F.col(value_col).alias("v"))
                    )
                ),
                lambda s: F.format_number(s["v"], 4),
            ),
            ",",
        ).alias("trend")
    )
