"""Batch sessionization + cross-snapshot aggregation quirks."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.operators.sessions import (
    mean_skip_first,
    session_stats,
    sessionize,
    trend,
)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 0: 3 events, gap breaks after the second (40 min)
        (0, "2024-01-01 10:00:00", 0, 1.0),
        (1, "2024-01-01 10:10:00", 0, 2.0),
        (2, "2024-01-01 10:50:00", 0, 3.0),
        # user 1: single event
        (3, "2024-01-01 09:00:00", 1, 4.0),
        # user 0: exactly at the 30-min boundary -> same session
        (4, "2024-01-01 11:20:00", 0, 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_sessionize_gap_semantics(tiny_events):
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(tiny_events, gap_minutes=30).collect()
    }
    # events 0,1 in session 1; event 2 starts session 2 (40 min gap);
    # event 4 is exactly 30 min after event 2 -> NOT a break (> gap)
    assert got == {0: 1, 1: 1, 2: 2, 3: 1, 4: 2}


def test_session_stats(tiny_events):
    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"], r["total_value"])
        for r in session_stats(sessionize(tiny_events, gap_minutes=30)).collect()
    }
    assert stats[(0, 1)] == (2, 10 * 60 * 1_000_000, 3.0)
    assert stats[(0, 2)] == (2, 30 * 60 * 1_000_000, 8.0)
    assert stats[(1, 1)] == (1, 0, 4.0)


def test_mean_skip_first_and_trend(spark):
    per_snap = spark.createDataFrame(
        [(0, "recall", 10, 0.9), (1, "recall", 10, 0.2),
         (2, "recall", 10, 0.4), (3, "recall", 10, 0.6)],
        "snapshot_idx int, metric string, k int, value double",
    )
    m = mean_skip_first(per_snap).collect()[0]
    # first snapshot's 0.9 EXCLUDED (ref src/main.py:55-57)
    assert m["mean_value"] == pytest.approx(round((0.2 + 0.4 + 0.6) / 3, 4))
    t = trend(per_snap).collect()[0]
    assert t["trend"] == "0.9000,0.2000,0.4000,0.6000"
