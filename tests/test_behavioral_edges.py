"""Edge-case fixtures for the round-8 behavioral operators — the
boundary semantics the sf-scale oracle pairs exercise only by luck:
the exact-30-minute session gap (NOT a split; the rule is strictly
greater), single-event bounce sessions, interleaved users, singleton
islands, and same-day duplicate orders."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

BASE = datetime(1995, 3, 1, 12, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, user_id, seconds_offset)."""
    df = spark.createDataFrame(
        [
            (eid, BASE + timedelta(seconds=off), uid, "click", 1.0, "{}")
            for eid, uid, off in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _write_orders(spark, tmp_path, day_offsets):
    df = spark.createDataFrame(
        [
            (i, 1 + i % 3, datetime(1995, 1, 1) + timedelta(days=d), 100.0)
            for i, d in enumerate(day_offsets)
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def test_session_gap_boundary_is_strictly_greater(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    # user 1: gaps of exactly 1800 s (one session of 3 events);
    # user 2: gap of 1801 s (two sessions, the second a bounce);
    # user 3: a single event (bounce).
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1, 0),
            (2, 1, 1800),
            (3, 1, 3600),
            (4, 2, 0),
            (5, 2, 1801),
            (6, 3, 0),
        ],
    )
    got = _QUERIES["events_session_stats"](spark, sf).collect()[0]
    assert got["n_sessions"] == 4
    assert got["n_events"] == 6
    assert got["max_session_events"] == 3
    # bounces: BOTH of user 2's sessions (each one event) and user 3's
    assert got["n_bounce_sessions"] == 3
    # mean duration: (3600 + 0 + 0 + 0) / 4
    assert got["mean_duration_secs"] == pytest.approx(900.0, abs=1e-6)


def test_sessions_interleaved_users_do_not_merge(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    # two users strictly alternating every second: still ONE session
    # per user (sessionization is per-user, not global).
    rows = [(i, 1 + i % 2, i) for i in range(10)]
    sf = _write_events(spark, tmp_path, rows)
    got = _QUERIES["events_session_stats"](spark, sf).collect()[0]
    assert got["n_sessions"] == 2
    assert got["n_events"] == 10
    assert got["n_bounce_sessions"] == 0


def test_gaps_and_islands_exact_runs(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    # day offsets {1,2,3, 7, 9,10} + a same-day duplicate (distinct
    # handling): islands (1-3), (7), (9-10).
    sf = _write_orders(spark, tmp_path, [1, 2, 3, 7, 9, 10, 2])
    got = _QUERIES["orders_gaps_and_islands"](spark, sf).collect()[0]
    assert got["n_islands"] == 3
    assert got["n_active_days"] == 6
    assert got["longest_len"] == 3
    assert got["mean_island_len"] == pytest.approx(2.0, abs=1e-6)


def test_gaps_and_islands_single_day(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    sf = _write_orders(spark, tmp_path, [5, 5, 5])
    got = _QUERIES["orders_gaps_and_islands"](spark, sf).collect()[0]
    assert got["n_islands"] == 1
    assert got["n_active_days"] == 1
    assert got["longest_len"] == 1


def test_retention_cohort_handcrafted(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    week = 7 * 24 * 3600
    # user 1: weeks 0,1 ; user 2: weeks 0 ; user 3: weeks 1
    # (offsets relative to BASE, which sits mid-week — the cohort ids
    # are whatever week bucket BASE lands in; offsets of exactly one
    # week keep every event in a well-defined consecutive bucket)
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 1, 0),
            (2, 1, week),
            (3, 2, 60),
            (4, 3, week + 60),
        ],
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): r
        for r in _QUERIES["events_retention_cohort"](spark, sf).collect()
    }
    cohorts = sorted({cw for cw, _ in rows})
    w0, w1 = cohorts[0], cohorts[-1]
    assert w1 == w0 + 1
    # cohort w0 = users 1,2 at offset 0; user 1 retained at offset 1
    assert rows[(w0, 0)]["n_users"] == 2
    assert rows[(w0, 1)]["n_users"] == 1
    assert rows[(w0, 1)]["retention"] == pytest.approx(0.5, abs=1e-6)
    # cohort w1 = user 3 only
    assert rows[(w1, 0)]["n_users"] == 1
    assert rows[(w1, 0)]["cohort_size"] == 1


def test_new_vs_returning_first_day_is_new(spark, tmp_path):
    from slipstream_async_spark.plans.catalog import _QUERIES

    day = 24 * 3600
    # user 1 active day 0 and day 2; user 2 active day 2 only
    sf = _write_events(
        spark,
        tmp_path,
        [(1, 1, 0), (2, 1, 2 * day), (3, 2, 2 * day)],
    )
    rows = {
        r["day_no"]: r
        for r in _QUERIES["events_new_vs_returning"](spark, sf).collect()
    }
    days = sorted(rows)
    d0, d2 = days[0], days[-1]
    assert rows[d0]["n_new"] == 1 and rows[d0]["n_returning"] == 0
    assert rows[d2]["n_new"] == 1 and rows[d2]["n_returning"] == 1
    assert rows[d2]["new_share"] == pytest.approx(0.5, abs=1e-6)
