"""As-of join: backward match semantics, tie-breaks, tolerance, and
the single-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from pignlproc_spark.operators.temporal import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 200), (3, 2, 150), (4, 3, 50)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 1, 100), (11, 1, 100), (12, 1, 180), (13, 2, 160)],
        "event_id long, user_id long, ts long",
    )
    return left, right


def test_asof_backward_semantics(spark, sides):
    left, right = sides
    got = {r.event_id: r for r in asof_join(left, right, on="user_id", ts_col="ts", right_cols=["event_id"]).collect()}
    assert len(got) == 4  # every left row survives
    # equal ts counts as "at or before"; among equal-ts rights the
    # greatest id wins (frozen tie-break)
    assert (got[1].event_id_ref, got[1].ts_ref) == (11, 100)
    # latest at-or-before, not just any earlier
    assert (got[2].event_id_ref, got[2].ts_ref) == (12, 180)
    # right row strictly AFTER the left ts never matches
    assert got[3].event_id_ref is None and got[3].ts_ref is None
    # key with no right rows at all
    assert got[4].event_id_ref is None


def test_asof_tolerance_and_payload(spark, sides):
    left, right = sides
    got = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", right_cols=["event_id"], tolerance=10
        ).collect()
    }
    assert got[1].event_id_ref == 11  # lag 0 <= 10
    assert got[2].event_id_ref is None  # lag 20 > 10 -> dropped to NULL
    # extra payload columns ride along and left extra columns survive
    r2 = right.withColumn("sev", F.col("event_id") * 2)
    l2 = left.withColumn("note", F.lit("n"))
    row = {
        r.event_id: r
        for r in asof_join(l2, r2, on="user_id", ts_col="ts", right_cols=["event_id", "sev"]).collect()
    }
    assert row[2].sev_ref == 24 and row[2].note == "n"


def test_asof_single_shuffle_no_python(spark, sides):
    import contextlib
    import io

    left, right = sides
    df = asof_join(left, right, on="user_id", ts_col="ts", right_cols=["event_id"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    # union-and-window: exactly one hash exchange (on the key), no
    # join operator, no Python eval
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session_windows_batch(spark):
    import datetime as dt

    from pignlproc_spark.operators.temporal import session_windows

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, s(0)), (2, 1, s(1800)), (3, 1, s(1800 + 1799)),  # one merged session (exact-gap merges)
        (4, 1, s(1800 + 1799 + 1801)),  # gap 1801 > 1800 -> new session
        (5, 2, s(100)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_start): r
        for r in session_windows(df, key="user_id", ts_col="ts", gap="30 minutes").collect()
    }
    a = got[(1, s(0))]
    assert a.n_events == 3 and a.session_end == s(3599 + 1800)
    b = got[(1, s(5400))]
    assert b.n_events == 1 and b.session_end == s(5400 + 1800)
    assert got[(2, s(100))].n_events == 1
    assert len(got) == 3


def test_tumbling_and_sliding_windows(spark):
    import datetime as dt

    from pyspark.sql import functions as F2

    from pignlproc_spark.operators.temporal import tumbling_windows

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    rows = [(1, "a", s(0)), (2, "a", s(899)), (3, "a", s(900)), (4, "b", s(0))]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp")
    got = {
        (r.k, r.window_start): (r.n_events, r.window_end, r.id_sum)
        for r in tumbling_windows(
            df, "ts", "15 minutes", keys=("k",),
            value_exprs=[F2.sum("event_id").cast("bigint").alias("id_sum")],
        ).collect()
    }
    # half-open epoch-aligned buckets: ts=900 starts the NEXT bucket
    assert got == {
        ("a", s(0)): (2, s(900), 3),
        ("a", s(900)): (1, s(1800), 3),
        ("b", s(0)): (1, s(900), 4),
    }
    # sliding 30m-by-15m: every event lands in exactly 2 windows
    sl = tumbling_windows(df, "ts", "30 minutes", slide="15 minutes", keys=("k",)).collect()
    assert sum(r.n_events for r in sl) == 2 * len(rows)
    a = {r.window_start: r.n_events for r in sl if r.k == "a"}
    assert a == {s(-900): 2, s(0): 3, s(900): 1}


def test_interval_join(spark):
    from pignlproc_spark.operators.intervals import interval_join

    fact = spark.createDataFrame([(1, 5), (2, 10), (3, 25), (4, 99)], "id long, v long")
    iv = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 30), ("ab", 5, 15)], "band string, lo long, hi long"
    )
    out = interval_join(fact, iv, "v", bucket_width=8)
    got = {(r.id, r.band) for r in out.collect()}
    # half-open [lo, hi): v=10 misses band a, hits b and ab
    assert got == {(1, "a"), (1, "ab"), (2, "b"), (2, "ab"), (3, "b")}
    # left join keeps unmatched fact rows
    left = interval_join(fact, iv, "v", bucket_width=8, how="left")
    rows = {r.id: r for r in left.collect() if r.band is None}
    assert set(rows) == {4}
    # bucketing is width-invariant (same result at any positive width)
    for w in (1, 3, 100):
        assert {(r.id, r.band) for r in interval_join(fact, iv, "v", bucket_width=w).collect()} == got
    # empty / inverted intervals (hi <= lo) match nothing — they must
    # not blow up F.sequence with 'illegal sequence boundaries'
    iv_degen = spark.createDataFrame(
        [("empty", 5, 5), ("inverted", 30, 10), ("a", 0, 10)],
        "band string, lo long, hi long",
    )
    got_degen = {(r.id, r.band) for r in interval_join(fact, iv_degen, "v", bucket_width=8).collect()}
    assert got_degen == {(1, "a")}
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    plan = buf.getvalue()
    # the whole point: an equi-join, NOT a nested-loop/cartesian scan
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    with pytest.raises(ValueError):
        interval_join(fact, iv, "v", bucket_width=0)


def test_user_ewma_matches_recurrence(spark):
    """The grouped-map applyInPandas EWMA equals the plain-Python
    recurrence s_i = a*v_i + (1-a)*s_{i-1} seeded with v_0."""
    import datetime as dt

    from pignlproc_spark.operators.temporal import user_ewma

    base = dt.datetime(2024, 1, 1)
    rows = []
    vals = {1: [10.0, 20.0, 30.0, 0.0], 2: [5.0], 3: [1.0, 1.0, 100.0]}
    eid = 0
    for u, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, u, base + dt.timedelta(seconds=i), v))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r.event_id: r.ewma for r in user_ewma(df, alpha=0.3).collect()}

    eid = 0
    for u, vs in vals.items():
        s = None
        for v in vs:
            s = v if s is None else 0.3 * v + 0.7 * s
            assert got[eid] == pytest.approx(s, rel=1e-12), f"event {eid}"
            eid += 1
    assert len(got) == len(rows)


def test_cohort_retention(spark):
    """Retention semantics: cohort = first active day; a user counts
    once per returned day; offset 0 row is the cohort size."""
    from datetime import datetime

    from pignlproc_spark.operators.temporal import cohort_retention

    day = lambda d, h=0: datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        (1, day(1)), (1, day(1, 5)), (1, day(3)),   # u1: cohort d1, returns d3
        (2, day(1)), (2, day(2)),                   # u2: cohort d1, returns d2
        (3, day(2)),                                # u3: cohort d2 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    e = lambda d: int(datetime(2024, 1, d).timestamp())  # noqa: E731 (session TZ = UTC)
    got = {(r.cohort_epoch, r.day_offset): r.n_users for r in cohort_retention(df).collect()}
    assert got == {
        (e(1), 0): 2,  # u1+u2 on their cohort day (dup events collapse)
        (e(1), 1): 1,  # u2 returns next day
        (e(1), 2): 1,  # u1 returns two days later
        (e(2), 0): 1,  # u3's own cohort
    }


def test_funnel_ordering_semantics(spark):
    """Funnel counts users whose steps happen strictly in order from
    the earliest-completion chain; out-of-order users drop at the
    step they failed."""
    from datetime import datetime

    from pignlproc_spark.operators.temporal import funnel

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2 clicked BEFORE viewing; never clicks after -> stops at view
        (2, "click", t(0)), (2, "view", t(1)), (2, "purchase", t(2)),
        # u3 views + clicks only
        (3, "view", t(0)), (3, "click", t(5)),
        # u4 purchase only -> never enters
        (4, "purchase", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.step_idx: (r.step, r.n_users) for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}
