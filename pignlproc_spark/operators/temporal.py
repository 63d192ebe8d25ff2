"""Temporal operators over event streams: the as-of join.

The as-of join (each left row matched to the latest right row at or
before its timestamp, per key) is the classic operator relational
engines bolt on for time-series work (kdb+ ``aj``, DuckDB/pandas
``ASOF JOIN``). Spark has no built-in; the naive formulations are a
range-condition theta join (O(n·m) per key) or a per-key sort-merge in
Python. Neither survives 100 TB.

Scale shape here: the **union-and-window** formulation — tag both
sides, union them, and run ONE window pass per key ordered by
(ts, side, tie), carrying the right row's payload forward with
``last(..., ignorenulls)``. Cost is a single hash shuffle on the key
plus an in-partition sort — exactly the cost of the group-by both
sides already need — with no join, no range predicate, and no
per-key Python. Skew is the per-key event count, the same skew any
per-key window has; AQE handles moderate cases and upstream
sessionization caps pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_ref",
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row, plus the payload of the
    latest ``right`` row with the same ``on`` key and ``right.ts <=
    left.ts`` (ties at equal ts: the right side wins "at or before",
    and among equal-ts right rows the greatest ``right_cols[0]`` wins —
    a frozen, engine-reproducible tie-break, so ``right_cols[0]`` must
    be a unique id). Unmatched left rows keep NULL payloads.

    ``tolerance`` (same units as ``ts_col``) drops matches older than
    ``left.ts - tolerance`` back to NULL, pandas ``merge_asof``-style.

    Returns all ``left`` columns plus ``<c><suffix>`` for each of
    ``right_cols`` and ``<ts_col><suffix>`` for the matched timestamp.
    """
    lcols = left.columns
    reserved = {"_side", "_tie", "_ref", "_m"}
    bad = reserved & (set(lcols) | set(right.columns))
    if bad:
        raise ValueError(f"asof_join reserves column names {sorted(bad)}")
    if ts_col in right_cols:
        raise ValueError(
            f"{ts_col!r} in right_cols collides with the emitted "
            f"'{ts_col}{suffix}' match-timestamp column"
        )
    out_names = set(lcols) | {f"{c}{suffix}" for c in [ts_col, *right_cols]}
    if not right_cols:
        raise ValueError(
            "asof_join needs at least one right_cols entry (the first doubles "
            "as the frozen deterministic tie-break id)"
        )
    if len(out_names) != len(lcols) + 1 + len(right_cols):
        raise ValueError("asof_join output column names collide; change suffix")
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("_side"),
        F.col(right_cols[0]).alias("_tie"),
        payload.alias("_ref"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts_col)],
    )
    l = left.select(
        on,
        ts_col,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_ref"].dataType).alias("_ref"),
        *[c for c in lcols if c not in (on, ts_col)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        r.unionByName(l)
        .withColumn("_m", F.last("_ref", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        m = m.withColumn(
            "_m",
            F.when(F.col(ts_col) - F.col("_m._ts") <= F.lit(tolerance), F.col("_m")),
        )
    return m.select(
        *lcols,
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def tumbling_windows(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str | None = None,
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
    value_exprs: list | None = None,
) -> DataFrame:
    """(keys..., window_start, window_end, n_events[, extra aggs]) —
    native fixed-size time windows (``F.window``): tumbling when
    ``slide`` is None, overlapping/sliding otherwise (each event lands
    in ``duration/slide`` windows). Window starts are epoch-aligned
    (1970-01-01, session TZ pinned UTC), so ``start =
    floor(ts / duration) * duration`` — frozen, oracle-reproducible.

    ``value_exprs`` appends extra aggregate columns (already aliased)
    to the per-window count. Works unchanged on batch or stream; pass
    ``watermark`` on streams so closed windows emit and their state is
    evicted. One shuffle on (window, keys); the window assignment is a
    Catalyst projection (Expand for sliding), no Python anywhere.
    """
    d = df.withWatermark(ts_col, watermark) if watermark else df
    w = F.window(F.col(ts_col), duration, slide) if slide else F.window(F.col(ts_col), duration)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")] + list(value_exprs or [])
    agged = d.groupBy(w.alias("w"), *keys).agg(*aggs)
    extra = [c for c in agged.columns if c not in ("w", *keys, "n_events")]
    return agged.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
        *extra,
    )


def session_windows(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """(key, session_start, session_end, n_events) — native Spark
    session windows (``F.session_window``): consecutive events of a
    key merge while each arrives within ``gap`` of the session's
    (extending) end; ``session_end`` is last event + gap. Boundary
    semantics (probed, frozen): a gap of EXACTLY ``gap`` still merges
    — identical to the lag/cumsum batch formulation's ``diff > gap``
    new-session rule, which is this operator's oracle.

    Works unchanged on a batch DataFrame or a stream; pass
    ``watermark`` on streams so state for closed sessions is evicted —
    without it, session state grows forever. One shuffle on
    (key, merged window); Catalyst's SessionWindow node does the
    interval merging, no Python anywhere.
    """
    d = df.withWatermark(ts_col, watermark) if watermark else df
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    left_cols: tuple = ("event_id",),
    right_cols: tuple = ("event_id",),
    how: str = "inner",
) -> DataFrame:
    """(k, l_ts, l_*, r_ts, r_*) — every (left, right) event pair with
    the same key where the right event PRECEDES the left within
    ``lookback``: the attribution / funnel join (purchase ← the clicks
    that led to it). The many-match sibling of :func:`asof_join`
    (which keeps only the latest single match).

    Works unchanged on batch AND streaming inputs. Streaming: this is
    the canonical Spark *stream-stream inner join* — both sides get
    event-time watermarks, and the time-bound condition
    ``l_ts - lookback ≤ r_ts ≤ l_ts`` is what lets the state store
    evict: a buffered right row older than ``watermark + lookback``
    can never match a future left row, so state is bounded without any
    custom operator. Without the bound Spark would have to buffer both
    streams forever — the bound is a correctness-of-resource contract,
    not an optimization.

    Scale shape (batch): one equi-shuffle on the key; the range bound
    is a codegen'd post-join predicate. Per-key fanout is
    |left per key| × |right per key in window| — bounded by the
    lookback, the same knob that bounds streaming state.
    """
    l = left.select(
        F.col(on).alias("k"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
    )
    r = right.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col("k") == F.col("_rk"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    # left_outer: unmatched left rows emit with NULL right columns —
    # in streaming only once the watermark proves no match can still
    # arrive (Spark requires the watermark + time bound for this)
    return l.join(r, cond, how).drop("_rk")


def user_ewma(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """(user_id, event_id, ewma) — exponentially weighted moving
    average of each key's value sequence in (ts, id) order:
    ``s_i = α·v_i + (1−α)·s_{i−1}`` (pandas ``ewm(adjust=False)``
    semantics, seeded with the first value).

    This is the engine's one STATELESS grouped-map
    ``applyInPandas`` operator — kept deliberately narrow: the
    recursion is inherently sequential per group, and the relational
    closed form (pow-weighted prefix sums) underflows/overflows at
    real sequence lengths, so this is the case where the grouped-map
    escape hatch is the right tool rather than a missed relational
    rewrite (CLAUDE.md's no-Python-in-hot-path rule governs
    *relational* pipelines; per-group sequential state is exactly what
    the hatch exists for).

    Scale shape: ONE shuffle on the group key; each group arrives as a
    single Arrow-batched pandas frame, so memory is bounded by the
    largest single key's history — the same per-key bound any
    sessionization already holds. Float output ⇒ rows-only driver
    check + exact pytest vs an independent recurrence.
    """
    import pandas as pd  # noqa: F401 (documents the dependency)

    def fn(pdf):
        pdf = pdf.sort_values([ts_col, id_col])
        out = pdf[[key_col, id_col]].copy()
        out["ewma"] = pdf[val_col].ewm(alpha=alpha, adjust=False).mean()
        return out

    # derive key/id types from the input so string keys etc. fail at
    # plan time (or just work), never as an opaque Arrow worker error
    key_t = df.schema[key_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    return df.groupBy(key_col).applyInPandas(
        fn, schema=f"{key_col} {key_t}, {id_col} {id_t}, ewma double"
    )


def cohort_retention(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """(cohort_epoch, day_offset, n_users) — the classic retention
    triangle: users grouped by their FIRST active day (the cohort),
    counted on each later day they return (offset in days from the
    cohort day; offset 0 is the cohort's size). Exact integers (epoch
    seconds of the day bucket, day offsets, distinct-user counts).

    Scale shape: distinct (user, day) first (map-side combine absorbs
    the event fanout — nothing heavier than one row per user-day ever
    shuffles again), a per-user min-day aggregate, an equi-join back
    on user (co-partitioned), one final count aggregate. No windows
    over the corpus, no self-join of raw events.
    """
    day = F.unix_timestamp(F.date_trunc("day", F.col(ts_col))).cast("bigint")
    ud = events.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    firsts = ud.groupBy("u").agg(F.min("d").alias("cohort_epoch"))
    return (
        ud.join(firsts, "u")
        .groupBy(
            "cohort_epoch",
            ((F.col("d") - F.col("cohort_epoch")) / 86400).cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step_idx, step, n_users) — ordered funnel: how many users
    performed the steps IN ORDER (each step strictly after the
    earliest valid occurrence of the previous one; the standard
    earliest-completion funnel, which is deterministic and maximizes
    conversion counts — if any ordering of a user's events completes
    the funnel, the greedy earliest chain does too).

    Scale shape: one filtered scan per step (the ``type_col`` filter
    pushes to parquet), each reduced to one row per user BEFORE the
    next equi-join on user — k-1 co-partitioned joins of per-user
    aggregates, never an event-level self-join. ``step_idx`` is
    1-based.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    out = None
    cur = None  # (u, _t): earliest completion time of the prefix
    for i, s in enumerate(steps):
        ev = events.where(F.col(type_col) == s).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("_ts")
        )
        if cur is None:
            cur = ev.groupBy("u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(cur, "u")
                .where(F.col("_ts") > F.col("_t"))
                .groupBy("u")
                .agg(F.min("_ts").alias("_t"))
            )
        row = cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).cast("int").alias("step_idx"), F.lit(s).alias("step"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out
