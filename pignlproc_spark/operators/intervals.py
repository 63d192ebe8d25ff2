"""Interval (range) joins as bucketed equi-joins.

Spark has no range-join optimization: a join on ``lo <= v AND v < hi``
plans as BroadcastNestedLoopJoin (every fact row probes every
interval) or, worse, a cartesian product — O(n·m) work that a
predicate can't save. The standard scale path is the **bucketing
reformulation**: pick a bucket width, expand each interval to the
buckets it covers, bucket each fact value, equi-join on the bucket id,
then re-check the exact predicate. The join becomes a plain
hash join — broadcastable when the interval side is small, a
shuffled equi-join when it is not — and Catalyst/AQE treat it like
any other join (skew handling, codegen, pushdown all apply).

Cost model: interval side blows up by ceil(span / bucket_width)
rows per interval; fact side gains one projected column. Pick
``bucket_width`` near the median interval span so the expansion
factor stays O(1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int = 1,
    broadcast_intervals: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to every interval with ``lo <= value < hi``
    (half-open; integer domain). Overlapping intervals yield multiple
    matches — standard interval-join semantics.

    ``how='inner'`` drops unmatched fact rows; ``'left'`` keeps them
    with NULL interval columns (the re-check predicate is folded into
    the join condition so left semantics survive).

    Empty/inverted intervals (``hi <= lo``) match nothing under the
    half-open semantics and are filtered out before the bucket
    expansion — ``F.sequence`` with stop < start and a positive step
    would otherwise throw an "illegal sequence boundaries" runtime
    error mid-job instead of yielding zero matches.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    v = F.col(value_col)
    # bucket key = the bucket's START VALUE (x - pmod(x, w)): pure
    # int64 subtraction, no division — floor(x / w) through a double
    # silently misbuckets |x| > 2^53 (e.g. nanosecond epochs)
    w = F.lit(bucket_width)

    def start(c):
        return c - F.pmod(c, w)

    iv = intervals.where(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_b",
        F.explode(
            F.sequence(start(F.col(lo_col)), start(F.col(hi_col) - 1), w)
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    f = fact.withColumn("_b", start(v))
    cond = (
        (f["_b"] == iv["_b"]) & (v >= iv[lo_col]) & (v < iv[hi_col])
    )
    return f.join(iv, cond, how).drop("_b")
