"""Streaming distinct-cardinality — CCHll v1 registers as micro-batch
deltas over the counts.py merge-on-read/compaction machinery.

"How many distinct urls / tokens has this crawl seen SO FAR?" is the
streaming form of the sketch question, and HLL answers it for free:
the register merge is MAX, which is associative, commutative and
IDEMPOTENT — so a union of per-batch register deltas is exactly the
sketch of the union of the batches, replaying a batch is a no-op at
the value level, and compaction (fold deltas → base with MAX) changes
nothing a reader can observe. That is strictly stronger than the SUM
deltas the count tables need (those rely on the manifest's
``folded_through`` high-water mark for replay safety; register deltas
get value-level idempotence on top of it).

Per micro-batch cost: the batch's registers only — at most
groups × 256 rows regardless of batch size; the estimate read is a
merge of live dirs plus one ≤256-rows-per-group aggregate. The items
themselves are never retained, which is the whole point: an exact
streaming distinct-count needs state proportional to the distinct set
(streaming/dedup.py pays exactly that for its ledger), while the
sketch answers within 1.04/√256 ≈ 6.5 % in a few KB per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pignlproc_spark.operators import sketches
from pignlproc_spark.streaming import counts


def append_batch(
    batch_df: DataFrame,
    batch_id: int,
    item: str,
    groups: tuple[str, ...],
    hll_dir: str,
) -> None:
    """Sketch one micro-batch and publish its register delta.

    Idempotent per ``batch_id`` (manifest contract) AND per value
    (MAX merge), so crash-replay at any point is safe."""
    regs = sketches.hll_registers(batch_df, item, groups)
    counts.append_delta(
        regs.withColumn("rho", regs["rho"].cast("long")), hll_dir, batch_id
    )


def read_registers(
    spark: SparkSession, hll_dir: str, groups: tuple[str, ...]
) -> DataFrame:
    """The merged everything-so-far register table (groups…, register, rho)."""
    return counts.read_counts(
        spark, hll_dir, [*groups, "register"], value="rho", how="max"
    )


def read_estimates(
    spark: SparkSession, hll_dir: str, groups: tuple[str, ...]
) -> DataFrame:
    """(groups…, n_registers, est_distinct) over everything ingested
    so far — identical to batch ``hll_distinct`` on the full history
    (asserted in tests/test_streaming.py)."""
    return sketches.hll_estimate(read_registers(spark, hll_dir, groups), groups)


def foreach_batch_hook(
    item: str,
    groups: tuple[str, ...],
    hll_dir: str,
    compact_every: int | None = None,
):
    """A ``writeStream.foreachBatch`` callable maintaining the sketch;
    optional compaction every N batches (MAX-merge fold — observably
    a no-op for readers, bounds the live-dir count)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, batch_id, item, groups, hll_dir)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            counts.compact(
                batch_df.sparkSession,
                hll_dir,
                [*groups, "register"],
                value="rho",
                how="max",
            )

    return hook
