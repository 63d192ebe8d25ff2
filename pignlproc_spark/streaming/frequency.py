"""Streaming point-frequency estimation — CCCms v1 registers as
micro-batch deltas over the counts.py merge-on-read machinery.

"How often has this crawl seen token/url X SO FAR?" is the streaming
form of the frequency question. The count-min merge is per-cell SUM —
associative and commutative, so a union of per-batch register deltas
is exactly the sketch of the union of the batches. SUM is NOT
idempotent (unlike the HLL MAX in streaming/cardinality.py), so
replay safety rests on the manifest's ``folded_through`` high-water
mark — the same contract the exact count tables already rely on, and
the same foreachBatch/batch_id discipline.

Per micro-batch cost: the batch's registers only — at most
groups × D_CMS × 4096 rows regardless of batch size; a lookup reads
the merged live dirs plus one broadcast join against the probe set.
The items themselves are never retained: an exact streaming frequency
table needs state proportional to the distinct set, while the sketch
answers within e/4096 ≈ 0.066 % of total insertions (δ = e^−4) in a
bounded table per group.
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
    cms_dir: str,
) -> None:
    """Sketch one micro-batch and publish its register delta.
    Idempotent per ``batch_id`` via the manifest high-water mark
    (SUM deltas have no value-level idempotence — do not re-append
    a batch under a fresh id)."""
    regs = sketches.cms_registers(batch_df, item, groups)
    counts.append_delta(regs, cms_dir, batch_id)


def read_registers(
    spark: SparkSession, cms_dir: str, groups: tuple[str, ...]
) -> DataFrame:
    """The merged everything-so-far register table
    (groups…, hrow, bucket, cnt)."""
    return counts.read_counts(
        spark, cms_dir, [*groups, "hrow int", "bucket"], value="cnt", how="sum"
    )


def read_estimates(
    spark: SparkSession,
    cms_dir: str,
    probes: DataFrame,
    item: str,
    groups: tuple[str, ...] = (),
) -> DataFrame:
    """(groups…, item, est_count) over everything ingested so far —
    identical to batch ``cms_lookup`` on the full history (asserted
    in tests/test_streaming.py)."""
    return sketches.cms_lookup(
        read_registers(spark, cms_dir, groups), probes, item, groups
    )


def foreach_batch_hook(
    item: str,
    groups: tuple[str, ...],
    cms_dir: str,
    compact_every: int | None = None,
):
    """A ``writeStream.foreachBatch`` callable maintaining the sketch;
    optional compaction every N batches (SUM-merge fold — observably
    a no-op for readers, bounds the live-dir count)."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, batch_id, item, groups, cms_dir)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            counts.compact(
                batch_df.sparkSession,
                cms_dir,
                [*groups, "hrow int", "bucket"],
                value="cnt",
                how="sum",
            )

    return hook
