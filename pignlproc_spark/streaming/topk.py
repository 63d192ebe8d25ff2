"""Streaming heavy hitters — "what are the top-k hosts / tokens /
urls in the crawl SO FAR?" in bounded state.

The classic sketch-plus-candidates construction (Cormode &
Muthukrishnan, J.Alg 2005 §4, the distributed practical form): a
CCCms v1 register store estimates ANY item's frequency from fixed
space (streaming/frequency.py), and a candidate store remembers every
item that ever made a micro-batch's exact per-group top-k. At read
time the candidates are ranked by their sketch estimate and the
global top-k reported.

Guarantees (stated honestly):

- est_count ≥ the item's true stream count, always (CMS one-sided).
- Any item that is ever among a batch's k most frequent items per
  group is tracked forever after. An adversarial item that stays just
  below every batch's top-k while accumulating globally CAN be missed
  — the standard compromise of candidate-tracking heavy hitters; size
  k above the report size (k_track ≥ 2–4× k_report) to shrink it.
  A true majority-style hitter (≥ 1/k of any batch) is always caught.

State: CMS registers are fixed (groups × 4 × 4096 cells); candidates
are ≤ distinct-ever-candidates rows (≤ batches × groups × k before
compaction, deduped to the distinct set by the MAX-merge fold).
Both stores share the manifest/high-water-mark replay contract of
streaming/counts.py, each under its own subdirectory of ``store_dir``
(``cms/`` and ``cand/``), so a crash between the two appends replays
each store exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pignlproc_spark.operators import sketches
from pignlproc_spark.streaming import counts, frequency


def _cms_dir(store_dir: str) -> str:
    return f"{store_dir}/cms"


def _cand_dir(store_dir: str) -> str:
    return f"{store_dir}/cand"


def _item_name(item: str) -> str:
    """``item`` may carry a type ("doc_id bigint") for the candidate
    store's cold-start schema — column references use the bare name."""
    return item.split()[0]


def append_batch(
    batch_df: DataFrame,
    batch_id: int,
    item: str,
    groups: tuple[str, ...],
    store_dir: str,
    k_track: int = 64,
) -> None:
    """Publish one micro-batch: its CMS register delta plus its exact
    per-group top-``k_track`` items as candidate rows. Idempotent per
    ``batch_id`` per store (manifest contract).

    The candidate window sorts one BATCH's distinct (group, item)
    counts — post-aggregation rows, not the stream. With no groups
    that is a single-reducer top-k over the batch's distinct items:
    bounded by the micro-batch, not the corpus, which is the
    batch-sizing contract (same stance as the per-host fetch-schedule
    window).

    ``item`` may carry a type spec ("doc_id bigint") — forwarded to
    the candidate store so a cold-start (empty) read has the same
    schema as a populated one for non-string item columns."""
    name = _item_name(item)
    frequency.append_batch(batch_df, batch_id, name, groups, _cms_dir(store_dir))
    bc = batch_df.groupBy(*groups, name).agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
        F.desc("_cnt"), F.col(name)
    )
    cand = (
        bc.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k_track)
        .select(*groups, name, F.lit(1).cast("long").alias("seen"))
    )
    counts.append_delta(cand, _cand_dir(store_dir), batch_id)


def read_candidates(
    spark: SparkSession, store_dir: str, item: str, groups: tuple[str, ...]
) -> DataFrame:
    """(groups…, item) — every item ever tracked (MAX-merged set).
    A typed ``item`` ("doc_id bigint") pins the cold-start schema."""
    return counts.read_counts(
        spark, _cand_dir(store_dir), [*groups, item], value="seen", how="max"
    ).drop("seen")


def read_topk(
    spark: SparkSession,
    store_dir: str,
    item: str,
    groups: tuple[str, ...] = (),
    k: int = 10,
) -> DataFrame:
    """(groups…, item, est_count, rank) — the top-``k`` tracked items
    per group by sketch estimate (ties broken by item, so the report
    is deterministic under replay and compaction)."""
    name = _item_name(item)
    cand = read_candidates(spark, store_dir, item, groups)
    est = frequency.read_estimates(spark, _cms_dir(store_dir), cand, name, groups)
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(
        F.desc("est_count"), F.col(name)
    )
    return est.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def compact(spark: SparkSession, store_dir: str, item: str, groups: tuple[str, ...]) -> None:
    """Fold both stores (CMS: SUM cells; candidates: MAX-dedup to the
    distinct set) — observably a no-op for readers."""
    counts.compact(
        spark, _cms_dir(store_dir), [*groups, "hrow int", "bucket"],
        min_deltas=1, value="cnt", how="sum",
    )
    counts.compact(
        spark, _cand_dir(store_dir), [*groups, item],
        min_deltas=1, value="seen", how="max",
    )


def foreach_batch_hook(
    item: str,
    groups: tuple[str, ...],
    store_dir: str,
    k_track: int = 64,
    compact_every: int | None = None,
):
    """A ``writeStream.foreachBatch`` callable maintaining both stores."""

    def hook(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, batch_id, item, groups, store_dir, k_track)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact(batch_df.sparkSession, store_dir, item, groups)

    return hook
