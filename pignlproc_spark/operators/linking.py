"""Mention → entity candidate scoring with broadcast dictionaries.

Reference parity: pignlproc itself only *produces* the statistics
(pairCounts / sfAndTotalCounts) that DBpedia Spotlight turns into a
linker; BASELINE.json:6 asks this engine to also run the scoring step:
"batched mention detection and entity-link scoring using broadcast
surface-form→URI dictionaries with link-probability statistics
(anchor count / occurrence count)".

Semantics (frozen):

- ``link_probability(sf) = anchor_count / occurrence_count`` from the
  ``surface_forms`` dimension (occurrence_count ≥ anchor_count ≥ 0 by
  construction; -1 sentinels never reach this table).
- candidate ranking per surface form: by ``anchor_count`` desc (the
  P(uri|sf) numerator), tie-broken by uri asc — per-group top-k via a
  window (SURVEY.md §2.2 P15 / J13 FirstNtuples).
- mention scoring: broadcast-join mentions to candidates (P11
  'replicated' join), score = candidate anchor share × link prob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def candidate_topk(surface_forms: DataFrame, k: int = 3) -> DataFrame:
    """(surface_form, uri, anchor_count, occurrence_count, rank) — the
    k most-linked entities per surface form."""
    w = Window.partitionBy("surface_form").orderBy(F.desc("anchor_count"), F.asc("uri"))
    return (
        surface_forms.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("surface_form", "uri", "anchor_count", "occurrence_count", "rank")
    )


def link_probability(surface_forms: DataFrame) -> DataFrame:
    """(surface_form, anchor_total, occurrence_total, link_prob) — how
    often a surface form is a link when it appears at all."""
    agg = surface_forms.groupBy("surface_form").agg(
        F.sum("anchor_count").alias("anchor_total"),
        F.max("occurrence_count").alias("occurrence_total"),
    )
    return agg.withColumn(
        "link_prob",
        F.when(F.col("occurrence_total") > 0, F.col("anchor_total") / F.col("occurrence_total")).otherwise(
            F.lit(0.0)
        ),
    )


def score_mentions(mentions: DataFrame, surface_forms: DataFrame, k: int = 3) -> DataFrame:
    """mentions(url, surface_form, ...) × broadcast candidate dict →
    (url, surface_form, candidate_uri, score, rank).

    score = anchor_count / sum(anchor_count over the sf's candidates):
    the P(uri|sf) estimate the reference's pairCounts exist to supply.
    The dict side is broadcast — the (huge) mention side never
    shuffles. AQE skew-join covers the residual case where the dict
    outgrows the broadcast threshold on a real cluster.
    """
    cands = candidate_topk(surface_forms, k)
    sf_tot = cands.groupBy("surface_form").agg(F.sum("anchor_count").alias("_sf_anchor_total"))
    dim = F.broadcast(
        cands.join(sf_tot, "surface_form").select(
            F.col("surface_form").alias("_sf"),
            F.col("uri").alias("candidate_uri"),
            "anchor_count",
            "_sf_anchor_total",
            "rank",
        )
    )
    return (
        mentions.join(dim, mentions["surface_form"] == dim["_sf"], "inner")
        .withColumn(
            "score",
            F.when(F.col("_sf_anchor_total") > 0, F.col("anchor_count") / F.col("_sf_anchor_total")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_sf", "anchor_count", "_sf_anchor_total")
    )
