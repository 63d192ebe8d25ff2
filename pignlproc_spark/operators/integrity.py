"""KG integrity audit — the post-materialization QA pass a production
graph build runs before publishing a snapshot (referential integrity,
functional-property and multi-edge checks, weight sanity).

The reference pipeline (SURVEY.md §2.3 — count-table emission via
names_and_entities.pig and friends) publishes its outputs with no
validation stage; at 10^12-document scale a silent extraction
regression (a parser change dropping a namespace, a join key gone
NULL) corrupts downstream consumers long before a human reads the
tables. These operators make the audit a first-class relational pass
over the frozen (subj, pred, obj, weight) embedding
(operators/triples.py).

All exact integers — oracle hash-matchable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: preds of the frozen triple embedding (triples.py) that are
#: functional — exactly one object per subject by construction; >1
#: distinct objects for a subject is a build defect.
FUNCTIONAL_PREDS = ("kg:uriCount", "kg:annotatedCount", "kg:totalCount")


def graph_audit(triples: DataFrame, functional_preds=FUNCTIONAL_PREDS) -> DataFrame:
    """One audit row per predicate: (pred, n_triples, n_subj,
    max_fanout, n_self_loops, n_bad_weight, n_null_obj, n_dup_triples,
    n_functional_violations).

    - ``max_fanout``: largest per-subject row count — the hub-skew
      signal that decides salting width for the partitioned write.
    - ``n_self_loops``: subj == obj rows (extraction echo defects).
    - ``n_bad_weight``: weight <= 0 OR NULL (counts must be positive;
      a NULL weight is the aggregate-gone-NULL twin of the NULL-object
      defect and must not slip through the <= comparison's
      NULL-propagation).
    - ``n_null_obj``: NULL objects — the "join key gone NULL" defect
      this module exists to catch, counted explicitly (and NULL is
      treated as ONE distinct object value in the dup/functional
      checks below, so NULL-carrying subjects are audited, not
      silently miscategorized).
    - ``n_dup_triples``: rows beyond the first per (subj, pred, obj)
      — the bag-union embedding is dedup-free by contract, so
      duplicates mean an upstream stage double-emitted.
    - ``n_functional_violations``: subjects of a functional pred with
      more than one distinct object (NULL counts as a value: a real
      object plus a NULL is a violation).

    Scale shape: the triples shuffle ONCE at data scale — Catalyst
    rewrites the distinct-obj aggregate into a partial/final pass
    keyed (pred, subj, obj) (map-side combined, so exact-duplicate
    triples collapse before the exchange) — and every later aggregate
    runs on dimensions: (pred, subj, obj) → (pred, subj) → pred, each
    input strictly smaller. All checks fold into that single cascade;
    no joins, no second pass over the triple set.
    """
    per_subj = triples.groupBy("pred", "subj").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        # count_distinct skips NULLs; add the NULL "value" back so 3×
        # (s, p, NULL) is 2 dups of one object, not 3 phantom dups
        (F.count_distinct("obj") + F.max(F.when(F.col("obj").isNull(), 1).otherwise(0)))
        .cast("bigint")
        .alias("_n_obj"),
        F.sum(F.when(F.col("subj") == F.col("obj"), 1).otherwise(0)).cast("bigint").alias("_self"),
        F.sum(F.when((F.col("weight") <= 0) | F.col("weight").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("_bad"),
        F.sum(F.when(F.col("obj").isNull(), 1).otherwise(0)).cast("bigint").alias("_null"),
    )
    is_func = F.col("pred").isin(*functional_preds)
    return per_subj.groupBy("pred").agg(
        F.sum("_n").cast("bigint").alias("n_triples"),
        F.count(F.lit(1)).cast("bigint").alias("n_subj"),
        F.max("_n").cast("bigint").alias("max_fanout"),
        F.sum("_self").cast("bigint").alias("n_self_loops"),
        F.sum("_bad").cast("bigint").alias("n_bad_weight"),
        F.sum("_null").cast("bigint").alias("n_null_obj"),
        # rows sharing an already-seen obj within (pred, subj) are
        # duplicate (s, p, o) triples regardless of weight
        F.sum(F.col("_n") - F.col("_n_obj")).cast("bigint").alias("n_dup_triples"),
        F.sum(F.when(is_func & (F.col("_n_obj") > 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_functional_violations"),
    )


def dangling_refs(
    triples: DataFrame, ref_pred: str = "kg:mentions", target_pred: str = "kg:uriCount"
) -> DataFrame:
    """(obj, n_refs) — referential-integrity check: objects of
    ``ref_pred`` edges that no ``target_pred`` row defines as a
    subject (mentions pointing at entities the entity dimension never
    materialized — a dropped join input or a canonicalization miss).

    Scale shape: the ref side pre-aggregates to (obj, n_refs) — the
    entity dimension, not the edge set — before a LEFT ANTI join
    against the target-pred subject dimension, hashed on the same key.
    Both anti-join inputs are entity-cardinality; the edges collapse
    map-side. No broadcast assumption: at 10^12 docs the entity
    dimension itself is too big to ship, so the equi-key shuffle IS
    the plan (AQE converts to broadcast when a small snapshot allows).
    """
    refs = (
        triples.where(F.col("pred") == ref_pred)
        .groupBy("obj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_refs"))
    )
    defined = triples.where(F.col("pred") == target_pred).select(F.col("subj").alias("obj"))
    return refs.join(defined, "obj", "left_anti")
