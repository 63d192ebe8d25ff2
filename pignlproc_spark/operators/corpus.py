"""NER-corpus and topic-corpus analogues.

Reference parity (SURVEY.md §2.3):
- ``examples/ner-corpus/02_dbpedia_article_types.pig`` — typed-URI
  dimension (our ``entity_types`` side table; J4b loads it from NT).
- ``examples/ner-corpus/03_join_by_type_and_convert.pig`` — JOIN
  sentence mentions by target URI with types, then
  ``MergeAsOpenNLPAnnotatedText`` (J10): render each sentence with
  inline ``<START:type> surface <END>`` span markers.
- ``examples/topic-corpus/*.pig`` — count articles per category, keep
  "grounded" topics (count ≥ N), walk skos:broader transitively
  (pointer-chasing, same machinery as redirects), join long abstracts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pignlproc_spark.operators.canonicalize import MAX_HOPS, resolve_mapping


def typed_mentions(mentions: DataFrame, entity_types: DataFrame) -> DataFrame:
    """mentions ⋈ broadcast types → one row per (mention, type)."""
    dim = F.broadcast(entity_types.select(F.col("uri").alias("_turi"), "type"))
    return mentions.join(dim, mentions["uri"] == dim["_turi"], "inner").drop("_turi")


def opennlp_render(sentence: str, spans: list) -> str:
    """J10 MergeAsOpenNLPAnnotatedText: splice ``<START:type> s <END>``
    markers by character offsets (0-based [begin,end), descending so
    earlier offsets stay valid). Overlapping spans: keep the earliest,
    drop overlaps (frozen choice)."""
    chosen = []
    last_end = -1
    for s in sorted(spans, key=lambda x: (x["begin"], x["end"])):
        if s["begin"] >= last_end:
            chosen.append(s)
            last_end = s["end"]
    out = sentence
    for s in reversed(chosen):  # splice descending so offsets stay valid
        out = out[: s["begin"]] + f"<START:{s['type']}> " + out[s["begin"] : s["end"]] + " <END>" + out[s["end"] :]
    return out


def ner_training_sentences(mentions: DataFrame, entity_types: DataFrame) -> DataFrame:
    """(url, ctx_idx, type-annotated sentence) — the ner-corpus output.

    Group typed mentions per sentence, collect spans, render with a
    pandas UDF (string splicing by offsets is inherently positional —
    the one place higher-order functions would be contortion)."""
    from pyspark.sql.functions import pandas_udf

    tm = typed_mentions(mentions, entity_types)
    grouped = tm.groupBy("url", "ctx_idx", "context").agg(
        F.collect_list(F.struct("begin", "end", "type")).alias("spans")
    )

    @pandas_udf("string")
    def _render(context: pd.Series, spans: pd.Series) -> pd.Series:
        return pd.Series(
            [opennlp_render(c, list(s)) for c, s in zip(context, spans)]
        )

    return grouped.select(
        "url", "ctx_idx", _render(F.col("context"), F.col("spans")).alias("annotated")
    )


def grounded_topics(article_categories: DataFrame, min_articles: int = 3) -> DataFrame:
    """(category, n_articles) for categories with enough members."""
    return (
        article_categories.groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_articles"))
        .where(F.col("n_articles") >= min_articles)
    )


def broader_closure(skos_broader: DataFrame, max_hops: int = MAX_HOPS) -> DataFrame:
    """(category, root) — transitive skos:broader resolution, bounded
    and cycle-safe: the redirects pointer-chase applied to the
    category graph. Multi-parent categories (the real Wikipedia case —
    skos:broader is a DAG) resolve through the lexicographically-
    smallest parent chain, deterministically on both resolve_mapping
    code paths; single-parent hierarchies are unaffected."""
    edges = skos_broader.select(F.col("category").alias("src_uri"), F.col("parent").alias("dst_uri"))
    m = resolve_mapping(edges, max_hops=max_hops)
    return m.select(F.col("src_uri").alias("category"), F.col("resolved_uri").alias("root"))


def topic_abstract_corpus(
    article_categories: DataFrame, abstracts: DataFrame, min_articles: int = 3
) -> DataFrame:
    """(category, uri, abstract) for grounded topics — the
    topic-corpus join product."""
    grounded = grounded_topics(article_categories, min_articles).select("category")
    return (
        article_categories.join(F.broadcast(grounded), "category")
        .join(abstracts, "uri")
        .select("category", "uri", "abstract")
    )
