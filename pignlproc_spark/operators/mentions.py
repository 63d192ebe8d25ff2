"""Mention extraction: parsed pages → (url, surface_form, uri) mention rows.

Reference parity: the core of
``examples/indexing/names_and_entities.pig`` (SURVEY.md §2.3):
``FOREACH articles GENERATE FLATTEN(SentencesWithLink(text, links,
paragraphs))`` then ``surfaceForm = SUBSTRING(sentence, startPos,
endPos)`` and ``uri = DBpediaUriEncode(target)`` (J6 + J11 + P18),
with redirect targets resolved through the redirect map (P12).

Spark shape: parquet scan → extract pandas UDF → contexts pandas UDF →
``explode`` → JVM-side uri-encode → broadcast redirect join. The only
Python in the hot path is the two Arrow-batched UDFs; everything
relational stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pignlproc_spark.operators.canonicalize import apply_redirects

URI_LANG = "en"


def extract_mentions(
    pages: DataFrame,
    redirects: DataFrame | None = None,
    granularity: str = "sentence",
    lang: str = URI_LANG,
) -> DataFrame:
    """pages(url, html, ...) → (url, ctx_idx, context, begin, end,
    surface_form, uri) — one row per in-context wiki link, target
    redirect-resolved and DBpedia-URI-encoded.

    Offset contract (SURVEY.md §7.4-2): ``context[begin:end] ==
    surface_form`` in Pig's 0-based [begin, end) convention.
    """
    from pignlproc_spark.functions.extract import fused_mentions_udf

    if "text" in pages.columns:
        pages = pages.drop("text")
    fused = fused_mentions_udf(granularity=granularity, lang=lang)
    cols = ["url"] + (["lang"] if "lang" in pages.columns else [])
    parsed = pages.select(*cols, fused(F.col("html")).alias("_p")).select(*cols, "_p.*")
    mentions = (
        parsed.where(F.col("redirect").isNull())
        .select(*cols, F.explode("mentions").alias("c"))
        .select(*cols, "c.ctx_idx", "c.context", "c.uri", "c.begin", "c.end", "c.surface_form")
    )
    if redirects is not None:
        mentions = apply_redirects(mentions, redirects, "uri")
    return mentions
