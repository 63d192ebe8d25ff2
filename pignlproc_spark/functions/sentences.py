"""Sentence/paragraph contexts with rebased link spans.

Reference parity: ``pignlproc/evaluation/SentencesWithLink.java`` (J6)
and ``ParagraphsWithLink.java`` (J7) — SURVEY.md §2.1. The reference
sentence-splits with an OpenNLP model (binary unavailable offline);
we freeze a deterministic rule-based splitter spec instead
(SURVEY.md §5.2 golden-file strategy):

Splitter spec (FROZEN): within a paragraph span, a sentence boundary
is the position after a maximal run of ``.!?`` that is followed by at
least one whitespace character. Each sentence is trimmed of leading /
whitespace (offsets move accordingly). Empty sentences are dropped.

A link belongs to a sentence iff its whole span fits inside the
sentence span (FLATTEN of an empty bag drops the row — so sentences
without links vanish, exactly like the reference's UDTF; SURVEY.md
§2.2 P4). Emitted link offsets are rebased to the sentence
(0-based [begin,end)), so ``sentence[begin:end] == label`` always.
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

_BOUNDARY_RE = re.compile(r"[.!?]+(?=\s)")


def split_sentences(text: str, begin: int, end: int) -> list[tuple[int, int]]:
    """Sentence spans (absolute offsets) inside text[begin:end]."""
    spans: list[tuple[int, int]] = []
    seg = text[begin:end]
    start = 0
    for m in _BOUNDARY_RE.finditer(seg):
        spans.append((start, m.end()))
        start = m.end()
    if start < len(seg):
        spans.append((start, len(seg)))
    out: list[tuple[int, int]] = []
    for s, e in spans:
        while s < e and seg[s].isspace():
            s += 1
        while e > s and seg[e - 1].isspace():
            e -= 1
        if e > s:
            out.append((begin + s, begin + e))
    return out


def contexts_with_links(
    text: str,
    links: Iterable[dict],
    paragraphs: Iterable[dict],
    granularity: str = "sentence",
) -> list[dict]:
    """One output row per (context, link) pair, link offsets rebased.

    granularity: 'sentence' (J6) or 'paragraph' (J7).
    """
    if not text:
        return []
    paras = [(p["begin"], p["end"]) for p in paragraphs]
    if granularity == "paragraph":
        spans = paras
    else:
        spans = [s for b, e in paras for s in split_sentences(text, b, e)]
    out: list[dict] = []
    link_list = sorted(links, key=lambda a: (a["begin"], a["end"]))
    for idx, (b, e) in enumerate(spans):
        ctx = None
        for a in link_list:
            if a["begin"] >= b and a["end"] <= e:
                if ctx is None:
                    ctx = text[b:e]
                out.append(
                    {
                        "ctx_idx": idx,
                        "context": ctx,
                        "target": a["target"],
                        "begin": a["begin"] - b,
                        "end": a["end"] - b,
                        "surface_form": a["label"],
                    }
                )
    return out


CONTEXTS_SCHEMA = (
    "array<struct<ctx_idx:int,context:string,target:string,begin:int,end:int,surface_form:string>>"
)


def contexts_udf(granularity: str = "sentence"):
    """pandas UDF: (text, links, paragraphs) → ARRAY<STRUCT> (explode after).

    UDTF-as-array pattern (SURVEY.md §2.2 coverage note): never the
    per-row Python UDTF API.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(CONTEXTS_SCHEMA)
    def _ctx(text: pd.Series, links: pd.Series, paragraphs: pd.Series) -> pd.Series:
        rows = []
        for t, ls, ps in zip(text, links, paragraphs):
            if t is None:
                rows.append([])
                continue
            rows.append(contexts_with_links(t, ls if ls is not None else [], ps if ps is not None else [], granularity))
        return pd.Series(rows)

    return _ctx


def sentences_with_links(parsed_df, granularity: str = "sentence"):
    """parsed articles → exploded (url, ctx_idx, context, target, begin, end, surface_form).

    Parity: the FOREACH ... FLATTEN(SentencesWithLink(...)) idiom in
    examples/indexing/names_and_entities.pig (SURVEY.md §2.3).
    """
    from pyspark.sql import functions as F

    ctx = contexts_udf(granularity)
    return (
        parsed_df.where(F.col("redirect").isNull())
        .select("url", "lang", F.explode(ctx("text", "links", "paragraphs")).alias("c"))
        .select("url", "lang", "c.ctx_idx", "c.context", "c.target", "c.begin", "c.end", "c.surface_form")
    )
