"""Annotating markup extraction — the engine's J5 analogue.

Reference parity: ``pignlproc/markup/AnnotatingMarkupParser.java`` +
``Annotation.java`` (SURVEY.md §2.1 J5; reconstructed — the reference
mount was empty). The reference renders wiki markup with a bliki
WikiModel subclass and side-collects link/header/paragraph annotations
with character offsets into the rendered text, plus ``#REDIRECT``
detection. We freeze our own normative spec ("CCWikiText v1", below)
over Common-Crawl-style ``html`` bytes, because BASELINE.json:15
demands byte-identical extracted text per url and the reference binary
is unavailable — determinism against pinned goldens is the testable
invariant (SURVEY.md §5.2).

CCWikiText v1 spec (FROZEN — never change without regenerating
``tests/golden``):

1. ``html`` is decoded as UTF-8 (``errors="replace"``).
2. A page whose body (after stripping leading whitespace) starts with
   ``#REDIRECT [[Target]]`` (case-insensitive, optional colon) is a
   redirect: ``text = ""``, ``redirect`` = normalized target title.
3. Strip, in order: HTML comments ``<!-- -->``; ``<script>``/
   ``<style>`` blocks with content; ``<ref>..</ref>`` / ``<ref/>``;
   ``{{templates}}`` (innermost-out, bounded nesting). The order is
   observable on pathological overlaps and is NORMATIVE — it matches
   the implementation and the pinned goldens.
4. Block structure: ``<h1..6>`` → header block; ``<p>`` → paragraph
   block; any stray top-level text run becomes a paragraph. Blocks are
   joined with ``"\n\n"``; final text has no trailing newline.
5. Inline content: ``<a href="/wiki/T">s</a>`` and ``[[T|s]]`` /
   ``[[T]]`` become their surface text and record a link annotation
   ``(target, begin, end, label)`` with offsets into the FINAL text
   (0-based, [begin, end), Pig SUBSTRING convention — SURVEY.md §2.2
   P18). All other tags are dropped, keeping inner text. Entities
   ``&amp; &lt; &gt; &quot; &apos; &nbsp; &#N; &#xH;`` are decoded
   (``&nbsp;`` → regular space); invalid numeric references — malformed
   digits, codepoints > 0x10FFFF, or surrogates U+D800–U+DFFF (which
   no UTF-8 sink could encode) — stay literal text. Whitespace runs
   collapse to one space; block edges are trimmed.
6. Headers additionally record ``(level, begin, end, title)``;
   paragraphs record ``(begin, end)``. Link targets are normalized
   titles (percent-unescaped, ``_``-joined, first char uppercased —
   see functions/uri.py).

The public batch API is :func:`extract_batch` (pandas in/out) and the
Spark-side :func:`extract_udf` — an Arrow-batched pandas UDF returning
one STRUCT column (never per-row Python; BASELINE.json:15).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import pandas as pd

from pignlproc_spark.functions.uri import normalize_title

# ---------------------------------------------------------------------------
# pure-python core (one doc at a time; batched by the pandas UDF below)
# ---------------------------------------------------------------------------

_REDIRECT_RE = re.compile(r"^#REDIRECT\s*:?\s*\[\[([^\]|#]+)(?:#[^\]|]*)?(?:\|[^\]]*)?\]\]", re.IGNORECASE)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_REF_RE = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.DOTALL | re.IGNORECASE)
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}", re.DOTALL)
_BLOCK_RE = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>|<p[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_INLINE_RE = re.compile(
    r'<a\s+[^>]*href="(?:https?://[^/"]*)?/wiki/([^"#]*)(?:#[^"]*)?"[^>]*>(.*?)</a>'  # 1,2 html anchor
    r"|\[\[([^\]|#]+)(?:#[^\]|]*)?(?:\|([^\]]*))?\]\]"  # 3,4 wiki link
    r"|(<[^>]+>)"  # 5 other tag (dropped)
    r"|(&(?:[a-zA-Z]+|#[0-9]+|#x[0-9a-fA-F]+);)",  # 6 entity
    re.DOTALL,
)
_WS_RE = re.compile(r"\s+")

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "ndash": "–",
    "mdash": "—",
}

# Non-article namespaces: links into these render their surface text
# but are NOT recorded as entity annotations — parity with the
# reference's article-namespace-only link collection
# (pignlproc/markup/AnnotatingMarkupParser.java [M], SURVEY.md §2.1 J5).
# Frozen set; lowercase comparison on the prefix before ':'.
NON_ARTICLE_NAMESPACES = frozenset(
    "file image media category wikipedia help portal template talk user special book draft".split()
)


def _is_article_target(target: str) -> bool:
    head, sep, _ = target.partition(":")
    if not sep:
        return True
    return head.strip().lower() not in NON_ARTICLE_NAMESPACES


class Annotation(NamedTuple):
    """Parity: pignlproc/markup/Annotation.java (value, begin, end, label)."""

    value: str
    begin: int
    end: int
    label: str


def _decode_entity(raw: str) -> str:
    body = raw[1:-1]
    if body.startswith("#x") or body.startswith("#X"):
        try:
            cp = int(body[2:], 16)
        except ValueError:
            return raw
        # surrogate NCRs (&#xD800;-&#xDFFF;) decode to lone surrogates
        # that cannot be UTF-8/Arrow-encoded — ONE such entity on one
        # crawled page would kill the whole batch at serialization.
        # Treat them like any other invalid reference: literal text.
        # (chr() itself raises for > 0x10FFFF → same raw fallback.)
        if 0xD800 <= cp <= 0xDFFF:
            return raw
        try:
            return chr(cp)
        except ValueError:
            return raw
    if body.startswith("#"):
        try:
            cp = int(body[1:])
        except ValueError:
            return raw
        if 0xD800 <= cp <= 0xDFFF:
            return raw
        try:
            return chr(cp)
        except ValueError:
            return raw
    return _ENTITIES.get(body.lower(), raw)


class _Builder:
    """Whitespace-collapsing text builder with offset tracking."""

    __slots__ = ("parts", "length", "pending")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.length = 0
        self.pending = False  # a whitespace run awaits emission

    def ws(self) -> None:
        if self.length:
            self.pending = True

    def flush(self) -> None:
        if self.pending:
            self.parts.append(" ")
            self.length += 1
            self.pending = False

    def emit(self, s: str) -> None:
        if not s:
            return
        if self.pending:
            self.parts.append(" ")
            self.length += 1
            self.pending = False
        self.parts.append(s)
        self.length += len(s)

    def text(self) -> str:
        return "".join(self.parts)


def _clean_inline(markup: str, out: _Builder, links: list[Annotation] | None) -> None:
    """Render inline markup into ``out``; record link annotations."""
    pos = 0
    for m in _INLINE_RE.finditer(markup):
        _emit_text(markup[pos : m.start()], out)
        pos = m.end()
        if m.group(1) is not None or m.group(3) is not None:
            if m.group(1) is not None:
                target_raw, surface_raw = m.group(1), m.group(2)
            else:
                target_raw = m.group(3)
                surface_raw = m.group(4) if m.group(4) is not None else m.group(3)
            if "<" not in surface_raw and "&" not in surface_raw and "[" not in surface_raw:
                # no markup possible in the surface: plain ws-collapse
                # (identical to a sub-render: leading/trailing runs drop,
                # interior runs become single spaces)
                surface = " ".join(surface_raw.split())
            else:
                sub = _Builder()
                _clean_inline(surface_raw, sub, None)
                surface = sub.text()
            if surface:
                out.flush()
                begin = out.length
                out.emit(surface)
                if links is not None and _is_article_target(target_raw):
                    target = normalize_title(target_raw)
                    if target:
                        links.append(Annotation(target, begin, out.length, surface))
        elif m.group(5) is not None:
            pass  # bare tag: dropped, inner text handled by linear scan
        elif m.group(6) is not None:
            ch = _decode_entity(m.group(6))
            _emit_text(ch, out)
    _emit_text(markup[pos:], out)


def _emit_text(s: str, out: _Builder) -> None:
    # equivalent to emitting each non-ws chunk with pending-space
    # between runs: split() collapses interior runs to single spaces,
    # ws() handles the boundary runs (hot path — keep allocation-light)
    if not s:
        return
    parts = s.split()
    if not parts:
        out.ws()
        return
    if s[0].isspace():
        out.ws()
    out.emit(" ".join(parts))
    if s[-1].isspace():
        out.ws()


class ExtractResult(NamedTuple):
    text: str
    redirect: str | None
    links: list[Annotation]
    headers: list[tuple[int, int, int, str]]  # (level, begin, end, title)
    paragraphs: list[tuple[int, int]]  # (begin, end)


def extract(html: bytes | str | None) -> ExtractResult:
    """CCWikiText v1: html bytes → (text, redirect, links, headers, paragraphs).

    Deterministic pure function; the byte-identity surface of the
    engine (BASELINE.json:15).
    """
    if html is None:
        return ExtractResult("", None, [], [], [])
    raw = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    body = raw.lstrip()
    m = _REDIRECT_RE.match(body)
    if m:
        return ExtractResult("", normalize_title(m.group(1)), [], [], [])

    # stripped constructs are replaced by "" (FROZEN; renderers never
    # butt words directly against them, so no word-joining can occur)
    cleaned = _COMMENT_RE.sub("", raw)
    cleaned = _SCRIPT_RE.sub("", cleaned)
    cleaned = _REF_RE.sub("", cleaned)
    for _ in range(8):  # bounded template nesting
        cleaned, n = _TEMPLATE_RE.subn("", cleaned)
        if not n:
            break

    blocks: list[tuple[str, str | None, str]] = []  # (kind, level, inner)
    pos = 0
    for m in _BLOCK_RE.finditer(cleaned):
        stray = cleaned[pos : m.start()]
        if stray.strip():
            blocks.append(("p", None, stray))
        pos = m.end()
        if m.group(1) is not None:
            blocks.append(("h", m.group(1), m.group(2)))
        else:
            blocks.append(("p", None, m.group(3)))
    tail = cleaned[pos:]
    if tail.strip():
        blocks.append(("p", None, tail))

    parts: list[str] = []
    length = 0
    links: list[Annotation] = []
    headers: list[tuple[int, int, int, str]] = []
    paragraphs: list[tuple[int, int]] = []
    for kind, level, inner in blocks:
        out = _Builder()
        blinks: list[Annotation] = []
        _clean_inline(inner, out, blinks)
        block_text = out.text()
        if not block_text:
            continue
        if length:
            parts.append("\n\n")
            length += 2
        begin = length
        parts.append(block_text)
        length += len(block_text)
        for a in blinks:
            links.append(Annotation(a.value, a.begin + begin, a.end + begin, a.label))
        if kind == "h":
            headers.append((int(level), begin, length, block_text))
        else:
            paragraphs.append((begin, length))
    return ExtractResult("".join(parts), None, links, headers, paragraphs)


# ---------------------------------------------------------------------------
# Spark surface: Arrow-batched pandas UDF returning one STRUCT column
# ---------------------------------------------------------------------------

EXTRACT_SCHEMA = (
    "text string, redirect string, "
    "links array<struct<target:string,begin:int,end:int,label:string>>, "
    "headers array<struct<level:int,begin:int,end:int,title:string>>, "
    "paragraphs array<struct<begin:int,end:int>>"
)


def extract_batch(html: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper: one parse per row, Arrow-batched transfer."""
    texts, redirects, links, headers, paragraphs = [], [], [], [], []
    for value in html:
        r = extract(value)
        texts.append(r.text)
        redirects.append(r.redirect)
        links.append([{"target": a.value, "begin": a.begin, "end": a.end, "label": a.label} for a in r.links])
        headers.append([{"level": h[0], "begin": h[1], "end": h[2], "title": h[3]} for h in r.headers])
        paragraphs.append([{"begin": p[0], "end": p[1]} for p in r.paragraphs])
    return pd.DataFrame(
        {"text": texts, "redirect": redirects, "links": links, "headers": headers, "paragraphs": paragraphs}
    )


def extract_udf():
    """Return the pandas UDF (created lazily so importing this module
    does not require an active SparkSession)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(EXTRACT_SCHEMA)
    def _extract(html: pd.Series) -> pd.DataFrame:
        return extract_batch(html)

    return _extract


FUSED_SCHEMA = (
    "text string, redirect string, "
    "mentions array<struct<ctx_idx:int,context:string,target:string,uri:string,begin:int,end:int,surface_form:string>>"
)


def fused_mentions_udf(granularity: str = "sentence", lang: str = "en"):
    """Fused extract + contexts-with-links in ONE pandas UDF:
    html → (text, redirect, mentions[]).

    Identical frozen semantics to ``parse_pages`` →
    ``sentences_with_links`` (it calls the same pure functions), but
    the link/header/paragraph annotation structs never cross the
    Arrow boundary — at high parallelism the list-of-struct ⇄ Python
    dict conversion is allocation-bound and costs more CPU than the
    parse itself, so fusing the two stages roughly halves pipeline CPU
    and removes a full pass over the parsed cache. This is the hot
    path run() uses; the layered API remains for parity/inspection.

    Emits ``uri`` (DBpedia-encoded, memoized pure-Python uri_encode)
    alongside the raw target: percent-encoding of non-ASCII/reserved
    titles cannot be reproduced with JVM built-ins, and computing it
    here costs nothing extra (already inside the Python stage).
    """
    from pyspark.sql.functions import pandas_udf

    from pignlproc_spark.functions.sentences import contexts_with_links
    from pignlproc_spark.functions.uri import uri_encode

    @pandas_udf(FUSED_SCHEMA)
    def _fused(html: pd.Series) -> pd.DataFrame:
        texts, redirects, mentions = [], [], []
        for value in html:
            r = extract(value)
            texts.append(r.text)
            redirects.append(r.redirect)
            if r.redirect is not None or not r.text:
                mentions.append([])
                continue
            links = [{"target": a.value, "begin": a.begin, "end": a.end, "label": a.label} for a in r.links]
            paras = [{"begin": p[0], "end": p[1]} for p in r.paragraphs]
            ctxs = contexts_with_links(r.text, links, paras, granularity)
            for c in ctxs:
                c["uri"] = uri_encode(c["target"], lang)
            mentions.append(ctxs)
        return pd.DataFrame({"text": texts, "redirect": redirects, "mentions": mentions})

    return _fused


def parse_pages(pages_df, html_col: str = "html"):
    """pages(url, warc_ts, html, lang) → parsed articles DataFrame.

    Parity: ``pignlproc/storage/ParsingWikipediaLoader.java`` (J2) —
    scan + parse in one pass; output one row per page with nested
    annotation arrays (SURVEY.md §1.1). Column pruning still works:
    only ``html`` feeds the UDF; Catalyst prunes the rest at the scan.
    """
    from pyspark.sql import functions as F

    parsed = pages_df.withColumn("_parsed", extract_udf()(F.col(html_col)))
    return parsed.select(
        *[c for c in pages_df.columns if c != html_col],
        F.col("_parsed.text").alias("text"),
        F.col("_parsed.redirect").alias("redirect"),
        F.col("_parsed.links").alias("links"),
        F.col("_parsed.headers").alias("headers"),
        F.col("_parsed.paragraphs").alias("paragraphs"),
    )
