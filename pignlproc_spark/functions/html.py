"""HTML → text extraction for crawled web pages — frozen "CCHtml v1".

Not in the reference (pignlproc consumes Wikipedia *markup*, handled
by the frozen CCWikiText spec in functions/extract.py; SURVEY.md §2.1
J5) — but the canonical input of a web-scale training pipeline is
crawled **HTML** (Common-Crawl WET-style extraction is the first
stage of C4, CCNet and RefinedWeb), so the engine needs a
deterministic, cross-engine-checkable HTML text extractor sitting
between `sources/warc.py` and the document-level curation operators.

Spec "CCHtml v1" — a fixed sequence of regex/literal rewrites, chosen
so the IDENTICAL rules run codegen'd in Spark (Java regex) and in the
DuckDB oracle (RE2). Cross-engine discipline (learned the hard way;
see tests/test_regex_parity.py): no bare ``\\b``/``\\s``/``\\w``, no
``$`` anchors (Java matches before a final newline, RE2 does not),
no backreferences (RE2 has none), whitespace classes spelled out,
case-insensitivity only over ASCII tag names.

Rewrite order (each step feeds the next):

1. comments ``<!--...-->`` → one space (dotall, non-greedy);
2. ``<script...>...</script...>`` blocks → one space (the body may
   contain ``<`` ``>`` freely; non-greedy to the first real closer);
3. ``<style...>...</style...>`` blocks → one space;
4. block-level tags (open or close, with attributes, self-closing)
   → newline — these are the line boundaries of the extracted text;
5. every remaining tag ``<...>`` → one space (inline tags, DOCTYPE,
   unknown tags). A ``<`` with no later ``>`` passes through; a bare
   ``< b and c >`` IS swallowed as a tag (standard extractor
   behavior — unescaped ``<`` in running text is malformed HTML);
6. named/numeric entity decode for the fixed v1 table (LITERAL
   replaces, ``&amp;`` deliberately last — so a double-escaped
   ``&amp;lt;`` decodes exactly once, to the literal text ``&lt;``,
   matching real HTML semantics for the table's entities);
7. whitespace normalization: horizontal runs → one space, then
   newline runs (with adjacent spaces) → one newline, then trim.

v1 limits (explicit, frozen): no numeric entity decoding beyond the
table; no <pre> whitespace preservation; no table-cell separators
beyond the generic tag→space rule; CDATA sections fall under rule 5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: HTML-whitespace class, spelled out (NEVER \s — Java's includes
#: \x0B, RE2's does not).
_WS = r" \t\n\r\x0C"

COMMENT_RE = r"(?s)<!--.*?-->"
SCRIPT_RE = rf"(?is)<script([{_WS}][^>]*)?>.*?</script([{_WS}][^>]*)?>"
STYLE_RE = rf"(?is)<style([{_WS}][^>]*)?>.*?</style([{_WS}][^>]*)?>"

#: Tags whose boundaries become line breaks in the extracted text.
BLOCK_TAGS = (
    "p|div|br|hr|li|ul|ol|dl|dt|dd|h[1-6]|tr|table|blockquote|pre"
    "|section|article|header|footer|nav|aside|figure|figcaption|form"
)
BLOCK_TAG_RE = rf"(?i)</?({BLOCK_TAGS})([{_WS}/][^>]*)?>"
ANY_TAG_RE = r"<[^>]*>"

#: Ordered literal entity table; (&amp; → &) MUST stay last so the
#: earlier rows see the raw source bytes, not re-introduced ones.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Horizontal whitespace runs (newline handled separately).
HSPACE_RUN_RE = r"[ \t\r\x0C]+"
#: A newline plus any surrounding collapsed whitespace → one newline.
NL_RUN_RE = r" *\n[ \n]*"
#: Characters trimmed from both ends (literal, not regex).
TRIM_CHARS = " \n"


def html_to_text_col(html: Column) -> Column:
    """CCHtml v1 extracted text of an HTML string column (Spark side)."""
    c = F.regexp_replace(html, COMMENT_RE, " ")
    c = F.regexp_replace(c, SCRIPT_RE, " ")
    c = F.regexp_replace(c, STYLE_RE, " ")
    c = F.regexp_replace(c, BLOCK_TAG_RE, "\n")
    c = F.regexp_replace(c, ANY_TAG_RE, " ")
    for ent, rep in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, HSPACE_RUN_RE, " ")
    c = F.regexp_replace(c, NL_RUN_RE, "\n")
    return F.btrim(c, F.lit(TRIM_CHARS))


def _sq(s: str) -> str:
    """Escape a literal for a single-quoted SQL string."""
    return s.replace("'", "''")


def html_to_text_sql(expr: str) -> str:
    """The DuckDB-side CCHtml v1 expression over SQL expression ``expr``
    — built from the SAME pattern/entity constants as the Spark side,
    so the two engines cannot drift apart. DuckDB's regexp_replace
    replaces only the first match by default, hence the 'g' flag on
    every rewrite (Spark's replaces all matches by definition)."""
    c = f"regexp_replace({expr}, '{_sq(COMMENT_RE)}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_sq(SCRIPT_RE)}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_sq(STYLE_RE)}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_sq(BLOCK_TAG_RE)}', chr(10), 'g')"
    c = f"regexp_replace({c}, '{_sq(ANY_TAG_RE)}', ' ', 'g')"
    for ent, rep in ENTITIES:
        c = f"replace({c}, '{_sq(ent)}', '{_sq(rep)}')"
    c = f"regexp_replace({c}, '{_sq(HSPACE_RUN_RE)}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_sq(NL_RUN_RE)}', chr(10), 'g')"
    return f"trim({c}, ' ' || chr(10))"


#: Anchor-href extraction, frozen "CCLink v1" tag scan: an ``<a`` tag
#: (whitespace REQUIRED after the tag name, so ``<abbr``/``<area``
#: never match), optional attributes that must END in whitespace
#: before ``href`` (so a decoy attribute like ``hreflang=`` or
#: ``xhref=`` never matches), then a DOUBLE-quoted value. v1 limits
#: (explicit, frozen): single-quoted and unquoted attribute values are
#: out of spec, as are attribute VALUES that themselves contain
#: ``href="..."`` (regex-level scan, same trade-off as CCSitemap's
#: ``<loc>`` rule). Case-insensitivity spelled out per character —
#: never ``(?i)`` over the capture, which would also fold the URL.
HREF_RE = rf'<[aA][{_WS}](?:[^>]*[{_WS}])?[hH][rR][eE][fF][{_WS}]*=[{_WS}]*"([^"]*)"'


def extract_hrefs_col(html: Column) -> Column:
    """array<string> of raw ``<a href="...">`` values, document order
    (CCLink v1 scan). Pure codegen'd projection — the link-graph feed
    runs at scan speed with no Python and no shuffle."""
    return F.regexp_extract_all(html, F.lit(HREF_RE), F.lit(1))


def extract_hrefs_sql(expr: str) -> str:
    """DuckDB-side CCLink v1 scan: a per-row LIST of raw hrefs, from
    the SAME frozen pattern (unnest at the call site)."""
    return f"regexp_extract_all({expr}, '{_sq(HREF_RE)}', 1)"


#: Whole-anchor-element scan (CCLink v1, the paired form): the same
#: decoy-proof open-tag grammar as HREF_RE, then the rest of the open
#: tag, inner TEXT with no markup, and the close tag. v1 limits
#: (frozen): anchors whose body contains nested tags (``<a><b>x</b>``)
#: or a ``<``/``>`` are out of spec and skipped — the pair extractor
#: trades recall for a cross-engine-exact, backtrack-free scan.
A_ELEM_RE = (
    rf'<[aA][{_WS}](?:[^>]*[{_WS}])?[hH][rR][eE][fF][{_WS}]*=[{_WS}]*"[^"]*"'
    rf"[^>]*>[^<]*</[aA][{_WS}]*>"
)

#: Inner text of a matched anchor element: the last ``>``-to-``</a``
#: span with no angle brackets inside — immune to ``>`` characters
#: hiding inside the quoted href value.
INNER_TEXT_RE = rf">([^<>]*)</[aA][{_WS}]*>"


def anchor_elems_col(html: Column) -> Column:
    """array<string> of whole ``<a href="...">text</a>`` elements in
    document order (CCLink v1 paired scan) — codegen'd, no Python."""
    return F.regexp_extract_all(html, F.lit(A_ELEM_RE), F.lit(0))


def anchor_href_col(elem: Column) -> Column:
    """Raw href value of one matched anchor element."""
    return F.regexp_extract(elem, HREF_RE, 1)


def anchor_text_col(elem: Column) -> Column:
    """Normalized surface form of one matched anchor element: inner
    text, HTML-whitespace runs collapsed to one space, trimmed — the
    web analogue of pignlproc's anchor-text surface form (the
    (surface, target) evidence KG linking is trained on)."""
    t = F.regexp_extract(elem, INNER_TEXT_RE, 1)
    return F.btrim(F.regexp_replace(t, rf"[{_WS}]+", " "), F.lit(" "))


def anchor_elems_sql(expr: str) -> str:
    """DuckDB twin of :func:`anchor_elems_col` (same frozen pattern)."""
    return f"regexp_extract_all({expr}, '{_sq(A_ELEM_RE)}', 0)"


def anchor_href_sql(elem: str) -> str:
    """DuckDB twin of :func:`anchor_href_col`."""
    return f"regexp_extract({elem}, '{_sq(HREF_RE)}', 1)"


def anchor_text_sql(elem: str) -> str:
    """DuckDB twin of :func:`anchor_text_col`."""
    inner = f"regexp_extract({elem}, '{_sq(INNER_TEXT_RE)}', 1)"
    return f"trim(regexp_replace({inner}, '[{_WS}]+', ' ', 'g'), ' ')"


#: Head-metadata scan, frozen "CCMeta v1" — the WAT-style metadata a
#: crawl pipeline wants per page WITHOUT a DOM: <title>, the
#: rel="canonical" link, named <meta> content (description, robots),
#: and hreflang alternates. Same grammar family as CCLink: per-char
#: case classes on tag/attribute NAMES (never ``(?i)`` over a
#: capture), whitespace REQUIRED before an attribute name (so
#: ``data-name=`` / ``xhref=`` decoys never match), DOUBLE-quoted
#: values only. Attribute ORDER is free: every key/value rule is the
#: coalesce of a key-first and a value-first pattern (RE2 has no
#: lookahead, so the two-order union is the cross-engine-safe spelling).
#: v1 limits (explicit, frozen): attribute VALUES are matched
#: lowercase-exact ("canonical", never "CANONICAL"); single-quoted /
#: unquoted attributes are out of spec; an empty value is
#: indistinguishable from an absent element (both → NULL); the scan
#: runs on the COMMENT-STRIPPED document (CCHtml's COMMENT_RE), so a
#: commented-out head element never wins.


def _ci(word: str) -> str:
    """Per-character case classes for a tag/attribute name."""
    return "".join(f"[{c}{c.upper()}]" for c in word)


_EQ = rf"[{_WS}]*=[{_WS}]*"
_PRE_ATTRS = rf"(?:[^>]*[{_WS}])?"

TITLE_RE = rf"<{_ci('title')}(?:[{_WS}][^>]*)?>([^<]*)</{_ci('title')}[{_WS}]*>"
HREFLANG_RE = rf'<{_ci("link")}[{_WS}]{_PRE_ATTRS}{_ci("hreflang")}{_EQ}"([^"]*)"'


def _elem_pair_res(tag: str, key: str, key_val: str, val: str) -> tuple[str, str]:
    """The two attribute-order patterns for <tag … key="key_val" …
    val="(captured)" …> — key-first and value-first."""
    t, k, v = _ci(tag), _ci(key), _ci(val)
    kv = rf'<{t}[{_WS}]{_PRE_ATTRS}{k}{_EQ}"{key_val}"[^>]*[{_WS}]{v}{_EQ}"([^"]*)"'
    vk = rf'<{t}[{_WS}]{_PRE_ATTRS}{v}{_EQ}"([^"]*)"[^>]*[{_WS}]{k}{_EQ}"{key_val}"'
    return kv, vk


CANONICAL_KV_RE, CANONICAL_VK_RE = _elem_pair_res("link", "rel", "canonical", "href")


def strip_comments_col(html: Column) -> Column:
    """The comment-stripped document every CCMeta scan runs on."""
    return F.regexp_replace(html, COMMENT_RE, " ")


def strip_comments_sql(expr: str) -> str:
    return f"regexp_replace({expr}, '{_sq(COMMENT_RE)}', ' ', 'g')"


def _first_nonempty(*cols: Column) -> Column:
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])


def page_title_col(stripped: Column) -> Column:
    """First <title> inner text, whitespace-normalized; NULL if absent
    or empty. ``stripped`` must be the comment-stripped document
    (:func:`strip_comments_col` — share one strip across all scans)."""
    t = F.regexp_extract(stripped, TITLE_RE, 1)
    return F.nullif(
        F.btrim(F.regexp_replace(t, rf"[{_WS}]+", " "), F.lit(" ")), F.lit("")
    )


def canonical_link_col(stripped: Column) -> Column:
    """href of the first rel="canonical" <link> (either attribute
    order); NULL if absent."""
    return _first_nonempty(
        F.regexp_extract(stripped, CANONICAL_KV_RE, 1),
        F.regexp_extract(stripped, CANONICAL_VK_RE, 1),
    )


def meta_content_col(stripped: Column, name: str) -> Column:
    """content of the first <meta name="{name}"> (either attribute
    order); NULL if absent. ``name`` is a frozen lowercase literal
    ("description", "robots", …), part of the rendered pattern."""
    kv, vk = _elem_pair_res("meta", "name", name, "content")
    return _first_nonempty(
        F.regexp_extract(stripped, kv, 1), F.regexp_extract(stripped, vk, 1)
    )


def hreflang_langs_col(stripped: Column) -> Column:
    """array<string> of hreflang attribute values of <link> elements,
    document order — the alternate-language cluster signal."""
    return F.regexp_extract_all(stripped, F.lit(HREFLANG_RE), F.lit(1))


def page_metadata(pages, html_col: str = "html"):
    """(…, title, canonical, description, noindex, n_hreflang) — the
    CCMeta v1 bundle. One comment strip shared by all five scans; a
    pure codegen'd projection (no shuffle, no Python), so it fuses
    into the scan exactly like CCHtml text extraction."""
    c = strip_comments_col(F.col(html_col))
    robots = meta_content_col(c, "robots")
    return pages.select(
        "*",
        page_title_col(c).alias("title"),
        canonical_link_col(c).alias("canonical"),
        meta_content_col(c, "description").alias("description"),
        F.coalesce(robots.contains("noindex"), F.lit(False)).alias("noindex"),
        F.size(hreflang_langs_col(c)).cast("bigint").alias("n_hreflang"),
    )


# --- DuckDB twins, rendered from the SAME frozen patterns ----------


def page_title_sql(stripped: str) -> str:
    t = f"regexp_extract({stripped}, '{_sq(TITLE_RE)}', 1)"
    norm = f"trim(regexp_replace({t}, '[{_WS}]+', ' ', 'g'), ' ')"
    return f"nullif({norm}, '')"


def canonical_link_sql(stripped: str) -> str:
    return (
        f"coalesce(nullif(regexp_extract({stripped}, '{_sq(CANONICAL_KV_RE)}', 1), ''), "
        f"nullif(regexp_extract({stripped}, '{_sq(CANONICAL_VK_RE)}', 1), ''))"
    )


def meta_content_sql(stripped: str, name: str) -> str:
    kv, vk = _elem_pair_res("meta", "name", name, "content")
    return (
        f"coalesce(nullif(regexp_extract({stripped}, '{_sq(kv)}', 1), ''), "
        f"nullif(regexp_extract({stripped}, '{_sq(vk)}', 1), ''))"
    )


def hreflang_langs_sql(stripped: str) -> str:
    return f"regexp_extract_all({stripped}, '{_sq(HREFLANG_RE)}', 1)"


def extract_pages(pages, html_col: str = "html", out_col: str = "text"):
    """(…, text) — CCHtml v1 extraction over a pages DataFrame.

    Scale shape: a pure projection — no shuffle, no Python; every
    rewrite is a codegen'd JVM regex, so extraction streams at scan
    speed and fuses into whatever filter/projection follows (the same
    single-stage property as CCWikiText's fused parse path,
    plans/pipeline.py)."""
    return pages.withColumn(out_col, html_to_text_col(F.col(html_col)))
