"""Deterministic tokenizer + stopwords.

Reference parity: ``pignlproc/index/LuceneTokenizer.java`` (SURVEY.md
§2.1 J14) — the tgalery-fork addition that tokenizes entity-context
text with a language-specific Lucene analyzer for Spotlight token
counts. Lucene is unavailable; we freeze our own spec:

Tokenizer spec (FROZEN): NFC-normalize, lowercase (Python ``str.lower``),
extract maximal runs of Unicode word characters ``[\\w]`` excluding
pure ``_``; drop tokens in the (broadcast) stopword set; drop tokens
longer than 64 chars.

Exposed three ways:
- :func:`tokenize` — pure Python (golden tests, generator).
- :func:`tokens_col` — Spark built-ins only (lower + regexp split) for
  the hot path; identical output to :func:`tokenize` by construction.
- stopword filtering via ``array_except`` against a broadcast literal
  array, or a post-explode ``isin`` filter.
"""

from __future__ import annotations

import re
import unicodedata

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# small frozen English-ish stoplist (the reference ships per-language
# stoplists; ours is frozen in-code so results are reproducible)
STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on or that the to was were will with".split()
)


def tokenize(text: str | None, stopwords: frozenset[str] | None = STOPWORDS) -> list[str]:
    if not text:
        return []
    text = unicodedata.normalize("NFC", text).lower()
    toks = _TOKEN_RE.findall(text)
    if stopwords:
        toks = [t for t in toks if t not in stopwords]
    return [t for t in toks if len(t) <= 64]


def tokens_col(col, with_stopwords: bool = True):
    """ARRAY<STRING> token column using JVM-side built-ins only.

    NB: matches :func:`tokenize` for NFC-clean ASCII-ish corpora (our
    synthetic corpus and the driver's ``documents`` table); the pandas
    path exists for full-Unicode parity when needed.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    # (?U): Java regex defaults \w to ASCII; the Unicode flag makes it
    # match the Python spec ('café' must tokenize as one word). NFC
    # normalization (the one remaining Python-spec step) has no JVM
    # builtin — non-NFC text routes through functions.tokenize.
    arr = F.regexp_extract_all(F.lower(col), F.lit(r"(?U)[^\W_]+"), 0)
    arr = F.filter(arr, lambda t: F.length(t) <= 64)
    if with_stopwords:
        # NOT array_except (it dedups — token counting needs the multiset)
        arr = F.filter(arr, lambda t: ~t.isin(list(STOPWORDS)))
    return arr
