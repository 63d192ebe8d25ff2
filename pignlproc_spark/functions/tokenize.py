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

#: the same frozen word rule in Java-regex spelling — the single
#: source for every JVM-side tokenizer expression (tokens_col,
#: functions/register.py). NOT a translation of ``\w``: Java's Unicode
#: \w includes combining marks (Mn/Mc/Me), connector punctuation
#: beyond '_' (U+203F, U+FF3F), and Join_Control (ZWNJ/ZWJ), while
#: excluding the No numerics (², ½) Python's isnumeric admits — every
#: one a silent tokenization divergence. The positive class
#: [L, Nd, Nl, No] is exactly CPython's ``isalnum()`` (= the frozen
#: Python spec ``[^\W_]``), verified by an exhaustive BMP differential
#: test (test_functions.py::test_tokenize_parity_exhaustive_bmp). The
#: only residual divergence is Unicode DATABASE VERSION skew: Java 17
#: carries Unicode 13.0, CPython 3.11 carries 14.0, so the 53 BMP
#: codepoints assigned in 14.0 (Arabic Extended-B, Tagalog RA, …) are
#: letters to Python and unassigned to the JVM — pinned as an explicit
#: allowlist in that test.
TOKEN_RE_JVM = r"[\p{L}\p{Nd}\p{Nl}\p{No}]+"

# Frozen per-language stoplists — parity with the reference's
# LuceneTokenizer(stoplistPath, stoplistName, lang, analyzer) ctor
# parameterization (tgalery fork's multilingual additions, SURVEY.md
# §2.1 J14). Frozen in-code so results are reproducible offline.
STOPWORDS_BY_LANG: dict[str, frozenset[str]] = {
    "en": frozenset(
        "a an and are as at be by for from has he in is it its of on or that the to was were will with".split()
    ),
    "de": frozenset("der die das und ist von mit den nicht ein eine im für auf des dem als auch an".split()),
    "fr": frozenset("le la les et de des est dans pour une un du au aux par sur que qui ne pas".split()),
    "es": frozenset("el la los las y de es en por una un del al con se que no para más como".split()),
    "zh": frozenset("的 是 在 了 和 有 我 不 这 中 大 为 上 个 国 也 以 要 他 时".split()),
}
STOPWORDS = STOPWORDS_BY_LANG["en"]  # frozen default (goldens depend on it)


def stopwords_for(lang: str) -> frozenset[str]:
    return STOPWORDS_BY_LANG.get(lang, STOPWORDS)


_HAN_RUN = re.compile(r"[一-鿿]+")


def cjk_bigrams(text: str | None) -> list[str]:
    """CJK analysis (frozen): maximal Han runs → overlapping character
    bigrams (runs of length 1 emit the single char) — the classic
    Lucene CJKAnalyzer behavior the reference used for zh models."""
    if not text:
        return []
    out: list[str] = []
    for m in _HAN_RUN.finditer(text):
        run = m.group()
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


def tokenize(text: str | None, stopwords: frozenset[str] | None = STOPWORDS) -> list[str]:
    if not text:
        return []
    text = unicodedata.normalize("NFC", text).lower()
    toks = _TOKEN_RE.findall(text)
    if stopwords:
        toks = [t for t in toks if t not in stopwords]
    return [t for t in toks if len(t) <= 64]


def cjk_bigrams_col(col):
    """JVM-side CJK bigrams, identical to :func:`cjk_bigrams`: extract
    Han runs with a codegen'd regexp, fan bigrams out with transform
    (tiny arrays — HOF interpretation is irrelevant at run granularity)."""
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    runs = F.regexp_extract_all(col, F.lit(r"[一-鿿]+"), 0)
    bigrams = F.transform(
        runs,
        lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(r) - 1), lambda i: F.substring(r, i, 2))
        ),
    )
    return F.flatten(bigrams)


def tokens_col(col, apply_stoplist: bool = True, lang: str = "en"):
    """ARRAY<STRING> token column using JVM-side built-ins only.

    ``apply_stoplist=True`` means "apply the stopword step", i.e. the
    stoplist is FILTERED OUT (Lucene analyzer semantics); ``False``
    keeps every token — the dedup/window operators use ``False``.

    NB: matches :func:`tokenize` for NFC-clean ASCII-ish corpora (our
    synthetic corpus and the driver's ``documents`` table); the pandas
    path exists for full-Unicode parity when needed.
    """
    from pyspark.sql import functions as F

    if isinstance(col, str):
        col = F.col(col)
    # TOKEN_RE_JVM is the plain positive class
    # [\p{L}\p{Nd}\p{Nl}\p{No}]+ (see its definition block — Java
    # property classes are Unicode-aware without any flag, so 'café'
    # is one word). NFC normalization (the one remaining Python-spec
    # step) has no JVM builtin — non-NFC text routes through
    # functions.tokenize.
    arr = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE_JVM), 0)
    arr = F.filter(arr, lambda t: F.length(t) <= 64)
    if apply_stoplist:
        # NOT array_except (it dedups — token counting needs the multiset)
        arr = F.filter(arr, lambda t: ~t.isin(list(stopwords_for(lang))))
    return arr
