"""Encoding-damage (mojibake) detection & repair — frozen "CCMoji v1".

Not in the reference (pignlproc's wiki dumps are clean UTF-8) — but
real crawled text is full of UTF-8 bytes that were decoded as
cp1252/latin-1 somewhere upstream ("Ã©" for "é", "â€™" for a right
single quote). Every production web-corpus cleaner carries an
ftfy-style repair pass; this is the bounded, cross-engine-checkable
version of that pass.

Spec "CCMoji v1":

- The repair table is GENERATED, not hand-typed: for each target char
  ``c`` in ``TARGET_CHARS``, the damaged form is
  ``c.encode("utf-8").decode("cp1252")`` — the canonical definition of
  the artifact. Targets whose UTF-8 bytes hit one of cp1252's five
  undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) are excluded at module
  load (they cannot round-trip and so cannot appear via this damage
  path).
- Repair = one literal replace per table row, longest damaged form
  first (3-byte targets like the curly quotes produce 3-char damage
  starting 'â', 2-byte Latin letters produce 2-char damage starting
  'Ã' — the families share no prefix, but the order is still pinned
  for determinism). Single pass: doubly-damaged text (mojibake of
  mojibake) repairs one level per application; documented v1 limit.
- Detection = count of non-overlapping matches of the alternation of
  all damaged forms, longest first (Java and RE2 both use
  leftmost-first alternation, so counts agree across engines).

Cross-engine discipline as in CCHtml/CCPii (functions/html.py): the
DuckDB oracle SQL is rendered from the SAME generated table, literal
replaces only, no regex metacharacters in any key (asserted at module
load).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pignlproc_spark.functions.html import _sq  # one SQL-literal escaper, shared

#: Characters whose mojibake forms CCMoji v1 repairs: the common
#: Western-European accented letters plus the cp1252 "smart
#: punctuation" range that dominates real-world damage.
TARGET_CHARS = "éèêëáàâäãçñóòôöõúùûüíìîïýÿ’‘“”–—…€°©®«»"

_CP1252_HOLES = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _damaged(c: str) -> str | None:
    b = c.encode("utf-8")
    if any(x in _CP1252_HOLES for x in b):
        return None
    return b.decode("cp1252")


#: (damaged, repaired) rows, longest damaged form first, then by
#: codepoint — a pinned deterministic order shared with the oracle.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((d, c) for c in TARGET_CHARS if (d := _damaged(c)) is not None),
        key=lambda t: (-len(t[0]), t[1]),
    )
)

# regex-metacharacter audit: every damaged form must be literal-safe
# for the detection alternation in BOTH engines
_META = set("\\^$.|?*+()[]{}")
for _d, _ in MOJIBAKE_TABLE:
    assert not (set(_d) & _META), f"regex metachar in mojibake key {_d!r}"

#: Detection pattern: alternation of all damaged forms, table order.
MOJIBAKE_RE = "|".join(d for d, _ in MOJIBAKE_TABLE)


def mojibake_count_col(text: Column) -> Column:
    """Number of CCMoji v1 artifacts in ``text`` (BIGINT, Spark side)."""
    return F.regexp_count(text, F.lit(MOJIBAKE_RE)).cast("bigint")


def mojibake_fix_col(text: Column) -> Column:
    """``text`` with every table artifact repaired (single pass)."""
    c = text
    for damaged, repaired in MOJIBAKE_TABLE:
        c = F.replace(c, F.lit(damaged), F.lit(repaired))
    return c


def mojibake_count_sql(expr: str) -> str:
    """DuckDB-side artifact count, from the same generated table."""
    return f"len(regexp_extract_all({expr}, '{_sq(MOJIBAKE_RE)}'))::BIGINT"


def mojibake_fix_sql(expr: str) -> str:
    """DuckDB-side repair chain, from the same generated table."""
    c = expr
    for damaged, repaired in MOJIBAKE_TABLE:
        c = f"replace({c}, '{_sq(damaged)}', '{_sq(repaired)}')"
    return c


def encoding_signals(df, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_mojibake, text_fixed, n_chars_fixed) — the repair
    pass as a corpus operator.

    Scale shape: pure projection (codegen'd regexp_count + literal
    replaces), no shuffle, no Python — it rides the same scan as the
    rest of the quality signals, so adding it to a pipeline costs
    ~nothing at 100 TB."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        mojibake_count_col(t).alias("n_mojibake"),
        mojibake_fix_col(t).alias("text_fixed"),
    ).withColumn("n_chars_fixed", F.length("text_fixed").cast("bigint"))
