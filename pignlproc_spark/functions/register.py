"""SQL surface of the frozen engine expressions — the Pig ``DEFINE``
analog (SURVEY.md §2.2 P19): expose the CCWikiText-v1 tokenizer,
BPE-ish piece counter, md5 hash bucket and DBpedia URI helpers as
Spark SQL *scalar functions* (Spark 4 ``CREATE TEMPORARY FUNCTION …
RETURN <expr>``), so ``spark.sql()`` users run the exact JVM-side,
codegen-able expressions the DataFrame API uses.

Deliberately NOT ``spark.udf.register`` of the Python twins: a Python
registration would put a row-at-a-time interpreter in the SQL hot
path and create a second spec copy that can drift. SQL functions
inline into the calling plan like a view, so Catalyst still prunes /
pushes through them.

Single-sourced: regexes, stoplist, and the resource-IRI prefix are
imported from the frozen modules (functions/tokenize.py,
functions/uri.py, operators/textstats.py) and escaped here — never
retyped. String literals are escaped for the SESSION's actual
string-literal mode: ``spark.sql.parser.escapedStringLiterals=true``
(Hive-compat raw literals) changes what a backslash means, so
:func:`register_sql` reads the conf and builds matching statements —
registering with the wrong mode would silently corrupt the regexes.
"""

from __future__ import annotations

import re

from pignlproc_spark.functions.tokenize import STOPWORDS, TOKEN_RE_JVM
from pignlproc_spark.functions.uri import resource_prefix
from pignlproc_spark.operators.textstats import _ASCII_B, BPE_SPLIT_RE, PII_PATTERNS


def _sql_str(s: str, escaped_literals: bool = False) -> str:
    """Python string → Spark SQL single-quoted literal under the given
    parser mode (default mode treats backslash as an escape char;
    escapedStringLiterals=true treats it literally, Hive-style)."""
    if escaped_literals:
        return "'" + s.replace("'", "''") + "'"
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def statements(escaped_literals: bool = False) -> dict[str, str]:
    """name → CREATE statement (exposed for inspection/testing)."""

    def lit(s: str) -> str:
        return _sql_str(s, escaped_literals)

    tok_re = lit(TOKEN_RE_JVM)
    bpe_re = lit(BPE_SPLIT_RE)
    prefix = resource_prefix("en")
    stop = "array(" + ",".join(lit(w) for w in sorted(STOPWORDS)) + ")"
    base_tok = f"filter(regexp_extract_all(lower(s), {tok_re}, 0), t -> length(t) <= 64)"
    return {
        "ccw_tokenize": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_tokenize(s STRING) "
            f"RETURNS ARRAY<STRING> RETURN {base_tok}"
        ),
        "ccw_tokenize_stopped": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_tokenize_stopped(s STRING) "
            "RETURNS ARRAY<STRING> RETURN "
            f"filter({base_tok}, t -> NOT array_contains({stop}, t))"
        ),
        "ccw_bpe_pieces": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_bpe_pieces(s STRING) "
            "RETURNS BIGINT RETURN "
            f"cast(size(regexp_extract_all(s, {bpe_re}, 0)) AS BIGINT)"
        ),
        "ccw_hash_bucket": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_hash_bucket(id BIGINT, mod INT) "
            "RETURNS BIGINT RETURN "
            "cast(conv(substring(md5(cast(cast(id AS STRING) AS BINARY)), 1, 4), 16, 10) AS BIGINT) % mod"
        ),
        "ccw_uri_encode": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_uri_encode(t STRING) "
            "RETURNS STRING RETURN "
            f"concat({lit(prefix)}, upper(substring(t, 1, 1)), substring(t, 2, 2000000))"
        ),
        "ccw_title_from_uri": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_title_from_uri(u STRING) "
            "RETURNS STRING RETURN "
            f"regexp_replace(u, {lit('^' + re.escape(prefix))}, '')"
        ),
        "ccw_pii_clean": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_pii_clean(s STRING) "
            f"RETURNS STRING RETURN {_pii_clean_expr('s', lit)}"
        ),
        "ccw_html_text": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_html_text(s STRING) "
            f"RETURNS STRING RETURN {_html_text_expr('s', lit)}"
        ),
        "ccw_moji_fix": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_moji_fix(s STRING) "
            f"RETURNS STRING RETURN {_moji_fix_expr('s', lit)}"
        ),
        "ccw_url_canonical": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_url_canonical(s STRING) "
            f"RETURNS STRING RETURN {_url_canonical_expr('s', lit)}"
        ),
    }


def _pii_clean_expr(col: str, lit) -> str:
    """The CCPii v1 scrub as one nested SQL expression, built from the
    frozen PII_PATTERNS with the same Java-side ASCII-\\b translation
    the DataFrame operator applies (textstats.pii_scrub)."""
    expr = col
    for _, pat, repl in PII_PATTERNS:
        jpat = pat.replace(r"\b", _ASCII_B)
        expr = f"regexp_replace({expr}, {lit(jpat)}, {lit(repl)})"
    return expr


def _html_text_expr(col: str, lit) -> str:
    """CCHtml v1 (functions/html.py) as one nested SQL expression —
    the same frozen pattern/entity constants, never retyped."""
    from pignlproc_spark.functions import html as H

    e = f"regexp_replace({col}, {lit(H.COMMENT_RE)}, ' ')"
    e = f"regexp_replace({e}, {lit(H.SCRIPT_RE)}, ' ')"
    e = f"regexp_replace({e}, {lit(H.STYLE_RE)}, ' ')"
    e = f"regexp_replace({e}, {lit(H.BLOCK_TAG_RE)}, {lit(chr(10))})"
    e = f"regexp_replace({e}, {lit(H.ANY_TAG_RE)}, ' ')"
    for ent, rep in H.ENTITIES:
        e = f"replace({e}, {lit(ent)}, {lit(rep)})"
    e = f"regexp_replace({e}, {lit(H.HSPACE_RUN_RE)}, ' ')"
    e = f"regexp_replace({e}, {lit(H.NL_RUN_RE)}, {lit(chr(10))})"
    return f"btrim({e}, {lit(H.TRIM_CHARS)})"


def _moji_fix_expr(col: str, lit) -> str:
    """CCMoji v1 repair chain (functions/encoding.py), single-sourced
    from the generated table."""
    from pignlproc_spark.functions.encoding import MOJIBAKE_TABLE

    e = col
    for damaged, repaired in MOJIBAKE_TABLE:
        e = f"replace({e}, {lit(damaged)}, {lit(repaired)})"
    return e


def _url_canonical_expr(col: str, lit) -> str:
    """CCUrl v1 (functions/urls.py) as one SQL expression, from the
    same frozen regex constants as canonical_url_col."""
    from pignlproc_spark.functions import urls as U

    u = f"trim({col})"
    scheme = f"lower(regexp_extract({u}, {lit(U._SCHEME_RE)}, 1))"
    raw_host = f"lower(regexp_extract({u}, {lit(U._HOST_RE)}, 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({raw_host}, {lit(':80$')}, '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({raw_host}, {lit(':443$')}, '') "
        f"ELSE {raw_host} END"
    )
    path = f"regexp_replace(regexp_extract({u}, {lit(U._PATH_RE)}, 1), {lit('/+$')}, '')"
    lone_qmark = r"^\?$"
    query = f"regexp_replace(regexp_extract({u}, {lit(U._QUERY_RE)}, 1), {lit(lone_qmark)}, '')"
    return (
        f"CASE WHEN {scheme} = '' OR {raw_host} = '' THEN {u} "
        f"ELSE concat({scheme}, '://', {host}, {path}, {query}) END"
    )


def register_sql(spark) -> list[str]:
    """Register every engine SQL function on the session, escaping
    string literals for the session's actual parser mode; returns the
    registered names. Idempotent (CREATE OR REPLACE)."""
    mode = str(spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")).lower() == "true"
    stmts = statements(escaped_literals=mode)
    for sql in stmts.values():
        spark.sql(sql)
    return sorted(stmts)
