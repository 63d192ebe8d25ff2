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

Single-sourced: the regexes and stoplist are imported from the frozen
modules (functions/tokenize.py, operators/textstats.py) and escaped
here — never retyped.
"""

from __future__ import annotations

from pignlproc_spark.functions.tokenize import STOPWORDS, TOKEN_RE_JVM
from pignlproc_spark.operators.textstats import BPE_SPLIT_RE


def _sql_str(s: str) -> str:
    """Python string → Spark SQL single-quoted literal (backslash is
    an escape character in Spark's default string-literal mode)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def statements() -> dict[str, str]:
    """name → CREATE statement (exposed for inspection/testing)."""
    tok_re = _sql_str(TOKEN_RE_JVM)
    bpe_re = _sql_str(BPE_SPLIT_RE)
    stop = "array(" + ",".join(_sql_str(w) for w in sorted(STOPWORDS)) + ")"
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
            "concat('http://en.dbpedia.org/resource/', upper(substring(t, 1, 1)), substring(t, 2, 2000000))"
        ),
        "ccw_title_from_uri": (
            "CREATE OR REPLACE TEMPORARY FUNCTION ccw_title_from_uri(u STRING) "
            "RETURNS STRING RETURN "
            "regexp_replace(u, '^http://en\\\\.dbpedia\\\\.org/resource/', '')"
        ),
    }


def register_sql(spark) -> list[str]:
    """Register every engine SQL function on the session; returns the
    registered names. Idempotent (CREATE OR REPLACE)."""
    stmts = statements()
    for sql in stmts.values():
        spark.sql(sql)
    return sorted(stmts)
