"""CCMoji v1 (functions/encoding.py) — generated-table validity,
repair goldens, Spark↔DuckDB parity, plan purity."""

import duckdb
from pyspark.sql import functions as F

from pignlproc_spark.functions.encoding import (
    MOJIBAKE_RE,
    MOJIBAKE_TABLE,
    TARGET_CHARS,
    encoding_signals,
    mojibake_count_col,
    mojibake_count_sql,
    mojibake_fix_col,
    mojibake_fix_sql,
)


def test_table_is_the_cp1252_round_trip():
    """Every row IS the canonical damage definition — no hand-typing."""
    holes = {0x81, 0x8D, 0x8F, 0x90, 0x9D}
    expected = {}
    for c in TARGET_CHARS:
        b = c.encode("utf-8")
        if not any(x in holes for x in b):
            expected[b.decode("cp1252")] = c
    assert dict(MOJIBAKE_TABLE) == expected
    # longest-first pinned order (3-char smart punctuation before the
    # 2-char accented letters)
    lens = [len(d) for d, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)
    # all repair targets present except the cp1252-hole-crossing ones
    dropped = set(TARGET_CHARS) - set(dict(MOJIBAKE_TABLE).values())
    assert all(any(x in holes for x in c.encode("utf-8")) for c in dropped)


GOLDENS = [
    ("caf" + "é".encode("utf-8").decode("cp1252"), "café", 1),
    ("it" + "’".encode("utf-8").decode("cp1252") + "s", "it’s", 1),
    ("no damage here", "no damage here", 0),
    ("", "", 0),
    # mixed families in one string
    (
        "d" + "é".encode("utf-8").decode("cp1252") + "j"
        + "à".encode("utf-8").decode("cp1252") + " "
        + "“".encode("utf-8").decode("cp1252") + "x",
        "déjà “x",
        3,
    ),
    # clean text containing a repaired char must NOT be touched
    ("déjà vu", "déjà vu", 0),
]


def test_repair_goldens_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(GOLDENS)], "i int, text string"
    )
    rows = {
        r.i: (r.fixed, r.n)
        for r in df.select(
            "i",
            mojibake_fix_col(F.col("text")).alias("fixed"),
            mojibake_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    for i, (_, want_fixed, want_n) in enumerate(GOLDENS):
        assert rows[i] == (want_fixed, want_n), f"case {i}"


def test_duckdb_parity_on_goldens():
    con = duckdb.connect()
    for i, (t, want_fixed, want_n) in enumerate(GOLDENS):
        con.execute("create or replace table t as select ? as text", [t])
        fixed, n = con.sql(
            f"select {mojibake_fix_sql('text')}, {mojibake_count_sql('text')} from t"
        ).fetchone()
        assert (fixed, n) == (want_fixed, want_n), f"case {i}"


def test_differential_fuzz_spark_vs_duckdb(spark):
    """All damaged forms + repaired chars + ascii + the historical
    divergence probes, concatenated pairwise."""
    atoms = [d for d, _ in MOJIBAKE_TABLE] + ["é", "â", "Ã", "€", "x", "\x0b", "漢"]
    cases = [a + b for a in atoms for b in atoms][::7]  # deterministic sample
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, text string"
    )
    got = {
        r.i: (r.fixed, r.n)
        for r in df.select(
            "i",
            mojibake_fix_col(F.col("text")).alias("fixed"),
            mojibake_count_col(F.col("text")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        con.execute("create or replace table t as select ? as text", [c])
        want = con.sql(
            f"select {mojibake_fix_sql('text')}, {mojibake_count_sql('text')} from t"
        ).fetchone()
        assert got[i] == want, f"fuzz case {i}: {c!r}"


def test_detection_matches_alternation_semantics():
    """MOJIBAKE_RE is longest-first so 'â€™' counts as ONE artifact,
    not as a shorter-key prefix hit."""
    assert MOJIBAKE_RE.index("â€™") < MOJIBAKE_RE.index("Ã©")


def test_encoding_signals_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = encoding_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
