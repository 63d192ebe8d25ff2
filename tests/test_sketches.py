"""CCHll v1 (operators/sketches.py) — estimator accuracy, merge /
partitioning invariance, and Spark↔DuckDB differential parity (the
estimate must be EXACTLY equal across engines, not just close — the
whole point of freezing an md5-based HLL)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pignlproc_spark.operators import sketches as sk


def _df(spark, n_rows: int, n_distinct: int, n_groups: int = 1):
    return spark.range(0, n_rows).select(
        (F.col("id") % n_groups).cast("string").alias("g"),
        F.concat(F.lit("item-"), (F.col("id") % n_distinct).cast("string")).alias(
            "item"
        ),
    )


def test_accuracy_within_hll_bound(spark):
    """Raw estimator error stays within ~3× the 1.04/√m RSE (≈20 %)
    for cardinalities above the documented small-range bias zone."""
    for true in (1000, 5000, 20000):
        df = _df(spark, true * 2, true)
        est = sk.hll_distinct(df, "item").collect()[0].est_distinct
        assert abs(est - true) / true < 0.20, (true, est)


def test_duplicates_do_not_move_the_estimate(spark):
    """The sketch sees sets, not multisets: 10× duplication of every
    item yields the IDENTICAL register table and estimate."""
    once = sk.hll_distinct(_df(spark, 3000, 3000), "item").collect()
    many = sk.hll_distinct(_df(spark, 30000, 3000), "item").collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in many]


def test_merge_and_partitioning_invariance(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)); repartitioning
    changes nothing — MAX is associative/commutative/idempotent."""
    df = _df(spark, 20000, 5000, n_groups=3)
    whole = [
        tuple(r) for r in sk.hll_distinct(df, "item", ("g",)).orderBy("g").collect()
    ]
    a = df.where(F.col("item") < "item-3")
    b = df.where(F.col("item") >= "item-3")
    merged = sk.hll_merge(
        sk.hll_registers(a, "item", ("g",)).unionByName(
            sk.hll_registers(b, "item", ("g",))
        ),
        ("g",),
    )
    assert [
        tuple(r) for r in sk.hll_estimate(merged, ("g",)).orderBy("g").collect()
    ] == whole
    assert [
        tuple(r)
        for r in sk.hll_distinct(df.repartition(7), "item", ("g",))
        .orderBy("g")
        .collect()
    ] == whole


def test_duckdb_parity_exact(spark):
    """Same data → byte-identical (n_registers, est_distinct) in both
    engines, including the final IEEE division."""
    got_spark = [
        tuple(r)
        for r in sk.hll_distinct(_df(spark, 20000, 5000, 3), "item", ("g",))
        .orderBy("g")
        .collect()
    ]
    sql = sk.hll_distinct_sql(
        "SELECT (i % 3)::VARCHAR AS g, 'item-' || (i % 5000)::VARCHAR AS item "
        "FROM range(20000) t(i)",
        "item",
        ("g",),
    )
    got_duck = duckdb.sql(sql + " ORDER BY g").fetchall()
    assert got_spark == [tuple(r) for r in got_duck]


def test_register_table_shape(spark):
    """≤ m register rows per group; rho ≥ 1; register is 2 hex chars."""
    regs = sk.hll_registers(_df(spark, 5000, 5000, 2), "item", ("g",))
    rows = regs.collect()
    assert all(len(r.register) == 2 and r.rho >= 1 for r in rows)
    from collections import Counter

    per_group = Counter(r.g for r in rows)
    assert all(v <= sk.M for v in per_group.values())


def test_all_zero_tail_rho_golden(spark):
    """The ρ CASE ladder golden-checked digit-by-digit on constructed
    hex tails (not via md5 — directly on _rho_col/hll_rho_sql)."""
    cases = [
        ("f" + "0" * 29, 1),  # high digit first: 0 extra bits
        ("8" + "0" * 29, 1),
        ("7" + "0" * 29, 2),  # 4-7: 1 extra bit
        ("2" + "0" * 29, 3),  # 2-3: 2 extra bits
        ("1" + "0" * 29, 4),  # 1: 3 extra bits
        ("0" * 3 + "1" + "0" * 26, 16),  # 3 zero chars + digit 1
        ("0" * 30, 121),  # all-zero tail sentinel
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, tail string"
    )
    got = {
        r.i: r.rho
        for r in df.select("i", sk._rho_col(F.col("tail")).alias("rho")).collect()
    }
    con = duckdb.connect()
    for i, (tail, want) in enumerate(cases):
        assert got[i] == want, (i, tail)
        con.execute("create or replace table t as select ? as tail", [tail])
        assert con.sql(f"select {sk.hll_rho_sql('tail')} from t").fetchone()[0] == want


# ====================================================================
# CCCms v1 — count-min frequency sketch
# ====================================================================


def _freq_df(spark, n_rows: int, n_distinct: int, n_groups: int = 1):
    # Zipf-ish multiset: item-k appears ~n_rows/n_distinct times with
    # a deterministic heavy head (id % k^2 style skew is overkill —
    # squaring the residue suffices to make counts unequal).
    return spark.range(0, n_rows).select(
        (F.col("id") % n_groups).cast("string").alias("g"),
        F.concat(
            F.lit("t-"), ((F.col("id") * F.col("id")) % n_distinct).cast("string")
        ).alias("item"),
    )


def test_null_items_are_no_observation(spark):
    """NULL items mint no register: the estimate over a column with
    NULLs equals the estimate over the non-NULL subset, an all-NULL
    group estimates 0 registers (not a NULL estimate), and CMS skips
    NULLs the same way."""
    from pignlproc_spark.operators import sketches

    mixed = spark.createDataFrame(
        [("g", f"u{i}") for i in range(50)] + [("g", None)] * 7 + [("h", None)],
        "grp string, url string",
    )
    regs = sketches.hll_registers(mixed, "url", groups=("grp",))
    assert regs.where("register IS NULL").count() == 0
    assert regs.where("grp = 'h'").count() == 0  # all-NULL group: empty sketch
    clean = sketches.hll_registers(mixed.where("url IS NOT NULL"), "url", groups=("grp",))
    est_m = {r.grp: r.est_distinct for r in sketches.hll_estimate(regs, ("grp",)).collect()}
    est_c = {r.grp: r.est_distinct for r in sketches.hll_estimate(clean, ("grp",)).collect()}
    assert est_m == est_c
    cms = sketches.cms_registers(mixed, "url", groups=("grp",))
    assert cms.where("bucket IS NULL").count() == 0
    assert cms.where("grp = 'h'").count() == 0


def test_cms_never_underestimates_and_bound(spark):
    """est ≥ exact for EVERY probe (the CMS guarantee is one-sided),
    and the mean overestimate sits far below the ε·N = e/4096·N
    bound on this deterministic corpus."""
    df = _freq_df(spark, 40000, 700)
    probes = df.select("item").distinct()
    est = {
        r.item: r.est_count
        for r in sk.cms_lookup(sk.cms_registers(df, "item"), probes, "item").collect()
    }
    exact = {r.item: r.c for r in df.groupBy("item").agg(F.count("*").alias("c")).collect()}
    assert set(est) == set(exact)
    overs = [est[k] - exact[k] for k in exact]
    assert min(overs) >= 0, "CMS must never underestimate"
    import math

    assert sum(overs) / len(overs) <= math.e / 4096 * 40000


def test_cms_merge_and_partitioning_invariance(spark):
    """sketch(A ⊎ B) == merge(sketch(A), sketch(B)) — SUM is
    associative/commutative — and repartitioning changes nothing."""
    df = _freq_df(spark, 30000, 500, n_groups=3)
    whole = sorted(
        tuple(r) for r in sk.cms_registers(df, "item", ("g",)).collect()
    )
    a = df.where(F.col("item") < "t-3")
    b = df.where(F.col("item") >= "t-3")
    merged = sk.cms_merge(
        sk.cms_registers(a, "item", ("g",)).unionByName(
            sk.cms_registers(b, "item", ("g",))
        ),
        ("g",),
    )
    assert sorted(tuple(r) for r in merged.collect()) == whole
    assert (
        sorted(
            tuple(r)
            for r in sk.cms_registers(df.repartition(7), "item", ("g",)).collect()
        )
        == whole
    )


def test_cms_duckdb_parity_exact(spark):
    """Same data → byte-identical (g, item, est_count) in both
    engines; absent probes estimate from colliding buckets only."""
    df = _freq_df(spark, 20000, 400, n_groups=2)
    probes = df.select("g", "item").distinct().union(
        spark.createDataFrame([("0", "never-seen"), ("1", "also-absent")], "g string, item string")
    )
    got_spark = sorted(
        tuple(r)
        for r in sk.cms_lookup(
            sk.cms_registers(df, "item", ("g",)), probes, "item", ("g",)
        ).collect()
    )
    base = (
        "SELECT (i % 2)::VARCHAR AS g, "
        "'t-' || ((i * i) % 400)::VARCHAR AS item FROM range(20000) t(i)"
    )
    pr = (
        f"SELECT DISTINCT g, item FROM ({base}) "
        "UNION ALL SELECT '0', 'never-seen' UNION ALL SELECT '1', 'also-absent'"
    )
    sql = sk.cms_lookup_sql(base, pr, "item", ("g",))
    assert got_spark == sorted(duckdb.sql(sql).fetchall())


def test_cms_register_table_shape(spark):
    """≤ D_CMS × 4096 rows per group; every row id < D_CMS; bucket is
    3 hex chars; total mass per hash row equals the insert count."""
    df = _freq_df(spark, 8000, 300, n_groups=2)
    rows = sk.cms_registers(df, "item", ("g",)).collect()
    assert all(0 <= r.hrow < sk.D_CMS and len(r.bucket) == sk.W_HEX for r in rows)
    from collections import Counter

    per = Counter((r.g, r.hrow) for r in rows)
    assert all(v <= 16**sk.W_HEX for v in per.values())
    mass = Counter()
    for r in rows:
        mass[(r.g, r.hrow)] += r.cnt
    assert all(v == 4000 for v in mass.values()), "each row holds all inserts"
