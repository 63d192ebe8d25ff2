"""Mergeable cardinality sketches — frozen "CCHll v1" HyperLogLog.

Not in the reference (pignlproc counts distincts exactly via GROUP BY,
SURVEY.md §2.2 P7/P13) — but "how many distinct urls / tokens /
n-grams does this 100-TB crawl contain?" is a first-class question a
web-scale pipeline must answer WITHOUT shuffling the distinct items
themselves. HyperLogLog (Flajolet et al., AofA 2007) answers it with
a fixed 2^p-register sketch whose merge is a plain per-register MAX —
partitioning-invariant, streaming-friendly, and a few KB per group.

Spark ships ``approx_count_distinct`` (HLL++), but its sketch is not
reproducible outside the JVM — useless against a DuckDB oracle. CCHll
v1 instead freezes an HLL built ONLY from cross-engine-exact pieces:

- hash: lowercase-hex ``md5`` of the item's UTF-8 bytes (the one hash
  both engines render identically — the repo-wide oracle rule);
- p = 8 → m = 256 registers; register index = the first 2 hex chars;
- rank ρ = 1 + (number of leading zero BITS of the remaining 30 hex
  chars / 120 bits), computed from hex digits: 4·z zero bits for z
  leading ``'0'`` chars, plus 0/1/2/3 extra bits when the first
  nonzero digit is in 8-f / 4-7 / 2-3 / 1. All-zero tail ⇒ ρ = 121.
- register value = MAX(ρ) — the merge operation, exact under any
  partitioning, re-aggregation or union of sketches;
- estimate: ρ is capped at 40 so the harmonic sum Σ 2^(−ρ_j) can be
  computed EXACTLY as the integer Σ 2^(40−min(ρ_j,40)) (empty
  registers contribute 2^40 each; the sum fits int64 with 2^14 spare
  bits). The only float op is the final single division
  ``NUMER / S`` — two exact inputs, one IEEE op, identical in both
  engines — then ``floor`` to a BIGINT estimate.

v1 limits (explicit, frozen): no small-range linear-counting
correction (it needs ``ln``, which is libm- not IEEE-specified, so it
can't be oracle-exact; at the m=256 default the raw estimator's bias
below ~640 distincts is documented instead) and no large-range
correction (md5 has no 2^32 collision ceiling). Standard error is the
HLL bound 1.04/√m ≈ 6.5 % at p=8.

Scale shape: explode → md5 → partial MAX per (group, register) —
map-side combine bounds the shuffle at n_partitions × groups × 256
rows regardless of corpus size; the estimate is a second tiny agg
over ≤256 rows per group. The distinct items themselves never
shuffle (the whole point vs exact COUNT DISTINCT at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Frozen spec constants. P/M fix the register count; RHO_CAP makes
#: the harmonic sum integer-exact; NUMER = α_m · m² · 2^RHO_CAP with
#: α_256 = 0.7213/(1 + 1.079/256), frozen as the shortest-round-trip
#: double literal so both engines parse the identical IEEE value.
P = 8
M = 256
RHO_CAP = 40
ALPHA_M = 0.7182725932495458
NUMER = 5.175699493294551e16  # ALPHA_M * M*M * 2**RHO_CAP

_HI = ("8", "9", "a", "b", "c", "d", "e", "f")
_MID = ("4", "5", "6", "7")
_LOW = ("2", "3")


def _rho_col(tail: Column) -> Column:
    """Rank ρ of the 30-hex-char (120-bit) hash tail (Spark side)."""
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    d = F.substring(tail, z + 1, 1)
    extra = (
        F.when(d.isin(*_HI), 0)
        .when(d.isin(*_MID), 1)
        .when(d.isin(*_LOW), 2)
        .otherwise(3)
    )
    return F.when(z == 30, F.lit(121)).otherwise(z * 4 + extra + 1)


def hll_registers(df: DataFrame, item, groups: tuple[str, ...] = ()) -> DataFrame:
    """(groups…, register STRING, rho INT) — the CCHll v1 sketch of
    the distinct ``item`` values per group. Re-aggregating this table
    with MAX(rho) is the sketch merge (see :func:`hll_merge`)."""
    if isinstance(item, str):
        item = F.col(item)
    h = F.md5(item.cast("string"))
    keyed = df.select(
        *groups,
        F.substring(h, 1, 2).alias("register"),
        _rho_col(F.substring(h, 3, 30)).alias("_rho"),
    ).where(
        # md5(NULL) is NULL: without the filter a NULL item mints a
        # phantom (register=NULL, rho=NULL) row that inflates the
        # register count while adding nothing to the harmonic sum —
        # NULL items are "no observation", exactly like in count(col)
        F.col("register").isNotNull()
    )
    return keyed.groupBy(*groups, "register").agg(F.max("_rho").alias("rho"))


def hll_merge(regs: DataFrame, groups: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables (e.g. a union of per-batch sketches):
    plain MAX per (group, register) — associative, commutative,
    idempotent, so incremental/streaming accumulation is exact."""
    return regs.groupBy(*groups, "register").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, groups: tuple[str, ...] = ()) -> DataFrame:
    """(groups…, n_registers BIGINT, est_distinct BIGINT) from a
    register table. Integer-exact harmonic sum; one IEEE division."""
    capped = F.least(F.col("rho"), F.lit(RHO_CAP))
    # the python shiftleft() wrapper only takes a literal shift count;
    # the SQL function itself is happy with a column second argument
    weight = F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), (F.lit(RHO_CAP) - capped).cast("int")
    )
    agg = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        F.sum(weight).cast("bigint").alias("_s_hit"),
    )
    empty = (F.lit(M).cast("bigint") - F.col("n_registers")) * F.shiftleft(
        F.lit(1).cast("bigint"), RHO_CAP
    )
    s = (F.col("_s_hit") + empty).cast("double")
    return agg.select(
        *groups,
        "n_registers",
        F.floor(F.lit(NUMER) / s).cast("bigint").alias("est_distinct"),
    )


def hll_distinct(df: DataFrame, item, groups: tuple[str, ...] = ()) -> DataFrame:
    """Per-group approximate COUNT DISTINCT — the one-call form."""
    return hll_estimate(hll_registers(df, item, groups), groups)


# --- DuckDB twins, rendered from the SAME frozen constants ---------


def hll_rho_sql(tail: str) -> str:
    """ρ of a 30-hex-char tail expression (DuckDB side)."""
    z = f"length(regexp_extract({tail}, '^(0*)', 1))"
    d = f"substr({tail}, {z} + 1, 1)"
    extra = (
        f"CASE WHEN {d} IN ('8','9','a','b','c','d','e','f') THEN 0 "
        f"WHEN {d} IN ('4','5','6','7') THEN 1 "
        f"WHEN {d} IN ('2','3') THEN 2 ELSE 3 END"
    )
    return f"CASE WHEN {z} = 30 THEN 121 ELSE {z} * 4 + {extra} + 1 END"


def hll_distinct_sql(inner_sql: str, item: str, groups: tuple[str, ...] = ()) -> str:
    """Full CCHll v1 chain over ``inner_sql`` (a SELECT providing the
    group columns and ``item``): registers CTE + estimate projection,
    byte-for-byte the same constants as the Spark path."""
    gcols = ", ".join(groups)
    gpfx = f"{gcols}, " if groups else ""
    h = f"md5(CAST({item} AS VARCHAR))"
    regs = (
        f"SELECT {gpfx}substr({h}, 1, 2) AS register, "
        f"max({hll_rho_sql(f'substr({h}, 3, 30)')}) AS rho "
        f"FROM ({inner_sql}) GROUP BY {gpfx}register"
    )
    s = (
        f"sum(1::BIGINT << ({RHO_CAP} - least(rho, {RHO_CAP})))::BIGINT"
        f" + ({M}::BIGINT - count(*)) * (1::BIGINT << {RHO_CAP})"
    )
    grp = f" GROUP BY {gcols}" if groups else ""
    return (
        f"SELECT {gpfx}count(*)::BIGINT AS n_registers, "
        f"CAST(floor({NUMER!r} / CAST({s} AS DOUBLE)) AS BIGINT) AS est_distinct "
        f"FROM ({regs}){grp}"
    )


# ====================================================================
# Frequency sketch — frozen "CCCms v1" count-min sketch
# ====================================================================
#
# The dual of CCHll: "how OFTEN does this token / url / n-gram occur
# in the 100-TB stream?" answered from fixed space, without retaining
# or shuffling the items. Count-min (Cormode & Muthukrishnan, J.Alg
# 2005): D keyed hash rows × W counters; insert adds 1 to one counter
# per row; the point estimate is the MIN over the D counters, which
# NEVER underestimates and overestimates by ≤ ⌈e·N/W⌉ with
# probability ≥ 1 − e^−D (N = total insertions).
#
# Everything is integer SUMs over md5-derived buckets, so the whole
# sketch — registers AND estimates — is bit-identical across engines
# and oracle-exact, unlike any float-seeded native sketch. The merge
# is per-cell SUM: associative/commutative (NOT idempotent — replay
# safety for streaming deltas comes from the manifest high-water mark
# in streaming/counts.py, exactly like the exact count tables).
#
# Frozen v1 constants: D = 4 keyed md5 rows (key = 'cms<i>' + US
# separator, the repo's keyed-md5-family idiom, dedup.py:116);
# W = 4096 buckets addressed by the first 3 hex chars — no hex→int
# conversion, the same cross-engine trick as CCHll's registers.
# Error: ε = e/4096 ≈ 0.066 % of N per lookup, δ = e^−4 ≈ 1.8 %.
#
# Scale shape: 4-element array build → posexplode → partial SUM per
# (group, hrow, bucket); the shuffle is bounded by
# n_partitions × groups × 4 × 4096 rows regardless of corpus size.
# Lookups broadcast the ≤16 384-row-per-group register table and
# never shuffle the probe side except the final per-probe MIN.

D_CMS = 4
W_HEX = 3  # bucket id = first 3 hex chars → W = 16^3 = 4096
_CMS_SEP = "\u001f"  # US separator, same family-keying byte as MinHash


def _cms_buckets(item: Column) -> Column:
    """ARRAY<STRING> of the D_CMS bucket ids of one item (Spark side)."""
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"cms{i}{_CMS_SEP}"), item.cast("string"))),
                1,
                W_HEX,
            )
            for i in range(D_CMS)
        ]
    )


def cms_registers(df: DataFrame, item, groups: tuple[str, ...] = ()) -> DataFrame:
    """(groups…, hrow INT, bucket STRING, cnt BIGINT) — the CCCms v1
    sketch of ``item`` OCCURRENCES (a multiset, unlike CCHll) per
    group. Re-aggregating with SUM is the sketch merge."""
    if isinstance(item, str):
        item = F.col(item)
    keyed = df.select(
        *groups, F.posexplode(_cms_buckets(item)).alias("hrow", "bucket")
    ).where(F.col("bucket").isNotNull())  # NULL item = no observation (as in hll)
    return keyed.groupBy(*groups, "hrow", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(regs: DataFrame, groups: tuple[str, ...] = ()) -> DataFrame:
    """Merge register tables (union of per-batch / per-split sketches):
    per-cell SUM — associative and commutative, so any partitioning or
    re-aggregation order yields the identical sketch."""
    return regs.groupBy(*groups, "hrow", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_lookup(
    regs: DataFrame, probes: DataFrame, item: str, groups: tuple[str, ...] = ()
) -> DataFrame:
    """(groups…, item, est_count BIGINT) — point-frequency estimates
    for each DISTINCT probe row. est_count ≥ the true count, always;
    the register table is broadcast (≤ groups × 16 384 rows), so the
    probe side never shuffles except the final per-probe MIN."""
    keyed = probes.select(
        *groups, item, F.posexplode(_cms_buckets(F.col(item))).alias("hrow", "bucket")
    )
    joined = keyed.join(F.broadcast(regs), [*groups, "hrow", "bucket"], "left")
    return joined.groupBy(*groups, item).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )


# --- DuckDB twins, rendered from the SAME frozen constants ---------


def _cms_bucket_sql(item: str, i: int) -> str:
    return (
        f"substr(md5('cms{i}' || chr(31) || CAST({item} AS VARCHAR)), 1, {W_HEX})"
    )


def _cms_keyed_sql(inner_sql: str, item: str, groups: tuple[str, ...]) -> str:
    """UNION ALL of the D_CMS keyed (hrow, bucket) projections."""
    gpfx = "".join(f"{g}, " for g in groups)
    return " UNION ALL ".join(
        f"SELECT {gpfx}{i} AS hrow, {_cms_bucket_sql(item, i)} AS bucket, "
        f"{item} AS item FROM ({inner_sql})"
        for i in range(D_CMS)
    )


def cms_registers_sql(
    inner_sql: str, item: str, groups: tuple[str, ...] = ()
) -> str:
    """CCCms v1 register table over ``inner_sql`` (DuckDB side)."""
    gpfx = "".join(f"{g}, " for g in groups)
    return (
        f"SELECT {gpfx}hrow, bucket, count(*)::BIGINT AS cnt "
        f"FROM ({_cms_keyed_sql(inner_sql, item, groups)}) "
        f"GROUP BY {gpfx}hrow, bucket"
    )


def cms_lookup_sql(
    inner_sql: str,
    probes_sql: str,
    item: str,
    groups: tuple[str, ...] = (),
    out_item: str | None = None,
) -> str:
    """Point estimates for ``probes_sql``'s distinct rows against the
    sketch of ``inner_sql`` — byte-for-byte the Spark chain."""
    out_item = out_item or item
    gcols = "".join(f"{g}, " for g in groups)
    using = ", ".join([*groups, "hrow", "bucket"])
    return (
        f"SELECT {gcols}p.item AS {out_item}, "
        f"min(coalesce(r.cnt, 0))::BIGINT AS est_count "
        f"FROM ({_cms_keyed_sql(probes_sql, item, groups)}) p "
        f"LEFT JOIN ({cms_registers_sql(inner_sql, item, groups)}) r "
        f"USING ({using}) GROUP BY {gcols}p.item"
    )
