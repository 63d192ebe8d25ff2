"""Approximate-sketch scale paths with bounded error.

The driver-checked operators are EXACT (`docs_global_token_stats`,
`docs_length_quantiles`); at 100 TB a pipeline swaps in the built-in
sketches (HyperLogLog++ `approx_count_distinct`, Greenwald-Khanna
`percentile_approx`) when an exact pass is too expensive. Approximate
answers can't hash-match a DuckDB oracle, so the contract here is a
bounded-error pytest against the exact answer instead.
"""

from pyspark.sql import functions as F


def test_approx_count_distinct_error_bound(spark):
    n_distinct = 1234
    df = spark.range(50_000).select((F.col("id") % n_distinct).alias("v"))
    row = df.agg(
        F.approx_count_distinct("v", rsd=0.02).alias("est"),
        F.count_distinct("v").alias("exact"),
    ).first()
    assert row.exact == n_distinct
    # HLL++ rsd is a standard deviation; 3x is a safe deterministic bound
    assert abs(row.est - row.exact) / row.exact < 0.06


def test_percentile_approx_rank_error(spark):
    # skewed (quadratic) values so value-error would be a weak check;
    # rank error is the GK sketch's actual guarantee (~1/accuracy)
    n = 10_000
    df = spark.range(n).select((F.col("id") * F.col("id")).alias("v"))
    approx = df.agg(
        F.percentile_approx("v", [0.5, 0.9, 0.99], 1000).alias("p")
    ).first().p
    values = [i * i for i in range(n)]
    for q, got in zip([0.5, 0.9, 0.99], approx):
        # rank of the returned value must be within 1% of the target
        rank = values.index(got)
        assert abs(rank - q * (n - 1)) <= n / 100


def test_bloom_digest_properties(spark):
    """The packed Bloom digest: bounded size, partitioning-invariant,
    NO false negatives (every inserted key passes might_contain)."""
    from pignlproc_spark.operators.dedup import bloom_digest, bloom_might_contain

    n_bits = 1 << 12
    keys = spark.range(500).select(F.md5(F.col("id").cast("string")).alias("key"))
    d1 = bloom_digest(keys, n_bits=n_bits)
    assert d1.count() <= n_bits // 64
    # partitioning-invariant: bit_or over any layout gives identical words
    d2 = bloom_digest(keys.repartition(13), n_bits=n_bits)
    assert d1.exceptAll(d2).count() == 0 and d2.exceptAll(d1).count() == 0
    # no false negatives
    hits = bloom_might_contain(keys, d1, n_bits=n_bits)
    assert hits.count() == 500


def test_bloom_might_contain_prunes_definite_misses(spark):
    """Unseen keys mostly fail the probe (fpp stays near theory), so
    the confirm join's input is a sliver of the batch."""
    from pignlproc_spark.operators.dedup import bloom_digest, bloom_might_contain

    n = 2000
    n_bits = 10 * n  # ~1.2% theoretical fpp at k=4
    hist = spark.range(n).select(F.md5(F.col("id").cast("string")).alias("key"))
    fresh = spark.range(n, 2 * n).select(F.md5(F.col("id").cast("string")).alias("key"))
    digest = bloom_digest(hist, n_bits=n_bits)
    n_fp = bloom_might_contain(fresh, digest, n_bits=n_bits).count()
    assert n_fp / n < 0.05  # generous 4x the theoretical rate


def test_dedup_against_history_is_exact(spark):
    """Verdict == plain anti-join semantics, independent of bloom
    parameters — even with a tiny (high-fpp) digest the confirm join
    restores exactness."""
    from pignlproc_spark.operators.dedup import dedup_against_history

    hist = spark.createDataFrame(
        [(i, f"doc {i % 40}") for i in range(100)], "doc_id long, text string"
    )  # 40 distinct texts in history
    new = spark.createDataFrame(
        [(1000 + i, f"doc {i}") for i in range(80)], "doc_id long, text string"
    )  # texts 0..39 seen, 40..79 new
    for n_bits in (1 << 6, 1 << 16):  # 64-bit digest is ~saturated: all-FP stress
        out = {
            r.doc_id: r.keep
            for r in dedup_against_history(new, hist, n_bits=n_bits).collect()
        }
        assert len(out) == 80
        for i in range(80):
            assert out[1000 + i] == (0 if i < 40 else 1), (n_bits, i)
