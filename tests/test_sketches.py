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
