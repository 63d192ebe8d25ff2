"""AQE skew handling demonstration (SURVEY.md §4, BASELINE.json:6
"AQE skew-join handling for hub entities"): a Zipfian fact joined to a
non-broadcastable dimension must trigger adaptive skew-join splitting
— asserted on the executed plan, not just config."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    # force SMJ + make the skew detector fire at toy scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_salting_bounds_hub_partition_rows(spark):
    """The salting machinery EVIDENCED, not just present: on a 2M-row
    corpus where one hub entity owns 80% of mentions (a country page at
    web scale), hash partitioning alone pins ~80% of rows on one
    partition, while tune_salt_buckets + repartition_by_hash bounds the
    max partition to a small multiple of the average — the property the
    two-phase salted aggregation (operators/stats.py) relies on."""
    from pignlproc_spark import tables

    n, n_parts = 2_000_000, 32
    fact = spark.range(n).select(
        F.when(F.col("id") % 5 < 4, F.lit("uri:hub"))
        .otherwise(F.concat(F.lit("uri:"), (F.col("id") % 50_000).cast("string")))
        .alias("uri")
    )

    def max_partition_rows(df):
        hist = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        return max(r["cnt"] for r in hist)

    unsalted = max_partition_rows(fact.repartition(n_parts, F.col("uri")))
    assert unsalted >= 0.8 * n  # the hub key pins one partition

    s = tables.tune_salt_buckets(fact, "uri", n_parts)
    # rule: ceil(max_key_cnt * n_parts / total) = ceil(0.8 * 32) = 26
    assert s == 26
    salted = max_partition_rows(tables.repartition_by_hash(fact, "uri", n_parts, salt_buckets=s))
    # hub spreads over 26 sub-keys (~61.5k rows each); even with
    # unlucky bucket collisions the max partition stays within a small
    # multiple of the n/n_parts = 62.5k average — vs 1.6M unsalted
    assert salted <= 4 * n / n_parts
    assert salted * 3 < unsalted


def test_aqe_splits_skewed_hub_join(spark, skew_conf):
    # Zipfian fact: ~85% of rows hit one hub key (a country-page URI)
    fact = spark.range(120_000).select(
        F.when(F.col("id") % 7 < 6, F.lit("uri:hub")).otherwise(F.concat(F.lit("uri:"), F.col("id"))).alias("uri"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(30_000).select(
        F.when(F.col("id") == 0, F.lit("uri:hub")).otherwise(F.concat(F.lit("uri:"), F.col("id"))).alias("uri"),
        F.sha2(F.col("id").cast("string"), 512).alias("attrs"),
    )
    joined = fact.join(dim, "uri")
    # the action must run on THIS DataFrame's own QueryExecution —
    # count() plans a separate aggregate query and would leave the
    # inspected plan unexecuted/unadapted
    assert len(joined.collect()) > 0
    executed = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in executed, executed[:2000]
    assert "AQEShuffleRead" in executed
