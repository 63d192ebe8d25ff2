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
