"""Streaming ingestion parity: the availableNow micro-batch drain over
the synthetic corpus must produce the same mention multiset as the
batch pipeline (same frozen pure functions under both engines)."""

import shutil

import pytest
from pyspark.sql import functions as F

from pignlproc_spark import synth
from pignlproc_spark.streaming import ingest


@pytest.fixture(scope="module")
def staged_pages(spark, synth_dir, tmp_path_factory):
    """Split the sf0.001 pages into several files so the file stream
    has multiple arrivals."""
    root = tmp_path_factory.mktemp("stream_in")
    pages = spark.read.parquet(str(synth_dir / "pages.parquet"))
    pages.repartition(5).write.mode("overwrite").parquet(str(root / "pages"))
    return str(root / "pages")


def test_incremental_matches_batch(spark, sf_dir, synth_dir, staged_pages, tmp_path):
    out_dir = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt")
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))
    q = ingest.run_incremental(spark, staged_pages, out_dir, ckpt, redirects=red)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .groupBy("url", "context", "surface_form", "uri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    golden = synth.side_table(spark, sf_dir, "golden_mentions")
    cols = ["url", "context", "surface_form", "uri", "cnt"]
    assert got.select(*cols).exceptAll(golden.select(*cols)).count() == 0
    assert golden.select(*cols).exceptAll(got.select(*cols)).count() == 0

    # restart with same checkpoint: no new files -> no duplicate output
    n1 = spark.read.parquet(out_dir).count()
    q2 = ingest.run_incremental(spark, staged_pages, out_dir, ckpt, redirects=red)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n1
    shutil.rmtree(out_dir)


def test_windowed_counts_stream(spark, staged_pages, tmp_path):
    stream = ingest.mention_stream(ingest.read_page_stream(spark, staged_pages))
    counts = ingest.windowed_uri_counts(stream, window="30 minutes", watermark="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("wuc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    df = spark.sql("select * from wuc")
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "uri", "cnt"}
    assert df.agg(F.min("cnt")).collect()[0][0] >= 1
