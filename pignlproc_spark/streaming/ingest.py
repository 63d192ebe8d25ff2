"""Structured-Streaming ingestion for continuous corpus arrival.

The reference is batch-only (SURVEY.md §2.2 coverage note: "Streaming:
none"); this module is the engine's forward-looking path for a corpus
that arrives continuously (Common-Crawl drops, WARC feeds): the same
frozen extraction/mention semantics, incrementally.

Two shapes:

- :func:`mention_stream` — readStream → fused extract UDF → explode:
  an unbounded mention stream with *identical* row semantics to the
  batch pipeline (same pure functions).
- :func:`windowed_uri_counts` — event-time tumbling-window counts per
  entity with a watermark for late data: the streaming analogue of
  uriCounts. Emits (window_start, uri, cnt).
- :func:`run_incremental` — foreachBatch micro-batch driver that runs
  the batch mention extraction per micro-batch and appends to a
  mentions table; count tables stay derivable by batch aggregation
  (the lambda-architecture-free pattern: stream = append-only facts,
  stats = cheap batch over columnar facts).

Scale notes: stateful streaming aggregations keep per-key state in the
state store — keyed by (window, uri) this is bounded by distinct
entities per window, not corpus size. Watermark bounds state
retention. foreachBatch writes are idempotent per batchId when the
sink dir embeds it (exactly-once on retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pignlproc_spark.functions.extract import fused_mentions_udf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_page_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-arrival stream of pages parquet (the local stand-in for a
    Kafka/WARC feed; swap ``format`` on a real cluster)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def read_warc_stream(
    spark: SparkSession,
    input_dir: str,
    lang: str = "en",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Continuous crawl ingestion from RAW archives: ``.warc.gz`` files
    landing in ``input_dir`` (a Common-Crawl drop directory) become a
    canonical pages stream (url, warc_ts, html BINARY, lang).

    Same per-file decompression as the batch reader
    (``sources/warc.py::read_warc_gz``): the streaming ``binaryFile``
    listing is pruned to paths only (no archive bytes in the exchange),
    each micro-batch task stream-inflates its own files, and the file
    source's processed-files log gives exactly-once per archive across
    restarts. ``maxFilesPerTrigger`` bounds micro-batch size — the
    natural unit is the archive file, exactly as in batch."""
    from pignlproc_spark.sources.warc import WARC_GZ_SCHEMA, _files_to_records

    files = (
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema, stated explicitly (streaming
        # sources cannot infer); `content` is pruned right below so no
        # archive bytes enter the plan
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.warc.gz")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
        .select("path")
    )
    recs = files.mapInPandas(_files_to_records, WARC_GZ_SCHEMA)
    return recs.select(
        "url", "warc_ts", F.col("payload").alias("html"), F.lit(lang).alias("lang")
    )


def mention_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming mentions: identical per-row semantics to the batch
    pipeline's fused path (same pandas UDF)."""
    fused = fused_mentions_udf()
    parsed = pages_stream.select(
        "url", "warc_ts", "lang", fused(F.col("html")).alias("_p")
    ).select("url", "warc_ts", "lang", "_p.*")
    return (
        parsed.where(F.col("redirect").isNull())
        .select("url", "warc_ts", "lang", F.explode("mentions").alias("c"))
        .select("url", "warc_ts", "lang", "c.ctx_idx", "c.context", "c.uri", "c.begin", "c.end", "c.surface_form")
    )


def windowed_uri_counts(
    mentions: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window entity counts with late-data bound."""
    return (
        mentions.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "uri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "uri", "cnt")
    )


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    redirects: DataFrame | None = None,
    available_now: bool = True,
    stats_root: str | None = None,
    compact_every: int = 0,
    link_decisions: bool = False,
    lang: str = "en",
    analysis: str = "word",
    source: str = "pages",
):
    """Micro-batch driver: stream pages → mentions (+ optional redirect
    resolution against the broadcast dimension) → append parquet.

    ``availableNow`` drains what exists then stops (the test/backfill
    mode); without it the query runs continuously. Returns the
    StreamingQuery.

    ``stats_root``: also maintain incremental pairCounts/uriCounts/
    sf-count/token-profile tables (streaming/counts.py merge-on-read
    deltas) so the stats stay fresh per micro-batch instead of needing
    a full recompute over the fact table.

    ``link_decisions`` (requires ``stats_root``): after updating the
    stats, run the Spotlight-style disambiguation for THIS batch's
    mentions against the merged-to-date dictionaries and write the
    top-1 decision per mention to the SIBLING root
    ``<out_dir>_decisions/batch=N`` (never nested inside the fact
    table: leaf files at mixed depths break a wholesale
    ``spark.read.parquet(out_dir)`` with conflicting partition
    structures) —
    the incremental linker: new pages are linked with statistics that
    include everything ingested so far (self-inclusive, matching the
    batch operator's semantics; a single availableNow batch is exactly
    equal to batch ``linking.disambiguate``)."""
    from pignlproc_spark.operators.canonicalize import apply_redirects

    if link_decisions and stats_root is None:
        raise ValueError("link_decisions=True requires stats_root (the merged dictionaries)")
    if source not in ("pages", "warc"):
        raise ValueError(f"source must be 'pages' or 'warc', got {source!r}")
    # `warc`: the drop directory receives RAW .warc.gz crawl archives;
    # the canonical pages shape comes straight out of the archive
    # stream, so the whole incremental KG path (extraction → mentions →
    # counts → link decisions) runs off the crawl with no intermediate
    # parquet landing step
    pages = (
        read_warc_stream(spark, input_dir, lang=lang)
        if source == "warc"
        else read_page_stream(spark, input_dir)
    )
    stream = mention_stream(pages)

    def handle_batch(batch_df: DataFrame, batch_id: int):
        out = batch_df
        if redirects is not None:
            out = apply_redirects(out, redirects, "uri")
        # per-batch directory + overwrite = idempotent on micro-batch
        # replay (crash between sink write and checkpoint commit):
        # re-running batch N replaces batch=N instead of appending dupes
        if stats_root is None:
            out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
            return
        out = out.persist()  # one extraction pass feeds facts + stats
        try:
            out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
            from pignlproc_spark.streaming.counts import maintain_mention_stats, read_counts

            maintain_mention_stats(
                out, stats_root, batch_id, compact_every=compact_every, lang=lang, analysis=analysis
            )
            if link_decisions:
                from pignlproc_spark.operators import linking

                spark_b = out.sparkSession
                pair = read_counts(spark_b, f"{stats_root}/pair_counts", ["surface_form", "uri"])
                toks = read_counts(spark_b, f"{stats_root}/token_counts", ["uri", "token"])
                dec = linking.disambiguate(out, pair, toks, k=1, lang=lang)
                dec.write.mode("overwrite").parquet(f"{out_dir}_decisions/batch={batch_id}")
        finally:
            # unpersist even when the write/stats raise — foreachBatch
            # retries would otherwise layer a leaked cache per attempt
            out.unpersist()

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
