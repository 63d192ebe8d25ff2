"""Wikipedia-XML-dump replay source.

Reference parity: ``pignlproc/format/WikipediaPageInputFormat.java``
(J1) + ``storage/ParsingWikipediaLoader.java`` (J2), SURVEY.md §2.1 —
the Hadoop InputFormat that splits a multi-GB dump into ``<page>``
records, and the LoadFunc that extracts title/id/markup per page. Our
canonical input is the already-rowized pages table (SURVEY.md §1.3),
so this source exists for dump-replay/parity workloads.

Spark-first design: ``spark.read.text(..., lineSep="</page>")`` makes
the record split a *native, splittable, JVM-side* scan (one row per
page chunk, no custom InputFormat, no Python), then pure built-in
``regexp_extract`` pulls title/id/markup and ``sx.unescape``-style
entity decoding is three chained ``replace`` calls. Multi-file dumps
parallelize per file and per split exactly like the reference's HDFS
splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dump(spark: SparkSession, path: str) -> DataFrame:
    """dump xml file(s) → (title, page_id, markup) one row per page."""
    raw = spark.read.text(path, lineSep="</page>")
    page = raw.where(F.col("value").contains("<page>"))
    xml_unescape = _xml_unescape
    return page.select(
        xml_unescape(F.regexp_extract("value", r"<title>([\s\S]*?)</title>", 1)).alias("title"),
        F.regexp_extract("value", r"<id>(\d+)</id>", 1).cast("bigint").alias("page_id"),
        xml_unescape(F.regexp_extract("value", r"<text[^>]*>([\s\S]*?)</text>", 1)).alias("markup"),
    ).where(F.col("title") != "")


def _xml_unescape(col):
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&apos;", "'")
    return F.regexp_replace(out, "&amp;", "&")


def dump_to_pages(spark: SparkSession, path: str, base_url: str = "https://dump.example/wiki/") -> DataFrame:
    """Dump records → the engine's canonical pages shape
    (url, warc_ts, html, lang); parse with the normal pipeline after."""
    d = read_dump(spark, path)
    return d.select(
        F.concat(F.lit(base_url), F.translate("title", " ", "_")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("markup", "UTF-8").alias("html"),
        F.lit("en").alias("lang"),
    )
