"""Common-Crawl WARC replay source.

The engine's canonical input is an Iceberg/parquet table of
Common-Crawl-style web pages (BASELINE.json:15 ``input_hint``; the
pages shape is (url, warc_ts, html, lang), see SURVEY.md §1.3). This
source replays raw WARC files into that shape, the web-crawl analogue
of ``sources/wikidump.py`` (reference parity: pignlproc's
``format/WikipediaPageInputFormat.java`` J1 — a splittable record
reader over a concatenated-record archive; WARC/1.0 per ISO 28500).

Spark-first design: ``spark.read.text(..., lineSep="WARC/1.0\\r\\n")``
makes the record split a native, splittable, JVM-side scan — one row
per WARC record, no custom InputFormat, no Python — then pure
built-ins (``substring_index`` / ``regexp_extract``) pull the WARC
headers, HTTP status line, and payload. Multi-file crawls parallelize
per file and per split.

Limitation (documented, deliberate): text-mode replay decodes bytes
as UTF-8 with replacement, so gzip'd/binary payloads are not
byte-faithful — matching the rest of the engine's text pipeline
(`functions/extract.py` uses errors=replace too). A byte-faithful
path would swap the scan for ``format("binaryFile")`` + a
``mapInPandas`` splitter; the downstream shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP = "\r\n\r\n"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → one row per *response* record:
    (url, warc_ts, http_status, content_type, html).

    Record framing: each ``spark.read.text`` row is everything between
    two ``WARC/1.0`` version lines — WARC header block, blank line,
    HTTP message (headers, blank line, body), trailing record
    separator. Non-response records (warcinfo, request, metadata) are
    filtered out; the version line itself is consumed by the lineSep.
    """
    raw = spark.read.text(path, lineSep="WARC/1.0\r\n")
    rec = raw.where(F.trim(F.col("value")) != "")
    warc_hdr = F.substring_index("value", _SEP, 1)
    # HTTP message = everything after the WARC header block's blank line
    http = F.substring("value", F.length(warc_hdr) + 5, F.length("value"))
    http_hdr = F.substring_index(http, _SEP, 1)
    body = F.substring(http, F.length(http_hdr) + 5, F.length(http))
    d = rec.select(
        F.regexp_extract(warc_hdr, r"(?m)^WARC-Type:\s*(\S+)", 1).alias("warc_type"),
        F.regexp_extract(warc_hdr, r"(?m)^WARC-Target-URI:\s*(\S+)", 1).alias("url"),
        F.regexp_extract(warc_hdr, r"(?m)^WARC-Date:\s*(\S+)", 1)
        .cast("timestamp")
        .alias("warc_ts"),
        F.regexp_extract(http_hdr, r"^HTTP/\d\.\d\s+(\d{3})", 1)
        .cast("int")
        .alias("http_status"),
        F.regexp_extract(http_hdr, r"(?mi)^Content-Type:\s*([^\r\n;]+)", 1).alias(
            "content_type"
        ),
        # strip the inter-record separator the framing leaves on the body
        F.regexp_replace(body, r"(\r\n)+$", "").alias("html"),
    )
    return d.where(F.col("warc_type") == "response").drop("warc_type")


def warc_to_pages(spark: SparkSession, path: str, lang: str = "en") -> DataFrame:
    """WARC record(s) → the engine's canonical pages shape
    (url, warc_ts, html BINARY, lang); feed `plans.pipeline` /
    curation directly after."""
    return read_warc(spark, path).select(
        "url",
        "warc_ts",
        F.encode("html", "UTF-8").alias("html"),
        F.lit(lang).alias("lang"),
    )
