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

Three access paths, matched to how Common Crawl actually ships data:

- :func:`read_warc` — plain-text ``.warc`` replay via a native
  splittable ``lineSep`` scan (fast, JVM-only; decodes bytes as UTF-8
  with replacement, so binary payloads are not byte-faithful).
- :func:`read_warc_gz` — real ``.warc.gz`` files where every record is
  its own gzip member (the CC layout). Gzip members are NOT
  byte-range-splittable without an index, so this path parallelizes
  per FILE: Spark's ``binaryFile`` source enumerates paths (content
  column pruned — no bytes move until the task opens its file), and a
  ``mapInPandas`` task stream-decompresses its file member-by-member,
  parsing records byte-exactly via WARC Content-Length framing. At CC
  scale a crawl is 60k+ ~1 GB files → 60k+ independent tasks, which is
  exactly how production CC/Spark readers distribute.
- :func:`read_warc_gz_indexed` — random-access replay driven by a
  CDX-style index table (path, offset, length): each task seeks to its
  record's gzip member and inflates just that member. This is the
  fine-grained scale path (arbitrary repartitioning of the index), and
  the only sound way to "split" a .warc.gz.
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEP = "\r\n\r\n"

#: sanity cap on a single WARC record body (Common Crawl truncates
#: payloads at 1 MiB; 1 GiB tolerates exotic archives while bounding
#: what a corrupt Content-Length can make the parser buffer)
_MAX_RECORD_BYTES = 1 << 30

#: rows per emitted Arrow batch from the .warc.gz readers — bounds
#: resident decompressed payload per task (a ~1 GB CC file holds ~50k
#: records; buffering them all before the first yield would OOM)
_BATCH_ROWS = 512


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
        # \S+ not \d\.\d: modern captures record "HTTP/2 200" verbatim
        # (single-digit version) — the byte-faithful reader's
        # _split_http already accepts it, so the two paths must agree
        F.regexp_extract(http_hdr, r"^HTTP/\S+\s+(\d{3})", 1)
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


# ---------------------------------------------------------------------------
# binary .warc.gz (per-record gzip members — the Common Crawl layout)
# ---------------------------------------------------------------------------

#: output schema of the byte-faithful readers; ``payload`` is the raw
#: HTTP body bytes (NOT decoded), ``html`` the errors=replace decode
#: for the text pipeline.
WARC_GZ_SCHEMA = (
    "path string, url string, warc_ts timestamp, http_status int, "
    "content_type string, payload binary, html string"
)


def _open_input(path: str):
    """Open ``path`` for random-access binary reads via pyarrow.fs —
    local, hdfs:// and s3:// all resolve through the same call, so the
    executor-side code is storage-agnostic."""
    from pyarrow import fs as pafs

    if "://" in path or path.startswith("file:/"):
        filesystem, inner = pafs.FileSystem.from_uri(path)
    else:
        filesystem, inner = pafs.LocalFileSystem(), path
    return filesystem.open_input_file(inner)


def _gunzip_members(read_chunk, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Stream-decompress concatenated gzip members (and plain
    single-member gzip) from a ``read_chunk(n) -> bytes`` callable,
    yielding decompressed chunks. Constant memory: one compressed chunk
    + one inflate window live at a time.

    Corruption tolerance (a 100-TB crawl WILL contain damaged
    archives): a member whose deflate stream is invalid must not kill
    the task — on ``zlib.error`` the scan resyncs at the next gzip
    magic (``1f 8b 08``; per-record members mean that is the next
    record) and continues, salvaging everything after the damage.
    Best-effort: a magic split across chunk boundaries or a truncated
    final member loses at most that member; the WARC parser above this
    layer independently resyncs on the ``WARC/`` version line, so
    partially-inflated garbage cannot corrupt neighboring records."""
    d = zlib.decompressobj(wbits=31)  # 31 = gzip framing
    while True:
        chunk = read_chunk(chunk_size)
        if not chunk:
            break
        while chunk:
            try:
                out = d.decompress(chunk)
            except zlib.error:
                # resync: next member magic in the unconsumed bytes
                # (offset 1 guarantees progress on a false positive)
                nxt = chunk.find(b"\x1f\x8b\x08", 1)
                d = zlib.decompressobj(wbits=31)
                chunk = chunk[nxt:] if nxt >= 0 else b""
                continue
            if out:
                yield out
            if d.eof:  # member boundary — restart on the leftover bytes
                chunk = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                chunk = b""
    try:
        tail = d.flush()
    except zlib.error:  # truncated/damaged final member
        tail = b""
    if tail:
        yield tail


def _parse_warc_records(chunks: Iterable[bytes]) -> Iterator[tuple[dict, bytes]]:
    """Incremental byte-exact WARC record parser over a decompressed
    chunk stream: (warc-headers dict, record-body bytes) per record.
    Framing is the ISO 28500 contract — header block ends at CRLFCRLF,
    body length is the Content-Length header, records are separated by
    CRLFs — so it is independent of how gzip members align with
    records (one-per-record, several-per-member, or one big member).
    """
    buf = bytearray()
    pos = 0
    for chunk in chunks:
        buf += chunk
        while True:
            # skip inter-record CRLF padding
            while buf.startswith(b"\r\n", pos):
                pos += 2
            end_hdr = buf.find(b"\r\n\r\n", pos)
            if end_hdr < 0:
                break
            headers: dict[str, str] = {}
            head = bytes(buf[pos:end_hdr]).decode("utf-8", errors="replace")
            for line in head.split("\r\n"):
                if ":" in line:
                    k, _, v = line.partition(":")
                    headers[k.strip().lower()] = v.strip()
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                length = -1
            # a negative OR absurd length is damage (partially-inflated
            # garbage can parse as a numeric header): without the cap
            # the parser would buffer the entire remaining stream
            # waiting for a body that never completes, dropping every
            # record after the damage at EOF — resync instead
            if not 0 <= length <= _MAX_RECORD_BYTES:
                nxt = buf.find(b"WARC/", end_hdr)
                if nxt < 0:
                    pos = len(buf)
                    break
                pos = nxt
                continue
            body_start = end_hdr + 4
            if len(buf) - body_start < length:
                break  # need more chunks
            yield headers, bytes(buf[body_start : body_start + length])
            pos = body_start + length
        if pos:
            del buf[:pos]
            pos = 0


def _split_http(body: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response message bytes → (status, content_type, payload)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body.startswith(b"HTTP/"):
        return None, None, body
    head = body[:sep].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1][:3].isdigit():
        status = int(parts[1][:3])
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip().split(";")[0].strip()
            break
    return status, ctype, body[sep + 4 :]


def _response_row(path: str, headers: dict, body: bytes):
    if headers.get("warc-type") != "response":
        return None
    status, ctype, payload = _split_http(body)
    ts = headers.get("warc-date")
    return {
        "path": path,
        "url": headers.get("warc-target-uri"),
        # WARC-Date is ISO-8601 Zulu; pandas parses it tz-aware, and
        # the session TZ is pinned UTC so Spark stores the same instant
        "warc_ts": ts,
        "http_status": status,
        "content_type": ctype,
        "payload": payload,
        "html": payload.decode("utf-8", errors="replace"),
    }


def read_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """Byte-faithful replay of ``.warc.gz`` file(s) (per-record gzip
    members, the Common Crawl layout) → one row per *response* record:
    (path, url, warc_ts, http_status, content_type, payload BINARY,
    html STRING).

    Scale shape: ``binaryFile`` enumerates paths with the content
    column PRUNED (a metadata-only listing — no file bytes shuffle);
    each task then stream-decompresses its own file with constant
    memory. Parallelism is per file — the natural unit, since gzip
    members cannot be split by byte range; for sub-file parallelism
    use :func:`read_warc_gz_indexed` with a CDX index.
    """
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path")  # column pruning drops `content` from the scan
    )
    # one task per file: keyless repartition round-robins N rows into
    # N partitions exactly one each (hashing paths would leave ~37 %
    # of partitions empty and stack 3-4 files on the stragglers)
    files = files.repartition(max(files.count(), 1))
    return files.mapInPandas(_files_to_records, WARC_GZ_SCHEMA)


def _files_to_records(batches) -> Iterator["pd.DataFrame"]:
    """mapInPandas kernel shared by the batch reader and
    ``streaming/ingest.py::read_warc_stream``: path rows in, parsed
    response records out; one streaming decompression pass per file,
    flushed every ``_BATCH_ROWS`` records so the task never holds a
    whole archive's decompressed payloads resident."""
    for pdf in batches:
        rows = []
        for p in pdf["path"]:
            local = p[5:] if p.startswith("file:") and "://" not in p else p
            with _open_input(local) as f:
                for headers, body in _parse_warc_records(_gunzip_members(f.read)):
                    row = _response_row(p, headers, body)
                    if row is not None:
                        rows.append(row)
                    if len(rows) >= _BATCH_ROWS:
                        yield _rows_to_pdf(rows)
                        rows = []
        if rows:
            yield _rows_to_pdf(rows)


def _rows_to_pdf(rows: list[dict]):
    import pandas as pd

    pdf = pd.DataFrame(
        rows,
        columns=[
            "path", "url", "warc_ts", "http_status", "content_type", "payload", "html",
        ],
    )
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], utc=True, errors="coerce")
    pdf["http_status"] = pdf["http_status"].astype("Int32")
    return pdf


def read_warc_gz_indexed(
    spark: SparkSession,
    index: DataFrame,
    path_col: str = "path",
    offset_col: str = "offset",
    length_col: str = "length",
) -> DataFrame:
    """CDX-driven random-access replay: ``index`` rows
    (path, offset, length) each point at ONE record's gzip member;
    every task seeks and inflates only its own members. Same output
    schema as :func:`read_warc_gz`.

    This is the 100-TB path: the index is an ordinary DataFrame, so it
    repartitions/filters/joins like any other — record-level
    parallelism over an archive gzip itself cannot split.
    """
    import pandas as pd

    sel = index.select(
        F.col(path_col).alias("path"),
        F.col(offset_col).cast("bigint").alias("offset"),
        F.col(length_col).cast("bigint").alias("length"),
    )

    def _read_slices(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from collections import OrderedDict

        # LRU-capped handle cache: an index partition may span
        # thousands of distinct archives (repartitioned by record
        # count), and an unbounded dict exhausts the fd ulimit
        handles: OrderedDict[str, object] = OrderedDict()
        max_handles = 64

        def _handle(local: str):
            f = handles.get(local)
            if f is not None:
                handles.move_to_end(local)
                return f
            if len(handles) >= max_handles:
                _, old = handles.popitem(last=False)
                old.close()
            f = handles[local] = _open_input(local)
            return f

        try:
            for pdf in batches:
                rows = []
                for p, off, ln in zip(pdf["path"], pdf["offset"], pdf["length"]):
                    local = p[5:] if p.startswith("file:") and "://" not in p else p
                    f = _handle(local)
                    f.seek(int(off))
                    blob = f.read(int(ln))
                    raw = zlib.decompress(blob, wbits=32 + 15)  # auto-detect gzip/zlib
                    for headers, body in _parse_warc_records([raw]):
                        row = _response_row(p, headers, body)
                        if row is not None:
                            rows.append(row)
                    if len(rows) >= _BATCH_ROWS:
                        yield _rows_to_pdf(rows)
                        rows = []
                if rows:
                    yield _rows_to_pdf(rows)
        finally:
            for f in handles.values():
                f.close()

    return sel.mapInPandas(_read_slices, WARC_GZ_SCHEMA)


def warc_gz_to_pages(spark: SparkSession, path: str, lang: str = "en") -> DataFrame:
    """.warc.gz record(s) → the canonical pages shape
    (url, warc_ts, html BINARY, lang) — byte-faithful payloads."""
    return read_warc_gz(spark, path).select(
        "url", "warc_ts", F.col("payload").alias("html"), F.lit(lang).alias("lang")
    )
