"""Dump-replay (J1/J2) and NTriples (J4) source parity."""

from pyspark.sql import functions as F

from pignlproc_spark import synth
from pignlproc_spark.sources import ntriples, wikidump

RED_PROP = "http://dbpedia.org/ontology/wikiPageRedirects"
ABS_PROP = "http://dbpedia.org/ontology/abstract"


def test_dump_roundtrip_markup(spark, synth_dir):
    d = wikidump.read_dump(spark, str(synth_dir / "dump"))
    idx = spark.read.parquet(str(synth_dir / "golden_dump_index.parquet"))
    assert d.count() == idx.count()
    j = d.join(idx, ["title", "page_id"])
    assert j.count() == idx.count()
    # markup survives XML escaping byte-for-byte
    bad = j.where(F.octet_length(F.encode("markup", "UTF-8")) != F.col("markup_bytes")).count()
    assert bad == 0


def test_dump_to_pages_reparses(spark, synth_dir):
    from pignlproc_spark.functions.extract import parse_pages

    pages = wikidump.dump_to_pages(spark, str(synth_dir / "dump"))
    parsed = parse_pages(pages)
    # extraction over the replayed dump reproduces the same text corpus
    got = parsed.select(F.md5(F.col("text").cast("binary")).alias("h"))
    want = spark.read.parquet(str(synth_dir / "golden_text.parquet")).select(
        F.md5(F.col("text").cast("binary")).alias("h")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_dump_replay_full_pipeline_parity(spark, synth_dir, sf_dir):
    """J1→J2→J5→stats chain: running the WHOLE pipeline over the
    XML-dump replay reproduces every url-independent statistic exactly
    (urls differ by construction, so mention/url triples are excluded)."""
    from pignlproc_spark import synth
    from pignlproc_spark.plans import pipeline

    pages = wikidump.dump_to_pages(spark, str(synth_dir / "dump"))
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))
    res = pipeline.run(spark, pages, red, source_id="dump-replay-test")
    try:
        for df, golden_name, cols in (
            (res.pair_counts, "golden_pair_counts", ["surface_form", "uri", "cnt"]),
            (res.uri_counts, "golden_uri_counts", ["uri", "cnt"]),
            (res.sf_total_counts, "golden_sf_total_counts", ["surface_form", "annotated_cnt", "total_cnt"]),
            (res.token_counts, "golden_token_counts", ["uri", "token", "cnt"]),
        ):
            g = synth.side_table(spark, sf_dir, golden_name).select(*cols)
            d = df.select(*cols)
            assert d.exceptAll(g).count() == 0, golden_name
            assert g.exceptAll(d).count() == 0, golden_name
    finally:
        res.unpersist()


def test_ntriples_uri_uri(spark, synth_dir):
    got = ntriples.read_uri_uri(spark, str(synth_dir / "nt" / "redirects.nt"), RED_PROP)
    want = spark.read.parquet(str(synth_dir / "redirects.parquet")).select(
        F.col("src_uri").alias("subj"), F.col("dst_uri").alias("obj")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # malformed + comment lines are skipped, wrong property filtered
    assert ntriples.read_uri_uri(spark, str(synth_dir / "nt" / "redirects.nt"), "http://other/prop").count() == 0


def test_ntriples_uri_literal(spark, synth_dir):
    got = ntriples.read_uri_literal(spark, str(synth_dir / "nt" / "abstracts.nt"), ABS_PROP)
    want = spark.read.parquet(str(synth_dir / "abstracts.parquet")).select(
        F.col("uri").alias("subj"), F.col("abstract").alias("lit")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_ntriples_literal_unescape(spark, tmp_path):
    p = tmp_path / "x.nt"
    p.write_text(
        '<http://a> <http://p> "say \\"hi\\" and \\\\ back"@en .\n'
        '<http://b> <http://p> "typed"^^<http://www.w3.org/2001/XMLSchema#string> .\n'
        "# comment\n"
        "<http://c> <http://q> <http://not-a-literal> .\n"
    )
    rows = {r.subj: r.lit for r in ntriples.read_uri_literal(spark, str(p), "http://p").collect()}
    assert rows == {"http://a": 'say "hi" and \\ back', "http://b": "typed"}


def test_prefix_stripping(spark, tmp_path):
    p = tmp_path / "y.nt"
    p.write_text("<http://x/A> <http://p> <http://x/B> .\n")
    rows = ntriples.read_uri_uri(spark, str(p), "http://p", strip_prefix="http://x/").collect()
    assert [(rows[0].subj, rows[0].obj)] == [("A", "B")]
    # the strip is LITERAL: a regex-metachar prefix must neither crash
    # nor over-match ('.' may not match arbitrary chars), and a
    # non-matching URI passes through untouched
    p2 = tmp_path / "z.nt"
    p2.write_text(
        "<http://x(1)/A> <http://p> <http://xZ1)/B> .\n"
        "<http://other/C> <http://p> <http://x(1)/D> .\n"
    )
    r2 = {
        (r.subj, r.obj)
        for r in ntriples.read_uri_uri(spark, str(p2), "http://p", strip_prefix="http://x(1)/").collect()
    }
    assert r2 == {("A", "http://xZ1)/B"), ("http://other/C", "D")}


def test_warc_replay(spark, tmp_path):
    import datetime as dt

    from pignlproc_spark.sources import warc as W

    def rec(typ, uri, date, body, status=200, ctype="text/html"):
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}; charset=utf-8\r\n\r\n{body}"
        )
        return (
            f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
            + f"WARC-Date: {date}\r\nContent-Length: {len(http.encode())}\r\n\r\n"
            + http
            + "\r\n\r\n"
        )

    data = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n\r\n"
        "software: synth\r\n\r\n"
        + rec("response", "https://example.com/a", "2024-01-01T01:02:03Z",
              "<html>héllo &amp; wörld</html>")
        + rec("request", "https://example.com/a", "2024-01-01T01:02:03Z", "GET /a")
        + rec("response", "https://example.com/b", "2024-02-03T04:05:06Z",
              "line1\r\nline2", status=404, ctype="text/plain")
    )
    p = tmp_path / "sample.warc"
    p.write_bytes(data.encode("utf-8"))
    rows = {r.url: r for r in W.read_warc(spark, str(p)).collect()}
    # warcinfo + request records filtered; both responses survive
    assert set(rows) == {"https://example.com/a", "https://example.com/b"}
    a = rows["https://example.com/a"]
    assert a.html == "<html>héllo &amp; wörld</html>"
    assert (a.http_status, a.content_type) == (200, "text/html")
    assert a.warc_ts == dt.datetime(2024, 1, 1, 1, 2, 3)
    b = rows["https://example.com/b"]
    assert (b.http_status, b.content_type) == (404, "text/plain")
    # multi-line body survives; the inter-record separator is stripped
    assert b.html == "line1\r\nline2"
    # canonical pages shape, byte-faithful for UTF-8 text payloads
    pages = W.warc_to_pages(spark, str(p))
    assert pages.columns == ["url", "warc_ts", "html", "lang"]
    got = {r.url: bytes(r.html).decode() for r in pages.collect()}
    assert got["https://example.com/a"] == "<html>héllo &amp; wörld</html>"


def _warc_record(typ, uri, date, body: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {typ}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"WARC-Date: {date}\r\nContent-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body + b"\r\n\r\n"


def test_warc_gz_replay_byte_faithful(spark, tmp_path):
    """Per-record gzip members (the CC layout): binary payloads replay
    byte-exactly, non-response records are filtered, and the CDX-indexed
    random-access path returns the identical rows."""
    import datetime as dt
    import gzip

    from pignlproc_spark.sources import warc as W

    binary_payload = b"\x89PNG\r\n\x1a\n" + bytes(range(256))  # NOT valid UTF-8
    http_a = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        b"<html>h\xc3\xa9llo</html>"
    )
    http_png = b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n" + binary_payload
    members = [
        ("skip", gzip.compress(_warc_record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: t\r\n"), mtime=0)),
        ("https://e.com/a", gzip.compress(_warc_record("response", "https://e.com/a", "2024-01-01T01:02:03Z", http_a), mtime=0)),
        ("skip", gzip.compress(_warc_record("request", "https://e.com/a", "2024-01-01T01:02:03Z", b"GET /a HTTP/1.1\r\n\r\n"), mtime=0)),
        ("https://e.com/png", gzip.compress(_warc_record("response", "https://e.com/png", "2024-02-03T04:05:06Z", http_png), mtime=0)),
    ]
    p = tmp_path / "f.warc.gz"
    p.write_bytes(b"".join(m for _, m in members))

    rows = {r.url: r for r in W.read_warc_gz(spark, str(p)).collect()}
    assert set(rows) == {"https://e.com/a", "https://e.com/png"}
    png = rows["https://e.com/png"]
    assert bytes(png.payload) == binary_payload  # byte-faithful through gzip+Arrow
    assert (png.http_status, png.content_type) == (200, "image/png")
    a = rows["https://e.com/a"]
    assert bytes(a.payload).decode() == "<html>héllo</html>"
    assert a.warc_ts == dt.datetime(2024, 1, 1, 1, 2, 3)

    # CDX-indexed random access: offsets recorded at write time
    off = 0
    idx_rows = []
    for url, m in members:
        if url != "skip":
            idx_rows.append((str(p), off, len(m), url))
        off += len(m)
    idx = spark.createDataFrame(idx_rows, "path string, offset long, length long, url string")
    via_idx = {r.url: r for r in W.read_warc_gz_indexed(spark, idx).collect()}
    assert set(via_idx) == set(rows)
    for url in rows:
        assert bytes(via_idx[url].payload) == bytes(rows[url].payload)
        assert via_idx[url].http_status == rows[url].http_status

    # pages shape is byte-faithful binary html
    pages = W.warc_gz_to_pages(spark, str(p))
    assert pages.columns == ["url", "warc_ts", "html", "lang"]
    got = {r.url: bytes(r.html) for r in pages.collect()}
    assert got["https://e.com/png"] == binary_payload


def test_warc_gz_multirecord_member(spark, tmp_path):
    """Framing is Content-Length-driven, so several records inside ONE
    gzip member (non-CC layouts) parse identically."""
    import gzip

    from pignlproc_spark.sources import warc as W

    recs = b"".join(
        _warc_record(
            "response",
            f"https://m.com/{i}",
            "2024-01-01T00:00:00Z",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + f"body-{i}".encode(),
        )
        for i in range(5)
    )
    p = tmp_path / "multi.warc.gz"
    p.write_bytes(gzip.compress(recs, mtime=0))
    rows = {r.url: r for r in W.read_warc_gz(spark, str(p)).collect()}
    assert set(rows) == {f"https://m.com/{i}" for i in range(5)}
    assert all(bytes(rows[f"https://m.com/{i}"].payload) == f"body-{i}".encode() for i in range(5))


def test_warc_gz_synth_fixture_matches_golden(spark, synth_dir):
    """The synth .warc.gz fixture replays to exactly the plan-derived
    golden (url, epoch, status, content_type, byte length, md5)."""
    from pignlproc_spark.sources import warc as W

    got = W.read_warc_gz(spark, str(synth_dir / "warc")).select(
        "url",
        F.unix_timestamp("warc_ts").cast("bigint").alias("ts_epoch"),
        F.col("http_status").cast("bigint").alias("http_status"),
        "content_type",
        F.octet_length("payload").cast("bigint").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
    gold = spark.read.parquet(str(synth_dir / "golden_warc_pages.parquet"))
    assert got.count() == gold.count()
    assert got.exceptAll(gold.select(got.columns)).count() == 0
    assert gold.select(got.columns).exceptAll(got).count() == 0


def test_warc_gz_end_to_end_extraction(spark, synth_dir):
    """Crawl-archive ingestion meets the byte-identity gate: pages
    replayed from the .warc.gz fixture, run through the frozen
    extractor, must reproduce golden_text exactly (BASELINE.json
    input_hint: the engine's canonical input IS a CC-style crawl)."""
    from pignlproc_spark.functions.extract import parse_pages
    from pignlproc_spark.sources import warc as W

    pages = W.warc_gz_to_pages(spark, str(synth_dir / "warc"))
    parsed = parse_pages(pages).select("url", "text")
    gold = spark.read.parquet(str(synth_dir / "golden_text.parquet")).withColumnRenamed(
        "text", "expected"
    )
    j = parsed.join(gold, "url")
    assert j.count() == gold.count()
    assert j.where(F.col("text") != F.col("expected")).count() == 0


def test_warc_gz_corrupt_member_resync(spark, tmp_path):
    """A damaged gzip member must not kill the scan: the reader resyncs
    at the next member magic and salvages every record after (and
    before) the damage; a truncated final member is dropped silently."""
    import gzip

    def member(url, body):
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
            + b"\r\n\r\n"
        )
        return gzip.compress(rec, mtime=0)

    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\npayload-%d"
    good = [member(f"http://ex.org/{i}", http % i) for i in range(5)]
    bad = bytearray(member("http://ex.org/corrupt", http % 99))
    bad[20:40] = b"\x00" * 20  # wreck the deflate stream, keep the magic
    archive = good[0] + good[1] + bytes(bad) + good[2] + good[3] + good[4][:25]
    p = tmp_path / "damaged.warc.gz"
    p.write_bytes(archive)

    from pignlproc_spark.sources.warc import read_warc_gz

    rows = read_warc_gz(spark, str(p)).collect()
    got = sorted(r.url for r in rows)
    # members 0-3 survive; the corrupt member and the truncated tail drop
    assert got == [f"http://ex.org/{i}" for i in range(4)]
    assert all(
        r.payload == b"payload-%d" % i
        for i, r in enumerate(sorted(rows, key=lambda r: r.url))
    )


def test_dump_split_boundary_invariance(spark, tmp_path):
    """J1's split-correctness contract: pages straddling file-split
    boundaries must parse identically at ANY maxPartitionBytes. The
    fixture is a multi-MB single-file dump with wildly varying page
    sizes (so dozens of pages straddle 64 KB splits), read at 64 KB,
    the session default (1 MB), and effectively-unsplit (1 GB) — page
    count, titles/ids and markup bytes must be invariant, and the
    split counts must actually differ for the test to bite.

    Why it holds: lineSep delegates to Hadoop's delimited record
    reader — a task reads PAST its split end to finish the record it
    started and skips the partial record at its start, the same
    contract the reference's WikipediaPageInputFormat implements by
    hand (SURVEY.md §2.1 J1)."""
    import hashlib
    import random

    rng = random.Random(20260819)
    pages, want = [], {}
    for i in range(500):
        body = "".join(
            rng.choice(("lorem ", "ipsum ", "[[Link_%d]] " % i, "&amp;x ", "y<z "))
            for _ in range(rng.randrange(10, 3000))
        ).replace("<", "&lt;").replace(">", "&gt;")
        title = f"Page {i}&amp;tail"
        pages.append(
            f"<page>\n  <title>{title}</title>\n  <id>{i}</id>\n"
            f"  <revision><text xml:space=\"preserve\">{body}</text></revision>\n</page>"
        )
        unescaped = body.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
        want[(f"Page {i}&tail", i)] = hashlib.md5(unescaped.encode()).hexdigest()
    xml = "<mediawiki>\n" + "\n".join(pages) + "\n</mediawiki>\n"
    p = tmp_path / "dump.xml"
    p.write_text(xml, encoding="utf-8")
    assert p.stat().st_size > 4 * 64 * 1024  # many 64 KB boundaries

    def rows_at(max_bytes):
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
        try:
            d = wikidump.read_dump(spark, str(p))
            n_splits = spark.read.text(str(p), lineSep="</page>").rdd.getNumPartitions()
            rows = {
                (r.title, r.page_id): r.h
                for r in d.select(
                    "title", "page_id", F.md5(F.encode("markup", "UTF-8")).alias("h")
                ).collect()
            }
            return n_splits, rows
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    s64, r64 = rows_at("64k")
    s1m, r1m = rows_at("1m")
    sbig, rbig = rows_at("1g")
    # splits genuinely differ (sbig may still be 2: the planner floors
    # split size at openCostInBytes-derived bytesPerCore, not 1 file)
    assert s64 > s1m > sbig >= 1
    assert r64 == r1m == rbig == want  # parse is split-invariant, byte-exact


def test_dump_bz2_replay_matches_plain(spark, tmp_path):
    """The .bz2 replay path (the format real Wikipedia dumps ship in,
    and a SPLITTABLE codec on Hadoop): identical rows to the plain-XML
    read — J1's compressed-input contract."""
    import bz2

    pages = [
        f"<page><title>B {i}</title><id>{i}</id>"
        f"<revision><text>body {i} [[T_{i}|t]]</text></revision></page>"
        for i in range(200)
    ]
    xml = "<mediawiki>\n" + "\n".join(pages) + "\n</mediawiki>\n"
    (tmp_path / "plain").mkdir()
    (tmp_path / "packed").mkdir()
    (tmp_path / "plain" / "dump.xml").write_text(xml, encoding="utf-8")
    (tmp_path / "packed" / "dump.xml.bz2").write_bytes(bz2.compress(xml.encode()))

    plain = {
        (r.title, r.page_id, r.markup)
        for r in wikidump.read_dump(spark, str(tmp_path / "plain")).collect()
    }
    packed = {
        (r.title, r.page_id, r.markup)
        for r in wikidump.read_dump(spark, str(tmp_path / "packed")).collect()
    }
    assert plain == packed and len(plain) == 200
