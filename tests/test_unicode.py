"""Non-ASCII regression tests: the synthetic corpus is ASCII-only, so
these cover the paths a real web corpus exercises — percent-encoded
URIs through redirect resolution, Unicode surface-form totals, and
CJK language detection (all found masked in review)."""

from datetime import datetime

import pytest


from pignlproc_spark.functions.uri import uri_encode
from pignlproc_spark.operators import textstats
from pignlproc_spark.plans import pipeline


@pytest.fixture(scope="module")
def unicode_result(spark):
    cafe = uri_encode("Café")  # 'Caf%C3%A9'
    koffie = uri_encode("Koffie")
    pages = spark.createDataFrame(
        [
            (
                "https://u.example/1",
                datetime(2024, 1, 1),
                bytearray("<p>visit the <a href=\"/wiki/Café\">café münchen</a> today.</p>".encode()),
                "de",
            ),
            (
                "https://u.example/2",
                datetime(2024, 1, 1),
                bytearray("<p>the café münchen was busy. see [[Zürich|zürich]] too.</p>".encode()),
                "de",
            ),
        ],
        "url string, warc_ts timestamp, html binary, lang string",
    )
    redirects = spark.createDataFrame([(cafe, koffie)], "src_uri string, dst_uri string")
    res = pipeline.run(spark, pages, redirects, source_id="unicode-test")
    yield res, cafe, koffie
    res.unpersist()


def test_unicode_uri_percent_encoding_roundtrip(unicode_result):
    res, cafe, koffie = unicode_result
    uris = {r.uri for r in res.mentions.select("uri").collect()}
    assert koffie in uris  # redirect applied — encodings matched
    assert cafe not in uris
    assert uri_encode("Zürich") in uris


def test_unicode_sf_total_counts(unicode_result):
    res, _, _ = unicode_result
    rows = {r.surface_form: (r.annotated_cnt, r.total_cnt) for r in res.sf_total_counts.collect()}
    # 'café münchen' linked once, occurs twice in free text total
    assert rows["café münchen"] == (1, 2)
    assert rows["zürich"][0] == 1
    assert rows["zürich"][1] >= 1


def test_unicode_token_counts(unicode_result):
    res, _, koffie = unicode_result
    toks = {(r.uri, r.token) for r in res.token_counts.collect()}
    assert (koffie, "café") in toks
    assert (koffie, "münchen") in toks


def test_lang_id_zh(spark):
    df = spark.createDataFrame(
        [(1, "这是在了中文的测试和示例"), (2, "the quick brown fox and the dog")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in textstats.lang_id(df).collect()}
    assert got[1] == "zh"
    assert got[2] == "en"
