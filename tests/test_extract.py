"""Golden + property tests for the CCWikiText v1 extractor (J5 analogue;
SURVEY.md §5.2 items 1–2). Goldens are authored from our frozen spec —
determinism and byte-identity are the testable invariants."""

import pandas as pd
import pytest

from pignlproc_spark.functions.extract import extract

GOLDENS = [
    # (html, expected_text, expected_redirect)
    (b"<p>plain words here</p>", "plain words here", None),
    (b"<h2>Title</h2>\n<p>body text</p>", "Title\n\nbody text", None),
    (b'<p>see <a href="/wiki/Alpha_1">the alpha</a> now</p>', "see the alpha now", None),
    (b"<p>see [[Alpha_1|the alpha]] now</p>", "see the alpha now", None),
    (b"<p>see [[Alpha 1]] now</p>", "see Alpha 1 now", None),
    (b"#REDIRECT [[Target_Page]]", "", "Target_Page"),
    (b"#redirect [[target page]]", "", "Target_page"),
    (b"  #REDIRECT: [[A|old]]", "", "A"),
    (b"<p>a {{Infobox|x=1}} b</p>", "a b", None),
    (b"<p>a {{outer|{{inner}}}} b</p>", "a b", None),
    (b"<p>x<ref>cite</ref> y</p>", "x y", None),
    (b"<p>x<ref name=a/> y</p>", "x y", None),
    (b"<p>x <!-- hidden --> y</p>", "x y", None),
    (b"<p>a &amp; b &lt;c&gt; &#65; &#x42;</p>", "a & b <c> A B", None),
    (b"<p>non&nbsp;breaking</p>", "non breaking", None),
    (b"<p>  lots   of\n\t space  </p>", "lots of space", None),
    (b"<p><b>bold</b> and <i>ital</i></p>", "bold and ital", None),
    (b"<script>var x=1;</script><p>after</p>", "after", None),
    (b"stray top level text", "stray top level text", None),
    (b"", "", None),
    (b"   \n\t ", "", None),
    (b"<p>&broken; <unclosed</p>", "&broken; <unclosed", None),
]


@pytest.mark.parametrize("html,text,redirect", GOLDENS, ids=range(len(GOLDENS)))
def test_golden(html, text, redirect):
    r = extract(html)
    assert r.text == text
    assert r.redirect == redirect


def test_link_annotations_offsets():
    r = extract(b'<p>see <a href="/wiki/Alpha_1">the alpha</a> and [[Beta_2|b two]].</p>')
    assert [(a.value, a.label) for a in r.links] == [("Alpha_1", "the alpha"), ("Beta_2", "b two")]
    for a in r.links:
        assert r.text[a.begin : a.end] == a.label


def test_percent_encoded_target():
    r = extract(b'<p><a href="/wiki/Alpha%5F1">x</a></p>')
    assert r.links[0].value == "Alpha_1"


def test_anchor_fragment_and_external_base():
    r = extract(b'<p><a href="https://en.example.org/wiki/Gamma_3#sec">g</a></p>')
    assert r.links[0].value == "Gamma_3"


def test_headers_paragraphs():
    r = extract(b"<h2>Head er</h2><p>one.</p><p>two.</p>")
    assert r.headers == [(2, 0, 7, "Head er")]
    assert r.paragraphs == [(9, 13), (15, 19)]
    assert r.text == "Head er\n\none.\n\ntwo."


def test_nested_link_markup_in_surface():
    r = extract(b'<p><a href="/wiki/T_1"><b>deep</b> surface</a></p>')
    assert r.text == "deep surface"
    assert r.links[0].label == "deep surface"


def test_determinism_and_byte_identity_corpus(synth_dir):
    pages = pd.read_parquet(synth_dir / "pages.parquet")
    for _, row in pages.iterrows():
        r1 = extract(row.html)
        r2 = extract(row.html)
        assert r1 == r2
        assert r1.text == row.text, row.url
        for a in r1.links:
            assert r1.text[a.begin : a.end] == a.label


def test_namespace_links_render_but_dont_annotate():
    r = extract(b"<p>see [[File:Pic.jpg|a photo]] and [[Category:Things|things]] and [[Real_Page|real]].</p>")
    assert r.text == "see a photo and things and real."
    assert [(a.value, a.label) for a in r.links] == [("Real_Page", "real")]
    # colon in a title that is NOT a known namespace stays a link
    r2 = extract(b"<p>[[Dr: Strange|doc]]</p>")
    assert [(a.value, a.label) for a in r2.links] == [("Dr:_Strange", "doc")]
    r3 = extract(b'<p><a href="/wiki/Category:Birds">birds</a></p>')
    assert r3.text == "birds" and r3.links == []


def test_robustness_probes():
    assert extract(None).text == ""
    assert extract(b"\xff\xfe<p>ok</p>").text.endswith("ok")
    assert extract(b"<p>x &#x1F600; y</p>").text == "x \U0001F600 y"
    # surrogate / out-of-range NCRs stay literal text (a decoded lone
    # surrogate cannot be UTF-8/Arrow-encoded and would kill the batch)
    assert extract(b"<p>a &#xD800; b</p>").text == "a &#xD800; b"
    assert extract(b"<p>a &#55296; b</p>").text == "a &#55296; b"
    assert extract(b"<p>a &#x110000; b</p>").text == "a &#x110000; b"
    extract(b"<p>a &#xD800; b</p>").text.encode("utf-8")  # must not raise
