"""Property-based fuzzing of the frozen extraction/tokenize/sentence
specs (hypothesis): on ARBITRARY byte soup the extractor must never
crash, must be deterministic, and must keep its structural invariants
— offsets valid, no unconsumed markup constructs, spans rebased
exactly. These are the guarantees that let a 100 TB run survive the
web's worst pages without a single task retry loop."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pignlproc_spark.functions.extract import extract
from pignlproc_spark.functions.ngrams import SurfaceFormMatcher, normalize_sf
from pignlproc_spark.functions.sentences import split_sentences
from pignlproc_spark.functions.tokenize import tokenize
from pignlproc_spark.functions.uri import normalize_title, uri_encode

MARKUPISH = st.text(
    alphabet=st.sampled_from(list("abc XY01.&;<>/[]{}|#!\"'=\n\t-_%é😀")), max_size=300
)


@settings(max_examples=300, deadline=None)
@given(MARKUPISH)
def test_extract_never_crashes_and_is_deterministic(s):
    b = s.encode("utf-8")
    r1 = extract(b)
    r2 = extract(b)
    assert r1 == r2


@settings(max_examples=300, deadline=None)
@given(MARKUPISH)
def test_extract_offsets_valid(s):
    r = extract(s.encode("utf-8"))
    for a in r.links:
        assert 0 <= a.begin <= a.end <= len(r.text)
        assert r.text[a.begin : a.end] == a.label
    for b, e in r.paragraphs:
        assert 0 <= b <= e <= len(r.text)
    for _, b, e, title in r.headers:
        assert r.text[b:e] == title


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=200))
def test_extract_arbitrary_bytes(b):
    r = extract(b)
    assert isinstance(r.text, str)
    # whitespace discipline: no runs, no boundary whitespace per block
    assert "  " not in r.text
    assert not re.search(r"[ \t]\n|\n[ \t]", r.text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_tokenize_properties(s):
    toks = tokenize(s)
    assert isinstance(toks, list)
    for t in toks:
        assert t == t.lower()
        assert len(t) <= 64
        assert not re.search(r"[\s_]", t)
    # re-tokenizing the joined tokens is a fixpoint
    joined = " ".join(tokenize(s, stopwords=None))
    assert " ".join(tokenize(joined, stopwords=None)) == joined


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(list("ab c.!?X\n")), max_size=120))
def test_sentence_spans_partition_text(s):
    spans = split_sentences(s, 0, len(s))
    last = -1
    for b, e in spans:
        assert 0 <= b < e <= len(s)
        assert b > last  # ordered, non-overlapping
        last = e - 1
        assert not s[b].isspace() and not s[e - 1].isspace()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_title_idempotent(s):
    t = normalize_title(s)
    assert normalize_title(t) == t
    if t:
        u = uri_encode(t)
        assert u.startswith("http://en.dbpedia.org/resource/")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet=st.sampled_from(list("ab cd")), min_size=1, max_size=20), max_size=8), st.text(alphabet=st.sampled_from(list("ab cd.")), max_size=100))
def test_matcher_occurrences_subset_of_dict(forms, text):
    m = SurfaceFormMatcher(forms)
    for occ in m.occurrences(text):
        assert occ in m.forms
        assert occ == normalize_sf(occ)
