"""CCBpe v1 tokenizer induction: Spark learner vs the pure-Python
reference implementation (dual-path spec discipline, like
extract.py vs synth.py), greedy merge-apply semantics, encode
parity, and the bounded-vocab contract."""

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from pignlproc_spark.operators import bpe


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cats that chat"),
        (2, "batty mats chatter chatter"),
        (3, "aaaa aaa aa a"),  # overlap-greedy stress
        (4, ""),  # empty doc: no tokens, no encode row
        (5, "zzz 1234 cafe caffé caffé"),  # digits + non-ASCII
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_model(docs_df, n_merges):
    wf = sorted((r["word"], r["freq"]) for r in bpe.word_freqs(docs_df).collect())
    merges = bpe.learn_bpe_reference(wf, n_merges)
    enc = bpe.encode_words([w for w, _ in wf], [(l, r) for _, l, r, _ in merges])
    return wf, merges, dict(zip((w for w, _ in wf), enc))


def test_learner_matches_reference(spark, docs):
    model = bpe.learn_bpe(docs, n_merges=8)
    _, ref_merges, ref_enc = _ref_model(docs, 8)
    got = [(r.rank, r.lhs, r.rhs, r.pair_freq) for r in model.merges.orderBy("rank").collect()]
    assert got == ref_merges
    got_vocab = {r.word: r.syms for r in model.vocab.collect()}
    assert got_vocab == ref_enc


def test_greedy_overlap_semantics(spark):
    # "a a a a" + (a,a) must give [aa, aa], one greedy pass — not
    # [aa, a, a] (boundary-consumed) and not [aaa, a] (re-merge)
    d = spark.createDataFrame([(["a", "a", "a", "a"],), (["a", "a", "a"],)], "syms array<string>")
    out = [r[0] for r in d.select(bpe._apply_merge(F.col("syms"), "a", "a")).collect()]
    assert out == [["aa", "aa"], ["aa", "a"]]
    assert bpe._apply_py(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    # merged symbol may pair with the NEXT round's neighbours only
    d2 = spark.createDataFrame([(["x", "a", "b", "a", "b"],)], "syms array<string>")
    assert d2.select(bpe._apply_merge(F.col("syms"), "a", "b")).collect()[0][0] == ["x", "ab", "ab"]


def test_learner_fuzz_vs_reference(spark):
    rng = random.Random(7)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7))) for _ in range(60)]
    rows = [(i, " ".join(rng.sample(words, rng.randint(1, 12)))) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.learn_bpe(d, n_merges=12)
    _, ref_merges, ref_enc = _ref_model(d, 12)
    got = [(r.rank, r.lhs, r.rhs, r.pair_freq) for r in model.merges.orderBy("rank").collect()]
    assert got == ref_merges
    assert {r.word: r.syms for r in model.vocab.collect()} == ref_enc


def test_encode_corpus_and_piece_counts(spark, docs):
    model = bpe.learn_bpe(docs, n_merges=8)
    wf, merges, ref_enc = _ref_model(docs, 8)
    enc = bpe.encode_corpus(docs, model).collect()
    # recompute per-doc expected encoding straight from the reference
    toks = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id",
            bpe.tokens_col(F.col("text"), apply_stoplist=False).alias("toks"),
        ).collect()
    }
    by_id = {r.doc_id: r for r in enc}
    assert 4 not in by_id  # empty doc emits no row (inner-join semantics)
    for doc_id, ts in toks.items():
        if not ts:
            continue
        pieces = [p for t in ts for p in ref_enc[t]]
        row = by_id[doc_id]
        assert row.n_pieces == len(pieces)
        assert row.pieces_md5 == hashlib.md5(" ".join(pieces).encode()).hexdigest()
    # piece_counts conservation: freq-weighted unnest == corpus totals
    pc = {r.piece: r.cnt for r in bpe.piece_counts(model).collect()}
    flat: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            for p in ref_enc[t]:
                flat[p] = flat.get(p, 0) + 1
    assert pc == flat


def test_vocab_bounds_and_early_stop(spark, docs):
    # min_freq floors the vocab relationally
    wf = {r["word"]: r["freq"] for r in bpe.word_freqs(docs, min_freq=2).collect()}
    assert wf and all(f >= 2 for f in wf.values())
    # vocab_cap keeps exactly N words by (freq DESC, word ASC)
    capped = bpe.word_freqs(docs, vocab_cap=3).collect()
    full = sorted(
        ((r["word"], r["freq"]) for r in bpe.word_freqs(docs).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    assert sorted(((r["word"], r["freq"]) for r in capped), key=lambda t: (-t[1], t[0])) == full[:3]
    # single-char vocab: no pairs -> zero merges, loop stops early
    tiny = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    model = bpe.learn_bpe(tiny, n_merges=5)
    assert model.merges.count() == 0
    assert {r.word: r.syms for r in model.vocab.collect()} == {"a": ["a"], "b": ["b"], "c": ["c"]}
