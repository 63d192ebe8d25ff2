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


def test_batched_learner_matches_reference(spark, docs):
    """CCBpeB v1: the Spark batched learner == the pure-Python batched
    reference (merge sequence AND final encoder states), and the round
    count actually collapses (the latency contract: ≥4x fewer driver
    rounds than the 1-merge-per-round v1 learner on typical text)."""
    model = bpe.learn_bpe_batched(docs, n_merges=8, batch=8, window=32)
    wf = sorted((r["word"], r["freq"]) for r in bpe.word_freqs(docs).collect())
    ref_merges = bpe.learn_bpe_batched_reference(wf, 8, batch=8, window=32)
    got = [(r.rank, r.lhs, r.rhs, r.pair_freq) for r in model.merges.orderBy("rank").collect()]
    assert got == ref_merges
    enc = bpe.encode_words([w for w, _ in wf], [(l, r) for _, l, r, _ in ref_merges])
    assert {r.word: r.syms for r in model.vocab.collect()} == dict(
        zip((w for w, _ in wf), enc)
    )
    assert 1 <= model.rounds <= 2  # 8 merges in ≤2 rounds vs 8 in v1


def test_batched_learner_fuzz_vs_reference(spark):
    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7))) for _ in range(60)]
    rows = [(i, " ".join(rng.sample(words, rng.randint(1, 12)))) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.learn_bpe_batched(d, n_merges=12, batch=4, window=16)
    wf = sorted((r["word"], r["freq"]) for r in bpe.word_freqs(d).collect())
    ref = bpe.learn_bpe_batched_reference(wf, 12, batch=4, window=16)
    got = [(r.rank, r.lhs, r.rhs, r.pair_freq) for r in model.merges.orderBy("rank").collect()]
    assert got == ref


def test_batched_acceptance_rule_blocks_concat_coupling():
    """The {l, r, l||r} used-set must block (a) symbol reuse and
    (b) a pair whose input equals another accepted pair's OUTPUT —
    the one coupling that would make the combined single pass diverge
    from sequential application."""
    ranked = [
        ("a", "b", 100),   # accepted; used = {a, b, ab}
        ("b", "c", 90),    # blocked: b used
        ("ab", "x", 80),   # blocked: consumes the new concat 'ab'
        ("c", "d", 70),    # accepted; used += {c, d, cd}
        ("x", "y", 60),    # accepted
    ]
    got = bpe.select_merge_batch(ranked, remaining=10, batch=8)
    assert [(l, r) for l, r, _ in got] == [("a", "b"), ("c", "d"), ("x", "y")]
    # cap truncates without polluting the used set
    assert [(l, r) for l, r, _ in bpe.select_merge_batch(ranked, 10, 1)] == [("a", "b")]
    assert [(l, r) for l, r, _ in bpe.select_merge_batch(ranked, 2, 8)] == [
        ("a", "b"), ("c", "d"),
    ]


def test_batched_multi_apply_equals_sequential(spark):
    """For a within-round-disjoint pair set, ONE combined greedy pass
    must equal applying the pairs sequentially (the soundness claim the
    CCBpeB spec rests on), including the 'a a a a' self-overlap case."""
    pairs = [("a", "a"), ("c", "d")]
    rows = [
        (["a", "a", "a", "a"],),
        (["c", "d", "a", "a", "c", "d"],),
        (["x", "c", "a", "d"],),
        ([],),
    ]
    d = spark.createDataFrame(rows, "syms array<string>")
    multi = [r[0] for r in d.select(bpe._apply_merges(F.col("syms"), pairs)).collect()]
    seq = d
    for l, r in pairs:
        seq = seq.select(bpe._apply_merge(F.col(seq.columns[0]), l, r).alias("syms"))
    assert multi == [r[0] for r in seq.collect()]
    assert multi[0] == ["aa", "aa"] and multi[1] == ["cd", "aa", "cd"]
    # empty pair set is the identity
    same = [r[0] for r in d.select(bpe._apply_merges(F.col("syms"), [])).collect()]
    assert same == [list(r[0]) for r in d.collect()]


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
