"""Distributed BPE tokenizer induction — "CCBpe v1" frozen spec.

Learning a byte-pair-encoding merge table is the canonical
tokenizer-training step of an LLM data pipeline (Sennrich et al.,
ACL 2016).  The classic observation that makes it distributable is
that BPE never needs the corpus after one aggregation: merges are a
function of the **word-frequency table** alone.  So the 100-TB shape
is

    corpus ──(one tokenize + groupBy word, map-side combined)──▶
    (word, freq) vocab table  [≈10⁶–10⁸ rows, ≪ corpus]
      └─ n_merges rounds over the vocab table only:
           explode adjacent symbol pairs (freq-weighted) → partial/
           final sum → 1-row argmax to the driver → greedy merge
           applied executor-side via a string fold
    encode = **relational join** corpus tokens → final (word → pieces)
    dictionary (broadcast when capped) — zero Python in the corpus
    path, and the corpus is scanned exactly twice end-to-end (once to
    learn, once to encode).

Driver materialization is bounded: one (l, r, cnt) row per round plus
the final ``n_merges``-row merge list — the same bounded-scalar
contract as ``similarity.ivf_centroids`` and the capped surface-form
dictionary (operators/stats.sf_total_counts).

Spec decisions frozen as **CCBpe v1** (mirrored by the DuckDB oracle
and by :func:`encode_words`, the pure-Python reference used in tests
— change any of them only with a version bump):

- pre-tokenization = the frozen ``CCWikiTok`` tokenizer with the
  stoplist OFF (``functions.tokenize.tokens_col(..., False)``);
- initial symbols = Unicode **codepoints** of the word (no
  end-of-word marker; both Spark's ``split(word, '')`` and DuckDB's
  ``string_split(word, '')`` split codepoint-wise, incl. astral);
- each round merges the pair with the highest freq-weighted count,
  ties broken by (left ASC, right ASC) binary UTF-8 order;
- a merge is applied as ONE greedy left-to-right pass per word
  ("a a a a" + (a,a) → "aa aa", never "a aa a");
- words are independent: merging never crosses word boundaries.

The greedy pass is a string fold (``F.aggregate`` with a ``\\x1f``-
separated accumulator): symbols are tokenizer output (letters/digits
only), so ``\\x1f`` can never occur inside one, and "accumulator ends
with ``\\x1f + left`` and next symbol equals right" is exactly the
adjacent-pair test.  The fold's lambda runs interpreted, but ONLY
over the vocab table (never the corpus) — the documented exception
class of CLAUDE.md's plan invariants.

Reference parity: pignlproc has no tokenizer-induction operator —
this is a "beyond the reference" training-pipeline op (COVERAGE.md),
sharing the bounded-fixpoint discipline of stats.entity_pagerank_q
and the capped-dictionary contract of stats.sf_total_counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pignlproc_spark.functions.tokenize import tokens_col

#: symbol separator inside the fold accumulator; the frozen tokenizer
#: emits only letters/digits, so U+001F can never appear in a symbol
SEP = "\x1f"

SPEC_VERSION = "CCBpe v1"


@dataclass(frozen=True)
class BpeModel:
    """Learned model: ``merges`` = (rank, lhs, rhs, pair_freq);
    ``vocab`` = (word, freq, syms ARRAY<STRING>) with ``syms`` in the
    final post-merge state — i.e. the word→pieces **encoder table**.
    ``rounds`` = driver rounds the learner ran (v1: one per merge;
    batched: one per accepted batch — the latency metric)."""

    merges: DataFrame
    vocab: DataFrame
    rounds: int = 0


MERGES_SCHEMA = "rank int, lhs string, rhs string, pair_freq bigint"


def _apply_merge(syms_col, left: str, right: str):
    """Greedy left-to-right single pass of merge (left, right) over a
    symbol array, as a JVM-side string fold (see module docstring)."""
    fold = F.aggregate(
        syms_col,
        F.lit(""),
        lambda acc, x: F.when(
            acc.endswith(SEP + left) & (x == F.lit(right)), F.concat(acc, x)
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    # every symbol is SEP-prefixed by construction → drop the leading ''
    return F.filter(F.split(fold, SEP), lambda s: s != F.lit(""))


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    vocab_cap: int | None = None,
) -> DataFrame:
    """(word, freq) — the one corpus pass BPE needs. ``min_freq`` is a
    pure relational floor (scale-free); ``vocab_cap`` keeps the top-N
    by (freq DESC, word ASC) via Spark's distributed TakeOrdered — an
    EXPLICIT bound contract, not a silent truncation: on a web-scale
    corpus set one of them so the vocab table stays executor-sized."""
    freqs = (
        df.select(F.explode(tokens_col(F.col(text_col), apply_stoplist=False)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    if min_freq > 1:
        freqs = freqs.where(F.col("freq") >= F.lit(min_freq))
    if vocab_cap is not None:
        freqs = freqs.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(vocab_cap)
    return freqs



def _pair_counts(vocab):
    """(l, r, cnt) — frequency-weighted adjacent-symbol pair counts of
    a (syms ARRAY, freq) vocab table. THE per-round statistic both BPE
    specs (CCBpe v1 sequential, CCBpeB v1 batched) define identically —
    single-sourced so the two learners cannot drift. Adjacent-pair
    ARRAY CONSTRUCTION feeds an immediate explode (the accepted
    plan-invariant exception); the aggregation sits after the explode
    as a partial/final sum."""
    return (
        vocab.where(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " j -> named_struct('l', syms[j-1], 'r', syms[j]))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_freq: int = 1,
    vocab_cap: int | None = None,
) -> BpeModel:
    """Learn ``n_merges`` BPE merges (CCBpe v1).  Each round costs one
    vocab-table aggregation (pair explode → partial/final sum) plus a
    1-row argmax collect; the vocab's symbol state is localCheckpointed
    per round so round k never re-executes rounds 1..k-1.  Stops early
    if no adjacent pair remains (every word fully merged)."""
    spark = df.sparkSession
    vocab = (
        word_freqs(df, text_col, min_freq, vocab_cap)
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = _pair_counts(vocab)
        best = pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, left, right, cnt))
        vocab = vocab.select(
            "word", "freq", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    return BpeModel(merges=merges_df, vocab=vocab, rounds=len(merges))


# --------------------------- CCBpeB v1 ---------------------------
#
# Batched merge learning. CCBpe v1 is latency-bound by design: one
# driver argmax round-trip per merge = n_merges SEQUENTIAL Spark jobs
# whose fixed latency dominates on small clusters (VERDICT r2). CCBpeB
# v1 learns UP TO ``batch`` merges per round under a FROZEN
# within-round independence rule, cutting driver rounds ~3-5x while
# every accepted merge's recorded pair_freq stays exactly the count at
# its true application time:
#
#   1. rank the round's snapshot pairs by (cnt DESC, l ASC, r ASC)
#      and take the top ``window``;
#   2. scan in rank order, greedily accepting a pair (l, r) iff
#      {l, r, l||r} is disjoint from the accepted-so-far symbol set
#      {l_j, r_j, l_j||r_j} — stop at min(batch, merges remaining);
#   3. apply ALL accepted merges in ONE greedy left-to-right pass.
#
# Why the rule is sound: accepted pairs share no symbols, so applying
# one cannot create, destroy, or re-count occurrences of another
# (the concat term l||r in the used set closes the one loophole — a
# merge whose OUTPUT equals another accepted pair's INPUT symbol, or
# vice versa, would couple them). Hence the single combined pass
# equals applying the batch sequentially in rank order, and each
# snapshot count equals the count at application time. The SEQUENCE
# differs from CCBpe v1 in general (v1 re-ranks after every merge;
# CCBpeB commits a batch against one snapshot) — CCBpeB is its own
# frozen spec with its own pure-Python reference and DuckDB oracle
# (the standard trade of scalable BPE trainers).


def select_merge_batch(
    ranked: list[tuple[str, str, int]], remaining: int, batch: int
) -> list[tuple[str, str, int]]:
    """The frozen CCBpeB acceptance rule over one round's ranked
    top-``window`` pairs (shared by the Spark driver loop, the pure-
    Python reference, and mirrored by the oracle's recursive CTE)."""
    cap = min(batch, remaining)
    acc: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for left, right, cnt in ranked:
        if len(acc) >= cap:
            break
        if {left, right, left + right} & used:
            continue
        acc.append((left, right, cnt))
        used |= {left, right, left + right}
    return acc


def _apply_merges(syms_col, pairs: list[tuple[str, str]]):
    """One greedy left-to-right pass applying a WITHIN-ROUND-DISJOINT
    set of merges (the CCBpeB acceptance rule guarantees the combined
    pass equals sequential application). Empty set = identity."""
    if not pairs:
        return syms_col

    def step(acc, x):
        cond = F.lit(False)
        for left, right in pairs:
            cond = cond | (acc.endswith(SEP + left) & (x == F.lit(right)))
        return F.when(cond, F.concat(acc, x)).otherwise(F.concat(acc, F.lit(SEP), x))

    fold = F.aggregate(syms_col, F.lit(""), step)
    return F.filter(F.split(fold, SEP), lambda s: s != F.lit(""))


def learn_bpe_batched(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_freq: int = 1,
    vocab_cap: int | None = None,
    batch: int = 8,
    window: int = 32,
) -> BpeModel:
    """Learn ``n_merges`` merges under CCBpeB v1 (see the spec block
    above). Each driver round costs ONE top-``window`` collect plus one
    checkpointed vocab rewrite, and accepts up to ``batch`` merges —
    rank-1 is always accepted, so rounds ≤ n_merges with typical text
    converging in ~n_merges/4 rounds (4x fewer sequential Spark jobs
    than :func:`learn_bpe`; ``model.rounds`` reports the actual count).
    """
    spark = df.sparkSession
    vocab = (
        word_freqs(df, text_col, min_freq, vocab_cap)
        .select("word", "freq", F.split("word", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        pairs = _pair_counts(vocab)
        top = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(window)
            .collect()
        )
        if not top:
            break
        rounds += 1
        ranked = [(r["l"], r["r"], int(r["cnt"])) for r in top]
        accepted = select_merge_batch(ranked, n_merges - len(merges), batch)
        for left, right, cnt in accepted:
            merges.append((len(merges) + 1, left, right, cnt))
        vocab = vocab.select(
            "word",
            "freq",
            _apply_merges(F.col("syms"), [(l, r) for l, r, _ in accepted]).alias("syms"),
        ).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    return BpeModel(merges=merges_df, vocab=vocab, rounds=rounds)



def _count_pairs_py(syms: dict, freqs: dict) -> dict:
    """Frequency-weighted adjacent-pair counts — the pure-Python twin
    of :func:`_pair_counts`, shared by both reference learners so the
    two specs' per-round statistic cannot drift."""
    counts: dict[tuple[str, str], int] = {}
    for w, s in syms.items():
        f = freqs[w]
        for a, b in zip(s, s[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def learn_bpe_batched_reference(
    word_freqs_list: list[tuple[str, int]],
    n_merges: int,
    batch: int = 8,
    window: int = 32,
) -> list[tuple[int, str, str, int]]:
    """Pure-Python CCBpeB v1 reference learner — the independent
    second implementation tests hold :func:`learn_bpe_batched` to."""
    syms = {w: [c for c in w] for w, _ in word_freqs_list}
    freqs = dict(word_freqs_list)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        counts = _count_pairs_py(syms, freqs)
        if not counts:
            break
        ranked = sorted(
            ((left, right, cnt) for (left, right), cnt in counts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[:window]
        accepted = select_merge_batch(ranked, n_merges - len(merges), batch)
        for left, right, cnt in accepted:
            merges.append((len(merges) + 1, left, right, cnt))
            for w in syms:
                syms[w] = _apply_py(syms[w], left, right)
    return merges


def piece_counts(model: BpeModel) -> DataFrame:
    """(piece, cnt) — corpus piece frequencies after encoding, WITHOUT
    re-reading the corpus: the vocab already carries per-word corpus
    freq, so corpus piece counts = freq-weighted unnest of the final
    symbol states.  This is the "encode for stats is free" property."""
    return (
        model.vocab.select("freq", F.explode("syms").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def encode_corpus(
    df: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(doc_id, n_pieces, pieces_md5) — per-document CCBpe encoding as
    a relational join: tokens → (word → pieces) dictionary.  The
    corpus never touches Python; the dictionary broadcasts when capped
    (``word_freqs`` contract), else it's a plain shuffle equi-join.

    Docs whose tokenization is empty produce no row (inner-join
    semantics — mirrored by the oracle).  ``pieces_md5`` hashes the
    space-joined piece sequence in (token order, piece order) — the
    per-word piece string is prejoined on the vocab side (vocab-sized
    work), so the per-doc step is one ordered concat.
    """
    v = model.vocab.select(
        "word",
        F.array_join("syms", " ").alias("enc"),
        F.size("syms").cast("bigint").alias("n"),
    )
    if broadcast_vocab:
        v = F.broadcast(v)
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col), apply_stoplist=False)).alias("ord", "tok"),
    )
    joined = toks.join(v, toks.tok == v.word, "inner")
    # one row per doc after the agg; the field-projection lambda runs
    # over n_tokens elements of already-reduced rows, not the corpus
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("n").alias("n_pieces"),
            F.sort_array(F.collect_list(F.struct("ord", "enc"))).alias("ps"),
        )
        .select(
            F.col(id_col).cast("bigint").alias(id_col),
            F.col("n_pieces").cast("bigint").alias("n_pieces"),
            F.md5(
                F.concat_ws(" ", F.expr("transform(ps, s -> s.enc)")).cast("binary")
            ).alias("pieces_md5"),
        )
    )


def encode_words(words: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Pure-Python CCBpe v1 reference encoder (NO Spark): applies each
    merge as one greedy left-to-right pass, in rank order.  This is
    the spec's second, independent implementation — tests assert the
    Spark fold and this function agree symbol-for-symbol, the same
    dual-path discipline as extract.py vs synth.py."""
    out = []
    for w in words:
        syms = [c for c in w]
        for left, right in merges:
            syms = _apply_py(syms, left, right)
        out.append(syms)
    return out


def learn_bpe_reference(word_freqs_list: list[tuple[str, int]], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Pure-Python CCBpe v1 reference learner over (word, freq) pairs —
    the independent oracle for tests (argmax by count DESC then
    (l, r) ASC, one greedy pass per round, codepoint symbols)."""
    syms = {w: [c for c in w] for w, _ in word_freqs_list}
    freqs = dict(word_freqs_list)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts = _count_pairs_py(syms, freqs)
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, left, right, cnt))
        for w in syms:
            syms[w] = _apply_py(syms[w], left, right)
    return merges


def _apply_py(syms: list[str], left: str, right: str) -> list[str]:
    merged: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            merged.append(left + right)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged
