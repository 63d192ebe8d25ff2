"""CCLogReg v1: bit-deterministic distributed classifier training —
Spark loop vs the pure-Python reference, partitioning invariance,
and learning sanity on a separable task."""

import pytest
from pyspark.sql import functions as F

from pignlproc_spark.functions.tokenize import tokenize
from pignlproc_spark.operators import classifier as C


ROWS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today", 1),
    (1, "short junk", 0),
    (2, "another long document with many many useful words and content here now", 1),
    (3, "spam spam", 0),
    (4, "tiny", 0),
    (5, "a very long and wordy page of reasonable quality text content for training", 1),
    (6, "", 0),  # empty doc: bias-only features, still trains/scores
]


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, y int")


def test_weights_match_reference_bitwise(spark, labeled):
    model = C.train_hashed_logreg(labeled, dim=16, rounds=3)
    got = {r.bucket: r.w_q for r in model.weights.collect()}
    ref = C.train_reference(
        [(i, tokenize(t, stopwords=None), y) for i, t, y in ROWS], dim=16, rounds=3, eta=0.5
    )
    assert got == ref
    assert any(v != 0 for v in got.values())


def test_class_balance_bitwise_and_learns_imbalanced(spark):
    # 1:4 imbalance with the minority carrying little token mass —
    # unbalanced GD collapses to majority; balanced must separate
    rows = []
    for i in range(8):
        rows.append((i, " ".join(f"big{j}x" for j in range(20)), 1))
    for i in range(32):
        rows.append((100 + i, f"tiny{i % 3}y", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = C.train_hashed_logreg(df, dim=32, rounds=24, eta=8.0, class_balance=True)
    got = {r.bucket: r.w_q for r in model.weights.collect()}
    ref = C.train_reference(
        [(i, tokenize(t, stopwords=None), y) for i, t, y in rows],
        dim=32, rounds=24, eta=8.0, class_balance=True,
    )
    assert got == ref
    acc = (
        C.score_docs(df, model)
        .join(df.select("doc_id", "y"), "doc_id")
        .agg(F.avg((F.col("pred") == F.col("y")).cast("int")))
        .collect()[0][0]
    )
    assert acc >= 0.9
    with pytest.raises(ValueError, match="both classes"):
        C.train_hashed_logreg(
            df.withColumn("y", F.lit(1)), dim=8, rounds=1, class_balance=True
        )


def test_partitioning_invariance(spark, labeled):
    # the whole point of integer-sum gradient state: core count and
    # row placement must not change a single weight bit
    w1 = {
        r.bucket: r.w_q
        for r in C.train_hashed_logreg(labeled.repartition(1), dim=16, rounds=2).weights.collect()
    }
    w7 = {
        r.bucket: r.w_q
        for r in C.train_hashed_logreg(labeled.repartition(7), dim=16, rounds=2).weights.collect()
    }
    assert w1 == w7


def test_learns_separable_task(spark):
    # long docs (>=12 distinct filler words) vs short ones — linearly
    # separable from hashed counts; GD must fit the training set
    rows = []
    for i in range(30):
        words = [f"w{j}k" for j in range(12 + i % 5)]
        rows.append((i, " ".join(words), 1))
        rows.append((100 + i, f"w{i % 7}k bad", 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    model = C.train_hashed_logreg(df, dim=32, rounds=6, eta=1.0)
    scored = C.score_docs(df, model)
    acc = (
        scored.join(df.select("doc_id", "y"), "doc_id")
        .select((F.col("pred") == F.col("y")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .collect()[0][0]
    )
    assert acc >= 0.9


def test_empty_doc_and_empty_corpus(spark, labeled):
    model = C.train_hashed_logreg(labeled, dim=16, rounds=2)
    scores = {r.doc_id: r.score_q for r in C.score_docs(labeled, model).collect()}
    assert 6 in scores  # empty doc scored via the bias pseudo-feature
    bias = {r.bucket: r.w_q for r in model.weights.collect()}[C.BIAS_BUCKET]
    assert scores[6] == bias
    with pytest.raises(ValueError, match="empty"):
        C.train_hashed_logreg(labeled.where(F.lit(False)), dim=16, rounds=1)
