"""Checkpoint / lineage / resume semantics (BASELINE.json:14;
SURVEY.md §5.2 item 4): a re-run with the same fingerprint skips
completed stages and produces identical triples."""

from pignlproc_spark.checkpoint import CheckpointManager, input_fingerprint
from pignlproc_spark.plans import pipeline


def test_resume_identical_output(spark, sf_dir, tmp_path):
    ckpt1 = CheckpointManager(tmp_path / "ck")
    r1 = pipeline.run_synth(spark, sf_dir, ckpt=ckpt1)
    t1 = sorted(map(tuple, r1.triples.collect()))
    assert [e["resumed"] for e in ckpt1.events] == [False, False]

    # simulate driver loss: fresh manager, same root + fingerprint
    ckpt2 = CheckpointManager(tmp_path / "ck")
    r2 = pipeline.run_synth(spark, sf_dir, ckpt=ckpt2)
    t2 = sorted(map(tuple, r2.triples.collect()))
    assert [e["resumed"] for e in ckpt2.events] == [True, True]
    assert t1 == t2

    # lineage records per-partition metrics
    fp = ckpt1.events[0]["fingerprint"]
    lin = ckpt1.lineage("parsed", fp)
    assert lin["rows"] > 0
    assert lin["partitions"] and all(p["rows"] >= 0 and p["bytes"] > 0 for p in lin["partitions"])
    assert sum(p["rows"] for p in lin["partitions"]) == lin["rows"]


def test_partial_resume_recomputes_only_missing(spark, sf_dir, tmp_path):
    import shutil

    root = tmp_path / "ck2"
    ckpt1 = CheckpointManager(root)
    pipeline.run_synth(spark, sf_dir, ckpt=ckpt1).triples.count()
    # lose the mentions stage only
    shutil.rmtree(root / "mentions")
    ckpt2 = CheckpointManager(root)
    pipeline.run_synth(spark, sf_dir, ckpt=ckpt2).triples.count()
    assert [(e["stage"], e["resumed"]) for e in ckpt2.events] == [("parsed", True), ("mentions", False)]


def test_fingerprint_stability(spark):
    a = input_fingerprint(spark, "x", "v1")
    assert a == input_fingerprint(spark, "x", "v1")
    assert a != input_fingerprint(spark, "x", "v2")
