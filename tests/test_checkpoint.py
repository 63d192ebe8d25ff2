"""Checkpoint / lineage / resume semantics (BASELINE.json:14;
SURVEY.md §5.2 item 4): a re-run with the same fingerprint skips
completed stages and produces identical triples."""

from pyspark.sql import functions as F

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


def test_partitioned_stage_slice_resume(spark, synth_dir, tmp_path):
    """Redo unit below a stage: losing 2 of 8 slices recomputes only
    those 2, in one pass, and the re-read equals the original rows."""
    import shutil

    pages = spark.read.parquet(str(synth_dir / "pages.parquet")).select("url", "lang")
    root = tmp_path / "ck3"
    ckpt1 = CheckpointManager(root)
    fp = input_fingerprint(spark, "pages", "v1")
    out1 = ckpt1.stage_partitioned(pages, "parsed", fp, key="url", num_slices=8)
    rows1 = sorted(map(tuple, out1.collect()))
    assert ckpt1.events[-1]["slices_recomputed"] == list(range(8))
    assert all(ckpt1.slice_states("parsed", fp, 8))

    # simulate executor/partition loss: two slice manifests vanish
    shutil.rmtree(root / "parsed" / f"fp={fp}" / "s2")
    shutil.rmtree(root / "parsed" / f"fp={fp}" / "s5")
    ckpt2 = CheckpointManager(root)
    out2 = ckpt2.stage_partitioned(pages, "parsed", fp, key="url", num_slices=8)
    assert ckpt2.events[-1]["slices_recomputed"] == [2, 5]
    assert sorted(map(tuple, out2.collect())) == rows1

    # untouched re-run resumes fully; per-slice lineage has metrics
    ckpt3 = CheckpointManager(root)
    out3 = ckpt3.stage_partitioned(pages, "parsed", fp, key="url", num_slices=8)
    assert ckpt3.events[-1]["resumed"] and ckpt3.events[-1]["slices_recomputed"] == []
    assert out3.count() == len(rows1)
    import json

    lin = json.loads((root / "parsed" / f"fp={fp}" / "s2" / "_lineage.json").read_text())
    assert lin["slice"] == 2 and lin["rows"] >= 0


def test_partitioned_stage_guards(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(f"u{i}", i) for i in range(50)], "url string, x long")
    ckpt = CheckpointManager(tmp_path / "ck4")
    fp = input_fingerprint(spark, "g", "v1")
    ckpt.stage_partitioned(df, "s", fp, key="url", num_slices=4)
    # resuming the same fingerprint with a different modulus would mix
    # pmod-4 and pmod-8 slices and duplicate rows — must refuse
    with pytest.raises(ValueError, match="num_slices=4"):
        ckpt.stage_partitioned(df, "s", fp, key="url", num_slices=8)

    # an all-empty stage must round-trip (schema given explicitly; no
    # parquet files exist to infer from)
    empty = df.where(F.lit(False))
    out = ckpt.stage_partitioned(empty, "s_empty", fp, key="url", num_slices=4)
    assert out.count() == 0 and out.columns == ["url", "x"]


def test_fingerprint_stability(spark):
    a = input_fingerprint(spark, "x", "v1")
    assert a == input_fingerprint(spark, "x", "v1")
    assert a != input_fingerprint(spark, "x", "v2")


def test_redirects_refresh_invalidates_mentions_stage(spark, synth_dir, tmp_path):
    """A redirects snapshot change (new redirects_id) must recompute
    the mentions stage — serving the cached one would silently carry
    stale redirect resolution into every downstream count."""
    from pyspark.sql import functions as F

    pages = spark.read.parquet(str(synth_dir / "pages.parquet"))
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))
    root = tmp_path / "ckr"
    r1 = pipeline.run(spark, pages, red, ckpt=CheckpointManager(root),
                      source_id="p1", redirects_id="red-v1")
    n1 = r1.mentions.count()
    # same ids → both stages resume
    ck2 = CheckpointManager(root)
    pipeline.run(spark, pages, red, ckpt=ck2, source_id="p1",
                 redirects_id="red-v1").mentions.count()
    assert [(e["stage"], e["resumed"]) for e in ck2.events] == [
        ("parsed", True), ("mentions", True)]
    # refreshed redirects (empty snapshot, new id) → parsed resumes,
    # mentions recomputes against the NEW table
    ck3 = CheckpointManager(root)
    r3 = pipeline.run(spark, pages, red.limit(0), ckpt=ck3, source_id="p1",
                      redirects_id="red-v2")
    assert [(e["stage"], e["resumed"]) for e in ck3.events] == [
        ("parsed", True), ("mentions", False)]
    # and the recompute actually reflects the new snapshot: without
    # redirects, redirect-source uris stay unresolved
    assert r3.mentions.count() == n1  # row count is resolution-invariant
    u1 = {r.uri for r in r1.mentions.select("uri").distinct().collect()}
    u3 = {r.uri for r in r3.mentions.select("uri").distinct().collect()}
    assert u1 != u3
