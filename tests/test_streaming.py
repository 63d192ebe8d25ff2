"""Streaming ingestion parity: the availableNow micro-batch drain over
the synthetic corpus must produce the same mention multiset as the
batch pipeline (same frozen pure functions under both engines)."""

import shutil

import pytest
from pyspark.sql import functions as F

from pignlproc_spark import synth
from pignlproc_spark.streaming import ingest


@pytest.fixture(scope="module")
def staged_pages(spark, synth_dir, tmp_path_factory):
    """Split the sf0.001 pages into several files so the file stream
    has multiple arrivals."""
    root = tmp_path_factory.mktemp("stream_in")
    pages = spark.read.parquet(str(synth_dir / "pages.parquet"))
    pages.repartition(5).write.mode("overwrite").parquet(str(root / "pages"))
    return str(root / "pages")


def test_incremental_matches_batch(spark, sf_dir, synth_dir, staged_pages, tmp_path):
    out_dir = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt")
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))
    q = ingest.run_incremental(spark, staged_pages, out_dir, ckpt, redirects=red)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .groupBy("url", "context", "surface_form", "uri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    golden = synth.side_table(spark, sf_dir, "golden_mentions")
    cols = ["url", "context", "surface_form", "uri", "cnt"]
    assert got.select(*cols).exceptAll(golden.select(*cols)).count() == 0
    assert golden.select(*cols).exceptAll(got.select(*cols)).count() == 0

    # restart with same checkpoint: no new files -> no duplicate output
    n1 = spark.read.parquet(out_dir).count()
    q2 = ingest.run_incremental(spark, staged_pages, out_dir, ckpt, redirects=red)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n1
    shutil.rmtree(out_dir)


def test_incremental_stats_merge_on_read(spark, sf_dir, synth_dir, staged_pages, tmp_path):
    from pignlproc_spark.streaming import counts

    out_dir = str(tmp_path / "facts")
    stats_root = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))
    q = ingest.run_incremental(spark, staged_pages, out_dir, ckpt, redirects=red, stats_root=stats_root)
    q.awaitTermination(120)

    def assert_fresh():
        pc = counts.read_counts(spark, f"{stats_root}/pair_counts", ["surface_form", "uri"])
        golden = synth.side_table(spark, sf_dir, "golden_pair_counts")
        cols = ["surface_form", "uri", "cnt"]
        assert pc.select(*cols).exceptAll(golden.select(*cols)).count() == 0
        assert golden.select(*cols).exceptAll(pc.select(*cols)).count() == 0
        uc = counts.read_counts(spark, f"{stats_root}/uri_counts", ["uri"])
        gu = synth.side_table(spark, sf_dir, "golden_uri_counts")
        assert uc.exceptAll(gu.select("uri", "cnt")).count() == 0
        assert gu.select("uri", "cnt").exceptAll(uc).count() == 0

    # merge-on-read over per-batch deltas == batch-recomputed counts
    assert_fresh()
    n_deltas = len(counts._read_manifest(f"{stats_root}/pair_counts")["live"])
    assert n_deltas >= 2  # several micro-batches actually happened

    # compaction folds deltas into one base; counts unchanged
    assert counts.compact(spark, f"{stats_root}/pair_counts", ["surface_form", "uri"])
    assert counts.compact(spark, f"{stats_root}/uri_counts", ["uri"])
    assert len(counts._read_manifest(f"{stats_root}/pair_counts")["live"]) == 1
    assert_fresh()

    # replay of a batch ALREADY FOLDED by compaction must be a no-op
    # (the folded_through high-water mark): counts stay exact
    some_batch = spark.read.parquet(f"{out_dir}/batch=0")
    b0_delta = some_batch.groupBy("surface_form", "uri").agg(F.count(F.lit(1)).alias("cnt"))
    counts.append_delta(b0_delta, f"{stats_root}/pair_counts", batch_id=0)
    assert_fresh()

    # replay of a NEW (still-live) batch overwrites its own delta —
    # appended twice, counted once
    counts.append_delta(b0_delta, f"{stats_root}/pair_counts", batch_id=999)
    counts.append_delta(b0_delta, f"{stats_root}/pair_counts", batch_id=999)
    pc = counts.read_counts(spark, f"{stats_root}/pair_counts", ["surface_form", "uri"])
    golden = synth.side_table(spark, sf_dir, "golden_pair_counts")
    merged = pc.join(golden.select("surface_form", "uri", F.col("cnt").alias("g")), ["surface_form", "uri"])
    b0 = some_batch.groupBy("surface_form", "uri").agg(F.count(F.lit(1)).alias("b0"))
    chk = merged.join(b0, ["surface_form", "uri"], "left").fillna(0, subset=["b0"])
    assert chk.where(F.col("cnt") != F.col("g") + F.col("b0")).count() == 0


def test_incremental_link_decisions(spark, synth_dir, tmp_path):
    """Per-batch disambiguation against merged-to-date stats: a single
    availableNow batch must equal the batch operator exactly; a
    multi-batch drain produces prefix-stats decisions per batch."""
    from pignlproc_spark.operators import linking, stats
    from pignlproc_spark.streaming import counts

    pages = spark.read.parquet(str(synth_dir / "pages.parquet"))
    red = spark.read.parquet(str(synth_dir / "redirects.parquet"))

    # single batch: one input file -> one micro-batch
    one = tmp_path / "one"
    pages.coalesce(1).write.parquet(str(one / "pages"))
    out1 = str(tmp_path / "out1")
    q = ingest.run_incremental(
        spark, str(one / "pages"), out1, str(tmp_path / "ck1"),
        redirects=red, stats_root=str(tmp_path / "st1"), link_decisions=True,
    )
    q.awaitTermination(180)
    got = spark.read.parquet(f"{out1}_decisions/batch=0")
    m = spark.read.parquet(f"{out1}/batch=0")
    want = linking.disambiguate(m, stats.pair_counts(m), stats.token_counts(m), k=1)
    cols = ["url", "surface_form", "mention_id", "uri", "evidence", "overlap_cnt", "prior_cnt", "rank"]
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0

    # multi batch: decisions per batch, all rank-1, cumulative stats grow
    multi = tmp_path / "multi"
    pages.repartition(12).write.parquet(str(multi / "pages"))  # 4 files/trigger -> 3 batches
    out2 = str(tmp_path / "out2")
    q2 = ingest.run_incremental(
        spark, str(multi / "pages"), out2, str(tmp_path / "ck2"),
        redirects=red, stats_root=str(tmp_path / "st2"),
        link_decisions=True, compact_every=2,
    )
    q2.awaitTermination(180)
    import os

    batches = [d for d in os.listdir(f"{out2}_decisions") if d.startswith("batch=")]
    assert len(batches) >= 2
    dec = spark.read.parquet(f"{out2}_decisions")
    assert dec.where(F.col("rank") != 1).count() == 0
    # merged pair counts over all batches equal the batch-global counts
    pc = counts.read_counts(spark, str(tmp_path / "st2" / "pair_counts"), ["surface_form", "uri"])
    all_m = spark.read.parquet(f"{out2}/batch=*")
    want_pc = stats.pair_counts(all_m)
    assert pc.exceptAll(want_pc).count() == 0 and want_pc.exceptAll(pc).count() == 0


def test_maintain_stats_auto_compaction(spark, tmp_path):
    from pignlproc_spark.streaming import counts

    root = str(tmp_path / "stats")
    m1 = spark.createDataFrame(
        [("u1", "sf_a", "U1", "river words"), ("u2", "sf_a", "U2", "engine words")],
        "url string, surface_form string, uri string, context string",
    )
    m2 = spark.createDataFrame(
        [("u3", "sf_a", "U1", "river again")], "url string, surface_form string, uri string, context string"
    )
    counts.maintain_mention_stats(m1, root, batch_id=0, compact_every=2)
    counts.maintain_mention_stats(m2, root, batch_id=1, compact_every=2)
    # second batch triggered the fold: one live base, counts merged
    man = counts._read_manifest(f"{root}/pair_counts")
    assert len(man["live"]) == 1 and man["live"][0].startswith("base-")
    assert man["folded_through"] == 1
    pc = {(r.surface_form, r.uri): r.cnt for r in counts.read_counts(spark, f"{root}/pair_counts", ["surface_form", "uri"]).collect()}
    assert pc == {("sf_a", "U1"): 2, ("sf_a", "U2"): 1}
    # replay of folded batch 1 is a no-op
    counts.maintain_mention_stats(m2, root, batch_id=1, compact_every=2)
    pc2 = {(r.surface_form, r.uri): r.cnt for r in counts.read_counts(spark, f"{root}/pair_counts", ["surface_form", "uri"]).collect()}
    assert pc2 == pc

    # ONE new delta after a fold must NOT re-trigger compaction (the
    # base doesn't count toward min_deltas — else every batch would
    # rewrite the whole table)
    counts.maintain_mention_stats(m2, root, batch_id=2, compact_every=2)
    man2 = counts._read_manifest(f"{root}/pair_counts")
    assert sorted(man2["live"]) == ["base-00000000", "delta-00000002"]


def test_maintain_stats_first_batch_crash_replay(spark, tmp_path, monkeypatch):
    """A crash mid-first-batch — even with compact_every=1, which folds
    the batch's own delta before the later tables append — must replay
    cleanly, not trip the legacy-store guard and brick the stream."""
    from pignlproc_spark.operators import stats as stats_mod
    from pignlproc_spark.streaming import counts

    root = str(tmp_path / "stats")
    m = spark.createDataFrame(
        [("u1", "sf_a", "U1", "river words")],
        "url string, surface_form string, uri string, context string",
    )
    import pytest as pt

    real_append = counts.append_delta
    calls = {"n": 0}

    def crashy(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # token_counts (1st) landed + compacted; die before pair
            raise RuntimeError("simulated crash mid-batch")
        return real_append(*a, **k)

    monkeypatch.setattr(counts, "append_delta", crashy)
    with pt.raises(RuntimeError, match="simulated crash"):
        counts.maintain_mention_stats(m, root, batch_id=0, compact_every=1)
    monkeypatch.setattr(counts, "append_delta", real_append)
    # foreachBatch retry: same batch id, fresh attempt — must succeed
    counts.maintain_mention_stats(m, root, batch_id=0, compact_every=1)
    pc = {(r.surface_form, r.uri): r.cnt for r in counts.read_counts(
        spark, f"{root}/pair_counts", ["surface_form", "uri"]).collect()}
    assert pc == {("sf_a", "U1"): 1}
    uc = {r.uri: r.cnt for r in counts.read_counts(spark, f"{root}/uri_counts", ["uri"]).collect()}
    assert uc == {"U1": 1}

    # a TRULY legacy root (pair history, no token manifest) still raises
    legacy = str(tmp_path / "legacy")
    real_append(spark.createDataFrame([("sf", "U", 1)], "surface_form string, uri string, cnt long"),
                f"{legacy}/pair_counts", 0)
    with pt.raises(ValueError, match="token_counts manifest"):
        counts.maintain_mention_stats(m, legacy, batch_id=1, compact_every=0)


def test_streaming_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState ledger: duplicates are flagged against
    ALL history — within a batch, across micro-batches, and across a
    checkpointed restart (state store persistence)."""
    from pignlproc_spark.streaming.dedup import streaming_exact_dedup

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ck")

    def arrive(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(in_dir / name))

    def drain(phase):
        out_dir = str(tmp_path / f"out_{phase}")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("overwrite").parquet(f"{out_dir}/batch={bid}")
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}

    # phase 1: doc 3 duplicates doc 1 (same batch-or-later micro-batch)
    arrive("a", [(1, "alpha text"), (2, "beta text")])
    arrive("b", [(3, "alpha text"), (4, "gamma text")])
    got = drain("dedup1")
    assert not got[1].is_duplicate and got[1].keep_id == 1
    assert not got[2].is_duplicate and not got[4].is_duplicate
    assert got[3].is_duplicate and got[3].keep_id == 1

    # phase 2 (restart, same checkpoint): new file duplicating OLD
    # content — state must remember doc 1 across the restart
    arrive("c", [(5, "alpha text"), (6, "delta text")])
    got2 = drain("dedup2")
    assert set(got2) == {5, 6}  # only the new arrivals re-emit
    assert got2[5].is_duplicate and got2[5].keep_id == 1
    assert not got2[6].is_duplicate and got2[6].keep_id == 6


def test_streaming_exact_dedup_transform_with_state(spark, tmp_path):
    """Spark-4 stateful API variant: same ledger semantics on
    transformWithStateInPandas (RocksDB-backed state store). Skipped
    where google.protobuf (the state-server wire format) is absent."""
    pytest.importorskip("google.protobuf")
    from pignlproc_spark.streaming.dedup import streaming_exact_dedup_tws

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(in_dir / "a"))
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = (
        streaming_exact_dedup_tws(stream)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(f"{out_dir}/batch={bid}")
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert not got[1].is_duplicate and got[1].keep_id == 1
    assert not got[2].is_duplicate
    assert got[3].is_duplicate and got[3].keep_id == 1


def test_windowed_counts_stream(spark, staged_pages, tmp_path):
    stream = ingest.mention_stream(ingest.read_page_stream(spark, staged_pages))
    counts = ingest.windowed_uri_counts(stream, window="30 minutes", watermark="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("wuc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    df = spark.sql("select * from wuc")
    assert df.count() > 0
    assert set(df.columns) == {"window_start", "uri", "cnt"}
    assert df.agg(F.min("cnt")).collect()[0][0] >= 1


def test_incremental_near_dup(spark, tmp_path):
    """Streaming near-dup: union of per-batch pairs == batch
    near_duplicates on the whole corpus; a replayed micro-batch leaves
    state and pair set unchanged."""
    from pignlproc_spark.operators import dedup
    from pignlproc_spark.streaming import neardup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text", "lang", "source", "n_chars").collect()
    half = len(rows) // 2
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(str(in_dir / "a"))
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.parquet(str(in_dir / "b"))

    root = str(tmp_path / "nd")
    q = neardup.run_incremental_near_dup(
        spark, str(in_dir) + "/*", root, str(tmp_path / "ck"),
        min_jaccard_pct=60, max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    got = {(r.id_a, r.id_b) for r in neardup.read_pairs(spark, root).collect()}
    want = {(r.id_a, r.id_b) for r in dedup.near_duplicates(docs, min_jaccard_pct=60).collect()}
    assert got == want and len(want) > 0

    # replay the LAST micro-batch (foreachBatch retry semantics):
    # identical pair set, no duplicated store rows
    m = neardup._read_manifest(f"{root}/signatures")
    last_batch = max(int(d.split("-")[1]) for d in m["live"])
    # reconstruct that batch's docs from the store (file->batch order
    # is a streaming implementation detail)
    last_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{root}/signatures/delta-{last_batch:08d}")
        .select("doc_id")
        .distinct()
        .collect()
    }
    replay_docs = spark.createDataFrame([r for r in rows if r.doc_id in last_ids], schema)
    n_sig_before = neardup._read_facts(spark, f"{root}/signatures", neardup.SIGS_SCHEMA).count()
    neardup.process_batch(replay_docs, root, last_batch, min_jaccard_pct=60)
    got2 = {(r.id_a, r.id_b) for r in neardup.read_pairs(spark, root).collect()}
    assert got2 == want
    assert neardup._read_facts(spark, f"{root}/signatures", neardup.SIGS_SCHEMA).count() == n_sig_before

    # upstream RE-DELIVERY (same docs under a NEW batch id — not a
    # Spark replay): already-seen docs must not duplicate store rows
    # or re-emit their pairs
    neardup.process_batch(replay_docs, root, last_batch + 1, min_jaccard_pct=60)
    got3 = {(r.id_a, r.id_b) for r in neardup.read_pairs(spark, root).collect()}
    assert got3 == want
    assert neardup._read_facts(spark, f"{root}/signatures", neardup.SIGS_SCHEMA).count() == n_sig_before

    # config pinning: restarting with different bands must refuse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        neardup.process_batch(replay_docs, root, last_batch + 2, bands=8)


def test_near_dup_custom_id_col_and_threshold_pin(spark, tmp_path):
    """process_batch works with a non-default id column (store schema
    stays doc_id), and a restart at a different Jaccard threshold is
    refused instead of mixing thresholds in read_pairs."""
    import pytest as pt

    from pignlproc_spark.streaming import neardup

    root = str(tmp_path / "nd")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words here now ok")],
        "page_id long, text string",
    )
    neardup.process_batch(docs, root, 0, id_col="page_id", min_jaccard_pct=60)
    pairs = neardup.read_pairs(spark, root).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    sigs = neardup._read_facts(spark, f"{root}/signatures", neardup.SIGS_SCHEMA)
    assert sigs.columns[0] == "doc_id" and sigs.where("doc_id IS NULL").count() == 0
    with pt.raises(ValueError, match="min_jaccard_pct"):
        neardup.process_batch(docs, root, 1, id_col="page_id", min_jaccard_pct=80)


def test_incremental_near_dup_crash_window(spark, tmp_path, monkeypatch):
    """Crash AFTER the pair publish but BEFORE the store appends: the
    replayed batch must converge to the same final state as a clean
    run (pairs overwritten identically, store appended exactly once)."""
    from pignlproc_spark.streaming import neardup

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "unrelated words entirely here now")], schema
    )
    b1 = spark.createDataFrame([(3, "alpha beta gamma delta epsilon zeta")], schema)
    root = str(tmp_path / "nd")
    neardup.process_batch(b0, root, 0, text_col="text", min_jaccard_pct=60)

    # crash: batch 1 dies after writing pairs, before any store append
    calls = {"n": 0}
    real_append = neardup._append_facts

    def dying_append(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated crash before store append")

    monkeypatch.setattr(neardup, "_append_facts", dying_append)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        neardup.process_batch(b1, root, 1, min_jaccard_pct=60)
    assert calls["n"] == 1  # died on the first append
    monkeypatch.setattr(neardup, "_append_facts", real_append)

    # replay of batch 1 (foreachBatch retry) completes the batch
    neardup.process_batch(b1, root, 1, min_jaccard_pct=60)
    pairs = {(r.id_a, r.id_b) for r in neardup.read_pairs(spark, root).collect()}
    assert pairs == {(1, 3)}
    sigs = neardup._read_facts(spark, f"{root}/signatures", neardup.SIGS_SCHEMA)
    assert sigs.select("doc_id").distinct().count() == 3  # docs 1, 2, 3
    assert sigs.count() == sigs.distinct().count()  # appended exactly once each


def test_tumbling_windows_stream_parity(spark, tmp_path):
    """Native tumbling windows on a stream: the append-mode emissions
    equal the batch operator for windows closed before the final
    watermark (state for emitted windows is evicted)."""
    import datetime as dt

    from pignlproc_spark.operators.temporal import tumbling_windows

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    rows = [
        (1, "a", s(0)), (2, "a", s(100)), (3, "b", s(950)), (4, "a", s(1900)),
        # sentinel far in the future pushes the watermark past every
        # other window's end so append mode emits them all
        (99, "z", s(10**6)),
    ]
    schema = "event_id long, k string, ts timestamp"
    src = tmp_path / "ev_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        tumbling_windows(stream, "ts", "15 minutes", keys=("k",), watermark="1 hour")
        .writeStream.format("memory")
        .queryName("tumbling_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_tumb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.window_start, r.window_end, r.n_events)
        for r in spark.sql("select * from tumbling_stream").collect()
    }
    batch = tumbling_windows(spark.createDataFrame(rows, schema), "ts", "15 minutes", keys=("k",))
    watermark = s(10**6 - 3600)
    want = {
        (r.k, r.window_start, r.window_end, r.n_events)
        for r in batch.collect()
        if r.window_end < watermark
    }
    assert want and got == want


def test_session_windows_stream_parity(spark, tmp_path):
    """Native session windows on a stream (watermark evicts closed
    sessions): the append-mode emissions equal the batch operator's
    sessions that closed before the final watermark."""
    import datetime as dt

    from pignlproc_spark.operators.temporal import session_windows

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    rows = [
        (1, 1, s(0)), (2, 1, s(600)), (3, 1, s(4000)),
        (4, 2, s(100)), (5, 2, s(2200)),
        # sentinel far in the future pushes the watermark past every
        # other session's end so append mode emits them all
        (99, 9, s(10**6)),
    ]
    src = tmp_path / "events_src"
    spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp").write.parquet(str(src))
    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp").parquet(str(src))
    q = (
        session_windows(stream, key="user_id", ts_col="ts", gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sessions_stream").collect()
    }
    batch = session_windows(
        spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp"),
        key="user_id", ts_col="ts", gap="30 minutes",
    )
    watermark = s(10**6 - 3600)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
        if r.session_end < watermark
    }
    assert want and got == want


def test_attribution_join_stream_parity(spark, tmp_path):
    """Stream-stream inner join: with the watermark pushed past every
    event, the streamed emissions equal the batch attribution join."""
    import datetime as dt

    from pignlproc_spark.operators.temporal import attribution_join

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    # user 1: two clicks inside the 10-minute lookback of purchase 100,
    # one click outside it; user 2: click AFTER the purchase (no match)
    left_rows = [(100, 1, s(1200)), (200, 2, s(600)), (999, 9, s(10**6))]
    right_rows = [(10, 1, s(700)), (11, 1, s(1100)), (12, 1, s(100)),
                  (20, 2, s(700)), (998, 9, s(10**6))]
    lsch = "event_id long, user_id long, ts timestamp"
    lsrc, rsrc = tmp_path / "attr_l", tmp_path / "attr_r"
    spark.createDataFrame(left_rows, lsch).write.parquet(str(lsrc))
    spark.createDataFrame(right_rows, lsch).write.parquet(str(rsrc))

    batch = attribution_join(
        spark.read.parquet(str(lsrc)), spark.read.parquet(str(rsrc)), lookback="10 minutes"
    )
    want = sorted((r.k, r.l_event_id, r.r_event_id) for r in batch.collect())
    assert want == [(1, 100, 10), (1, 100, 11), (9, 999, 998)]  # click 12 too old, user 2 none

    q = (
        attribution_join(
            spark.readStream.schema(lsch).parquet(str(lsrc)),
            spark.readStream.schema(lsch).parquet(str(rsrc)),
            lookback="10 minutes",
            watermark="1 hour",
        )
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.k, r.l_event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM attr_stream").collect()
    )
    assert got == want


def test_attribution_join_left_outer_stream(spark, tmp_path):
    """left_outer stream-stream join: unmatched purchases emit with
    NULL click columns once the watermark passes their window."""
    import datetime as dt

    from pignlproc_spark.operators.temporal import attribution_join

    base = dt.datetime(2024, 1, 1)
    s = lambda sec: base + dt.timedelta(seconds=sec)
    left_rows = [(100, 1, s(1200)), (200, 2, s(600)), (999, 9, s(10**6))]
    right_rows = [(10, 1, s(1100)), (998, 9, s(10**6))]
    sch = "event_id long, user_id long, ts timestamp"
    lsrc, rsrc = tmp_path / "attro_l", tmp_path / "attro_r"
    spark.createDataFrame(left_rows, sch).write.parquet(str(lsrc))
    spark.createDataFrame(right_rows, sch).write.parquet(str(rsrc))

    q = (
        attribution_join(
            spark.readStream.schema(sch).parquet(str(lsrc)),
            spark.readStream.schema(sch).parquet(str(rsrc)),
            lookback="10 minutes",
            watermark="10 minutes",
            how="left_outer",
        )
        .writeStream.format("memory")
        .queryName("attro_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attro"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.l_event_id): r.r_event_id
        for r in spark.sql("SELECT * FROM attro_stream").collect()
    }
    assert got[(1, 100)] == 10  # matched pair
    # purchase 200 had no click: emitted with NULL right side after the
    # watermark (pushed far past it by the sentinel events)
    assert (2, 200) in got and got[(2, 200)] is None
    with __import__("pytest").raises(ValueError):
        attribution_join(
            spark.read.parquet(str(lsrc)), spark.read.parquet(str(rsrc)), how="full"
        )


def test_warc_stream_ingest_exactly_once(spark, synth_dir, tmp_path):
    """Raw .warc.gz archives landing in a drop directory stream into
    canonical pages with exactly-once per archive: an availableNow
    drain over file 1, then a RESTART after file 2 lands, must emit
    each record once and match the batch reader row-for-row."""
    import shutil

    from pignlproc_spark.sources.warc import read_warc_gz
    from pignlproc_spark.streaming.ingest import read_warc_stream

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "pages_out")
    ckpt = str(tmp_path / "ckpt")
    src = sorted((synth_dir / "warc").glob("*.warc.gz"))
    assert len(src) == 2

    def drain():
        q = (
            read_warc_stream(spark, str(drop), max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    shutil.copy(src[0], drop / src[0].name)
    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    shutil.copy(src[1], drop / src[1].name)
    drain()  # restart from the same checkpoint: file 1 must NOT replay
    got = spark.read.parquet(out)
    batch = read_warc_gz(spark, str(synth_dir / "warc"))
    assert got.count() == batch.count()  # each record exactly once
    # row-identical to the batch reader (url + payload md5 multiset)
    from pyspark.sql import functions as F

    key = lambda d: d.select("url", F.md5("html" if "html" in d.columns else "payload").alias("m"))  # noqa: E731
    assert key(got).exceptAll(key(batch)).count() == 0
    assert key(batch).exceptAll(key(got)).count() == 0


def test_streaming_hll_matches_batch_sketch(spark, tmp_path):
    """CCHll register deltas drained through a real file stream must
    yield the IDENTICAL estimate as the batch sketch over the union —
    then replay idempotence and compaction invariance on top."""
    from pignlproc_spark.operators import sketches
    from pignlproc_spark.streaming import cardinality, counts

    src = str(tmp_path / "hll_in")
    df = spark.range(0, 6000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("u-"), (F.col("id") % 1500).cast("string")).alias("item"),
    )
    df.repartition(4).write.mode("overwrite").parquet(src)

    hll_dir = str(tmp_path / "hll_regs")
    q = (
        spark.readStream.schema("g string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            cardinality.foreach_batch_hook("item", ("g",), hll_dir, compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = [
        tuple(r) for r in sketches.hll_distinct(df, "item", ("g",)).orderBy("g").collect()
    ]
    got = [
        tuple(r)
        for r in cardinality.read_estimates(spark, hll_dir, ("g",)).orderBy("g").collect()
    ]
    assert got == want

    # replaying an already-folded batch is a no-op (manifest HWM), and
    # replaying a live one is value-idempotent (MAX merge)
    cardinality.append_batch(df.limit(500), 0, "item", ("g",), hll_dir)
    cardinality.append_batch(df.limit(500), 99, "item", ("g",), hll_dir)
    got2 = [
        tuple(r)
        for r in cardinality.read_estimates(spark, hll_dir, ("g",)).orderBy("g").collect()
    ]
    assert got2 == want

    # compaction folds everything into one base, estimates unchanged
    assert counts.compact(
        spark, hll_dir, ["g", "register"], min_deltas=1, value="rho", how="max"
    )
    got3 = [
        tuple(r)
        for r in cardinality.read_estimates(spark, hll_dir, ("g",)).orderBy("g").collect()
    ]
    assert got3 == want


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    """CCCms register deltas drained through a real file stream must
    yield IDENTICAL point estimates to the batch sketch over the
    union; compaction must be observably a no-op."""
    from pignlproc_spark.operators import sketches
    from pignlproc_spark.streaming import counts, frequency

    src = str(tmp_path / "cms_in")
    df = spark.range(0, 9000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(
            F.lit("t-"), ((F.col("id") * F.col("id")) % 400).cast("string")
        ).alias("item"),
    )
    df.repartition(4).write.mode("overwrite").parquet(src)

    cms_dir = str(tmp_path / "cms_regs")
    q = (
        spark.readStream.schema("g string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            frequency.foreach_batch_hook("item", ("g",), cms_dir, compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    probes = df.select("g", "item").distinct()
    want = sorted(
        tuple(r)
        for r in sketches.cms_lookup(
            sketches.cms_registers(df, "item", ("g",)), probes, "item", ("g",)
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in frequency.read_estimates(
            spark, cms_dir, probes, "item", ("g",)
        ).collect()
    )
    assert got == want

    # replaying an already-seen batch id is a no-op (manifest HWM)
    frequency.append_batch(df.limit(500), 0, "item", ("g",), cms_dir)
    got2 = sorted(
        tuple(r)
        for r in frequency.read_estimates(
            spark, cms_dir, probes, "item", ("g",)
        ).collect()
    )
    assert got2 == want

    # compaction folds everything into one base, estimates unchanged
    assert counts.compact(
        spark, cms_dir, ["g", "hrow", "bucket"], min_deltas=1, value="cnt", how="sum"
    )
    got3 = sorted(
        tuple(r)
        for r in frequency.read_estimates(
            spark, cms_dir, probes, "item", ("g",)
        ).collect()
    )
    assert got3 == want


def test_streaming_topk_heavy_hitters(spark, tmp_path):
    """Sketch-plus-candidates heavy hitters: the streamed top-k must
    equal the exact batch top-k (counts spaced beyond the CMS error so
    ranks cannot swap), estimates never understate, and replay +
    compaction are observably no-ops."""
    from pignlproc_spark.streaming import topk

    # item i (i in 0..19) appears 50*(20-i) times per group: top-5 are
    # separated by 50 counts, far above any plausible CMS collision
    src = str(tmp_path / "hh_in")
    df = (
        spark.range(0, 2 * 50 * 210)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.floor(
                (F.col("id") / 2) % 10500 / F.lit(50)
            ).alias("_slot"),
        )
        .select(
            "g",
            F.concat(
                F.lit("w-"),
                F.expr(
                    "CASE WHEN _slot < 20 THEN 0 WHEN _slot < 39 THEN 1 "
                    "WHEN _slot < 57 THEN 2 ELSE _slot END"
                ).cast("int").cast("string"),
            ).alias("item"),
        )
    )
    df.repartition(4).write.mode("overwrite").parquet(src)

    store = str(tmp_path / "hh_store")
    q = (
        spark.readStream.schema("g string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            topk.foreach_batch_hook("item", ("g",), store, k_track=32, compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    exact = {
        (r.g, r.item): r.c
        for r in df.groupBy("g", "item").agg(F.count("*").alias("c")).collect()
    }
    top = topk.read_topk(spark, store, "item", ("g",), k=3).collect()
    want_items = {"w-0", "w-1", "w-2"}
    for g in ("0", "1"):
        got_g = sorted(
            [r for r in top if r.g == g], key=lambda r: r.rank
        )
        assert [r.item for r in got_g] == sorted(
            want_items, key=lambda i: -exact[(g, i)]
        )
        for r in got_g:
            assert r.est_count >= exact[(g, r.item)]
    # replay an already-folded batch id — nothing changes
    topk.append_batch(df.limit(1000), 0, "item", ("g",), store, k_track=32)
    again = topk.read_topk(spark, store, "item", ("g",), k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, top))
    # explicit compaction — still nothing changes
    topk.compact(spark, store, "item", ("g",))
    again2 = topk.read_topk(spark, store, "item", ("g",), k=3).collect()
    assert sorted(map(tuple, again2)) == sorted(map(tuple, top))


def test_cms_store_cold_start_schema(spark, tmp_path):
    """An empty CMS store must read with the SAME schema as a
    populated one (hrow int — the typed-key contract of
    counts.read_counts), so cold-start reads union/join cleanly with
    fresh batch registers, and read_topk on nothing returns nothing."""
    from pignlproc_spark.operators import sketches
    from pignlproc_spark.streaming import frequency, topk

    empty_regs = frequency.read_registers(spark, str(tmp_path / "none"), ("g",))
    fresh = sketches.cms_registers(
        spark.createDataFrame([("a", "x")], "g string, item string"), "item", ("g",)
    )
    # name+type parity is the contract (nullability flags differ —
    # posexplode output is non-nullable, DDL-schema fields nullable)
    assert [(f.name, f.dataType) for f in empty_regs.schema.fields] == [
        (f.name, f.dataType) for f in fresh.schema.fields
    ]
    assert empty_regs.unionByName(fresh).count() == 4  # D_CMS rows
    assert topk.read_topk(spark, str(tmp_path / "hh_none"), "item", ("g",)).count() == 0


def test_topk_typed_item_cold_start(spark, tmp_path):
    """A non-string item column ("doc_id bigint") must read with the
    SAME schema from a cold (empty) candidate store as from a
    populated one — the typed-item passthrough of topk."""
    from pignlproc_spark.streaming import topk

    store = str(tmp_path / "hh_typed")
    cold = topk.read_candidates(spark, store, "doc_id bigint", ("g",))
    assert [f.dataType.simpleString() for f in cold.schema.fields] == ["string", "bigint"]
    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("a", 7), ("a", 9)], "g string, doc_id long"
    )
    topk.append_batch(df, 0, "doc_id bigint", ("g",), store, k_track=8)
    warm = topk.read_candidates(spark, store, "doc_id bigint", ("g",))
    assert [(f.name, f.dataType) for f in cold.schema.fields] == [
        (f.name, f.dataType) for f in warm.schema.fields
    ]
    assert cold.unionByName(warm).count() == 2
    top = topk.read_topk(spark, store, "doc_id bigint", ("g",), k=1).collect()
    assert top[0].doc_id == 7 and top[0].est_count >= 3
    topk.compact(spark, store, "doc_id bigint", ("g",))
    again = topk.read_topk(spark, store, "doc_id bigint", ("g",), k=1).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, top))


def test_streaming_link_graph_matches_batch(spark, tmp_path):
    """Edge SUM deltas drained through a real file stream must merge
    to the IDENTICAL link graph as the batch scan over the union —
    and a graph scorer run on the maintained table must equal the
    same scorer on batch edges (the composability the store exists
    for). Replay and compaction are no-ops."""
    from __spark_entry__ import LINK_WRAP_POST, LINK_WRAP_PRE
    from pignlproc_spark.functions.urls import host_link_edges
    from pignlproc_spark.operators import stats
    from pignlproc_spark.streaming import counts, linkgraph

    src = str(tmp_path / "lg_in")
    pages = spark.range(0, 400).select(
        F.concat(
            F.lit("https://cc"), (F.col("id") % 7).cast("string"),
            F.lit(".example/p/"), F.lpad(F.col("id").cast("string"), 7, "0"),
        ).alias("url")
    ).select(
        "url",
        F.concat(
            F.lit(LINK_WRAP_PRE),
            F.regexp_extract("url", r"://([^/]+)/", 1),
            F.lit(LINK_WRAP_POST),
        ).alias("html"),
    )
    pages.repartition(4).write.mode("overwrite").parquet(src)

    graph_dir = str(tmp_path / "lg_edges")
    q = (
        spark.readStream.schema("url string, html string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            linkgraph.foreach_batch_hook(graph_dir, compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "lg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = sorted(tuple(r) for r in host_link_edges(pages).collect())
    got_edges = linkgraph.read_edges(spark, graph_dir)
    assert sorted(tuple(r) for r in got_edges.collect()) == want

    # a scorer on the maintained table == the scorer on batch edges
    batch_hits = sorted(
        tuple(r)
        for r in stats.hits_q(
            host_link_edges(pages), src="src_host", dst="dst_host",
            weight="n_links", iterations=2,
        ).collect()
    )
    stream_hits = sorted(
        tuple(r)
        for r in stats.hits_q(
            got_edges, src="src_host", dst="dst_host",
            weight="n_links", iterations=2,
        ).collect()
    )
    assert stream_hits == batch_hits

    # replaying a batch id the stream already folded is a no-op (the
    # manifest high-water mark — SUM deltas have NO value-level
    # idempotence, so this is the contract that matters); an explicit
    # compact afterwards changes nothing a reader can observe
    linkgraph.append_batch(pages.limit(50), 0, graph_dir)
    counts.compact(
        spark, graph_dir, ["src_host", "dst_host"], min_deltas=1,
        value="cnt", how="sum",
    )
    assert sorted(tuple(r) for r in linkgraph.read_edges(spark, graph_dir).collect()) == want
