"""Regenerate PLANS.md: formatted physical plans of the engine's key
operators with the scale-relevant properties annotated. Run after any
operator change: python tools/dump_plans.py"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue().strip()


def main():
    import pyspark.sql.functions as F

    from pignlproc_spark import synth
    from pignlproc_spark.functions.extract import parse_pages
    from pignlproc_spark.operators import dedup, integrity, linking, stats, textstats
    from pignlproc_spark.operators.canonicalize import apply_redirects
    from pignlproc_spark.plans import pipeline
    from pignlproc_spark.session import get_session

    spark = get_session(cpus=8)
    p = synth.generate(0.001)
    pages = spark.read.parquet(str(p / "pages.parquet"))
    red = spark.read.parquet(str(p / "redirects.parquet"))
    sfs = spark.read.parquet(str(p / "surface_forms.parquet"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    res = pipeline.run_synth(spark, "/root/testdata/sf0.001")

    sections = []

    def add(title, note, df, mode="formatted"):
        sections.append((title, note, plan_of(df, mode)))

    add(
        "Extraction scan (column pruning)",
        "The parse UDF's scan reads ONLY (url, html) — ReadSchema shows the pruned "
        "columns; warc_ts/lang/text never leave parquet. ArrowEvalPython is the single "
        "Python stage in the whole pipeline.",
        parse_pages(pages.drop("text")).select("url", "text"),
    )
    add(
        "pairCounts aggregation (map-side combine)",
        "partial_count before the exchange, final after — Pig's algebraic COUNT "
        "combiner, for free. Hub-entity skew collapses map-side; no salting needed "
        "for algebraic aggregates.",
        stats.pair_counts(res.mentions),
    )
    add(
        "Redirect enrichment (broadcast, fact side never shuffles)",
        "BroadcastHashJoin with the resolved redirect map as build side; the mention "
        "stream is enrichment-joined without an exchange.",
        apply_redirects(res.mentions.select("uri", "surface_form"), red, "uri"),
    )
    add(
        "Candidate top-k (window per surface form)",
        "RunningWindowFunction over (surface_form / anchor_count desc) — per-group "
        "top-k without collecting groups.",
        linking.candidate_topk(sfs, 3),
    )
    add(
        "MinHash signatures (codegen'd explode + partial/final min)",
        "One md5 per shingle as a plain projection (whole-stage codegen); per-lane "
        "minima via partial/final HashAggregate. No interpreted higher-order "
        "functions in the hot path.",
        dedup.minhash_signatures(docs),
    )
    add(
        "Disambiguation (broadcast dictionary × evidence join)",
        "Both candidate-dictionary joins are BroadcastHashJoin (the corpus-sized "
        "mention/token sides never shuffle for enrichment); the (uri, token) "
        "evidence join + (mention_id, uri) overlap aggregate carry compact keys "
        "with partial_sum map-side combine.",
        linking.disambiguate(res.mentions, res.pair_counts, res.token_counts),
    )
    add(
        "Ambiguity-routed disambiguation (map-only easy branch, shared distinct)",
        "Routing is a dictionary-sized aggregate of pair_counts broadcast onto the "
        "mention table: the ~74% easy branch is a BroadcastHashJoin lookup of the "
        "surface's precomputed top-k — no tokenization, no evidence exchange, no "
        "top-1 aggregation. The contested branch (left-anti on the same broadcast) "
        "runs the unchanged full model; both branches build their distinct-mention "
        "table from the SAME cached mention relation (one parse, statically shared "
        "— note the repeated InMemoryRelation node id), and AQE exchange reuse "
        "dedupes the identical distinct exchanges at runtime. An eager checkpoint "
        "here measured 0.81x at sf4.0, so the plan shares instead of materializing.",
        linking.disambiguate_routed(res.mentions, res.pair_counts, res.token_counts),
    )
    add(
        "Repetition signals (exploded n-grams, two-level partial/final agg)",
        "Per-(doc, gram) counts then per-doc aggregates — map-side combine absorbs "
        "the n-gram fanout; nothing wider than (doc_id, gram) shuffles; the per-doc "
        "aggregates co-join on doc_id. (The connected-components rounds reuse this "
        "same groupBy-min + join shape per round and are driver-iterated with "
        "localCheckpoint, so no single static plan exists to dump.)",
        textstats.repetition_signals(docs),
    )
    add(
        "Benchmark decontamination (broadcast eval-gram probe)",
        "The eval set's distinct window hashes broadcast; the corpus windows probe "
        "them map-side (BroadcastHashJoin on h) — the corpus text never shuffles "
        "for the join. Hit counting is a partial/final aggregate on doc_id; the "
        "zero-fill outer join back to the base co-partitions on doc_id.",
        dedup.contamination(docs, docs.where(F.col("doc_id") % 5 == 0), n=8),
    )
    add(
        "Sequence packing (one shuffle, window cumsum per shard)",
        "The BPE-ish piece count and the md5 shard are projected below the single "
        "exchange — only (doc_id, shard, n_pieces) shuffles, never text; the "
        "running sum is one Window over the shard partitioning.",
        textstats.pack_sequences(docs),
    )
    add(
        "tf-cosine all-pairs (inverted-index join over postings)",
        "Docs pair only through shared tokens: the join carries (token, doc, tf) "
        "postings, never text; dot products and norms are partial/final "
        "HashAggregates; the threshold is a codegen'd integer predicate.",
        dedup.tf_cosine_pairs(docs, min_cos_pct=50, guard_overflow=False),
    )
    add(
        "Containment pairs (posting equi-join, intersection as an aggregate)",
        "Same inverted-index shape as tf-cosine: candidates arise only through "
        "shared tokens (SortMergeJoin/ShuffledHashJoin on _token over (token, id) "
        "postings — never a cartesian), inter_cnt is a partial/final count over "
        "(id_a, id_b), and the containment threshold is a codegen'd integer "
        "predicate over broadcast-joined set sizes.",
        dedup.containment_pairs(docs, min_containment_pct=90),
    )
    add(
        "Rarity score (one tokenize pass, window df — no self-join)",
        "ONE parquet scan and one explode; doc_freq is an unordered count(*) "
        "window over the token partitioning (whole-partition aggregate, no "
        "sort-order column), so there is no df-rollup-and-rejoin and no second "
        "tokenize; the final agg exchanges only (doc_id, tf, doc_freq).",
        textstats.rarity_score(docs),
    )
    add(
        "Corpus mixing (pure projection, no shuffle)",
        "Epochs-per-source weights compile to a literal CASE chain; the copy "
        "count is floor + md5-bucket and the copies come from a tiny sequence "
        "feeding an immediate explode — no Exchange anywhere, no RNG.",
        textstats.mix_corpus(docs, {"src0": 250, "src1": 130}, default_pct=40),
    )
    add(
        "Quality gate (histogram two-phase percentile, corpus never sorts)",
        "The (id, n_tokens) projection is persisted (InMemoryRelation) so the "
        "expensive tokenize runs ONCE for both consumers; the exact global "
        "threshold comes from a partial/final groupBy(n_tokens) "
        "histogram plus a single-partition window over that tiny table; the "
        "1-row threshold joins back as BroadcastNestedLoopJoin — the fact side "
        "keeps its parallelism; the only Sort in the plan is the "
        "single-partition one over the tiny histogram, never the corpus.",
        textstats.quality_gate(docs, q=10),
    )
    add(
        "tf-idf top-k (one tokenize pass, window df, broadcast N)",
        "Same no-self-join shape as the rarity score: doc_freq is a count "
        "window over the token partitioning of the per-(doc, token) tf "
        "aggregate, the corpus size N rides a 1-row broadcast, and the per-doc "
        "top-k is a row_number window — three key shuffles carrying only "
        "id/count columns, never text.",
        textstats.tfidf_topk(docs, k=3),
    )
    from pignlproc_spark.operators.temporal import attribution_join, user_ewma

    add(
        "Per-key EWMA (the one stateless grouped-map Python stage)",
        "FlatMapGroupsInPandas directly above a single hashpartitioning "
        "exchange on the key — the deliberate escape hatch for per-group "
        "sequential recursion; everything else in the engine stays JVM-side.",
        user_ewma(
            docs.select(F.col("doc_id").alias("event_id"), (F.col("doc_id") % 5).alias("user_id"),
                        F.timestamp_seconds(F.col("doc_id")).alias("ts"),
                        F.col("n_chars").cast("double").alias("value"))
        ),
    )
    add(
        "Attribution join (equi-shuffle + codegen'd range predicate)",
        "The batch plan of the stream-stream attribution join: an equi-join "
        "on the key (broadcast at this toy size; a hash exchange per side at "
        "scale) carrying the lookback bound as a join-condition range "
        "predicate — no NestedLoop/cartesian; in streaming the same bound "
        "becomes the state-eviction contract. (ts varies per row so Catalyst "
        "cannot constant-fold the bound away.)",
        attribution_join(
            docs.select(F.col("doc_id").alias("event_id"), (F.col("doc_id") % 5).alias("user_id"),
                        F.timestamp_seconds(F.col("doc_id") * 60).alias("ts")),
            docs.select(F.col("doc_id").alias("event_id"), (F.col("doc_id") % 5).alias("user_id"),
                        F.timestamp_seconds(F.col("doc_id") * 37).alias("ts")),
            on="user_id",
        ),
    )
    add(
        "As-of join (union-and-window, no range join)",
        "ONE hash exchange on the key feeds a single window sort; no Join operator "
        "appears at all — the backward match rides last(ignorenulls) over "
        "(ts, side, tie) ordering.",
        __import__("pignlproc_spark.operators.temporal", fromlist=["asof_join"]).asof_join(
            docs.select(F.col("doc_id").alias("event_id"), (F.col("doc_id") % 5).alias("k"), F.col("n_chars").alias("ts")),
            docs.select(F.col("doc_id").alias("event_id"), (F.col("doc_id") % 5).alias("k"), F.col("n_chars").alias("ts")),
            on="k", ts_col="ts", right_cols=["event_id"],
        ),
    )
    add(
        "BM25 ranked retrieval (one tokenize pass, broadcast corpus stats)",
        "Conditional aggregation folds dl and every query term's tf into ONE "
        "groupBy(doc_id); the 1-row stats rollup (sum_dl, N, per-term df) comes "
        "back as a broadcast; top-k is TakeOrderedAndProject, never a global "
        "sort. At execution AQE reuses the per-doc exchange so the corpus is "
        "tokenized exactly once (asserted on the executed plan in pytest).",
        textstats.bm25_topk(docs, ["data", "table"], k=10),
    )
    add(
        "Phrase search (single lead-window pass, no per-term joins)",
        "One posexplode + one window per doc ordered by position carrying "
        "lead(token, i) per phrase offset — a single hash exchange on doc_id; "
        "no Join operator for any phrase length.",
        textstats.phrase_search(docs, ["data", "table"]),
    )
    add(
        "SimHash hamming pairs (pigeonhole banding, equi-join not cross join)",
        "Candidates come from an equi-self-join on (band, bits) — no "
        "NestedLoop/cartesian anywhere; the exact bit_count(xor) verify is a "
        "codegen'd integer predicate above the join.",
        dedup.simhash_hamming_pairs(docs),
    )
    add(
        "Salted two-phase text aggregation (holistic agg under skew)",
        "Two exchanges: (uri, salt) then uri — a hub entity's contexts spread over "
        "salt_buckets partial concats before the final merge.",
        stats.aggregate_text_salted(res.mentions, "uri", "context"),
    )
    add(
        "CCHll v1 cardinality sketch (two bounded aggregations)",
        "Register build is a partial/final HashAggregate pair on "
        "(group, register) — map-side MAX bounds the shuffle at "
        "n_partitions × groups × 256 rows no matter the corpus size; the "
        "estimate is a second pair over ≤256 rows per group. The distinct "
        "items themselves never shuffle (the point vs exact COUNT DISTINCT "
        "at 100 TB).",
        __import__(
            "pignlproc_spark.operators.sketches", fromlist=["hll_distinct"]
        ).hll_distinct(
            docs.select("lang", F.col("text").alias("item")), "item", ("lang",)
        ),
    )
    add(
        "CCCms v1 frequency sketch lookup (broadcast registers)",
        "Register build is a partial/final COUNT pair on (group, hrow, "
        "bucket) — shuffle bounded at n_partitions × groups × 4 × 4096 "
        "rows; the probe lookup BROADCASTS the register table, so the "
        "probe side never shuffles for the join (only the final "
        "per-probe MIN aggregates).",
        (lambda sk: sk.cms_lookup(
            sk.cms_registers(docs.select("lang", F.col("text").alias("item")), "item", ("lang",)),
            docs.select("lang", F.col("text").alias("item")).distinct(),
            "item",
            ("lang",),
        ))(__import__("pignlproc_spark.operators.sketches", fromlist=["cms_lookup"])),
    )
    add(
        "CCMeta v1 head metadata (pure codegen projection)",
        "Title/canonical/description/robots/hreflang are five frozen "
        "regex scans over ONE shared comment-stripped column — a single "
        "Project over the scan, zero exchanges, no Python; metadata "
        "extraction runs at scan speed at any corpus size.",
        __import__(
            "pignlproc_spark.functions.html", fromlist=["page_metadata"]
        ).page_metadata(docs.select(F.col("text").alias("html"))),
    )
    add(
        "PII scrub (pure codegen projection)",
        "CCPii v1 redaction is ONE Project over the scan — all four "
        "regexp_replace/regexp_extract_all chains are JVM built-ins, zero "
        "exchanges, no Python stage; at 100 TB this runs at scan speed.",
        textstats.pii_scrub(docs),
    )

    from pignlproc_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    add(
        "Banded integer-SRP near-dup pairs (bucket equi-join, no product)",
        "The oracle-pinned ANN scale tier (emb_srp_pairs): sign rows "
        "(id, band, code) self-join on band+code — candidates shuffle, "
        "the corpus doesn't, and there is NO CartesianProduct / "
        "NestedLoop anywhere; the integer-cosine verify re-joins the "
        "quantized vectors by id after the distinct.",
        similarity.srp_banded_pairs(
            emb, min_cos_pct=40, dim=64, materialize=False
        ),
    )
    add(
        "Integer IVF top-k (cell equi-join, literal codebook)",
        "emb_ivf_topk_q: the codebook is a driver-bounded literal "
        "expression (no centroid table join), corpus rows equi-join on "
        "their assigned cell, the per-query rank window sees only "
        "probed-cell candidates — no product, no Python.",
        similarity.ivf_topk_q(
            emb, emb.where(F.col("vec_id") < 5), k=3, n_centroids=4, nprobe=2
        ),
    )
    add(
        "Integer PQ-ADC top-k (code equi-join, literal LUT)",
        "emb_pq_adc_topk_q: the trained codebooks are driver-bounded "
        "literal expressions (m × ks integer centroids — no codebook "
        "table join); each corpus vector carries m small codes, the "
        "query side builds its LUT as a projected literal array, and "
        "the approximate dot is a codegen'd sum of m LUT lookups — "
        "the full vectors never join, no product, no Python.",
        similarity.pq_adc_topk_q(
            emb, emb.where(F.col("vec_id") < 5), k=3, m=4, ks=4
        ),
    )
    add(
        "IVF+PQ production ANN (cell equi-join over compressed codes)",
        "emb_ivfpq_topk_q: IVF restricts the scan (query equi-joins "
        "only its nprobe probed cells) and PQ compresses it (the "
        "joined rows carry m codes, not vectors); both codebooks are "
        "driver-bounded literals, the ADC score is a codegen'd LUT "
        "sum, the per-query rank window sees only probed-cell "
        "candidates. The 100-TB retrieval shape: shuffle = codes, "
        "scan = nprobe/n_centroids of the corpus.",
        similarity.ivfpq_topk_q(
            emb, emb.where(F.col("vec_id") < 5), k=3,
            n_centroids=4, nprobe=2, m=4, ks=4,
        ),
    )
    add(
        "Residual IVFADC (classical Jégou 2011, same join shape)",
        "emb_ivfpq_residual_topk_q: identical scale shape to the "
        "raw-vector tier — the residual is a zip_with PROJECTION "
        "against the centroid literal (no extra shuffle), codes ride "
        "the same (cluster, sub, code) broadcast equi-join, and the "
        "per-(query, cell) base term <q,c> rides the LUT rows (folded "
        "with min in the same partial aggregate). Buys +0.23 recall@10 "
        "at the same code budget (BASELINE.md).",
        similarity.ivfpq_residual_topk_q(
            emb, emb.where(F.col("vec_id") < 5), k=3,
            n_centroids=4, nprobe=2, m=4, ks=4,
        ),
    )
    from pignlproc_spark.operators import multimodal

    media = spark.read.parquet(str(p / "media.parquet"))
    add(
        "Perceptual image near-dup pairs (band equi-join over dhash keys)",
        "media_dhash_pairs: ONE Arrow-batched decode stage computes the "
        "CCDHash key per image; candidates come from the 4×16-bit band "
        "equi-self-join (pigeonhole: hamming≤3 < 4 bands must share a "
        "band — perfect recall), the exact bit_count(xor) verify is a "
        "codegen'd integer predicate above the join. No CartesianProduct; "
        "images pair only through shared bands, payloads never shuffle. "
        "(Plan dumped from the pre-hashed table, as jobs/dedup_media.py "
        "holds it — the owning path persists the hash table and "
        "localCheckpoints the result, which would hide the join shape "
        "behind an ExistingRDD scan.)",
        multimodal.dhash_near_duplicates(
            None, max_hamming=3,
            hashed=multimodal.image_dhash(media.select("url", "kind", "payload")),
        ),
    )
    add(
        "Link prediction (wedge equi-join, degree attached pre-fanout)",
        "kg_link_prediction: the wedge self-join is an equi-join on the "
        "common neighbor z (no product); deg(z) rides along from BEFORE "
        "the fanout so the RA score is a map-side column; the existing-"
        "edge anti-join and the per-uri top-k window carry only "
        "id/score columns.",
        stats.link_prediction(res.mentions, k=5),
    )
    add(
        "KG integrity audit (one data-scale shuffle, dimension-only follow-ups)",
        "kg_graph_audit: the distinct-obj rewrite shuffles the triples "
        "once, keyed (pred, subj, obj) with map-side-combined partials "
        "(exact duplicates collapse before the exchange); the (pred, "
        "subj) and pred aggregates after it run on strictly shrinking "
        "dimensions, never the triple stream. No joins.",
        integrity.graph_audit(res.triples),
    )

    out = ["# PLANS — physical plans of the key operators\n"]
    out.append(
        "Generated by `python tools/dump_plans.py` (sf0.001 inputs; plans are\n"
        "scale-independent). Each section states the property the plan must\n"
        "keep; `tests/test_plans.py` asserts the same properties in CI.\n"
    )
    for title, note, plan in sections:
        out.append(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print("wrote PLANS.md", sum(len(s[2]) for s in sections), "chars of plans")


if __name__ == "__main__":
    main()
