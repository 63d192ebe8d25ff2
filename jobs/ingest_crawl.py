"""spark-submit entrypoint: raw crawl archives → a curation-ready
``documents`` table.

The front half of the web-corpus story (the back half is
jobs/curate_corpus.py): Common-Crawl-layout ``.warc.gz`` archives in,
one clean text document per unique canonical URL out —

  1. WARC replay     — per-record gzip members, byte-faithful bodies
                       (sources/warc.py; corrupt members lose one
                       record, not the job)
  2. response filter — HTTP 200 + text/html content type only
  3. URL blocklist   — optional UT1-style host list (broadcast join)
                       and literal URL-prefix bans
                       (functions/urls.blocklist_filter semantics)
  4. re-fetch dedup  — ONE canonical URL keeps ONE capture (the
                       latest warc_ts; ties to the larger raw url) —
                       CCUrl v1 canonicalization, min/max-struct
                       aggregation: the job's single shuffle
  4b. trap guard     — optional --max-per-template N: at most N
                       canonical urls per (host, path template) —
                       calendar/session/faceted traps collapse to one
                       template and get capped (urls.template_quota)
  5. head metadata   — CCMeta v1 title/canonical columns (always on —
                       a free scan-fused projection) and, with
                       --respect-noindex, the robots-meta gate real
                       crawlers must honor (noindex pages dropped,
                       count reported; the count is an extra action,
                       so the gate persists the deduped captures —
                       MEMORY_AND_DISK — instead of re-running the
                       archive scan + dedup shuffle under the write)
  6. text extraction — CCHtml v1 HTML→text (functions/html.py)
  7. encoding repair — optional CCMoji v1 pass (--fix-mojibake)
  8. language        — --lang literal, or --lang-id to run the
                       n-gram marker classifier (textstats.lang_id)

With ``--media-out`` the SAME archive scan also feeds the media leg:
image/audio/video responses → canonical-URL re-fetch dedup (the text
path's keeper rule) → CCDHash perceptual dedup of the images (the
jobs/dedup_media.py chain fused into ingest), written as a
(url, kind, payload, warc_ts) table with per-stage lineage counts in
the job manifest.

Scale shape: steps 1-3 and 5-8 are projections and broadcast probes
that fuse into the archive scan; step 4 is the only corpus-wide
shuffle (exact re-fetch dedup cannot avoid moving each kept payload
once). ``doc_id = xxhash64(canonical_url)`` is a convenience
surrogate — at ≫10¹⁰ documents use the url column itself as the key
(64-bit birthday collisions become material around there).

Cluster usage:

    spark-submit --py-files dist/pignlproc_spark.zip \\
      jobs/ingest_crawl.py \\
      --warc "/crawl/segments/*.warc.gz" --out /warehouse/documents \\
      [--block-hosts /lists/ut1_hosts.txt --block-prefix https://x.example/ads] \\
      [--respect-noindex] [--fix-mojibake] [--lang-id | --lang en] \\
      [--source-label cc-2026-08]

Local smoke (synthetic archives):

    python jobs/ingest_crawl.py \\
      --warc "/root/repo/.synthdata/sf0.001/warc/*.warc.gz" --out /tmp/crawl_docs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help=".warc.gz path/glob (crawl archives)")
    ap.add_argument("--out", required=True, help="documents table output path")
    ap.add_argument("--block-hosts", help="text file of banned hosts, one per line")
    ap.add_argument(
        "--block-prefix", action="append", default=[],
        help="banned literal URL prefix (repeatable)",
    )
    ap.add_argument(
        "--respect-noindex", action="store_true",
        help="drop pages whose <meta name=robots> contains noindex (CCMeta v1)",
    )
    ap.add_argument(
        "--max-per-template", type=int,
        help="crawler-trap guard: keep at most N canonical urls per "
             "(host, path template) — digit runs collapse to {n} "
             "(urls.template_quota)",
    )
    ap.add_argument("--fix-mojibake", action="store_true", help="CCMoji v1 repair pass")
    ap.add_argument("--lang", default="en", help="language label for every document")
    ap.add_argument(
        "--lang-id", action="store_true",
        help="classify language per document (textstats.lang_id) instead of --lang",
    )
    ap.add_argument("--source-label", default="crawl", help="documents.source value")
    ap.add_argument(
        "--robots",
        help="parquet of fetched robots.txt bodies (host, body): drop pages a "
             "'User-agent: *' rule disallows (CCRobots v1, RFC 9309 "
             "longest-match — urls.parse_robots/robots_filter)",
    )
    ap.add_argument(
        "--history",
        help="existing documents table: drop pages whose extracted text was "
             "already ingested (Bloom-digest probe + exact confirm join — "
             "dedup.dedup_against_history)",
    )
    ap.add_argument(
        "--no-funnel", action="store_true",
        help="skip the funnel-count aggregation (saves one archive scan)",
    )
    ap.add_argument(
        "--media-out",
        help="also extract media responses (image/audio/video content "
             "types) into a media table at this path: re-fetch dedup by "
             "canonical URL (same CCUrl keeper rule as the text path), "
             "then CCDHash perceptual dedup of the images (the "
             "jobs/dedup_media.py chain, fused into ingest)",
    )
    ap.add_argument(
        "--media-max-hamming", type=int, default=3,
        help="perceptual dedup radius for --media-out (dhash banding "
             "recall bound is 3)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pignlproc_spark.functions.html import html_to_text_col
    from pignlproc_spark.functions.urls import canonical_url_col, host_col
    from pignlproc_spark.session import get_session
    from pignlproc_spark.sources.warc import read_warc_gz

    spark = SparkSession.getActiveSession() or get_session(app_name="ingest-crawl")
    t0 = time.time()

    raw = read_warc_gz(spark, args.warc)

    # response gate: 200 + html. content_type is the raw header value
    # ("text/html; charset=utf-8") — prefix match, case-folded.
    ok_http = F.col("http_status") == 200
    ok_type = F.lower(F.coalesce(F.col("content_type"), F.lit(""))).startswith("text/html")

    u = F.col("url")
    host = host_col(u)
    prefix_hit = F.lit(False)
    for p in args.block_prefix:
        prefix_hit = prefix_hit | u.startswith(p)

    # blocklist + robots tables are built once and gate BOTH legs —
    # banned hosts / disallowed paths must not leak into the media
    # table any more than into the documents table
    bl = None
    if args.block_hosts:
        bl = (
            spark.read.text(args.block_hosts)
            .select(F.lower(F.trim("value")).alias("_bl_host"))
            .where(F.col("_bl_host") != "")
            .distinct()
        )
    rules = None
    if args.robots:
        from pignlproc_spark.functions.urls import parse_robots

        rules = parse_robots(spark.read.parquet(args.robots))

    media_lineage = {}
    if args.media_out:
        # the media leg of the same crawl: image/audio/video responses
        # → the SAME host/prefix/robots gates as the text path → ONE
        # capture per canonical URL (the text path's keeper rule) →
        # CCDHash perceptual dedup of the images via
        # multimodal.perceptual_dedup (the jobs/dedup_media.py chain,
        # ONE shared implementation; audio/video and undecodable
        # payloads pass through untouched)
        from pyspark import StorageLevel

        from pignlproc_spark.operators import multimodal

        _ct = F.lower(F.coalesce(F.col("content_type"), F.lit("")))
        _kind = (
            F.when(_ct.startswith("image/"), F.lit("image"))
            .when(_ct.startswith("audio/"), F.lit("audio"))
            .when(_ct.startswith("video/"), F.lit("video"))
        )
        med = raw.where(ok_http & _kind.isNotNull() & ~prefix_hit).withColumn("_host", host)
        if bl is not None:
            med = (
                med.join(F.broadcast(bl), med["_host"] == F.col("_bl_host"), "left")
                .where(F.col("_bl_host").isNull())
                .drop("_bl_host")
            )
        if rules is not None:
            from pignlproc_spark.functions.urls import robots_filter

            m_allowed = robots_filter(med.select("url"), rules).where(F.col("allow") == 1)
            med = med.join(m_allowed.select("url"), "url", "left_semi")
        media = (
            med.select(
                canonical_url_col(F.col("url")).alias("url"),
                F.struct("warc_ts", F.col("url").alias("raw_url"), _kind.alias("kind"), "payload").alias("_cap"),
            )
            .groupBy("url")
            .agg(F.max("_cap").alias("_cap"))
            .select(
                "url",
                F.col("_cap.kind").alias("kind"),
                F.col("_cap.payload").alias("payload"),
                F.col("_cap.warc_ts").alias("warc_ts"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)  # hash pass + write both read it
        )
        n_media_unique = media.count()
        survivors, _pairs, ml = multimodal.perceptual_dedup(
            media, max_hamming=args.media_max_hamming
        )
        survivors.write.mode("overwrite").parquet(args.media_out)
        media.unpersist()
        media_lineage = {
            "media_unique_urls": n_media_unique,
            "media_perceptual_pairs": ml["n_pairs"],
            "media_perceptual_dropped": ml["n_dropped"],
            "media_out": args.media_out,
        }

    flagged = raw.select(
        "url",
        "warc_ts",
        "html",
        ok_http.cast("int").alias("ok_http"),
        ok_type.cast("int").alias("ok_type"),
        host.alias("host"),
        prefix_hit.cast("int").alias("prefix_blocked"),
    )
    if bl is not None:
        flagged = flagged.join(
            F.broadcast(bl), flagged["host"] == F.col("_bl_host"), "left"
        ).withColumn("host_blocked", F.col("_bl_host").isNotNull().cast("int")).drop("_bl_host")
    else:
        flagged = flagged.withColumn("host_blocked", F.lit(0))

    kept = flagged.where(
        (F.col("ok_http") == 1)
        & (F.col("ok_type") == 1)
        & (F.col("host_blocked") == 0)
        & (F.col("prefix_blocked") == 0)
    )

    if rules is not None:
        from pignlproc_spark.functions.urls import robots_filter

        allowed = robots_filter(kept.select("url"), rules).where(F.col("allow") == 1)
        kept = kept.join(allowed.select("url"), "url", "left_semi")

    # re-fetch dedup: one capture per canonical URL — latest warc_ts,
    # ties to the larger raw url (struct comparison is lexicographic),
    # as a partial-aggregating groupBy (NO window sort over the crawl)
    deduped = (
        kept.select(
            canonical_url_col(u).alias("canonical_url"),
            F.struct("warc_ts", "url", "html").alias("_cap"),
        )
        .groupBy("canonical_url")
        .agg(F.max("_cap").alias("_cap"))
        .select(
            "canonical_url",
            F.col("_cap.url").alias("url"),
            F.col("_cap.warc_ts").alias("warc_ts"),
            F.col("_cap.html").alias("html"),
        )
    )

    if args.max_per_template is not None:
        # template_quota itself rejects k < 1, so a typo'd negative or
        # zero cap fails loudly instead of silently emptying the crawl
        from pignlproc_spark.functions.urls import template_quota

        keep = template_quota(
            deduped.select(F.col("canonical_url").alias("u")),
            args.max_per_template,
            url_col="u",
        )
        deduped = deduped.join(
            keep.select(F.col("url").alias("canonical_url")),
            "canonical_url",
            "left_semi",
        )

    # CCMeta v1 head metadata: always-on columns (a scan-fused regex
    # projection costs nothing extra) + the robots-meta verdict
    from pignlproc_spark.functions.html import (
        canonical_link_col,
        meta_content_col,
        page_title_col,
        strip_comments_col,
    )

    _stripped = strip_comments_col(F.col("html"))
    deduped = deduped.withColumn(
        "_noindex",
        F.coalesce(meta_content_col(_stripped, "robots").contains("noindex"), F.lit(False)),
    ).withColumn("title", page_title_col(_stripped)).withColumn(
        "canonical", canonical_link_col(_stripped)
    )
    n_noindexed = 0
    _gate_cache = None
    if args.respect_noindex:
        # the count is a separate action: without a persist its lineage
        # (archive scan + the dedup shuffle) would re-execute under the
        # final write. MEMORY_AND_DISK — payloads may exceed memory.
        _gate_cache = deduped.persist()
        n_noindexed = _gate_cache.where(F.col("_noindex")).count()
        deduped = _gate_cache.where(~F.col("_noindex"))

    docs = deduped.select(
        F.xxhash64("canonical_url").alias("doc_id"),
        "url",
        "warc_ts",
        "title",
        "canonical",
        html_to_text_col(F.col("html")).alias("text"),
    )

    if args.fix_mojibake:
        from pignlproc_spark.functions.encoding import mojibake_count_col, mojibake_fix_col

        docs = docs.withColumn(
            "n_mojibake", mojibake_count_col(F.col("text"))
        ).withColumn("text", mojibake_fix_col(F.col("text")))
    else:
        docs = docs.withColumn("n_mojibake", F.lit(0).cast("bigint"))

    if args.lang_id:
        from pignlproc_spark.operators import textstats

        langs = textstats.lang_id(docs.select("doc_id", "text")).select(
            "doc_id", F.col("lang_pred").alias("lang")
        )
        docs = docs.join(langs, "doc_id")
    else:
        docs = docs.withColumn("lang", F.lit(args.lang))

    n_seen = 0
    if args.history:
        from pignlproc_spark.operators.dedup import dedup_against_history

        hist = spark.read.parquet(args.history)
        # persist: the verdict (Bloom digest over the whole history +
        # exact confirm join + the upstream extraction) feeds BOTH the
        # n_seen count and the final write — same hazard the noindex
        # gate caches against above
        verdict = dedup_against_history(docs.select("doc_id", "text"), hist).persist()
        n_seen = verdict.where(F.col("keep") == 0).count()
        docs = docs.join(
            verdict.where(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
        )

    docs = docs.select(
        "doc_id",
        "url",
        "warc_ts",
        "title",
        "canonical",
        "text",
        "lang",
        F.lit(args.source_label).alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
        "n_mojibake",
    )
    docs.write.mode("overwrite").parquet(args.out)
    if _gate_cache is not None:
        _gate_cache.unpersist()
    if args.history:
        verdict.unpersist()

    out_w = spark.read.parquet(args.out)
    n_docs = out_w.count()
    n_mojibake_total = int(out_w.agg(F.sum("n_mojibake")).collect()[0][0] or 0)

    funnel = {}
    if not args.no_funnel:
        # one extra archive scan for the audit funnel; skip at scale
        # with --no-funnel if the numbers aren't worth the pass
        row = flagged.agg(
            F.count("*").alias("responses"),
            F.sum("ok_http").alias("http_ok"),
            F.sum(F.col("ok_http") * F.col("ok_type")).alias("html_ok"),
            F.sum(
                F.col("ok_http") * F.col("ok_type")
                * F.greatest("host_blocked", "prefix_blocked")
            ).alias("blocked"),
        ).collect()[0]
        funnel = {
            "responses": int(row.responses or 0),
            "http_ok": int(row.http_ok or 0),
            "html_ok": int(row.html_ok or 0),
            "blocked": int(row.blocked or 0),
        }

    print(
        json.dumps(
            {
                "documents": n_docs,
                "already_ingested": n_seen,
                "noindexed": n_noindexed,
                "mojibake_repaired": n_mojibake_total,
                **funnel,
                **media_lineage,
                "wall_s": round(time.time() - t0, 1),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
