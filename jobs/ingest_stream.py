"""spark-submit entrypoint: continuous corpus ingestion.

The streaming counterpart of jobs/build_kg.py — file-arrival stream of
pages → frozen extraction → mention facts, with optionally-maintained
incremental count tables and per-batch link decisions:

    spark-submit --py-files dist/pignlproc_spark.zip \\
      jobs/ingest_stream.py \\
      --pages /data/pages_stream_dir \\
      --redirects /data/redirects \\
      --out /warehouse/mentions \\
      --checkpoint /warehouse/ckpt \\
      [--stats /warehouse/stats --link-decisions --compact-every 16] \\
      [--continuous]

Default is an availableNow drain (backfill / cron mode: process
everything present, then exit); ``--continuous`` leaves the query
running until killed (the checkpoint makes either mode resumable,
micro-batch replay is idempotent — streaming/ingest.py).

``--source warc`` points ``--pages`` at a raw-crawl drop directory of
``.warc.gz`` archives instead of pages parquet: the incremental KG
path then runs straight off the crawl (archive → extraction →
mentions → counts → link decisions) with no parquet landing step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="directory the input files arrive in")
    ap.add_argument(
        "--source",
        choices=["pages", "warc"],
        default="pages",
        help="input kind: 'pages' parquet drops, or 'warc' raw .warc.gz crawl archives",
    )
    ap.add_argument("--redirects", help="redirects dimension parquet path/table")
    ap.add_argument("--out", required=True, help="mention-fact output root")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint location")
    ap.add_argument("--stats", help="also maintain incremental count tables under this root")
    ap.add_argument("--link-decisions", action="store_true", help="write per-batch top-1 link decisions (needs --stats)")
    ap.add_argument("--compact-every", type=int, default=0, help="fold count deltas into a base every N live deltas")
    ap.add_argument("--continuous", action="store_true", help="run until killed instead of draining and exiting")
    args = ap.parse_args(argv)
    if args.link_decisions and not args.stats:
        ap.error("--link-decisions requires --stats")

    from pyspark.sql import SparkSession

    from pignlproc_spark import tables
    from pignlproc_spark.session import get_session
    from pignlproc_spark.streaming import ingest

    spark = SparkSession.getActiveSession() or get_session(app_name="ingest-stream")
    red = tables.read_path_or_table(spark, args.redirects) if args.redirects else None
    q = ingest.run_incremental(
        spark,
        args.pages,
        args.out,
        args.checkpoint,
        redirects=red,
        available_now=not args.continuous,
        stats_root=args.stats,
        compact_every=args.compact_every,
        link_decisions=args.link_decisions,
        source=args.source,
    )
    q.awaitTermination()
    import glob

    # an empty-arrivals drain writes no batch dirs — a correct no-op,
    # not an error
    n = spark.read.parquet(f"{args.out}/batch=*").count() if glob.glob(f"{args.out}/batch=*") else 0
    print(json.dumps({"mentions": n, "out": args.out, "stats": args.stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
