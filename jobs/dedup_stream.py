"""spark-submit entrypoint: streaming near-duplicate maintenance.

The dedup counterpart of jobs/ingest_stream.py — file-arrival stream
of documents → per-micro-batch MinHash probe against the cumulative
signature store → exact-Jaccard-verified near-dup pairs, each emitted
once, at the batch where its later member arrives
(streaming/neardup.py):

    spark-submit --py-files dist/pignlproc_spark.zip \\
      jobs/dedup_stream.py \\
      --docs /data/documents_stream_dir \\
      --root /warehouse/neardup \\
      --checkpoint /warehouse/neardup_ckpt \\
      [--bands 8 --min-jaccard-pct 80] [--continuous]

Default drains what exists (availableNow) then prints a JSON summary;
``--continuous`` runs until killed. Both modes resume from the
checkpoint and micro-batch replay is idempotent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="directory the document parquet files arrive in")
    ap.add_argument("--root", required=True, help="near-dup store root (signatures/token_sets/pairs)")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint location")
    ap.add_argument("--bands", type=int, default=4, help="LSH bands (1-16; more = higher recall)")
    ap.add_argument("--min-jaccard-pct", type=int, default=80, help="verify threshold (percent)")
    ap.add_argument(
        "--max-files",
        type=int,
        default=4,
        help="files per micro-batch (each batch probes the full store once — bigger batches amortize it)",
    )
    ap.add_argument("--continuous", action="store_true", help="run until killed instead of draining and exiting")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from pignlproc_spark.session import get_session
    from pignlproc_spark.streaming import neardup

    spark = SparkSession.getActiveSession() or get_session(app_name="dedup-stream")
    q = neardup.run_incremental_near_dup(
        spark,
        args.docs,
        args.root,
        args.checkpoint,
        available_now=not args.continuous,
        max_files_per_trigger=args.max_files,
        bands=args.bands,
        min_jaccard_pct=args.min_jaccard_pct,
    )
    q.awaitTermination()
    if not args.continuous:
        n = neardup.read_pairs(spark, args.root).count()
        print(json.dumps({"near_dup_pairs": n, "root": args.root}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
