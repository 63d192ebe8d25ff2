"""spark-submit entrypoint: perceptual media dedup — a media parquet
directory of (url, kind, payload) rows → CCDHash keys over the real
image decodes → banded near-dup pairs → transitive clusters → one
survivor per cluster, written with the rest of the table untouched.

The media counterpart of jobs/curate_corpus.py's text dedup: a crawl
stores the same image under many URLs and containers (PNG here, the
same pixels re-encoded as BMP/JPEG there); CCDHash keys on luma
DIFFERENCES, so identical pixels collide at hamming 0 regardless of
container, and JPEG-recompressed copies land within the banded radius
(pinned by tests/test_training_ops.py::test_dhash_synth_twins's
planted gradient-BMP-vs-JPEG twins — baseline AND progressive — and
brightness-shifted copies in the same test family). Non-image rows
(audio/video) and payloads the dependency-free
codecs cannot read pass through untouched — dedup must never eat what
it cannot see.

Scale shape: decode cost is paid ONCE (the hash table is persisted and
shared by the pair join and the survivor join); candidates come from
the 4×16-bit band equi-join, never a cross join; clustering is the
same alternating large-star/small-star used for text near-dup
(string node ids via out_type=None).

Cluster usage:

    spark-submit --py-files dist/pignlproc_spark.zip \\
      jobs/dedup_media.py --media /crawl/media \\
      --out /warehouse/media_dedup --max-hamming 3

Local smoke: tests/test_job.py::test_dedup_media_job_end_to_end.
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
    ap.add_argument("--media", required=True, help="parquet dir of (url, kind, payload)")
    ap.add_argument("--out", required=True, help="survivor table output path")
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--pairs-out", help="optional: also write the verified pair table")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from pignlproc_spark.operators import multimodal
    from pignlproc_spark.session import get_session

    spark = SparkSession.getActiveSession() or get_session(app_name="dedup-media")
    t0 = time.time()

    media = spark.read.parquet(args.media)
    n_in = media.count()

    survivors, pairs, lineage = multimodal.perceptual_dedup(
        media, max_hamming=args.max_hamming
    )
    if args.pairs_out:
        pairs.write.mode("overwrite").parquet(args.pairs_out)
    survivors.write.mode("overwrite").parquet(args.out)
    # truthful output count: parquet footer metadata, not n_in - drops
    # (which is wrong whenever the input carries duplicate urls)
    n_out = spark.read.parquet(args.out).count()

    print(
        json.dumps(
            {
                "job": "dedup_media",
                "n_in": n_in,
                **lineage,
                "n_out": n_out,
                "max_hamming": args.max_hamming,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
