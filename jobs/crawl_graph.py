"""spark-submit entrypoint: a crawl drop-directory → a continuously
maintained host link graph → a ranked host table.

The graph half of the crawl story (jobs/ingest_crawl.py is the
document half): page batches land in a drop directory, each
micro-batch's CCLink edge partials are folded into the merge-on-read
edge store (streaming/linkgraph.py — scan cost paid once per page),
and the ranking of record is refreshed from the MAINTAINED edge table
— PageRank-style scorers only ever see (src_host, dst_host, n_links)
rows, never pages.

Scorers: ``--scorer hits`` (stats.hits_q hubs/authorities) or
``--scorer trustrank`` (stats.trustrank_q; seeds from ``--seeds``, a
text file of one trusted host per line, else every host WITH
OUT-LINKS — a degenerate all-trusted default; pass real seeds in
production). An empty graph or empty seed set writes an empty ranked
table rather than failing the refresh.

Cluster usage:

    spark-submit --py-files dist/pignlproc_spark.zip \\
      jobs/crawl_graph.py --pages "/crawl/pages_drop" \\
      --root /warehouse/linkgraph --checkpoint /warehouse/ck \\
      --scorer trustrank --seeds /lists/trusted_hosts.txt \\
      --out /warehouse/host_scores

Local smoke: tests/test_job.py::test_crawl_graph_job_end_to_end.
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
    ap.add_argument("--pages", required=True, help="parquet drop dir of (url, html) pages")
    ap.add_argument("--root", required=True, help="edge-store directory (merge-on-read)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True, help="ranked host table output path")
    ap.add_argument("--scorer", choices=("hits", "trustrank"), default="hits")
    ap.add_argument("--seeds", help="text file of trusted seed hosts (trustrank)")
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--compact-every", type=int, default=4)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pignlproc_spark.operators import stats
    from pignlproc_spark.session import get_session
    from pignlproc_spark.streaming import linkgraph

    spark = SparkSession.getActiveSession() or get_session(app_name="crawl-graph")
    t0 = time.time()

    q = (
        spark.readStream.schema("url string, html string")
        .option("maxFilesPerTrigger", 4)
        .parquet(args.pages)
        .writeStream.foreachBatch(
            linkgraph.foreach_batch_hook(args.root, compact_every=args.compact_every)
        )
        .option("checkpointLocation", args.checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    edges = linkgraph.read_edges(spark, args.root)
    if args.scorer == "trustrank":
        if args.seeds:
            seeds = (
                spark.read.text(args.seeds)
                .select(F.lower(F.trim("value")).alias("node"))
                .where(F.col("node") != "")
                .distinct()
            )
        else:
            # all-trusted fallback makes TrustRank's spam demotion a
            # no-op (degenerate near-PageRank) — shout, don't whisper
            print(
                "WARNING: --scorer trustrank without --seeds trusts EVERY "
                "host with out-links; spam demotion is disabled. Pass a "
                "real seed list in production.",
                file=sys.stderr,
            )
            seeds = edges.select(F.col("src_host").alias("node")).distinct()
        if not seeds.head(1):
            # pre-first-batch refresh or a blank seeds file: an empty
            # ranked table, not a failed job (matches the hits branch)
            scores = spark.createDataFrame([], "host string, score bigint")
        else:
            scores = stats.trustrank_q(
                edges, seeds, src="src_host", dst="dst_host",
                weight="n_links", iterations=args.iterations,
            ).select(F.col("node").alias("host"), F.col("trust_q").alias("score"))
    else:
        scores = stats.hits_q(
            edges, src="src_host", dst="dst_host",
            weight="n_links", iterations=args.iterations,
        ).select(F.col("node").alias("host"), "hub_q", "auth_q")
    scores.write.mode("overwrite").parquet(args.out)

    n_edges = edges.count()
    n_hosts = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "edges": n_edges,
                "hosts_ranked": n_hosts,
                "scorer": args.scorer,
                "wall_s": round(time.time() - t0, 1),
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
