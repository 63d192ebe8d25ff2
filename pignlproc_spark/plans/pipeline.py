"""End-to-end KG-construction pipeline (names_and_entities +
token_counts + nerd-stats in one DAG — SURVEY.md §2.3), with shared
scan reuse, optional per-stage checkpoint/resume, and the frozen
triple embedding.

Pig's MultiQuery optimization (one LOAD feeding several STOREs runs
the map phase once — SURVEY.md §4) is NOT automatic in Spark: each
action re-executes the scan+parse. The parsed-pages and mentions
DataFrames are therefore persisted (or durably checkpointed when a
CheckpointManager is supplied, which also buys resume-after-loss —
BASELINE.json:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from pignlproc_spark import synth
from pignlproc_spark.checkpoint import CheckpointManager, input_fingerprint
from pignlproc_spark.operators import stats, triples


SPEC_VERSION = "ccwikitext-v1"  # bump when any frozen spec changes


class PipelineResult:
    def __init__(self, parsed, mentions, pair_counts, uri_counts, sf_total_counts, token_counts, triples_df):
        self.parsed = parsed
        self.mentions = mentions
        self.pair_counts = pair_counts
        self.uri_counts = uri_counts
        self.sf_total_counts = sf_total_counts
        self.token_counts = token_counts
        self.triples = triples_df

    def unpersist(self):
        for df in (self.parsed, self.mentions, self.sf_total_counts):
            try:
                df.unpersist()
            except Exception:
                pass


def run(
    spark: SparkSession,
    pages: DataFrame,
    redirects: DataFrame,
    ckpt: CheckpointManager | None = None,
    source_id: str = "pages",
    input_partitions: int | None = None,
    redirects_id: str | None = None,
) -> PipelineResult:
    """pages + redirects dimension → all stats + triples.

    With ``ckpt``: parsed/mentions land as fingerprinted checkpoint
    stages (resume skips completed fingerprints). Without: in-memory
    persist only (fastest for benchmarks).

    ``redirects_id`` names the redirects snapshot and is folded into
    the MENTIONS stage fingerprint (mentions embed the resolved
    redirect targets, so a redirects refresh must invalidate that
    stage — a fingerprint keyed on pages alone would silently serve
    stale resolution on resume). Default None means ``source_id``
    already identifies BOTH inputs (one corpus snapshot, the synth
    case); pass the real snapshot/commit id whenever the redirect
    table can change independently of the pages.

    ``input_partitions``: the parse stage is CPU-bound per page, so it
    needs fine-grained input splits. Default (None) trusts the scan:
    session.py sets ``spark.sql.files.maxPartitionBytes=1m`` so even a
    single parquet file with row groups splits into many tasks — no
    shuffle of the raw html bytes. Pass an int to force an explicit
    repartition instead (sources that arrive as one giant unsplittable
    blob).
    """
    fp = input_fingerprint(spark, source_id, SPEC_VERSION)
    fp_mentions = input_fingerprint(
        spark, source_id, SPEC_VERSION, f"redirects={redirects_id or source_id}"
    )

    if input_partitions:
        pages = pages.repartition(input_partitions)
    if "text" in pages.columns:
        pages = pages.drop("text")

    # fused extract+contexts (one pandas UDF pass — see
    # functions.extract.fused_mentions_udf for why)
    from pignlproc_spark.functions.extract import fused_mentions_udf

    fused = fused_mentions_udf()
    parsed = pages.select(
        "url",
        *(["lang"] if "lang" in pages.columns else []),
        fused(F.col("html")).alias("_p"),
    ).select("url", *(["lang"] if "lang" in pages.columns else []), "_p.*")
    if ckpt:
        parsed = ckpt.stage(parsed, "parsed", fp)
    else:
        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)

    articles = parsed.where(F.col("redirect").isNull())
    mentions = mentions_from_fused(articles, redirects)
    if ckpt:
        mentions = ckpt.stage(mentions, "mentions", fp_mentions)
    else:
        mentions = mentions.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = stats.pair_counts(mentions)
    uris = stats.uri_counts(mentions)
    # persist: referenced twice in the triple union (annotatedCount +
    # totalCount) and its total-occurrence scan is a full pandas-UDF
    # pass over the corpus text — never run it twice
    sf_tot = stats.sf_total_counts(mentions, articles.select("text")).persist(StorageLevel.MEMORY_AND_DISK)
    toks = stats.token_counts(mentions)
    trip = triples.build_triples(pairs, uris, sf_tot, triples.mention_counts(mentions))
    return PipelineResult(parsed, mentions, pairs, uris, sf_tot, toks, trip)


def mentions_from_fused(fused_articles: DataFrame, redirects: DataFrame) -> DataFrame:
    """Explode the fused mentions array (uri already exactly encoded
    inside the UDF) and resolve redirects through the broadcast map —
    all relational from here."""
    from pignlproc_spark.operators.canonicalize import apply_redirects

    cols = ["url"] + (["lang"] if "lang" in fused_articles.columns else [])
    m = fused_articles.select(*cols, F.explode("mentions").alias("c")).select(
        *cols, "c.ctx_idx", "c.context", "c.uri", "c.begin", "c.end", "c.surface_form"
    )
    return apply_redirects(m, redirects, "uri")


def run_synth(
    spark: SparkSession, sf_dir: str, ckpt: CheckpointManager | None = None
) -> PipelineResult:
    """Run the full pipeline on the synthetic corpus matched to a
    driver sf dir (FIXTURES.md §5 scale mapping).

    source_id embeds the generator version — the checkpoint
    fingerprint must change whenever the input snapshot does
    (checkpoint.input_fingerprint's contract); for real tables pass
    the table path + snapshot/commit id instead."""
    pages = synth.pages_for(spark, sf_dir)
    redirects = synth.side_table(spark, sf_dir, "redirects")
    return run(
        spark,
        pages,
        redirects,
        ckpt=ckpt,
        source_id=f"synth:{synth.sf_of_dir(sf_dir)}:gen{synth.GEN_VERSION}",
    )


def precision_recall(result: DataFrame, golden: DataFrame, keys: list[str]) -> dict:
    """Set-based P/R of result vs golden over ``keys`` (the BASELINE
    P/R ≥ 0.95 gate; both sides deduped on keys)."""
    r = result.select(*keys).distinct()
    g = golden.select(*keys).distinct()
    tp = r.join(g, keys, "inner").count()
    n_r = r.count()
    n_g = g.count()
    return {
        "precision": tp / n_r if n_r else 0.0,
        "recall": tp / n_g if n_g else 0.0,
        "tp": tp,
        "result_rows": n_r,
        "golden_rows": n_g,
    }
