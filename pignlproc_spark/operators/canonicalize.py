"""URI canonicalization by iterative pointer-chasing joins.

Reference parity: the redirect-resolution self-joins in
``examples/indexing/names_and_entities.pig`` / ``nerd_commons.pig``
(SURVEY.md §2.2 P12, reconstructed). The reference scripts apply 1–2
redirect hops with ``JOIN ... USING 'replicated'``; the north rule
(BASELINE.json:6,14) requires full transitive resolution — a bounded
driver-side fixpoint loop of broadcast joins.

Frozen semantics (matches synth.Corpus.resolve_title and the DuckDB
recursive-CTE oracle in __spark_entry__):

    cur = uri
    for _ in range(max_hops):            # MAX_HOPS = 8
        nxt = redirects.get(cur)
        if nxt is None: return cur       # resolved (or dangling target)
        cur = nxt
    return cur                           # cycle / over-long chain: stop

Scale notes: the redirect table is a small dimension (~10^7 rows max
for all of Wikipedia ⇒ broadcastable); each hop is a broadcast hash
join, so the whole fixpoint is **shuffle-free** on the fact side. The
loop stops early via a cheap ``isNotNull`` count on the (tiny)
still-moving frontier. ``localCheckpoint`` every ``checkpoint_every``
hops cuts the iterative lineage so 8 hops never re-execute hop 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOPS = 8


def resolve_uris(
    uris: DataFrame,
    redirects: DataFrame,
    uri_col: str = "uri",
    out_col: str = "resolved_uri",
    max_hops: int = MAX_HOPS,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(uri) → (uri, resolved_uri) following redirect pointers ≤ max_hops.

    ``redirects`` must have columns (src_uri, dst_uri). Input need not
    be distinct; output preserves input rows/columns and appends
    ``out_col``.
    """
    red = F.broadcast(redirects.select("src_uri", "dst_uri"))
    cur = uris.withColumn(out_col, F.col(uri_col))
    for hop in range(max_hops):
        joined = cur.join(red, cur[out_col] == red["src_uri"], "left")
        moved = joined.where(F.col("dst_uri").isNotNull())
        # frontier check: count of rows that still have an outgoing edge
        if moved.limit(1).count() == 0:
            return cur
        cur = joined.withColumn(out_col, F.coalesce(F.col("dst_uri"), F.col(out_col))).drop(
            "src_uri", "dst_uri"
        )
        if (hop + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur


def _chase(src: str, edges: dict, max_hops: int) -> str:
    cur = src
    for _ in range(max_hops):
        nxt = edges.get(cur)
        if nxt is None:
            return cur
        cur = nxt
    return cur


AUTO_DISTRIBUTED_ROWS = 5_000_000


def resolve_mapping(
    redirects: DataFrame, max_hops: int = MAX_HOPS, distributed: bool | None = None
) -> DataFrame:
    """Fully-resolved redirect map: (src_uri, resolved_uri) for every
    source in the redirect table — the broadcastable dimension used by
    the pipeline so the *fact-side* join is a single broadcast hop.

    ``distributed=None`` (default) AUTO-SWITCHES on a row count:
    below :data:`AUTO_DISTRIBUTED_ROWS` the map is built by
    **driver-side pointer chasing** — the redirect table is a
    broadcastable dimension by contract (~10^7 rows ≈ 1 GB for all of
    Wikipedia — it ships to every executor for the broadcast join
    anyway, so the driver holding it once is strictly cheaper), and a
    dict-chase is one Spark job instead of up-to-8 join+count actions
    whose fixed latency serializes the DAG. At or above the threshold
    the bounded iterative-join fixpoint runs instead (identical frozen
    semantics, pytest-pinned) — a caller at 100× scale no longer has
    to remember the flag to avoid a driver-OOM collect. The count on
    the dimension is one cheap job; pass an explicit bool to skip it.
    """
    # FUNCTIONAL-IZE first: a source with several targets is a data
    # defect for redirects but routine for category DAGs fed through
    # broader_closure — resolve through the lexicographically-smallest
    # target on BOTH code paths, so the result is deterministic and
    # identical whichever path the row count selects (a raw dict-build
    # would keep an arbitrary collect-order winner; the join path
    # would fan out one row per parent per hop)
    redirects = redirects.groupBy("src_uri").agg(F.min("dst_uri").alias("dst_uri"))
    if distributed is None:
        distributed = redirects.count() >= AUTO_DISTRIBUTED_ROWS
    if distributed:
        srcs = redirects.select(F.col("src_uri").alias("uri")).distinct()
        return resolve_uris(srcs, redirects).withColumnRenamed("uri", "src_uri")
    spark = redirects.sparkSession
    edges = {r[0]: r[1] for r in redirects.select("src_uri", "dst_uri").collect()}
    rows = [(s, _chase(s, edges, max_hops)) for s in edges]
    return spark.createDataFrame(rows, "src_uri string, resolved_uri string")


def apply_redirects(
    df: DataFrame,
    redirects: DataFrame,
    uri_col: str,
    max_hops: int = MAX_HOPS,
    distributed: bool | None = False,
) -> DataFrame:
    """Rewrite ``uri_col`` through the resolved redirect map.

    One broadcast join on the (huge) fact side — the per-hop loop runs
    only over the tiny distinct source set (resolve_mapping).
    ``distributed`` forwards to :func:`resolve_mapping`; the default
    ``False`` skips the auto-switch row count because broadcasting the
    MAP below presumes a broadcastable dimension anyway — pass ``None``
    (auto) or ``True`` when the redirect table might not be.
    """
    mapping = F.broadcast(resolve_mapping(redirects, max_hops, distributed))
    out = df.join(mapping, df[uri_col] == mapping["src_uri"], "left")
    return out.withColumn(uri_col, F.coalesce(F.col("resolved_uri"), F.col(uri_col))).drop(
        "src_uri", "resolved_uri"
    )


def expand_disambiguations(
    df: DataFrame, disambiguations: DataFrame, uri_col: str = "uri", keep_unmatched: bool = True
) -> DataFrame:
    """Disambiguation-page resolution (BASELINE.json:6): a mention whose
    target is a disambiguation page fans out to one row per candidate
    entity (``candidate_uri`` replaces the dab URI, ``is_dab`` marks
    expanded rows). Non-dab rows pass through unchanged."""
    dabs = F.broadcast(disambiguations.select("dab_uri", "candidate_uri"))
    joined = df.join(dabs, df[uri_col] == dabs["dab_uri"], "left")
    out = joined.withColumn("is_dab", F.col("candidate_uri").isNotNull()).withColumn(
        uri_col, F.coalesce(F.col("candidate_uri"), F.col(uri_col))
    )
    if not keep_unmatched:
        out = out.where(F.col("is_dab"))
    return out.drop("dab_uri", "candidate_uri")
