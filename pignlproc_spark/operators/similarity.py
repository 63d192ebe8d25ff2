"""Similarity search over an embedding column (array<float>).

Training-data-pipeline requirement (not in the reference): approximate
nearest neighbors for embedding-based dedup/retrieval.

Three tiers:

- :func:`dot_topk_quantized` — exact top-k by inner product of
  1e-3-quantized integer vectors. Pure built-ins, *integer* math ⇒
  bit-identical to the DuckDB oracle (floats sums are order-dependent;
  quantized dot products are not). The correctness-gate variant.
- :func:`cosine_topk` — true float cosine brute force (built-ins:
  zip_with + aggregate). The quality baseline; rows-only checked.
- :func:`cosine_topk_quantized` — cosine ranking over the quantized
  integer vectors (exact dot/norm BIGINTs, IEEE-deterministic sort
  key) — the cosine semantics WITH the hash-exact oracle contract.
- :func:`srp_lsh_topk` — sign-random-projection LSH: bucket vectors
  by the sign pattern of dot products with ``n_planes`` deterministic
  pseudo-random hyperplanes (seeded, generated driver-side), then
  brute-force only within buckets. The 100 TB path: bucket join
  replaces the quadratic cross join; plane count trades recall for
  bucket size.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _quantize(col, scale: int = 1000):
    return F.transform(col, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def _dot_int(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _dot_double(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def dot_topk_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, dot_q, rank): exact top-k by quantized
    integer inner product; rank ties broken by neighbor id."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv"))
    t = embeddings.select(F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv"))
    scored = (
        q.crossJoin(t)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _dot_int(F.col("qv"), F.col("tv")).alias("dot_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            "dot_q",
            F.col("rank").cast("int"),
        )
    )


def cosine_topk_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(query_id, neighbor_id, dot_q, norm_q2, norm_n2, rank) — top-k
    by COSINE over ``1/scale``-quantized integer vectors; the
    norm-corrected upgrade of :func:`dot_topk_quantized` to the same
    oracle-exact contract (ranking by raw dot favors long vectors;
    cosine doesn't).

    Exactness argument: dot and squared norms are exact BIGINTs; the
    ranking key ``dot_q / (sqrt(norm_q2) · sqrt(norm_n2))`` is a
    four-op IEEE double chain (per-side int→double conversion,
    correctly-rounded sqrt, multiply, divide), so both engines compute
    the bit-identical double and row_number order matches; remaining
    exact-equal scores break on neighbor_id. Every HASHED column is an
    integer — the float never leaves the sort key. Taking the sqrt per
    SIDE (not of the product) means no int64 product exists to wrap on
    non-unit-normalized embeddings — the norms convert independently.
    Zero-norm vectors are excluded (cosine undefined, and NaN sort
    order is engine-specific).

    Scale shape: same as dot_topk_quantized — bounded query set ×
    corpus cross join (the brute-force baseline; LSH/IVF are the scale
    tiers), norms projected per side BEFORE the join."""
    from pyspark.sql import Window

    q = (
        queries.select(F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv"))
        .withColumn("norm_q2", _dot_int(F.col("qv"), F.col("qv")))
        .where(F.col("norm_q2") > 0)
    )
    t = (
        embeddings.select(F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv"))
        .withColumn("norm_n2", _dot_int(F.col("tv"), F.col("tv")))
        .where(F.col("norm_n2") > 0)
    )
    scored = (
        q.crossJoin(t)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot_int(F.col("qv"), F.col("tv")).alias("dot_q"),
            "norm_q2",
            "norm_n2",
        )
    )
    score = F.col("dot_q") / (
        F.sqrt(F.col("norm_q2").cast("double")) * F.sqrt(F.col("norm_n2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(score), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            "dot_q",
            "norm_q2",
            "norm_n2",
            F.col("rank").cast("int"),
        )
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank): float cosine brute force."""
    from pyspark.sql import Window

    def norm(col):
        return F.sqrt(_dot_double(col, col))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    t = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("tv")
    ).withColumn("tn", norm(F.col("tv")))
    scored = (
        q.crossJoin(t)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot_double(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def srp_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, broadcast as
    literals — tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def srp_bucket_col(vec_col, planes: list[list[float]]):
    """INT bucket id: sign bit per hyperplane."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot_double(_as_double(vec_col), lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def srp_planes_q(
    dim: int, n_planes: int = 32, seed: int = 42, plane_scale: int = 1000
) -> list[list[int]]:
    """INTEGER-quantized deterministic hyperplanes: ``round(N(0,1)·
    plane_scale)``. Quantizing the planes (not just the vectors) makes
    the sign test ``dot_int(v_q, p_q) ≥ 0`` exact integer arithmetic —
    the whole SRP bucketing becomes SQL-expressible, so a DuckDB
    oracle computes the IDENTICAL buckets (the same move that made
    docs_simhash_pairs hash-exact)."""
    rng = np.random.default_rng(seed)
    return [
        [int(x) for x in np.round(p * plane_scale).astype(np.int64)]
        for p in rng.standard_normal((n_planes, dim))
    ]


def srp_band_codes(qvec_name: str, planes_q: list[list[int]], band_planes: int):
    """ARRAY<BIGINT> of per-band SRP codes over an ALREADY-QUANTIZED
    vector column named ``qvec_name``: band b's code packs the sign
    bits of planes [b·r, (b+1)·r). All-integer — both engines agree
    bit-for-bit. Rendered as ONE SQL expression string: building it
    from per-element ``F.lit`` calls costs one py4j round-trip per
    plane coefficient (measured ~5 s of pure driver time at 32×64)."""
    assert len(planes_q) % band_planes == 0

    def dot_sql(plane: list[int]) -> str:
        lits = ", ".join(f"{x}L" for x in plane)
        return (
            f"aggregate(zip_with({qvec_name}, array({lits}), (x, y) -> x * y), "
            f"0L, (a, p) -> a + p)"
        )

    codes = []
    for b in range(len(planes_q) // band_planes):
        bits = " + ".join(
            f"(case when {dot_sql(planes_q[b * band_planes + j])} >= 0 "
            f"then {1 << j}L else 0L end)"
            for j in range(band_planes)
        )
        codes.append(f"cast({bits} as bigint)")
    return F.expr(f"array({', '.join(codes)})")


def srp_banded_pairs(
    embeddings: DataFrame,
    min_cos_pct: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    bands: int = 8,
    band_planes: int = 4,
    seed: int = 42,
    plane_scale: int = 1000,
    dim: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, dot_q, norm_a, norm_b) — the BUCKETED scale tier of
    :func:`embedding_near_duplicates`, hash-exact against a SQL oracle:
    banded integer SRP-LSH (bands × band_planes quantized hyperplanes;
    a pair is a candidate iff SOME band's full sign-code matches —
    the MinHash-LSH banding construction of dedup.near_duplicates
    applied to embeddings) followed by the exact integer cosine verify
    ``10⁴·dot_q² ≥ (100τ)²·‖a‖²·‖b‖²``.

    Candidates ⊆ verified: banding only ever *misses* true pairs
    (recall = 1-(1-(1-θ/π)^r)^b, tunable by b/r), never admits a false
    one past the verify — the standard LSH contract, here with every
    stage integer-exact so the driver oracle hash-matches.

    Scale shape — the reason this tier exists: NO crossJoin anywhere
    (plan-asserted in tests/test_plans.py). The corpus is projected to
    (id, band, code) sign rows (b rows per vector, vectors NOT
    carried), candidates come from a band+code equi-join, are deduped,
    and only then re-join the two quantized vectors by id. The shuffle
    carries bucket-join candidates, not the N² cross product.

    int64 headroom: verify as in embedding_near_duplicates (guarded
    there; same guard here); band dots ≤ dim·scale·plane_scale·max|x|
    — ~10¹⁰ at dim 1000 for unit vectors, far inside 2⁶³.

    ``materialize=False`` returns the un-persisted, un-checkpointed
    plan (plan-shape tests only — localCheckpoint hides the fragment).
    """
    n = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col), scale).alias("v")
    )
    if materialize:
        # persist the (id, v) projection BEFORE the guard aggregate so
        # its action populates the cache — otherwise the guard pays one
        # full extra scan+quantize pass over the corpus. nrm is NOT in
        # the cached projection: its int64 multiply must not execute
        # until the guard has cleared it (ANSI would throw mid-cache).
        n = n.persist()
    # same wrap-immune overflow guard as embedding_near_duplicates
    nrm_d = F.aggregate(
        F.col("v"), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    max_nrm = n.agg(F.max(nrm_d)).collect()[0][0] or 0.0
    if 10000.0 * max_nrm * max_nrm >= float(2**62):
        if materialize:
            n.unpersist()
        raise ValueError(
            f"quantized norm^2 up to {max_nrm:.3g} overflows the int64 cosine "
            "test; unit-normalize the embeddings or lower `scale`"
        )
    base = n  # the persisted projection — unpersist THIS, not a derived plan
    n = n.withColumn("nrm", _dot_int(F.col("v"), F.col("v")))
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = srp_planes_q(dim, bands * band_planes, seed, plane_scale)
    sigs = n.select(
        "id", F.posexplode(srp_band_codes("v", planes, band_planes)).alias("band", "code")
    )
    cand = (
        sigs.select(F.col("id").alias("id_a"), "band", "code")
        .join(sigs.select(F.col("id").alias("id_b"), "band", "code"), ["band", "code"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("norm_a"))
    vb = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("norm_b"))
    pct2 = min_cos_pct * min_cos_pct
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("dot_q", _dot_int(F.col("va"), F.col("vb")))
        .where(
            (F.col("dot_q") > 0)
            & (F.lit(10000) * F.col("dot_q") * F.col("dot_q") >= F.lit(pct2) * F.col("norm_a") * F.col("norm_b"))
        )
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("dot_q").cast("bigint"),
            F.col("norm_a").cast("bigint"),
            F.col("norm_b").cast("bigint"),
        )
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        base.unpersist()
    return out


def srp_topk_q(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    bands: int = 8,
    band_planes: int = 4,
    seed: int = 42,
    plane_scale: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, dot_q, norm_q2, norm_n2, rank) — the
    SEARCH twin of :func:`srp_banded_pairs`: banded integer-SRP bucket
    candidates (query and corpus vector share at least one band's full
    sign-code) ranked within the candidate set by the hash-exact
    integer-cosine key of :func:`cosine_topk_quantized`. This upgrades
    the float :func:`srp_lsh_topk` (rows-only) to the oracle-exact
    contract: every hashed column is an integer, the ranking key is
    the 3-op IEEE double chain both engines compute bit-identically.

    Scale shape: sign rows (id, band, code) equi-join — NO crossJoin;
    per query the rank window sees only its bucket candidates. Top-k
    is per-query, so a query whose buckets are sparse returns < k rows
    (candidates-only contract — recall is the band-count knob).
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = srp_planes_q(dim, bands * band_planes, seed, plane_scale)

    def prep(df, name):
        return (
            df.select(F.col(id_col).alias(name), _quantize(F.col(vec_col), scale).alias("v"))
            .withColumn("nrm", _dot_int(F.col("v"), F.col("v")))
            .where(F.col("nrm") > 0)
            .withColumn("codes", srp_band_codes("v", planes, band_planes))
        )

    t = prep(embeddings, "neighbor_id").persist()
    q = prep(queries, "query_id")
    t_sig = t.select("neighbor_id", F.posexplode("codes").alias("band", "code"))
    q_sig = q.select("query_id", F.posexplode("codes").alias("band", "code"))
    cand = (
        q_sig.join(t_sig, ["band", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(
            q.select("query_id", F.col("v").alias("qv"), F.col("nrm").alias("norm_q2")),
            "query_id",
        )
        .join(
            t.select("neighbor_id", F.col("v").alias("tv"), F.col("nrm").alias("norm_n2")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            _dot_int(F.col("qv"), F.col("tv")).alias("dot_q"),
            "norm_q2",
            "norm_n2",
        )
    )
    key = F.col("dot_q") / (
        F.sqrt(F.col("norm_q2").cast("double")) * F.sqrt(F.col("norm_n2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            "dot_q",
            "norm_q2",
            "norm_n2",
            F.col("rank").cast("int"),
        )
        .localCheckpoint(eager=True)
    )
    t.unpersist()
    return out


def ivf_centroids_q(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    train_iters: int = 1,
) -> list[list[int]]:
    """INTEGER IVF codebook (deterministic, oracle-replayable): seeds =
    the ``n_centroids`` lowest-id QUANTIZED vectors, refined by
    ``train_iters`` Lloyd steps where assignment is integer-dot argmax
    (ties → lowest centroid index) and the new centroid is the
    per-dimension ``floor(sum / count)`` — floor of an exact-int ratio
    through an IEEE double is bit-identical in both engines (|sum| ≪
    2⁵³), so the whole codebook is replayable in SQL. Clusters that
    lose all members keep their previous centroid. Mean computation is
    distributed (posexplode + partial/final agg); only the tiny
    codebook reaches the driver.
    """
    n = embeddings.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col), scale).alias("v")
    )
    seeds = [list(r.v) for r in n.orderBy("id").limit(n_centroids).select("v").collect()]
    if not seeds:
        raise ValueError("ivf_centroids_q: empty embeddings table")
    # fewer rows than requested centroids → smaller codebook (the
    # oracle's LIMIT-n seeding behaves the same way)
    cents = seeds
    for _ in range(train_iters):
        assigned = n.withColumn("cluster", _ivf_assign_q("v", cents))
        dims = assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
        means = (
            dims.groupBy("cluster", "dim")
            .agg(
                F.floor(
                    F.sum("val").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("bigint")
                .alias("m")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.transform("dm", lambda s: s["m"]).alias("v"))
            .collect()
        )
        new = {r.cluster: list(r.v) for r in means}
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def _ivf_assign_q(qvec_name: str, centroids_q: list[list[int]]):
    """INT cluster id: argmax integer dot against the codebook, ties to
    the lowest index. One SQL expression string (the srp_band_codes
    py4j lesson); the (-dot, idx) struct array min is the argmax."""
    entries = ", ".join(
        "named_struct('d', -aggregate(zip_with("
        + qvec_name
        + f", array({', '.join(str(x) + 'L' for x in c)}), (x, y) -> x * y), 0L, (a, p) -> a + p), 'i', {i})"
        for i, c in enumerate(centroids_q)
    )
    return F.expr(f"array_min(array({entries})).i").cast("int")


def ivf_topk_q(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids_q: list[list[int]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, dot_q, norm_q2, norm_n2, rank) — the
    IVF ANN tier with the hash-exact oracle contract: the all-integer
    codebook of :func:`ivf_centroids_q`, integer-dot cell assignment,
    integer-dot probe ranking (a query probes its ``nprobe`` best
    cells), and the :func:`cosine_topk_quantized` ranking key within
    the probed cells. Upgrades the float :func:`ivf_topk` (rows-only)
    the way srp_topk_q upgrades srp_lsh_topk.

    Scale shape: corpus equi-joined on ``cluster`` (store it as a
    partition column and the probe join becomes partition pruning);
    the codebook is a driver-bounded literal; no crossJoin.
    """
    from pyspark.sql import Window

    if centroids_q is None:
        centroids_q = ivf_centroids_q(embeddings, n_centroids, id_col, vec_col, scale)
    t = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv")
        )
        .withColumn("norm_n2", _dot_int(F.col("tv"), F.col("tv")))
        .where(F.col("norm_n2") > 0)
        .withColumn("cluster", _ivf_assign_q("tv", centroids_q))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv")
        )
        .withColumn("norm_q2", _dot_int(F.col("qv"), F.col("qv")))
        .where(F.col("norm_q2") > 0)
        .withColumn("probes", _ivf_probes_q("qv", centroids_q, nprobe))
        .select("query_id", "qv", "norm_q2", F.explode("probes").alias("cluster"))
    )
    scored = (
        q.join(t, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot_int(F.col("qv"), F.col("tv")).alias("dot_q"),
            "norm_q2",
            "norm_n2",
        )
    )
    key = F.col("dot_q") / (
        F.sqrt(F.col("norm_q2").cast("double")) * F.sqrt(F.col("norm_n2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(key), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            "dot_q",
            "norm_q2",
            "norm_n2",
            F.col("rank").cast("int"),
        )
    )


def _ivf_probes_q(qvec_name: str, centroids_q: list[list[int]], nprobe: int):
    """ARRAY<INT> of the ``nprobe`` best cells by integer dot (ties to
    lowest index) — slice of the sorted (-dot, idx) struct array."""
    entries = ", ".join(
        "named_struct('d', -aggregate(zip_with("
        + qvec_name
        + f", array({', '.join(str(x) + 'L' for x in c)}), (x, y) -> x * y), 0L, (a, p) -> a + p), 'i', {i})"
        for i, c in enumerate(centroids_q)
    )
    return F.expr(
        f"transform(slice(array_sort(array({entries})), 1, {nprobe}), s -> cast(s.i as int))"
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF codebook: seed centroids are the ``n_centroids``
    lowest-id vectors (seeded/deterministic, no RNG), refined by
    ``train_iters`` Lloyd steps executed distributed: assign via
    broadcast centroid literals (argmin dot-distance), then per-
    (cluster, dimension) mean via posexplode + partial/final avg —
    k-means as two codegen'd aggregations, no collect of vectors."""
    seeds = (
        embeddings.orderBy(F.col(id_col)).limit(n_centroids).select(_as_double(F.col(vec_col)).alias("v")).collect()
    )
    centroids = [list(r.v) for r in seeds]
    for _ in range(train_iters):
        assigned = with_ivf_cluster(embeddings, centroids, vec_col)
        dims = assigned.select(
            "cluster", F.posexplode(_as_double(F.col(vec_col))).alias("dim", "val")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.transform("dm", lambda s: s["m"]).alias("v"))
            .collect()
        )
        new = {r.cluster: list(r.v) for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def _centroid_dists(vec_col, centroids: list[list[float]]):
    """ARRAY<DOUBLE> of negative-dot 'distances' to each centroid."""
    dv = _as_double(vec_col)
    return F.array(
        *[
            -_dot_double(dv, F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ]
    )


def with_ivf_cluster(embeddings: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its max-dot-product centroid (argmin of
    the negative-dot array, ties to lowest index)."""
    dists = _centroid_dists(F.col(vec_col), centroids)
    return (
        embeddings.withColumn("_d", dists)
        .withColumn("cluster", (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1).cast("int"))
        .drop("_d")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: partition vectors into centroid cells, probe only the
    query's ``nprobe`` nearest cells, exact cosine within.

    Scale shape: the codebook is tiny and broadcast as literals; the
    corpus is equi-joined on ``cluster`` (shuffle ∝ probed cells, not
    the cross product); cell assignment is write-once (store
    ``cluster`` as a partition column of the embedding table and the
    probe join becomes partition pruning)."""
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    t = with_ivf_cluster(embeddings, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("tv"), "cluster"
    )
    qd = queries.withColumn("_d", _centroid_dists(F.col(vec_col), centroids))
    # rank (distance, index) structs so tied centroid distances still
    # probe nprobe DISTINCT cells (array_position on the raw distance
    # would collapse ties onto the first index)
    ranked = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(F.get(F.col("_d"), i).alias("d"), i.alias("idx")),
    )
    probe = (
        qd.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(F.slice(F.array_sort(ranked), 1, nprobe)).alias("_p"),
        )
        .withColumn("cluster", F.col("_p.idx").cast("int"))
        .drop("_p")
    )

    def norm(col):
        return F.sqrt(_dot_double(col, col))

    scored = (
        probe.join(t, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_double(_as_double(F.col("qv")), _as_double(F.col("tv")))
                / (norm(_as_double(F.col("qv"))) * norm(_as_double(F.col("tv"))))
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    min_cos_pct: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    n_planes: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, dot_q, norm_a, norm_b) — embedding-cosine near-
    duplicate pairs with cosine ≥ min_cos_pct/100, in *exact integer*
    arithmetic (the dedup-by-embedding completion of operators/dedup):

        cos(a,b) ≥ τ  ⟺  dot_q > 0 ∧ 10⁴·dot_q² ≥ (100τ)²·‖a‖²·‖b‖²

    over 1e-3-quantized vectors — no float sums, so the DuckDB oracle
    hash-matches (CLAUDE.md oracle rules). int64 headroom: both sides
    are ≤ 10⁴·‖a‖²·‖b‖² (|dot| ≤ √(‖a‖²‖b‖²), pct ≤ 100), so the test
    is exact iff max ‖v‖²_q < √(2⁶³/10⁴) ≈ 3.0×10⁷ — true for any
    unit-norm embedding at ``scale=1000`` (‖v‖²_q ≈ 10⁶ regardless of
    dim) but NOT for arbitrary-magnitude vectors; a driver-side guard
    aggregates max ‖v‖²_q and raises rather than wrap silently
    (Spark's non-ANSI bigint multiply does not error on overflow).

    ``n_planes=None`` compares all pairs — bounded inputs only (the
    oracle/verify path). With ``n_planes`` set, candidates come from a
    sign-random-projection bucket equi-join (cos ≥ 0.9 pairs disagree
    on a plane with prob ≈ 0.14·n_planes/π, so recall tuning =
    plane count); the shuffle then scales with bucket sizes, not the
    cross product — the 100 TB path, same candidates⊆verify contract
    as dedup.near_duplicates.
    """
    n = embeddings.select(
        F.col(id_col).alias("id"),
        _quantize(F.col(vec_col), scale).alias("v"),
        F.col(vec_col).alias("raw"),
    ).withColumn("nrm", _dot_int(F.col("v"), F.col("v")))
    # overflow guard: one tiny agg — the int64 comparison wraps
    # silently past 2^63 under non-ANSI semantics. The norm is
    # re-summed in DOUBLE for the guard (floats cannot wrap; relative
    # error ~1e-16 is absorbed by the 2× safety factor in 2^62), so
    # the guard itself is immune to the wrap it detects
    nrm_d = F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    max_nrm = n.agg(F.max(nrm_d)).collect()[0][0] or 0.0
    if 10000.0 * max_nrm * max_nrm >= float(2**62):
        raise ValueError(
            f"quantized norm^2 up to {max_nrm:.3g} overflows the int64 cosine "
            "test; unit-normalize the embeddings or lower `scale`"
        )
    if n_planes:
        dim = len(embeddings.select(vec_col).first()[0])
        planes = srp_planes(dim, n_planes, seed)
        n = n.withColumn("bucket", srp_bucket_col(F.col("raw"), planes))
    a = n.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("norm_a"),
        *(["bucket"] if n_planes else []),
    )
    b = n.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("norm_b"),
        *(["bucket"] if n_planes else []),
    )
    if n_planes:
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    pct2 = min_cos_pct * min_cos_pct
    scored = pairs.withColumn("dot_q", _dot_int(F.col("va"), F.col("vb")))
    return (
        scored.where(
            (F.col("dot_q") > 0)
            & (F.lit(10000) * F.col("dot_q") * F.col("dot_q") >= F.lit(pct2) * F.col("norm_a") * F.col("norm_b"))
        )
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("dot_q").cast("bigint"),
            F.col("norm_a").cast("bigint"),
            F.col("norm_b").cast("bigint"),
        )
    )


def semantic_dedup_keep(
    embeddings: DataFrame,
    min_cos_pct: int = 90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    n_planes: int | None = None,
    seed: int = 42,
    bands: int | None = None,
    band_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, component_id, keep INT) — the SemDeDup-style verdict
    (Abbas et al., 2023): embedding-cosine near-duplicate pairs →
    transitive clusters → one survivor (min id) per cluster, every
    unpaired vector kept.

    Pure composition of already-proven stages:
    :func:`embedding_near_duplicates` (exact integer cosine test; SRP
    bucketed when ``n_planes`` is set — the 100 TB path where the
    shuffle carries bucket-join candidates, not the cross product) →
    ``dedup.connected_components`` (large-star/small-star, relational)
    → ``dedup.dedup_keep_decision`` (components broadcast onto the
    corpus). Transitivity is the point: A≈B, B≈C must collapse
    {A,B,C} to one kept vector even when A–C was never a candidate
    pair — per-pair filtering alone over-deletes (kills both sides)
    or under-deletes (keeps chains).

    ``bands`` selects the ORACLE-EXACT bucketed scale tier
    (:func:`srp_banded_pairs` — banded integer SRP, replayable in SQL)
    instead of the all-pairs / float-single-bucket paths; this is the
    100-TB SemDeDup configuration with the hash-exact contract end to
    end (pairs → closure → keep).
    """
    from pignlproc_spark.operators import dedup

    if bands:
        pairs = srp_banded_pairs(
            embeddings, min_cos_pct, id_col, vec_col, scale,
            bands, band_planes, seed, dim=dim,
        )
    else:
        pairs = embedding_near_duplicates(
            embeddings, min_cos_pct, id_col, vec_col, scale, n_planes, seed
        )
    out = dedup.dedup_keep_decision(embeddings, pairs, id_col=id_col)
    return out.select(
        F.col(id_col).cast("bigint").alias(id_col), "component_id", "keep"
    )


def srp_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Bucketed ANN: candidates share the query's SRP bucket; then
    exact cosine within bucket. Equi-join on bucket ⇒ shuffle scales
    with bucket sizes, not the cross product."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = srp_planes(dim, n_planes, seed)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).withColumn(
        "bucket", srp_bucket_col(F.col("qv"), planes)
    )
    t = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("tv")).withColumn(
        "bucket", srp_bucket_col(F.col("tv"), planes)
    )
    def norm(col):
        return F.sqrt(_dot_double(col, col))

    scored = (
        q.join(t, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_double(_as_double(F.col("qv")), _as_double(F.col("tv")))
                / (norm(_as_double(F.col("qv"))) * norm(_as_double(F.col("tv"))))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------


def _pq_sub_dist_structs(qvec_name: str, sub_idx: int, sub: int, cents_j: list[list[int]]) -> str:
    """SQL fragment: the ks named_structs ('d' = integer squared L2 of
    subvector ``sub_idx`` of the quantized vector column ``qvec_name``
    against one codeword, 'i' = codeword index). One expression string
    per subspace (the srp_band_codes py4j lesson)."""
    off = sub_idx * sub
    entries = []
    for ci, c in enumerate(cents_j):
        lits = ", ".join(f"{x}L" for x in c)
        entries.append(
            f"named_struct('d', aggregate(zip_with(slice({qvec_name}, {off + 1}, {sub}), "
            f"array({lits}), (x, y) -> (x - y) * (x - y)), 0L, (a, p) -> a + p), 'i', {ci})"
        )
    return ", ".join(entries)


def _pq_code_col(qvec_name: str, sub_idx: int, sub: int, cents_j: list[list[int]]):
    """INT code for subspace ``sub_idx``: argmin integer squared L2
    against the subspace codebook, ties to the lowest codeword index
    (the (dist, idx) struct-array min IS the argmin)."""
    return F.expr(
        f"array_min(array({_pq_sub_dist_structs(qvec_name, sub_idx, sub, cents_j)})).i"
    ).cast("int")


def pq_codebooks_q(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    train_iters: int = 1,
    pre_quantized: bool = False,
) -> list[list[list[int]]]:
    """INTEGER product-quantization codebooks (deterministic,
    oracle-replayable), one per subspace: ``[m][ks][dim/m]``.
    ``pre_quantized=True`` skips the float→int quantization — the
    residual IVFADC tier trains on already-integer residual vectors.

    Same replayable-training contract as :func:`ivf_centroids_q`:
    seeds = the ``ks`` lowest-id QUANTIZED vectors' subvectors, refined
    by ``train_iters`` Lloyd steps where assignment is integer
    squared-L2 argmin (ties → lowest codeword index) and the new
    codeword is the per-dimension ``floor(sum / count)`` — floor of an
    exact-int ratio through an IEEE double is bit-identical in both
    engines (|sum| ≪ 2⁵³). Codewords that lose all members keep their
    previous value. Mean computation is distributed; only the tiny
    ``m·ks·(dim/m)``-int codebook reaches the driver. At 100 TB, train
    on a bounded sample (PQ codebooks converge on ~10⁵ vectors) and
    encode the full corpus with the frozen literals.
    """
    head = embeddings.select(vec_col).first()
    if head is None:
        raise ValueError("pq_codebooks_q: empty embeddings table")
    dim = len(head[0])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks_q: dim {dim} not divisible by m={m}")
    sub = dim // m
    vcol = F.col(vec_col) if pre_quantized else _quantize(F.col(vec_col), scale)
    n = embeddings.select(F.col(id_col).alias("id"), vcol.alias("v"))
    seeds = [list(r.v) for r in n.orderBy("id").limit(ks).select("v").collect()]
    if not seeds:
        raise ValueError("pq_codebooks_q: empty embeddings table")
    books = [[s[j * sub : (j + 1) * sub] for s in seeds] for j in range(m)]
    for _ in range(train_iters):
        # persist the assignment: the union below reads it once per
        # subspace, and without the cache each branch would re-run the
        # quantize + m argmin expressions over the full training set
        assigned = n.select(
            "v", *[_pq_code_col("v", j, sub, books[j]).alias(f"c{j}") for j in range(m)]
        ).persist()
        parts = [
            assigned.select(
                F.lit(j).alias("sub"),
                F.col(f"c{j}").alias("code"),
                F.posexplode(F.slice("v", j * sub + 1, sub)).alias("dim", "val"),
            )
            for j in range(m)
        ]
        dims = parts[0]
        for p in parts[1:]:
            dims = dims.unionByName(p)
        means = (
            dims.groupBy("sub", "code", "dim")
            .agg(
                F.floor(F.sum("val").cast("double") / F.count(F.lit(1)).cast("double"))
                .cast("bigint")
                .alias("mval")
            )
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mval"))).alias("dm"))
            .select("sub", "code", F.transform("dm", lambda s: s["mval"]).alias("sv"))
            .collect()
        )
        assigned.unpersist()
        new = {(r.sub, r.code): list(r.sv) for r in means}
        books = [
            [new.get((j, ci), books[j][ci]) for ci in range(ks)] for j in range(m)
        ]
    return books


def pq_adc_topk_q(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, adc_q, rank) — the PQ-ADC ANN tier with
    the hash-exact oracle contract (Jégou et al., TPAMI 2011): each
    corpus vector is compressed to ``m`` codes (integer squared-L2
    argmin per subspace against :func:`pq_codebooks_q`), the query side
    precomputes the ``m·ks`` exact-integer partial dot products
    LUT(sub, code) = <q_sub, codeword>, and the approximate inner
    product is the exact BIGINT sum of ``m`` LUT entries — so the
    ranking (adc_q DESC, neighbor_id ASC) is bit-identical in SQL.

    Completes the ANN family: brute (dot/cosine_topk_quantized), LSH
    (srp_topk_q), IVF (ivf_topk_q), PQ (this).

    Scale shape — the PQ story at 100 TB: after encoding, a scored scan
    touches ``m`` small ints per vector, not ``dim`` floats; here that
    is a broadcast of the nq·m·ks-row LUT onto the (neighbor_id, sub,
    code) projection, with the per-(query, neighbor) sum partially
    aggregated map-side (each neighbor's m rows are co-located, so one
    row per pair crosses the shuffle). No crossJoin; the codebook is a
    driver-bounded literal. Production pairs this with the IVF cell
    restriction (ivf_topk_q's cluster column) to scan a fraction of the
    codes; the full-scan form is the exactness-pinned baseline.
    """
    from pyspark.sql import Window

    if codebooks is None:
        codebooks = pq_codebooks_q(embeddings, m, ks, id_col, vec_col, scale)
    sub = len(codebooks[0][0])
    t = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv")
    )
    codes = t.select(
        "neighbor_id",
        F.posexplode(
            F.array(*[_pq_code_col("tv", j, sub, codebooks[j]) for j in range(m)])
        ).alias("sub", "code"),
    )

    def part_dot_sql(j: int, c: list[int]) -> str:
        lits = ", ".join(f"{x}L" for x in c)
        return (
            f"aggregate(zip_with(slice(qv, {j * sub + 1}, {sub}), array({lits}), "
            f"(x, y) -> x * y), 0L, (a, p) -> a + p)"
        )

    lut_entries = ", ".join(
        f"named_struct('sub', {j}, 'code', {ci}, 'part', {part_dot_sql(j, c)})"
        for j in range(m)
        for ci, c in enumerate(codebooks[j])
    )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv")
        )
        .select("query_id", F.explode(F.expr(f"array({lut_entries})")).alias("e"))
        .select("query_id", F.col("e.sub").alias("sub"), F.col("e.code").alias("code"), F.col("e.part").alias("part"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("part").alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.col("adc_q").cast("bigint"),
            F.col("rank").cast("int"),
        )
    )


def ivfpq_topk_q(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids_q: list[list[int]] | None = None,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, adc_q, rank) — the PRODUCTION ANN
    configuration with the hash-exact oracle contract: IVF restricts
    the scan (a query only scores vectors in its ``nprobe`` best cells,
    assignment/probing by integer-dot argmax against
    :func:`ivf_centroids_q`'s replayable codebook) and PQ compresses it
    (each vector scored from its ``m`` codes through the query's
    exact-integer LUT, :func:`pq_adc_topk_q`'s contract). Classical
    IVFADC (Jégou et al., TPAMI 2011) encodes RESIDUALS against the
    cell centroid; this variant encodes the raw vectors so both
    codebooks stay independently frozen-replayable in SQL — a
    documented simplification that trades some quantization error for
    oracle-exactness of the whole training + search chain.

    Scale shape: corpus carries (cluster, m codes) only; the query side
    is a driver-bounded broadcast of nq·nprobe·m·ks LUT rows; scoring
    is ONE broadcast equi-join on (cluster, sub, code) + a partial
    aggregate — no crossJoin, and the cluster key means a query scans
    |probed cells| / |corpus| of the codes (store cluster as a
    partition column and the join becomes partition pruning)."""
    from pyspark.sql import Window

    if centroids_q is None:
        centroids_q = ivf_centroids_q(embeddings, n_centroids, id_col, vec_col, scale)
    if codebooks is None:
        codebooks = pq_codebooks_q(embeddings, m, ks, id_col, vec_col, scale)
    sub = len(codebooks[0][0])
    t = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv")
    ).withColumn("cluster", _ivf_assign_q("tv", centroids_q))
    codes = t.select(
        "neighbor_id",
        "cluster",
        F.posexplode(
            F.array(*[_pq_code_col("tv", j, sub, codebooks[j]) for j in range(m)])
        ).alias("sub", "code"),
    )

    def part_dot_sql(j: int, c: list[int]) -> str:
        lits = ", ".join(f"{x}L" for x in c)
        return (
            f"aggregate(zip_with(slice(qv, {j * sub + 1}, {sub}), array({lits}), "
            f"(x, y) -> x * y), 0L, (a, p) -> a + p)"
        )

    lut_entries = ", ".join(
        f"named_struct('sub', {j}, 'code', {ci}, 'part', {part_dot_sql(j, c)})"
        for j in range(m)
        for ci, c in enumerate(codebooks[j])
    )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv")
        )
        .withColumn("probes", _ivf_probes_q("qv", centroids_q, nprobe))
        .select("query_id", "qv", F.explode("probes").alias("cluster"))
        .select("query_id", "cluster", F.explode(F.expr(f"array({lut_entries})")).alias("e"))
        .select(
            "query_id", "cluster",
            F.col("e.sub").alias("sub"), F.col("e.code").alias("code"),
            F.col("e.part").alias("part"),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["cluster", "sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("part").alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.col("adc_q").cast("bigint"),
            F.col("rank").cast("int"),
        )
    )


def _cents_lit_sql(centroids_q: list[list[int]]) -> str:
    """SQL literal: array-of-arrays of the integer IVF codebook,
    indexable by ``element_at(..., cluster + 1)``."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{x}L" for x in c) + ")" for c in centroids_q
        )
        + ")"
    )


def ivfpq_residual_topk_q(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    centroids_q: list[list[int]] | None = None,
    codebooks: list[list[list[int]]] | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, adc_q, rank) — CLASSICAL IVFADC (Jégou
    et al., TPAMI 2011) with the hash-exact oracle contract: unlike
    :func:`ivfpq_topk_q` (which PQ-encodes the raw vectors so the two
    codebooks replay independently), this tier encodes the RESIDUAL
    ``r = v_q − centroid_q[cluster]`` — an exact integer vector, so
    the whole chain (IVF training → residual → residual-PQ training →
    encode → LUT) stays replayable in SQL. For the inner-product
    ranking the centroid contribution separates exactly:
    ``<q, v> ≈ <q, c> + <q, r̂>`` where ``<q, c>`` is an exact-integer
    per-(query, probed cell) base term and ``<q, r̂>`` is the BIGINT
    sum of ``m`` residual-LUT entries. Residuals have smaller spread
    than raw vectors, so the same (m, ks) budget quantizes finer —
    the measured recall gain over the raw-vector tier lives in
    tests/test_training_ops.py::test_ann_recall_tiers and BASELINE.md.

    Scale shape: identical to :func:`ivfpq_topk_q` — corpus carries
    (cluster, m codes); ONE broadcast equi-join on (cluster, sub,
    code) + partial aggregate; the base term rides the broadcast LUT
    rows (constant within a (query, cluster) group, folded in with
    ``min``). The centroid literal is driver-bounded by design."""
    from pyspark.sql import Window

    if centroids_q is None:
        centroids_q = ivf_centroids_q(embeddings, n_centroids, id_col, vec_col, scale)
    cents_lit = _cents_lit_sql(centroids_q)
    t = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col), scale).alias("tv")
        )
        .withColumn("cluster", _ivf_assign_q("tv", centroids_q))
        .withColumn(
            "rv",
            F.expr(f"zip_with(tv, element_at({cents_lit}, cluster + 1), (x, y) -> x - y)"),
        )
    )
    if codebooks is None:
        codebooks = pq_codebooks_q(
            t.select("neighbor_id", "rv"),
            m,
            ks,
            id_col="neighbor_id",
            vec_col="rv",
            scale=scale,
            pre_quantized=True,
        )
    sub = len(codebooks[0][0])
    codes = t.select(
        "neighbor_id",
        "cluster",
        F.posexplode(
            F.array(*[_pq_code_col("rv", j, sub, codebooks[j]) for j in range(m)])
        ).alias("sub", "code"),
    )

    def part_dot_sql(j: int, c: list[int]) -> str:
        lits = ", ".join(f"{x}L" for x in c)
        return (
            f"aggregate(zip_with(slice(qv, {j * sub + 1}, {sub}), array({lits}), "
            f"(x, y) -> x * y), 0L, (a, p) -> a + p)"
        )

    lut_entries = ", ".join(
        f"named_struct('sub', {j}, 'code', {ci}, 'part', {part_dot_sql(j, c)})"
        for j in range(m)
        for ci, c in enumerate(codebooks[j])
    )
    lut = (
        queries.select(
            F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), scale).alias("qv")
        )
        .withColumn("probes", _ivf_probes_q("qv", centroids_q, nprobe))
        .select("query_id", "qv", F.explode("probes").alias("cluster"))
        .withColumn(
            "base",
            F.expr(
                f"aggregate(zip_with(qv, element_at({cents_lit}, cluster + 1), "
                "(x, y) -> x * y), 0L, (a, p) -> a + p)"
            ),
        )
        .select(
            "query_id", "cluster", "base",
            F.explode(F.expr(f"array({lut_entries})")).alias("e"),
        )
        .select(
            "query_id", "cluster", "base",
            F.col("e.sub").alias("sub"), F.col("e.code").alias("code"),
            F.col("e.part").alias("part"),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["cluster", "sub", "code"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("part") + F.min("base")).alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.col("adc_q").cast("bigint"),
            F.col("rank").cast("int"),
        )
    )
