"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the scale path: at 10^9+ vectors the crossJoin is
impossible, but hyperplane buckets turn ANN into a groupBy-sized join with
recall controlled by (n_planes, n_tables).

All distance math is pure Catalyst (zip_with / aggregate in whole-stage
codegen) — no Python in the hot path.  Hyperplanes are hash-derived
(md5 → uniform in [-1,1]) so the plan is fully deterministic with no
driver-side randomness and no broadcast of plane matrices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h64


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the corpus.

    The corpus side never shuffles raw vectors — the only shuffle is the
    per-query top-k aggregation, and with broadcast(queries) the join is
    map-side.  Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv"))
    )
    c = vectors.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv"))
    scored = q.crossJoin(c).filter(F.col(query_id_col) != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select(query_id_col, "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------- LSH


def _plane_component(plane: int, dim_idx: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1] — computed
    driver-side (md5) and shipped as a literal, so executors do zero hashing."""
    import hashlib

    h = int(hashlib.md5(f"plane{plane}#{dim_idx}".encode()).hexdigest()[:15], 16)
    return (h % 2_000_001) / 1_000_000.0 - 1.0


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Sign pattern of the vector against n_planes hash-derived hyperplanes,
    packed into one int64 bucket key.  Row-local, shuffle-free; planes are
    literal double arrays baked into the plan."""
    v = as_double(vec)
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_component(p, j)) for j in range(dim)])
        # slice to the actual vector length so shorter vectors (dim must be
        # >= the true dimension) never see null-padded zip_with products
        proj = F.aggregate(
            F.zip_with(v, F.slice(plane, 1, F.size(v)), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        out = out + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share ≥1 LSH band with the query, then exact
    cosine re-rank.  The join key is (band_idx, band_bits) — corpus-side
    work is proportional to bucket collisions, not corpus size × queries.

    Bands of n_planes/n_bands planes each trade recall (more bands → more
    candidates) against cost; planes partition the signature.
    """
    assert n_planes % n_bands == 0
    w_bits = n_planes // n_bands

    def banded(df: DataFrame, idc: str) -> DataFrame:
        sig = hyperplane_signature(F.col(vec_col), n_planes)
        return df.select(
            F.col(idc),
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(sig, b * w_bits).bitwiseAND(F.lit((1 << w_bits) - 1))
                        for b in range(n_bands)
                    ]
                )
            ).alias("band_idx", "band_bits"),
        )

    # candidate generation carries IDS ONLY — a pair colliding in several
    # bands would otherwise shuffle its (2 x dim) double vectors once per
    # band through the distinct; vectors are re-attached after dedup
    qb = F.broadcast(banded(queries, query_id_col))
    cb = banded(vectors.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    cand = (
        qb.join(cb, ["band_idx", "band_bits"])
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id")
        .distinct()
    )
    qv = F.broadcast(queries.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv")))
    cv = vectors.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv"))
    scored = cand.join(qv, query_id_col).join(cv, "neighbor_id")
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select(query_id_col, "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into n_cells Voronoi cells around
    deterministic hash-chosen centroids; a query scans only its n_probe
    nearest cells.

    Scale shape: cell assignment is one broadcast join against n_cells
    centroid vectors (map-side, no shuffle of the corpus beyond writing the
    cell key); the query-side join touches n_probe/n_cells of the data —
    the classic IVF cost model, expressed relationally.  Centroids here are
    hash-sampled corpus vectors (deterministic, no k-means iterations);
    swap in trained centroids for better recall without changing the plan.
    """
    v = vectors.select(F.col(id_col).alias("__cid"), as_double(F.col(vec_col)).alias("__v"))
    # deterministic centroid sample: smallest n_cells ids by md5 hash
    cents = (
        v.withColumn("__h", h64(F.col("__cid").cast("string")))
        .orderBy("__h")
        .limit(n_cells)
        .select(F.col("__cid").alias("cell_id"), F.col("__v").alias("__cv"))
    )
    bc = F.broadcast(cents)

    def assign(df: DataFrame, idc: str, vec: str, n_keep: int) -> DataFrame:
        scored = df.crossJoin(bc).select(
            F.col(idc),
            "cell_id",
            cosine(F.col(vec), F.col("__cv")).alias("__sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("__sim"), F.asc("cell_id"))
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_keep)
            .select(idc, "cell_id")
        )

    corpus_cells = assign(v.withColumnRenamed("__cid", "neighbor_id").withColumnRenamed("__v", "__nv"), "neighbor_id", "__nv", 1)
    q = queries.select(F.col(query_id_col), as_double(F.col(vec_col)).alias("__qv"))
    query_cells = F.broadcast(assign(q, query_id_col, "__qv", n_probe))

    cand = (
        query_cells.join(corpus_cells, "cell_id")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id")
        .distinct()
    )
    cv = v.select(F.col("__cid").alias("neighbor_id"), F.col("__v").alias("__nv"))
    scored = cand.join(F.broadcast(q), query_id_col).join(cv, "neighbor_id")
    sim = F.round(cosine(F.col("__qv"), F.col("__nv")), 6)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select(query_id_col, "neighbor_id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidate buckets.

    Same banding as lsh_topk; exact cosine verifies candidates.  High
    thresholds ⇒ near-collinear vectors ⇒ high per-band collision
    probability, so recall at threshold ≥ .9 is near-total while cost stays
    bucket-local.
    """
    assert n_planes % n_bands == 0
    w_bits = n_planes // n_bands
    sig = hyperplane_signature(F.col(vec_col), n_planes)
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(sig, b * w_bits).bitwiseAND(F.lit((1 << w_bits) - 1))
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_bits"),
    )
    # persist: both sides of the self-join share the banded-signature subplan;
    # candidates carry IDS ONLY through the distinct (vectors re-attached
    # after dedup — multi-band collisions must not shuffle vectors per band)
    base = base.persist()
    a = base.select(F.col("id").alias("id_a"), "band_idx", "band_bits")
    b = base.select(F.col("id").alias("id_b"), "band_idx", "band_bits")
    cand = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = vectors.select(F.col(id_col).alias("__vid"), as_double(F.col(vec_col)).alias("__v"))
    scored = (
        cand.join(vecs.withColumnRenamed("__vid", "id_a").withColumnRenamed("__v", "va"), "id_a")
        .join(vecs.withColumnRenamed("__vid", "id_b").withColumnRenamed("__v", "vb"), "id_b")
    )
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return scored.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )
