"""Similarity search over embedding columns (array<float>), 100 TB design.

- **Brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the document side; dot products computed
  JVM-side via zip_with/aggregate folds in whole-stage codegen. One pass
  over the corpus, no shuffle of the corpus itself; the only shuffle is
  the per-query top-k (k rows per partition per query after partial
  window pruning).
- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic seeded projections) bucket both sides; only same-bucket
  (plus multiprobe-adjacent) pairs are scored. Sub-linear candidate
  count at the cost of bounded recall.

All math is double-precision with a fixed left-fold order so results are
bit-identical to the DuckDB oracle's list_transform/list_sum pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _scatter(df: DataFrame) -> DataFrame:
    """Round-robin the corpus before vector math — single-file inputs
    otherwise pin the whole scan (and all dot products) to one core."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product (deterministic association)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded).

    ``queries`` is broadcast — the corpus is scanned once, never
    shuffled; ranking ties break on neighbor id for determinism.
    """
    docs = _scatter(embeddings).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("d_vec")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    scored = (
        docs.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("d_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def similar_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dedup.

    Local-scale exact implementation: block self-join (broadcast one
    side). The 100 TB path replaces the join with LSH buckets
    (ann_lsh_candidates) — same verify step, bounded candidates.
    """
    side = _scatter(embeddings).select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).persist()
    a = side.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = side.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: splitmix64-style
    integer scramble of (plane, i) mapped to [-1, 1). No RNG state, no
    numpy — reproducible on any executor."""
    out = []
    for i in range(dim):
        x = (plane * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) % (2**64)
        x ^= x >> 30
        x = (x * 0x94D049BB133111EB) % (2**64)
        x ^= x >> 31
        out.append((x / 2**63) - 1.0)
    return out


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane sign signature packed into a long."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = _hyperplane(dim, p + 1)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0))
    return sig


def ann_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    max_probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates whose hyperplane signature
    is within ``max_probe_hamming`` bits of the query's (multiprobe).

    At corpus scale the signature join replaces the full scan: candidates
    per query ≈ corpus / 2^(planes - probe_width).
    """
    docs = _scatter(embeddings).select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("d_vec"),
    ).withColumn("d_sig", lsh_signature(F.col("d_vec"), dim, n_planes))
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_sig", lsh_signature(F.col("q_vec"), dim, n_planes))
    cand = docs.join(
        F.broadcast(qs),
        (F.col("neighbor_id") != F.col("query_id"))
        & (
            F.bit_count(F.col("d_sig").bitwiseXOR(F.col("q_sig")))
            <= max_probe_hamming
        ),
    )
    scored = cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col("d_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (inverted-file index, the other scale path)
# ---------------------------------------------------------------------------


def _centroid_means(assigned: DataFrame) -> DataFrame:
    """Element-wise mean vector per cluster, pure DataFrame ops:
    posexplode → (cluster, pos) means → rebuild ordered arrays."""
    exploded = assigned.select(
        "cluster", F.posexplode("v").alias("pos", "val")
    )
    means = exploded.groupBy("cluster", "pos").agg(F.avg("val").alias("m"))
    return (
        means.groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("pm")
        )
        .select(
            "cluster",
            F.transform("pm", lambda s: s["m"]).alias("centroid"),
        )
    )


def _nearest_centroid(vec_col: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Argmin over broadcast centroid literals (k is small — the centroid
    table is driver-side metadata, never a data-scale collect)."""
    best_id, best_d = F.lit(centroids[0][0]), None
    for cid, cvec in centroids:
        lit_vec = F.array(*[F.lit(x) for x in cvec])
        d = F.aggregate(
            F.zip_with(vec_col, lit_vec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if best_d is None:
            best_d = d
            best_id = F.lit(cid)
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_id


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 8,
    n_probe: int = 3,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index.

    Train: deterministic init (cluster = vec_id % n_clusters) + a few
    k-means iterations, all as DataFrame aggregations — only the k
    centroid vectors (metadata) ever reach the driver. Search: each
    query probes its n_probe nearest clusters; only those clusters'
    vectors are scored. At corpus scale the cluster column becomes the
    lake partition key, so probing is partition pruning.
    """
    docs = _scatter(embeddings).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("v")
    ).persist()
    docs.count()

    assigned = docs.withColumn(
        "cluster", F.pmod(F.col("neighbor_id"), F.lit(n_clusters))
    )
    for _ in range(max(1, kmeans_iters)):  # ≥1 so centroids always exist
        cents = [
            (r["cluster"], list(r["centroid"]))
            for r in _centroid_means(assigned).collect()  # k rows (metadata)
        ]
        assigned = docs.withColumn(
            "cluster", _nearest_centroid(F.col("v"), cents)
        )

    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    # per-query probe list: n_probe nearest centroids by squared distance
    probe_rows = []
    for cid, cvec in cents:
        probe_rows.append((cid, cvec))
    cent_df = qs.sparkSession.createDataFrame(
        probe_rows, "cluster INT, centroid ARRAY<DOUBLE>"
    )
    qd = qs.crossJoin(F.broadcast(cent_df)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with("q_vec", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cluster")
    probes = (
        qd.withColumn("prnk", F.row_number().over(wq))
        .filter(F.col("prnk") <= n_probe)
        .select("query_id", "q_vec", "cluster")
    )
    cand = assigned.join(
        F.broadcast(probes),
        (assigned["cluster"] == probes["cluster"])
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    scored = cand.withColumn("cos_sim", cosine(F.col("q_vec"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
