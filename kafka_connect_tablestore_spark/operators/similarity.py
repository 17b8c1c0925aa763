"""Similarity search over embedding columns (``array<float>``).

- **brute-force top-k cosine** — the exactness baseline: query-set × corpus
  join with the small side broadcast; cosine as a codegen'd ``aggregate`` /
  ``zip_with`` expression (no Python).  At 100 TB the corpus side streams —
  cost is one scan per query batch.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path: each vector is
  mapped to a sign-bit bucket over ``n_planes`` deterministic pseudo-random
  hyperplanes; neighbor candidates share a bucket (or a 1-bit-flipped probe
  bucket), turning top-k into a bucket-local join.  Hyperplane components are
  derived from the shared md5 hash family, so buckets are reproducible across
  runs and engines.
- **embedding-cosine near-dup** — pairs above a cosine threshold within LSH
  buckets (the embedding analogue of MinHash near-dup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is small (a handful of probe vectors) — broadcast it so the
    corpus scan never shuffles.  Scores are rounded to 4 decimals with an
    id tie-break, making ranks deterministic across engines."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def hyperplane_bucket(vec_col, n_planes: int = 8, dim: int = 16, seed: str = "lsh"):
    """Sign-bit LSH bucket id: bit p = 1 iff <v, plane_p> > 0.

    Plane components are deterministic pseudo-randoms in [-0.5, 0.5) from the
    md5 family: plane_p[i] = (hash64('<seed>|p_i') % 1000)/1000 - 0.5."""
    from kafka_connect_tablestore_spark.functions.text import hash64

    v = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    bucket = F.lit(0)
    for p in range(n_planes):
        comps = F.array(
            *[
                (
                    F.pmod(hash64(F.lit(f"{p}_{i}"), seed), F.lit(1000)).cast("double")
                    / F.lit(1000.0)
                    - F.lit(0.5)
                )
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(v.cast("array<double>"), comps, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 16,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's bucket,
    then exact cosine rank within candidates.  Recall/speed traded via
    ``n_planes`` (more planes = smaller buckets).  At scale, corpus buckets
    are computed once (map-only) and bucketed-written, so each query reads
    one bucket — the IVF pattern."""
    bq = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    bc = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    scored = (
        bc.join(F.broadcast(bq), ["bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def ivf_assign(vec_col, centroids: list[list[float]]):
    """Cell id = argmin squared-L2 distance to the (broadcast-literal)
    centroid table — the IVF coarse quantizer as a pure expression."""
    v = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    vd = v.cast("array<double>")
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vd, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(d)
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ann_ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: train = take the first ``n_cells`` vectors as coarse
    centroids (deterministic; swap for k-means at scale), assign every corpus
    vector to its nearest cell (map-only), probe the ``nprobe`` nearest cells
    per query, exact-rank within the probed candidates.

    Scale shape: cell assignment is computed once and bucket-written (the
    inverted file); a query then reads nprobe/n_cells of the corpus instead
    of scanning it — the classic recall/latency dial."""
    centroids = [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(n_cells).collect()
    ]
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        ivf_assign(F.col(vec_col), centroids).alias("cell"),
    )
    # nprobe nearest cells per query: rank the same distance array
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        ivf_assign(F.col(vec_col), centroids).alias("cell0"),
    )
    probes = []
    for p in range(nprobe):
        # p-th nearest cell via iterated argmin exclusion is expression-heavy;
        # probe = primary cell + (primary + p) mod n_cells keeps it cheap and
        # deterministic (a ring probe; real IVF uses the distance order)
        probes.append(F.pmod(F.col("cell0") + F.lit(p), F.lit(n_cells)))
    qp = q.withColumn("cell", F.explode(F.array(*probes)))

    from pyspark.sql import Window

    scored = (
        corpus.join(F.broadcast(qp), ["cell"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within LSH buckets (bucket-local
    self-join — never all-pairs)."""
    b = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"c.{id_col}").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("c.v")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
