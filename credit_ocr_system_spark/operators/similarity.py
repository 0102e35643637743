"""Similarity search over embedding columns (array<float>).

Two paths, as a 100TB pipeline needs both:

* **Brute-force cosine top-k** — the exact baseline. Queries are tiny
  (broadcast side); the corpus streams once; per-partition top-k via a
  window. All arithmetic is JVM-side higher-order functions
  (``zip_with`` + ``aggregate``) in double precision — no UDF.
* **Sign-bucketed (LSH) top-k** — the scale path: bucket on the sign
  pattern of the leading dimensions (a fixed random-projection
  surrogate), probe only the query's bucket. Turns the n×q cross
  product into bucket-local joins.

Rank, not raw cosine, is the output contract — float formatting never
leaks into correctness comparisons; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import pround


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _as_double(col):
    return col.cast("array<double>")


def cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """Exact top-k neighbours for the first ``n_queries`` vectors.

    Output: (query_id, neighbor_id, rank) — rank 1 is the vector
    itself (cosine 1.0), deterministic tie-break on neighbor_id.
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("v"))
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"))
    scored = corpus.join(F.broadcast(queries)).withColumn(
        "cos", _cosine(F.col("q"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


def cosine_near_dup(embeddings: DataFrame, threshold: float = 0.35,
                    max_id: int = 300) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).

    The *exact verifier* of embedding-space dedup, deliberately
    bounded (``max_id``): all-pairs is the ground-truth definition,
    not a scale shape. The shipped scale path is
    :func:`bucketed_near_dup`, which runs this same cosine verify
    bucket-locally over the full corpus.
    """
    base = embeddings.where(F.col("vec_id") < max_id).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("raw_cos"))
        .where(F.col("raw_cos") >= threshold)
        .select("vec_a", "vec_b",
                pround(F.col("raw_cos"), 6).alias("cos_sim"))
    )


def bucketed_near_dup(embeddings: DataFrame,
                      threshold: float = 0.35) -> DataFrame:
    """Near-duplicate pairs over the FULL corpus, bucket-locally.

    The 100 TB shape of embedding dedup: sign-bucket LSH generates
    candidates (equi-join on bucket — shuffle is bucket-sized, never
    n²), and the exact cosine verify runs only inside buckets. Recall
    is bucket-limited by construction (a pair split across buckets is
    never considered — the standard LSH trade; more tables/bits tune
    it), which the oracle mirrors exactly. No nested-loop or cartesian
    join appears in the plan (guarded in
    ``tests/test_plan_properties.py``).
    """
    base = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
    ).withColumn("bucket", _sign_bucket(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("raw_cos"))
        .where(F.col("raw_cos") >= threshold)
        .select("vec_a", "vec_b",
                pround(F.col("raw_cos"), 6).alias("cos_sim"))
    )


N_CENTROIDS = 16
N_PROBE = 2


def _centroids(embeddings: DataFrame) -> DataFrame:
    """Deterministic coarse-quantizer codebook: the first
    ``N_CENTROIDS`` vectors by vec_id. (A trained k-means codebook
    would be an offline artifact at scale; a fixed deterministic one
    keeps the partitioning logic — the part Spark executes — exact and
    oracle-checkable.)"""
    return embeddings.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("bigint").alias("centroid_id"),
        _as_double(F.col("embedding")).alias("c"))


def _nearest_centroids(vectors: DataFrame, centroids: DataFrame,
                       id_col: str, vec_col: str, n: int) -> DataFrame:
    """Top-``n`` centroids per vector: broadcast the tiny codebook,
    score every (vector, centroid) pair JVM-side, keep rank <= n.
    This is IVF's partition step — at 10^12 rows it is a map-only
    stage (broadcast join + per-row argmax), no shuffle."""
    scored = vectors.join(F.broadcast(centroids)).withColumn(
        "ccos", _cosine(F.col(vec_col), F.col("c")))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("ccos"), F.asc("centroid_id"))
    return (scored.withColumn("crn", F.row_number().over(w))
            .where(F.col("crn") <= n)
            .drop("c", "ccos", "crn"))


def ivf_assign(embeddings: DataFrame) -> DataFrame:
    """IVF coarse assignment: every vector → its nearest centroid.

    Output: (vec_id, centroid_id). At scale this column becomes the
    partition/bucket key the corpus is repartitioned and stored by
    (one inverted list per centroid).
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    return _nearest_centroids(
        corpus, _centroids(embeddings), "vec_id", "v", 1
    ).select("vec_id", "centroid_id")


def ivf_topk(embeddings: DataFrame, n_queries: int = 5,
             k: int = 5, nprobe: int = N_PROBE) -> DataFrame:
    """IVF approximate top-k: probe the query's ``nprobe`` nearest
    inverted lists only.

    Corpus vectors carry their coarse assignment (ivf_assign); each
    query scores only vectors in its top-``nprobe`` centroid buckets.
    The candidate join is bucket-local (equi-join on centroid_id with
    the tiny probe side broadcast) — the n×q cross product never
    materializes. Output: (query_id, neighbor_id, rank).
    """
    cents = _centroids(embeddings)
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("v"))
    corpus = _nearest_centroids(corpus, cents, "neighbor_id", "v", 1)
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"))
    probes = _nearest_centroids(queries, cents, "query_id", "q", nprobe)
    scored = corpus.join(F.broadcast(probes), "centroid_id").withColumn(
        "cos", _cosine(F.col("q"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


N_BUCKET_BITS = 4


def _sign_bucket(vec, n_bits: int = N_BUCKET_BITS, center: float = 0.0):
    """Bucket id from the sign pattern of the first ``n_bits`` dims.

    ``center`` shifts the hyperplanes: non-negative feature spaces
    (histograms, counts) bucket on ``dim >= center`` instead of the
    useless ``>= 0`` (every vector would share one bucket).
    """
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(vec, i + 1) >= center,
            F.lit(2 ** i)).otherwise(0)
    return bucket.cast("int")


def bucketed_topk(embeddings: DataFrame, n_queries: int = 5,
                  k: int = 5) -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket.

    The bucket join replaces the full cross product — at 10^12 rows
    each of the 2^N buckets is scanned only by queries that land in
    it. Recall is approximate by construction (documented, measured
    against `cosine_topk` in tests).
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("v"),
    ).withColumn("bucket", _sign_bucket(F.col("v")))
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"),
    ).withColumn("bucket", _sign_bucket(F.col("q")))
    scored = corpus.join(F.broadcast(queries), "bucket").withColumn(
        "cos", _cosine(F.col("q"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )
