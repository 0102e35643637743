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
KMEANS_ITERS = 3


def _seed_centroids(embeddings: DataFrame) -> DataFrame:
    """k-means seeds: the first ``N_CENTROIDS`` vectors by vec_id —
    deterministic, so the whole training run is reproducible and
    oracle-checkable. (Also the *untrained* baseline codebook the
    recall tests compare against.)"""
    return embeddings.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("bigint").alias("centroid_id"),
        _as_double(F.col("embedding")).alias("c"))


def kmeans_codebook(embeddings: DataFrame, iters: int = KMEANS_ITERS
                    ) -> DataFrame:
    """Trained IVF coarse quantizer: fixed-iteration Lloyd's k-means
    as DataFrame operations. Output: (centroid_id, c array<double>).

    Deterministic by construction — the property that makes it
    oracle-checkable bit-for-bit:

    * seeds are the first ``N_CENTROIDS`` vectors by vec_id;
    * assignment is argmax cosine with (desc cos, asc centroid_id)
      tie-break — a broadcast join + windowed top-1, map-side at
      scale;
    * the centroid update sums each dimension by an ORDERED left fold
      over ``vec_id`` (``array_sort(collect_list(struct))`` +
      ``aggregate``): float addition isn't associative, so an
      unordered ``avg()`` would differ run-to-run and engine-to-engine
      at the ulp level — and a ulp on a centroid can flip an
      assignment. The ordered fold gives the identical IEEE sum in
      any engine;
    * clusters that lose all members keep their previous centroid.

    Scale note: the per-(centroid, dim) ordered fold materializes the
    member values of one centroid dimension as a list — fine for
    codebook training, which at 10^12 rows runs on a sample anyway
    (training a 16-entry codebook on the full corpus buys nothing).
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    cents = _seed_centroids(embeddings)
    for _ in range(iters):
        assigned = _nearest_centroids(corpus, cents, "vec_id", "v", 1)
        dims = assigned.select(
            "centroid_id", "vec_id",
            F.posexplode("v").alias("pos", "val"))
        sums = dims.groupBy("centroid_id", "pos").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                F.lit(0.0),
                lambda acc, s: acc + s["val"]).alias("s"),
            F.count("*").alias("n"))
        means = (
            sums
            .withColumn("m", F.col("s") / F.col("n"))
            .groupBy("centroid_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda st: st["m"]).alias("c_new")))
        # codebook-sized (N_CENTROIDS rows) join: always broadcast —
        # Catalyst can't size an aggregate-of-aggregate subtree and
        # would fall back to a sort-merge join
        # lineage cut per Lloyd round (same discipline as the CC loop
        # and candidate_pagerank): the codebook is N_CENTROIDS rows, but
        # without the cut every round — and every DOWNSTREAM use
        # (ivf_assign's corpus pass, ivf_topk's probe side) — re-embeds
        # and re-RUNS the full prior-round assignment subtree
        cents = (
            cents.join(F.broadcast(means), "centroid_id", "left")
            .select("centroid_id",
                    F.coalesce("c_new", "c").alias("c"))
            .localCheckpoint(eager=True))
    return cents


def _centroids(embeddings: DataFrame) -> DataFrame:
    """The codebook IVF partitions on — the trained k-means quantizer."""
    return kmeans_codebook(embeddings)


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


def ivf_assign(embeddings: DataFrame,
               centroids: DataFrame | None = None) -> DataFrame:
    """IVF coarse assignment: every vector → its nearest centroid.

    Output: (vec_id, centroid_id). At scale this column becomes the
    partition/bucket key the corpus is repartitioned and stored by
    (one inverted list per centroid). The codebook defaults to the
    trained k-means quantizer (:func:`kmeans_codebook`).
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    cents = centroids if centroids is not None else _centroids(embeddings)
    return _nearest_centroids(
        corpus, cents, "vec_id", "v", 1
    ).select("vec_id", "centroid_id")


def ivf_topk(embeddings: DataFrame, n_queries: int = 5,
             k: int = 5, nprobe: int = N_PROBE,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: probe the query's ``nprobe`` nearest
    inverted lists only.

    Corpus vectors carry their coarse assignment (ivf_assign); each
    query scores only vectors in its top-``nprobe`` centroid buckets.
    The candidate join is bucket-local (equi-join on centroid_id with
    the tiny probe side broadcast) — the n×q cross product never
    materializes. Output: (query_id, neighbor_id, rank).
    """
    cents = centroids if centroids is not None else _centroids(embeddings)
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
