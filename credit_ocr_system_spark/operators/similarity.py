"""Similarity search over embedding columns (array<float>).

Two paths, as a 100TB pipeline needs both:

* **Brute-force cosine top-k** — the exact baseline. Queries are tiny
  (broadcast side); the corpus streams once; per-partition top-k via a
  window. All arithmetic is JVM-side higher-order functions
  (``zip_with`` + ``aggregate``) in double precision — no UDF.
* **Sign-bucketed (LSH) top-k / near-dup** — the scale path: bucket
  on the sign pattern of seeded full-dimension hyperplane projections
  (multi-table OR-construction for the near-dup path), probe only
  matching buckets. Turns the n×q / n×n cross product into
  bucket-local joins.

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


N_BUCKET_BITS = 4
EMB_DIMS = 64          # testdata embeddings.parquet dimensionality
LSH_SEED = 0x5EEDC0DE  # hyperplane stream seed — a LITERAL, like every
                       # cross-engine constant (see operators/portable)

# Full-corpus paths default to >=16 bits: at 10^12 rows a low fixed bit
# count leaves n/2^bits of the corpus in every bucket and the
# bucket-local self-join goes quadratic again. The corpus-scaled rule
# (n_bits=None) sizes buckets to ~TARGET_BUCKET_SIZE rows.
MIN_CORPUS_BITS = 16
TARGET_BUCKET_SIZE = 256


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


def bucketed_near_dup(embeddings: DataFrame, threshold: float = 0.35,
                      n_bits: int | None = None, n_tables: int = 4,
                      dims: int = EMB_DIMS,
                      seed: int = LSH_SEED) -> DataFrame:
    """Near-duplicate pairs over the FULL corpus, bucket-locally.

    The 100 TB shape of embedding dedup: seeded full-dimension
    hyperplane sign-LSH generates candidates (equi-join on
    (table, bucket) — shuffle is bucket-sized, never n²), and the
    exact cosine verify runs only on candidates. Recall is the
    standard LSH OR-construction 1-(1-p^n_bits)^n_tables — tuned by
    ``n_bits``/``n_tables``, measured against :func:`cosine_near_dup`
    ground truth in ``tests/test_lsh_recall.py`` — and the oracle
    mirrors the identical hyperplane literals exactly. With
    ``n_bits=None`` the bit count is corpus-scaled (one count(), then
    buckets of ~TARGET_BUCKET_SIZE rows, floor MIN_CORPUS_BITS): at
    10^12 rows the bucket-local verify stays linear in n instead of
    quadratic-per-bucket. No nested-loop or cartesian join appears in
    the plan (guarded in ``tests/test_plan_properties.py``).

    Hot-bucket note: byte-identical vectors always share every
    bucket, so a giant exact-duplicate class makes its bucket's pair
    *output* quadratic in the class size — inherent to enumerating
    near-dup PAIRS, not to this plan. At corpus scale run
    ``textops.exact_dedup`` first (hash groupBy collapses identical
    mass to one representative) and near-dup only the survivors —
    the same order the composed curation pipeline uses.
    """
    base = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    if n_bits is None:
        n_bits = _scaled_bits(base.count())
    planes = lsh_hyperplanes(n_tables, n_bits, dims, seed)
    cand = lsh_candidate_pairs(base, "vec_id", "v", planes)
    va = base.select(F.col("vec_id").alias("id_a"),
                     F.col("v").alias("va"))
    vb = base.select(F.col("vec_id").alias("id_b"),
                     F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select(F.col("id_a").alias("vec_a"),
                F.col("id_b").alias("vec_b"),
                _cosine(F.col("va"), F.col("vb")).alias("raw_cos"))
        .where(F.col("raw_cos") >= threshold)
        .select("vec_a", "vec_b",
                pround(F.col("raw_cos"), 6).alias("cos_sim"))
    )


N_CENTROIDS = 16
N_PROBE = 2
KMEANS_ITERS = 3
# training-sample rate for the registered codebook query, as an md5
# hex prefix bound (engine-portable Bernoulli, same mechanism as
# textops.deterministic_sample): "c0000000" keeps ~3/4 of the corpus
KMEANS_SAMPLE_HEX = "c0000000"


def _seed_centroids(embeddings: DataFrame) -> DataFrame:
    """k-means seeds: the first ``N_CENTROIDS`` vectors by vec_id —
    deterministic, so the whole training run is reproducible and
    oracle-checkable. (Also the *untrained* baseline codebook the
    recall tests compare against.)

    orderBy+limit (TakeOrderedAndProject, no global shuffle), NOT
    ``where(vec_id < N)``: the filter form silently yields fewer —
    possibly zero — seeds on sparse or offset vec_ids (re-keyed or
    sharded corpora), and an empty codebook makes every downstream
    IVF/SemDeDup query return empty instead of erroring. The SQL
    oracle has always used ORDER BY/LIMIT; on dense ids the two
    agree, on sparse ids only this form is correct."""
    return (embeddings.select(
        F.col("vec_id").cast("bigint").alias("centroid_id"),
        _as_double(F.col("embedding")).alias("c"))
        .orderBy("centroid_id").limit(N_CENTROIDS))


def kmeans_codebook(embeddings: DataFrame, iters: int = KMEANS_ITERS,
                    sample_rate_hex: str | None = None) -> DataFrame:
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
    That sampling contract is CODE, not prose: pass
    ``sample_rate_hex`` (an md5-prefix Bernoulli bound, the same
    engine-portable mechanism as ``textops.deterministic_sample``)
    and both the training corpus and the seeds are drawn from the
    sample — the fold's list length is rate·n/k, tunable to any
    budget. Seeds under sampling are the first ``N_CENTROIDS``
    *sampled* vectors by vec_id (TakeOrderedAndProject — no global
    shuffle), so training never touches an unsampled row.
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    if sample_rate_hex is not None:
        corpus = corpus.where(
            F.substring(F.md5(F.col("vec_id").cast("string")),
                        1, len(sample_rate_hex)) < sample_rate_hex)
        cents = (corpus.orderBy("vec_id").limit(N_CENTROIDS)
                 .select(F.col("vec_id").alias("centroid_id"),
                         F.col("v").alias("c")))
    else:
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


SEMDEDUP_COS = 0.35


def semdedup(embeddings: DataFrame, threshold: float = SEMDEDUP_COS,
             centroids: DataFrame | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication inside the
    coarse k-means clusters — drop every vector that has a
    lower-id cluster-mate with cosine ≥ ``threshold``, keep the rest.

    The paper's shape exactly: cluster first (the trained
    :func:`kmeans_codebook` quantizer, broadcast argmax assignment —
    map-side), then compare only WITHIN clusters, so the n² semantic
    comparison becomes k cluster-local self-joins on ``centroid_id``.
    Keep-lowest-id is this engine's deterministic stand-in for the
    paper's keep-farthest-from-centroid (a tie-broken rule both
    engines compute identically; the keep policy is orthogonal to the
    candidate structure). Cluster-local self-join scale caveat, same
    as the LSH buckets: cluster population is ~n/k, so k must scale
    with the corpus (codebooks train on a sample at any k —
    ``kmeans_codebook(sample_rate_hex=…)``), and exact dedup runs
    first so identical-vector mass never lands in one cluster.

    Output: (vec_id, centroid_id, kept).
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    cents = centroids if centroids is not None else _centroids(embeddings)
    # assignment feeds both self-join sides and the output — one
    # eager cut, or the codebook training re-runs three times
    assigned = _nearest_centroids(
        corpus, cents, "vec_id", "v", 1).localCheckpoint(eager=True)
    a = assigned.select("centroid_id", F.col("vec_id").alias("id_a"),
                        F.col("v").alias("va"))
    b = assigned.select("centroid_id", F.col("vec_id").alias("id_b"),
                        F.col("v").alias("vb"))
    drops = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(_cosine(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True)))
    return (
        assigned.select("vec_id", "centroid_id")
        .join(drops, "vec_id", "left")
        .select("vec_id", "centroid_id",
                F.col("dropped").isNull().alias("kept"))
    )


def _lcg_doubles(seed: int, n: int) -> list[float]:
    """``n`` exactly-representable doubles in [-1, 1) from a 64-bit
    LCG (Knuth MMIX constants). Every value is a 53-bit integer
    divided by 2^53, scaled by 2 — all exact IEEE operations, so the
    same literals reproduce in any engine (repr round-trips)."""
    mask = (1 << 64) - 1
    state = seed & mask
    out = []
    for _ in range(n):
        state = (state * 6364136223846793005
                 + 1442695040888963407) & mask
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def lsh_hyperplanes(n_tables: int, n_bits: int, dims: int,
                    seed: int = LSH_SEED) -> list[list[list[float]]]:
    """Seeded random hyperplanes for sign-projection LSH:
    ``H[table][bit]`` is a ``dims``-long direction over ALL
    dimensions (not a leading-dim slice). Deterministic by
    construction — both the Spark plan and the SQL oracle embed the
    identical literal doubles, so the bucketing is oracle-checkable
    bit-for-bit."""
    return [
        [_lcg_doubles(seed ^ ((t * 1_000_003 + i) * 0x9E3779B9 + 1),
                      dims)
         for i in range(n_bits)]
        for t in range(n_tables)
    ]


def proj_bucket(vec, planes_t: list[list[float]]):
    """One LSH table's bucket id: bit i = sign(vec · H[i]).

    The dot product is the same left fold as :func:`_dot` — IEEE-exact
    and identical to DuckDB's ``list_dot_product`` (verified
    bit-for-bit in the oracle suite). Works unchanged for
    non-negative feature spaces (histograms): the hyperplane entries
    carry random signs, so the projections split mass without the
    centering hack the old leading-dim bucket needed.
    """
    bucket = F.lit(0).cast("bigint")
    for i, h in enumerate(planes_t):
        dot = _dot(vec, F.array(*[F.lit(x) for x in h]))
        bucket = bucket + F.when(dot >= 0.0,
                                 F.lit(2 ** i).cast("bigint")
                                 ).otherwise(F.lit(0).cast("bigint"))
    return bucket


def proj_bucket_sql(col: str, planes_t: list[list[float]]) -> str:
    """DuckDB mirror of :func:`proj_bucket` — generated from the SAME
    hyperplane literals, so the two expressions cannot drift."""
    terms = []
    for i, h in enumerate(planes_t):
        arr = "[" + ", ".join(repr(x) for x in h) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}, {arr}) >= 0.0 "
            f"THEN {2 ** i} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def _scaled_bits(n_rows: int) -> int:
    """Corpus-scaled bit count: buckets of ~TARGET_BUCKET_SIZE rows,
    never below MIN_CORPUS_BITS. At 10^12 rows this is ~32 bits —
    the bucket-local verify stays O(target²·n/target) = O(n)."""
    import math

    if n_rows <= TARGET_BUCKET_SIZE:
        return MIN_CORPUS_BITS
    return max(MIN_CORPUS_BITS,
               math.ceil(math.log2(n_rows / TARGET_BUCKET_SIZE)))


def lsh_candidate_pairs(base: DataFrame, id_col: str, vec_col: str,
                        planes: list[list[list[float]]]) -> DataFrame:
    """Multi-table OR-construction candidate pairs: a pair is a
    candidate if it collides in ANY table (standard LSH recall
    amplification: P = 1-(1-p^bits)^tables). Each table is an
    equi-join on (table, bucket) — shuffle is bucket-sized, never n²
    — and the union-of-tables is a posexplode + one join, not
    ``n_tables`` plans. Output: distinct (id_a, id_b), id_a < id_b.
    """
    tb = base.select(
        F.col(id_col),
        F.posexplode(F.array(
            *[proj_bucket(F.col(vec_col), pt) for pt in planes]
        )).alias("t", "bucket"))
    a, b = tb.alias("a"), tb.alias("b")
    return (
        a.join(b, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def bucketed_topk(embeddings: DataFrame, n_queries: int = 5,
                  k: int = 5, n_bits: int = N_BUCKET_BITS,
                  dims: int = EMB_DIMS) -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket
    (single-table full-dimension hyperplane projections — same
    machinery as :func:`bucketed_near_dup`).

    The bucket join replaces the full cross product — at 10^12 rows
    each of the 2^N buckets is scanned only by queries that land in
    it. Recall is approximate by construction (documented, measured
    against `cosine_topk` in tests).
    """
    planes_t = lsh_hyperplanes(1, n_bits, dims)[0]
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("v"),
    ).withColumn("bucket", proj_bucket(F.col("v"), planes_t))
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        _as_double(F.col("embedding")).alias("q"),
    ).withColumn("bucket", proj_bucket(F.col("q"), planes_t))
    scored = corpus.join(F.broadcast(queries), "bucket").withColumn(
        "cos", _cosine(F.col("q"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"))
    )


# --- product quantization (Jégou et al. 2011, "Product Quantization for
# --- Nearest Neighbor Search"): IVF-PQ's fine quantizer ------------------

PQ_SUBS = 8                    # M subspaces
PQ_SUBDIM = EMB_DIMS // PQ_SUBS
PQ_K = 16                      # centroids per subspace (4-bit codes)
PQ_ITERS = 2
# training-sample rate for the registered queries, as an md5 hex-prefix
# bound (the same engine-portable Bernoulli as KMEANS_SAMPLE_HEX)
PQ_SAMPLE_HEX = "c0000000"


def _l2(a, b):
    """Squared L2 distance as an ordered left fold over the dimensions
    (``zip_with`` then ``aggregate``): the identical IEEE operation
    sequence runs as ``list_reduce`` over ``generate_series`` in the
    DuckDB oracle, so distances land bit-for-bit in both engines.
    PQ is an L2 construction (the subspace distances must ADD UP to
    the full-space distance — true for squared L2 and inner product,
    false for cosine), hence L2 here while the IVF coarse stage keeps
    its cosine contract."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _subvectors(vectors: DataFrame, carry: tuple = ()) -> DataFrame:
    """(vec_id, [carry...], sub, sv): the ``PQ_SUBS`` disjoint
    ``PQ_SUBDIM``-dim slices of every vector — PQ's decomposition of
    the space into a Cartesian product of small spaces. One
    ``posexplode`` per vector, map-side. ``carry`` names extra
    columns to keep alongside (e.g. the coarse centroid id in
    :func:`ivfpq_topk`)."""
    return vectors.select(
        "vec_id", *carry,
        F.posexplode(F.array(*[
            F.slice(F.col("v"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
            for s in range(PQ_SUBS)])).alias("sub", "sv"))


def _pq_assign(sv: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest PQ centroid per (vector, subspace): broadcast the tiny
    codebook (PQ_SUBS × PQ_K rows), equi-join on ``sub``, argmin L2
    with (d asc, centroid_id asc) tie-break. Map-side at any corpus
    size — the shuffle is only the per-(vec_id, sub) top-1 window."""
    scored = sv.join(F.broadcast(cb), "sub").withColumn(
        "d", _l2(F.col("sv"), F.col("c")))
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("d"), F.asc("centroid_id"))
    return (scored.withColumn("prn", F.row_number().over(w))
            .where(F.col("prn") == 1).drop("c", "d", "prn"))


def pq_codebooks(embeddings: DataFrame, iters: int = PQ_ITERS,
                 sample_rate_hex: str | None = None) -> DataFrame:
    """Trained PQ codebooks: fixed-iteration Lloyd's k-means run in
    ALL ``PQ_SUBS`` subspaces simultaneously as one DataFrame loop.
    Output: (sub, centroid_id, c array<double>).

    Same determinism discipline as :func:`kmeans_codebook` — seeds are
    the first ``PQ_K`` vectors' subvectors, assignment ties break on
    centroid_id, centroid updates are ORDERED left folds by vec_id,
    empty clusters keep their previous centroid, and the sampling
    contract is executable (``sample_rate_hex``; seeds under sampling
    are the first PQ_K *sampled* vectors). The subspace dimension is
    just another grouping key, so training M codebooks costs one plan,
    not M — and the per-(sub, centroid, dim) fold list is rate·n/K
    values, bounded by the same sample argument as the coarse
    quantizer. Lineage is cut per Lloyd round.
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    if sample_rate_hex is not None:
        corpus = corpus.where(
            F.substring(F.md5(F.col("vec_id").cast("string")),
                        1, len(sample_rate_hex)) < sample_rate_hex)
    seeds = corpus.orderBy("vec_id").limit(PQ_K)
    # codes must be the DENSE range 0..PQ_K-1 (they index the ADC
    # lookup table), so seed centroid ids are renumbered by vec_id
    # rank, not taken from the (sampled, possibly gappy) vec_ids.
    # The window is global but runs on PQ_K rows post-limit.
    seeds = seeds.withColumn(
        "centroid_id",
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("bigint"))
    sv = _subvectors(corpus)
    cb = seeds.select(
        "centroid_id",
        F.posexplode(F.array(*[
            F.slice(F.col("v"), s * PQ_SUBDIM + 1, PQ_SUBDIM)
            for s in range(PQ_SUBS)])).alias("sub", "c")
    ).select("sub", "centroid_id", "c")
    for _ in range(iters):
        assigned = _pq_assign(sv, cb)
        dims = assigned.select(
            "sub", "centroid_id", "vec_id",
            F.posexplode("sv").alias("pos", "val"))
        sums = dims.groupBy("sub", "centroid_id", "pos").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                F.lit(0.0), lambda acc, s: acc + s["val"]).alias("s"),
            F.count("*").alias("n"))
        means = (sums.withColumn("m", F.col("s") / F.col("n"))
                 .groupBy("sub", "centroid_id")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "m"))),
                     lambda st: st["m"]).alias("c_new")))
        cb = (cb.join(F.broadcast(means), ["sub", "centroid_id"], "left")
              .select("sub", "centroid_id",
                      F.coalesce("c_new", "c").alias("c"))
              .localCheckpoint(eager=True))
    return cb


def pq_encode(embeddings: DataFrame,
              codebooks: DataFrame | None = None,
              sample_rate_hex: str | None = None) -> DataFrame:
    """PQ encoding of the FULL corpus: every vector → its per-subspace
    code. Output: (vec_id, sub, code).

    This is the 100 TB memory story of PQ: a 64-dim float64 vector
    (512 bytes) compresses to PQ_SUBS 4-bit codes (4 bytes, 128×),
    so a 10^12-row index fits where raw vectors cannot. Encoding is
    a broadcast argmin — map-side, no shuffle beyond the top-1
    window; the codebook trains on a sample (``sample_rate_hex``)
    while encoding always covers every row.
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    cb = (codebooks if codebooks is not None
          else pq_codebooks(embeddings, sample_rate_hex=sample_rate_hex))
    return _pq_assign(_subvectors(corpus), cb).select(
        "vec_id", "sub", F.col("centroid_id").alias("code"))


def _adc_luts(queries: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-query ADC lookup tables: (query_id, luts) where
    ``luts[sub][centroid]`` is the exact squared-L2 distance from the
    query's ``sub``-th subvector to that codebook centroid. One tiny
    row per query (PQ_SUBS x PQ_K doubles) — the broadcast side of
    every ADC scoring join. ``queries`` must carry (vec_id, v)."""
    lut = (_subvectors(queries)
           .join(F.broadcast(cb), "sub")
           .select(F.col("vec_id").alias("query_id"), "sub",
                   "centroid_id",
                   _l2(F.col("sv"), F.col("c")).alias("d")))
    lut_sub = lut.groupBy("query_id", "sub").agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("centroid_id", "d"))), lambda s: s["d"]).alias("row"))
    return lut_sub.groupBy("query_id").agg(
        F.transform(F.array_sort(F.collect_list(F.struct("sub", "row"))),
                    lambda s: s["row"]).alias("luts"))


def _adc_fold():
    """The ADC distance fold: Σ_sub luts[sub][codes[sub]] — ordered,
    +1 for 1-based element_at, int casts pinned. ONE definition shared
    by pq_topk and ivfpq_topk so a tie-break or index-cast change can
    never desynchronize the two (both oracles mirror this exact
    fold). A function, not a module constant: Columns need an active
    session."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_SUBS - 1)), F.lit(0.0),
        lambda acc, s: acc + F.element_at(
            F.element_at(F.col("luts"), (s + 1).cast("int")),
            (F.element_at(F.col("codes"), (s + 1).cast("int")) + 1)
            .cast("int")))


def _adc_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared ADC tail: fold the distance, rank per query (ties on
    neighbor_id), keep the top k."""
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id"))
    return (scored.withColumn("adist", _adc_fold())
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.col("rank").cast("int")))


def pq_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5,
            codebooks: DataFrame | None = None,
            sample_rate_hex: str | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes. Output:
    (query_id, neighbor_id, rank) — rank by approximate squared L2,
    ties on neighbor_id.

    The ADC shape that makes PQ scale: each query precomputes a
    PQ_SUBS × PQ_K lookup table of exact subspace distances to every
    codebook centroid (tiny — one broadcast row per query, nested
    ``luts[sub][centroid]`` arrays), and a corpus row's distance is
    the ordered fold ``Σ_sub luts[sub][code]`` — pure per-row array
    indexing over the packed code vector. The corpus never touches
    query vectors, never recomputes a distance, and never shuffles
    for scoring; the only shuffle is the final per-query top-k
    window. The same fold runs as ``list_reduce`` over
    ``list(d ORDER BY sub)`` in the oracle, bit-identically.
    """
    cb = (codebooks if codebooks is not None
          else pq_codebooks(embeddings, sample_rate_hex=sample_rate_hex))
    codes = pq_encode(embeddings, codebooks=cb)
    codes_wide = codes.groupBy(F.col("vec_id").alias("neighbor_id")).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("sub", "code"))),
                    lambda s: s["code"]).alias("codes"))
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    scored = codes_wide.join(F.broadcast(_adc_luts(queries, cb)))
    return _adc_topk(scored, k)


def ivfpq_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5,
               nprobe: int = N_PROBE,
               centroids: DataFrame | None = None,
               codebooks: DataFrame | None = None,
               pq_sample_hex: str | None = None) -> DataFrame:
    """IVF-PQ (Jégou et al. 2011 §IV): the composed trillion-row ANN
    query — coarse inverted-list probe, then PQ asymmetric-distance
    re-scoring INSIDE the probed lists only. Output:
    (query_id, neighbor_id, rank), approximate-L2 order, ties on
    neighbor_id.

    The plan is the deployment shape end to end:

    * one corpus pass computes BOTH the coarse assignment (broadcast
      argmax against the trained :func:`kmeans_codebook`) and the PQ
      codes (broadcast argmin against :func:`pq_codebooks`) — at
      deployment this pass is the index build, stored partitioned by
      ``centroid_id`` with 4-bit codes instead of raw vectors;
    * queries probe their ``nprobe`` nearest coarse lists
      (q×nprobe rows, BROADCAST) — the corpus-side join on
      ``centroid_id`` is bucket-local, so only ~nprobe/k_coarse of
      the corpus is ever scored per query;
    * scoring joins the query's broadcast 8×16 ADC lookup table and
      folds over the packed code array — per-row array indexing, no
      vector arithmetic, no shuffle beyond the final top-k window.

    Every stage is deterministic (trained quantizers with ordered
    folds, tie-broken argmins), so the whole composition is
    oracle-checked bit-for-bit.
    """
    cents = centroids if centroids is not None else _centroids(embeddings)
    cb = (codebooks if codebooks is not None
          else pq_codebooks(embeddings, sample_rate_hex=pq_sample_hex))
    corpus = embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    assigned = _nearest_centroids(corpus, cents, "vec_id", "v", 1)
    codes = _pq_assign(
        _subvectors(assigned, carry=("centroid_id",))
        .withColumnRenamed("centroid_id", "coarse_id"), cb)
    codes_wide = codes.groupBy(
        F.col("vec_id").alias("neighbor_id"),
        F.col("coarse_id").alias("centroid_id")).agg(
        F.transform(F.array_sort(F.collect_list(F.struct(
            "sub", F.col("centroid_id").alias("code")))),
            lambda s: s["code"]).alias("codes"))
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("v"))
    probes = _nearest_centroids(
        queries.select(F.col("vec_id").alias("query_id"),
                       F.col("v").alias("q")),
        cents, "query_id", "q", nprobe).select("query_id", "centroid_id")
    scored = (codes_wide
              .join(F.broadcast(probes), "centroid_id")
              .join(F.broadcast(_adc_luts(queries, cb)), "query_id"))
    return _adc_topk(scored, k)
