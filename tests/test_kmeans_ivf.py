"""Trained k-means IVF codebook: convergence, determinism, and the
recall payoff over the untrained (first-N-by-id) seed codebook.

All data is deterministic (seeded testdata + fixed-iteration Lloyd's),
so the bounds are exact, not statistical.
"""

from pyspark.sql import functions as F

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators.similarity import (
    N_CENTROIDS,
    _seed_centroids,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    kmeans_codebook,
)

K = 5
N_QUERIES = 5


def _emb(spark, sf_dir):
    return R.load(spark, sf_dir, "embeddings")


def test_codebook_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb1 = {r.centroid_id: r.c for r in kmeans_codebook(emb).collect()}
    cb2 = {r.centroid_id: r.c for r in kmeans_codebook(emb).collect()}
    assert len(cb1) == N_CENTROIDS
    dim = emb.select(F.size("embedding")).first()[0]
    assert all(len(c) == dim for c in cb1.values())
    # bit-identical across runs (ordered-fold sums, no avg())
    assert cb1 == cb2


def test_training_moves_centroids_and_keeps_all_clusters(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seeds = {r.centroid_id: r.c for r in _seed_centroids(emb).collect()}
    trained = {r.centroid_id: r.c
               for r in kmeans_codebook(emb).collect()}
    assert set(trained) == set(seeds)
    # Lloyd iterations actually move (almost all) centroids off the
    # seed vectors
    moved = sum(1 for cid in seeds if trained[cid] != seeds[cid])
    assert moved >= N_CENTROIDS - 2


def _clustered_embeddings(spark):
    """A corpus with real cluster structure where the seed codebook is
    *misaligned*: 8 well-separated clusters, but vec_id 0..15 (the
    seeds) only come from clusters 0..3 — so the untrained quantizer
    has no centroid near half the data. Deterministic (hash-derived
    perturbations)."""
    import hashlib
    import struct

    dim = 16
    rows = []
    for i in range(240):
        cluster = (i % 4) if i < 16 else (i % 8)
        v = [0.0] * dim
        v[2 * cluster] = 1.0
        v[2 * cluster + 1] = 0.3
        h = hashlib.sha256(f"kmeans-test:{i}".encode()).digest()
        for d in range(dim):
            (u,) = struct.unpack_from("<H", h, (2 * d) % 30)
            v[d] += (u / 65535.0 - 0.5) * 0.1
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>")


def _recall(emb, centroids) -> float:
    truth = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, N_QUERIES, K).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(emb, N_QUERIES, K,
                             centroids=centroids).collect()}
    return len(got & truth) / len(truth)


def _max_list_share(emb, centroids) -> float:
    counts = [r.n for r in ivf_assign(emb, centroids=centroids)
              .groupBy("centroid_id").agg(F.count("*").alias("n"))
              .collect()]
    return max(counts) / sum(counts)


def test_training_fixes_misaligned_codebook(spark):
    """On clustered data whose first-16 vectors miss half the
    clusters, training must strictly improve recall@k vs cosine_topk
    ground truth — the payoff over the untrained codebook (measured:
    0.96 → 1.0). List balance stays bounded (no cluster's mass heaps
    onto one list)."""
    emb = _clustered_embeddings(spark)
    seed = _seed_centroids(emb)
    trained = kmeans_codebook(emb)
    assert _recall(emb, trained) > _recall(emb, seed)
    assert _recall(emb, trained) == 1.0
    # 240 vectors / 16 lists = 0.0625 ideal; trained stays within ~2x
    assert _max_list_share(emb, trained) <= 0.2


def test_recall_on_driver_corpus_stays_high(spark, sf_dir):
    """The driver's embeddings table is structureless (near-random
    vectors), so training can't beat the seed there — but the trained
    codebook must still deliver usable nprobe=2 recall."""
    emb = _emb(spark, sf_dir)
    assert _recall(emb, kmeans_codebook(emb)) >= 0.8


def test_sampled_training_contract(spark):
    """The executable sampling contract (sample_rate_hex): training
    draws corpus AND seeds from the md5-prefix Bernoulli sample, is
    deterministic, and on clustered data still fixes the misaligned
    seed codebook — recall unchanged vs full-corpus training."""
    from credit_ocr_system_spark.operators.similarity import (
        KMEANS_SAMPLE_HEX,
        N_CENTROIDS,
    )

    emb = _clustered_embeddings(spark)
    sampled = kmeans_codebook(emb, sample_rate_hex=KMEANS_SAMPLE_HEX)
    cb1 = {r.centroid_id: r.c for r in sampled.collect()}
    cb2 = {r.centroid_id: r.c
           for r in kmeans_codebook(
               emb, sample_rate_hex=KMEANS_SAMPLE_HEX).collect()}
    assert cb1 == cb2  # bit-identical across runs
    assert len(cb1) == N_CENTROIDS
    # a ~3/4 sample of well-separated clusters keeps the training
    # payoff: at least as good as the untrained seed codebook, and
    # near the full-corpus 1.0 (measured: 0.96 — one borderline
    # neighbor flips when a cluster edge vector is sampled out)
    assert _recall(emb, sampled) >= _recall(emb, _seed_centroids(emb))
    assert _recall(emb, sampled) >= 0.9


def test_semdedup_drops_higher_id_of_near_identical_pair(spark, sf_dir):
    from credit_ocr_system_spark.operators.similarity import semdedup

    emb = _emb(spark, sf_dir)
    # plant an exact duplicate: vec 9001 is a copy of vec 3
    dup = (emb.where(F.col("vec_id") == 3)
           .select(F.lit(9001).alias("vec_id"), "embedding",
                   F.lit("dup").alias("label")))
    out = {r["vec_id"]: r for r in semdedup(emb.unionByName(dup)).collect()}
    assert len(out) == emb.count() + 1        # every vector, once
    # identical vectors share the same nearest centroid; cosine = 1.0
    # >= any threshold, so the higher id is dropped, the lower kept
    assert out[3]["centroid_id"] == out[9001]["centroid_id"]
    assert out[3]["kept"] is True
    assert out[9001]["kept"] is False
    # kept + dropped partition the corpus
    n_kept = sum(1 for r in out.values() if r["kept"])
    assert 0 < n_kept < len(out)
