"""Product quantization (similarity.pq_codebooks / pq_encode / pq_topk).

The oracle-parity suite pins the registered queries bit-for-bit against
DuckDB; these tests pin the operator against an independent pure-Python
reference that replays the same IEEE fold order, and check the training
contracts (dense codes, determinism, sample-train/encode-all).
"""

from credit_ocr_system_spark.operators import relational as R
from credit_ocr_system_spark.operators import similarity as S


def _emb(spark, sf_dir):
    return R.load(spark, sf_dir, "embeddings")


def _fold_l2(a, b):
    # the exact left fold _l2 runs: one double accumulator, in order
    d = 0.0
    for x, y in zip(a, b):
        d += (x - y) * (x - y)
    return d


def _reference_topk(emb_rows, cb_rows, n_queries=5, k=5):
    """Pure-Python PQ encode + ADC, mirroring the operator's ordered
    folds and tie-breaks (argmin → lowest centroid_id, rank ties →
    lowest neighbor_id)."""
    cb = {}
    for r in cb_rows:
        cb[(r["sub"], r["centroid_id"])] = list(r["c"])
    n_subs, n_cent = S.PQ_SUBS, S.PQ_K
    sd = S.PQ_SUBDIM

    def subvec(v, s):
        return v[s * sd:(s + 1) * sd]

    def encode(v):
        codes = []
        for s in range(n_subs):
            best = min(
                ((_fold_l2(subvec(v, s), cb[(s, c)]), c)
                 for c in range(n_cent)))
            codes.append(best[1])
        return codes

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb_rows}
    codes = {vid: encode(v) for vid, v in vecs.items()}
    out = {}
    for q in range(n_queries):
        lut = [[_fold_l2(subvec(vecs[q], s), cb[(s, c)])
                for c in range(n_cent)] for s in range(n_subs)]
        scored = []
        for vid, cd in codes.items():
            a = 0.0
            for s in range(n_subs):
                a += lut[s][cd[s]]
            scored.append((a, vid))
        scored.sort()
        out[q] = [vid for _, vid in scored[:k]]
    return out


def test_codebook_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = S.pq_codebooks(emb, sample_rate_hex=S.PQ_SAMPLE_HEX).toPandas()
    b = S.pq_codebooks(emb, sample_rate_hex=S.PQ_SAMPLE_HEX).toPandas()
    assert len(a) == S.PQ_SUBS * S.PQ_K
    assert sorted(a.centroid_id.unique()) == list(range(S.PQ_K))
    assert sorted(a["sub"].unique()) == list(range(S.PQ_SUBS))
    key = ["sub", "centroid_id"]
    av = a.sort_values(key).c.tolist()
    bv = b.sort_values(key).c.tolist()
    assert [list(x) for x in av] == [list(x) for x in bv]


def test_adc_matches_reference_python(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb = S.pq_codebooks(emb)  # full-corpus training for the reference
    got = S.pq_topk(emb, codebooks=cb).toPandas()
    want = _reference_topk(
        [r.asDict() for r in emb.collect()],
        [r.asDict() for r in cb.collect()])
    for q, ids in want.items():
        rows = got[got.query_id == q].sort_values("rank")
        assert rows.neighbor_id.tolist() == ids, f"query {q}"
        assert rows["rank"].tolist() == list(range(1, len(ids) + 1))


def test_sampled_training_encodes_full_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    n = emb.count()
    enc = S.pq_encode(emb, sample_rate_hex=S.PQ_SAMPLE_HEX).toPandas()
    assert len(enc) == n * S.PQ_SUBS
    assert enc.code.between(0, S.PQ_K - 1).all()
    assert enc.vec_id.nunique() == n


def test_ivfpq_composes_probe_and_adc(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    got = S.ivfpq_topk(emb, pq_sample_hex=S.PQ_SAMPLE_HEX).toPandas()
    # every query ranks itself first: the self-vector's coarse list is
    # by definition probed, and its ADC distance is the global minimum
    firsts = got[got["rank"] == 1].set_index("query_id").neighbor_id
    assert all(firsts[q] == q for q in firsts.index)
    # candidates are bucket-local: every returned neighbor sits in one
    # of its query's nprobe probed coarse lists
    cents = S.kmeans_codebook(emb)
    assign = S.ivf_assign(emb, centroids=cents).toPandas()
    assign = assign.set_index("vec_id").centroid_id
    probes = (S._nearest_centroids(
        emb.where("vec_id < 5").selectExpr(
            "CAST(vec_id AS BIGINT) AS query_id",
            "CAST(embedding AS ARRAY<DOUBLE>) AS q"),
        cents, "query_id", "q", S.N_PROBE)
        .select("query_id", "centroid_id").toPandas())
    probed = probes.groupby("query_id").centroid_id.apply(set)
    for row in got.itertuples():
        assert assign[row.neighbor_id] in probed[row.query_id]
