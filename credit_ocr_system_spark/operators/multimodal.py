"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100TB training-data pipeline carries media the same way this engine
carries page payloads: an opaque ``binary`` column plus a typed
metadata struct, processed by Arrow-batched iterator UDFs. This module
provides the full Spark-side plumbing — schemas, deterministic
synthetic media source, feature extraction, image resize, video frame
sampling (1→N explode) — with the *codec* behind a seam:

* ``decode_media`` really decodes PNG / BMP / WAV / JPEG (baseline
  progressive, and arithmetic, 4:4:4 and 4:2:0/4:2:2) / MJPEG-AVI payloads via
  the codecs in ``kernel/codecs.py`` + ``kernel/jpeg.py`` (zlib
  inflate + scanline unfilter, DIB row handling, PCM scaling,
  huffman + IDCT, RIFF walk); out-of-scope variants (MP4/H.264) raise
  ``NotImplementedError`` — no PIL/pyav in this container, by
  design, and they swap in at this same seam;
* ``fake_decode`` is the deterministic stand-in used by default for
  the opaque synthetic payloads: it derives a numpy array purely from
  the payload bytes + metadata, so every downstream
  shape/partitioning/batching behavior is real and testable while the
  codec is swappable.

Scale notes: media payloads are the memory bound, not row counts —
same Arrow-batch sizing rule as the page kernel. Frame sampling emits
1→N rows inside the UDF iterator (no explode of a materialized
array of frames, which would hold all frames of a batch in memory).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, "
    "mime:string>"
)

_KINDS = ("image", "audio", "video")
_MAGIC = {"image": b"\x89PNG\r\n", "audio": b"RIFF", "video": b"FTYP"}
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def gen_media_rows(n: int, seed: int = 42) -> list[dict]:
    """Deterministic synthetic media rows (pure function of seed+id).

    ~18% of rows past the first 20 are byte-exact duplicates of an
    earlier row (fresh media_id, same kind/payload/meta) — the
    duplication structure a web-scale media corpus has, so the media
    near-dup operators have real positives to find.
    """
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        if i >= 20 and h[7] < 46:          # ≈18% duplicate rate
            src = rows[i - 1 - (h[6] % 20)]
            rows.append({"media_id": i, "kind": src["kind"],
                         "payload": src["payload"],
                         "meta": dict(src["meta"])})
            continue
        kind = _KINDS[h[0] % 3]
        size = 256 + (h[1] << 4)
        # payload = magic + repeated digest: opaque, deterministic bytes
        body = (h * (size // len(h) + 1))[:size]
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": _MAGIC[kind] + body,
            "meta": {
                "width": 16 + h[2] % 64 if kind != "audio" else None,
                "height": 16 + h[3] % 64 if kind != "audio" else None,
                "sample_rate": 8000 + h[4] * 64 if kind == "audio" else None,
                # audio has no frames — None, the same metadata
                # contract as gen_real_media_rows, so fake and real
                # corpora stay interchangeable at the meta level
                "n_frames": 1 if kind == "image"
                            else (8 + h[5] % 24 if kind == "video"
                                  else None),
                "mime": _MIME[kind],
            },
        })
    return rows


def media_df(spark, n: int, seed: int = 42,
             partitions: int = 8) -> DataFrame:
    return spark.createDataFrame(
        gen_media_rows(n, seed), schema=MEDIA_SCHEMA
    ).repartition(partitions, "media_id")


def gen_real_media_rows(n: int, seed: int = 42) -> list[dict]:
    """Deterministic synthetic media rows with REAL payloads: actual
    PNG (row filters cycling 0..4, a third Adam7-interlaced), BMP,
    JPEG (baseline and progressive, 4:4:4/4:2:0, restart intervals —
    ``kernel/jpeg.py``), WAV (16/24-bit PCM and IEEE float32), and
    Motion-JPEG video in BOTH real containers (RIFF/AVI and
    ISO-BMFF/MP4), so the decode path exercised is the real
    zlib-inflate/unfilter/entropy-decode/PCM-scale/container-walk
    one, not the stand-in. Pixel and sample content derives purely
    from seed+id; the same ~18% duplicate structure as
    ``gen_media_rows`` feeds the near-dup operators.
    """
    from ..kernel import codecs
    from ..kernel.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:real:{i}".encode()).digest()
        if i >= 20 and h[7] < 46:          # ≈18% duplicate rate
            src = rows[i - 1 - (h[6] % 20)]
            rows.append({"media_id": i, "kind": src["kind"],
                         "payload": src["payload"],
                         "meta": dict(src["meta"])})
            continue
        fmt = ("png", "bmp", "wav", "jpeg", "avi")[h[0] % 5]
        if fmt == "avi":
            w, ht = 8 + h[2] % 9, 8 + h[3] % 9
            n_frames = 3 + h[5] % 4
            need = n_frames * ht * w * 3
            body = np.frombuffer(
                (h * (need // len(h) + 1))[:need], dtype=np.uint8)
            frames = body.reshape(n_frames, ht, w, 3)
            # half the videos arrive in each real container — RIFF/AVI
            # and ISO-BMFF/MP4 — carrying the same Motion-JPEG samples
            encode = (codecs.encode_mp4_mjpeg if h[12] % 2
                      else codecs.encode_avi_mjpeg)
            rows.append({
                "media_id": i, "kind": "video",
                "payload": encode(frames, quality=85 + h[4] % 15),
                "meta": {"width": w, "height": ht, "sample_rate": None,
                         "n_frames": n_frames,
                         "mime": "video/mp4" if h[12] % 2
                         else "video/avi"},
            })
        elif fmt in ("png", "bmp", "jpeg"):
            w, ht = 8 + h[2] % 25, 8 + h[3] % 25
            need = ht * w * 3
            body = np.frombuffer(
                (h * (need // len(h) + 1))[:need], dtype=np.uint8)
            px = body.reshape(ht, w, 3)
            payload = (
                # a third of the PNGs interlace (Adam7)
                codecs.encode_png(px, interlace=h[8] % 3 == 0)
                if fmt == "png"
                else codecs.encode_bmp(px) if fmt == "bmp"
                else encode_jpeg(
                    px, quality=85 + h[4] % 15,
                    # half the real JPEGs use the dominant
                    # real-world 4:2:0 chroma layout
                    subsampling="420" if h[1] % 2 else "444",
                    # and most web JPEGs are progressive
                    progressive=h[9] % 2 == 0,
                    restart_interval=(h[10] % 3) or 0,
                    # a slice of the baseline ones use the scanner-
                    # style one-scan-per-component layout
                    scan_split="per_component"
                    if h[9] % 2 and h[11] % 4 == 0
                    else "interleaved",
                    # and another slice arrives arithmetic-coded
                    # (SOF9, kernel/jpeg_arith.py — the r4 seam)
                    arithmetic=bool(h[9] % 2 and h[11] % 4 == 1)))
            rows.append({
                "media_id": i, "kind": "image", "payload": payload,
                "meta": {"width": w, "height": ht, "sample_rate": None,
                         "n_frames": 1, "mime": f"image/{fmt}"},
            })
        else:
            rate = 8000 + h[4] * 16
            n_samp = 200 + h[5] * 4
            body = np.frombuffer(
                (h * (n_samp // len(h) + 1))[:n_samp], dtype=np.uint8)
            samples = (body.astype(np.float32) - 127.5) / 127.5
            rows.append({
                "media_id": i, "kind": "audio",
                "payload": codecs.encode_wav(
                    samples, rate,
                    sample_format=("pcm16", "pcm24",
                                   "float32")[h[8] % 3]),
                "meta": {"width": None, "height": None,
                         "sample_rate": rate, "n_frames": None,
                         "mime": "audio/wav"},
            })
    return rows


def real_media_df(spark, n: int, seed: int = 42,
                  partitions: int = 8) -> DataFrame:
    return spark.createDataFrame(
        gen_real_media_rows(n, seed), schema=MEDIA_SCHEMA
    ).repartition(partitions, "media_id")


def decode_media(payload: bytes, kind: str, meta: dict) -> np.ndarray:
    """Real codec dispatch — honest decoders where they exist.

    PNG / BMP / WAV / baseline-JPEG / Motion-JPEG video (RIFF/AVI
    and ISO-BMFF/MP4 containers, sniffed by magic bytes) decode for
    real via ``kernel/codecs.py`` + ``kernel/jpeg.py`` —
    zlib-inflated, unfiltered, huffman/IDCT-reconstructed,
    PCM-scaled actual bytes, not a stand-in (the reference consumes
    media through PIL, ``/root/reference/src/ocr/easyocr_client.py:
    17-58``; these return the same ``(h, w, 3) uint8`` /
    float32-sample / ``(n, h, w, 3) uint8`` ndarrays). Arithmetic-
    coded JPEG (SOF9) decodes for real too (``kernel/jpeg_arith.py``,
    libjpeg-conformance-tested). The remaining out-of-scope variants
    (H.264/HEVC sample entries, non-MJPEG AVI streams) still raise
    with the codec named; a cluster with pyav swaps them in at this
    same seam.
    ``fake_decode`` remains the deterministic stand-in for the opaque
    synthetic payloads.
    """
    from ..kernel import codecs

    fmt = codecs.sniff_format(payload)
    if fmt in ("png", "bmp", "jpeg"):
        return codecs.decode_image_rgb(payload)
    if fmt == "wav":
        samples, _rate = codecs.decode_wav(payload)
        return samples
    if fmt == "avi":
        return codecs.decode_avi_mjpeg(payload)
    if fmt == "mp4":
        return codecs.decode_mp4_mjpeg(payload)
    raise NotImplementedError(
        f"real {kind} decode: no stdlib codec for this payload "
        "(H.264/HEVC need pyav); use fake_decode for the "
        "deterministic test path")


def fake_decode(payload: bytes, kind: str, meta: dict) -> np.ndarray:
    """Deterministic stand-in decode: bytes → typed ndarray.

    Shapes mirror real decodes — image: (h, w, 3) uint8; audio:
    (samples,) float32 in [-1, 1]; video: (frames, h, w, 3) uint8 —
    derived entirely from the payload so tests are reproducible.
    """
    body = np.frombuffer(payload, dtype=np.uint8)
    if kind == "image":
        w, h = meta["width"], meta["height"]
        need = h * w * 3
        px = np.resize(body, need).reshape(h, w, 3)
        return px
    if kind == "audio":
        samples = min(len(body) * 4, 4096)
        wave = np.resize(body, samples).astype(np.float32)
        return (wave - 127.5) / 127.5
    if kind == "video":
        w, h, n = meta["width"], meta["height"], meta["n_frames"]
        need = n * h * w * 3
        return np.resize(body, need).reshape(n, h, w, 3)
    raise ValueError(f"unknown media kind: {kind}")


MEDIA_FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "feat array<float>, feat_json string, mean_val double, "
    "std_val double, width int, height int, n_frames int"
)

_PA_FEATURES = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("n_bytes", pa.int64()),
    ("feat", pa.list_(pa.float32())),
    ("feat_json", pa.string()),
    ("mean_val", pa.float64()),
    ("std_val", pa.float64()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])

N_FEAT = 16


def media_feature_row(r: dict, decode=fake_decode) -> dict:
    """Feature row for one media record — pure function, shared by the
    Spark UDF and the driver-side golden materialization
    (``oracle_golden.py``) so both compute byte-identical values.

    ``decode`` selects the codec: ``fake_decode`` (default, opaque
    synthetic payloads) or ``decode_media`` (real PNG/BMP/WAV bytes).

    ``feat_json`` is the driver-contract serialization of the feature
    vector: raw arrays are banned in oracle-checked outputs (engines
    stringify/sort them differently — ``operators/relational.py``
    rule), so the vector is serialized in Python where the formatting
    is single-sourced.
    """
    arr = decode(r["payload"], r["kind"], r["meta"])
    flat = arr.astype(np.float64).ravel()
    # 16-bin byte histogram as the embedding-ish feature
    hist, _ = np.histogram(flat, bins=N_FEAT)
    denom = max(float(flat.size), 1.0)
    feat = (hist / denom).astype(np.float32).tolist()
    return {
        "media_id": r["media_id"],
        "kind": r["kind"],
        "n_bytes": len(r["payload"]),
        "feat": feat,
        "feat_json": json.dumps(feat),
        "mean_val": float(flat.mean()),
        "std_val": float(flat.std()),
        "width": r["meta"]["width"],
        "height": r["meta"]["height"],
        "n_frames": r["meta"]["n_frames"],
    }


def _features_batches(decode):
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = [media_feature_row(r, decode)
                    for r in batch.to_pylist()]
            yield pa.RecordBatch.from_pylist(rows, schema=_PA_FEATURES)

    return run


def extract_media_features(media: DataFrame,
                           decode=fake_decode) -> DataFrame:
    """Arrow-batched feature extraction over the decode seam.

    Pass ``decode=decode_media`` to run the real stdlib codecs
    (PNG/BMP/WAV) instead of the deterministic stand-in.
    """
    return media.mapInArrow(_features_batches(decode),
                            schema=MEDIA_FEATURES_SCHEMA)


FRAMES_SCHEMA = ("media_id bigint, frame_idx int, frame binary, "
                 "width int, height int")

_PA_FRAMES = pa.schema([
    ("media_id", pa.int64()),
    ("frame_idx", pa.int32()),
    ("frame", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def video_frame_rows(r: dict, every_n: int,
                     decode=fake_decode) -> list[dict]:
    """Sampled frames for one media record — pure function, shared by
    the Spark UDF and the golden materialization. ``decode``
    selects the codec (``decode_media`` for real MJPEG-AVI bytes).
    Frame geometry comes from the DECODED array, not the metadata —
    the bytes are the truth."""
    if r["kind"] != "video":
        return []
    vid = decode(r["payload"], "video", r["meta"])
    return [
        {
            "media_id": r["media_id"],
            "frame_idx": idx,
            "frame": vid[idx].tobytes(),
            "width": int(vid.shape[2]),
            "height": int(vid.shape[1]),
        }
        for idx in range(0, vid.shape[0], every_n)
    ]


def _frame_batches(every_n: int, decode):
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = []
            for r in batch.to_pylist():
                rows.extend(video_frame_rows(r, every_n, decode))
            yield pa.RecordBatch.from_pylist(rows, schema=_PA_FRAMES)

    return run


def sample_video_frames(media: DataFrame, every_n: int = 4,
                        decode=fake_decode) -> DataFrame:
    """1→N frame sampling inside the UDF iterator (no giant arrays)."""
    return media.mapInArrow(_frame_batches(every_n, decode),
                            schema=FRAMES_SCHEMA)


def resized_image_row(r: dict, out_w: int, out_h: int,
                      decode=fake_decode) -> dict | None:
    """Nearest-neighbour resize for one media record — pure function,
    shared by the Spark UDF and the golden materialization. ``decode``
    is the seam, like every sibling operator: pass ``decode_media``
    to resize real PNG/BMP/JPEG payloads (the default fake decode is
    for the opaque synthetic corpus and would otherwise reinterpret
    compressed bytes as pixels)."""
    if r["kind"] != "image":
        return None
    img = decode(r["payload"], "image", r["meta"])
    ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
    xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
    small = img[ys][:, xs]
    return {"media_id": r["media_id"], "width": out_w,
            "height": out_h, "pixels": small.tobytes()}


def resize_images(media: DataFrame, out_w: int = 8,
                  out_h: int = 8, decode=fake_decode) -> DataFrame:
    """Nearest-neighbour image resize through the decode seam."""
    schema = ("media_id bigint, width int, height int, pixels binary")
    pa_schema = pa.schema([
        ("media_id", pa.int64()), ("width", pa.int32()),
        ("height", pa.int32()), ("pixels", pa.binary()),
    ])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            rows = [row for r in batch.to_pylist()
                    if (row := resized_image_row(r, out_w, out_h,
                                                 decode=decode))]
            yield pa.RecordBatch.from_pylist(rows, schema=pa_schema)

    return media.mapInArrow(run, schema=schema)


MEDIA_NEAR_DUP_THRESHOLD = 0.9999

# Seeded full-dimension hyperplane sign-LSH over the 16-bin feature
# histograms. The hyperplane entries carry random signs, so the
# projections split the non-negative histogram space without the old
# fixed-center hack, and byte-identical payloads (identical features)
# always share every table's bucket — candidate pruning stays lossless
# for exact duplicates. Distinct seed from the embedding path so the
# two operator families never share hyperplanes.
MEDIA_BUCKET_BITS = 8
MEDIA_LSH_TABLES = 2
MEDIA_LSH_SEED = 0x3ED1A5EED


def media_lsh_planes() -> list:
    from .similarity import lsh_hyperplanes

    return lsh_hyperplanes(MEDIA_LSH_TABLES, MEDIA_BUCKET_BITS,
                           N_FEAT, seed=MEDIA_LSH_SEED)


def media_near_dup(media: DataFrame,
                   threshold: float = MEDIA_NEAR_DUP_THRESHOLD
                   ) -> DataFrame:
    """Media near-duplicate pairs: embedding-cosine over the extracted
    feature vectors — multimodal wired into the dedup stack.

    Exact-duplicate payloads score cosine 1.0; unrelated media of the
    same kind sit well below (16-bin histograms of pseudo-random bytes
    are near-uniform but differ at the percent level; measured max
    non-dup cosine ≈ 0.9533 on the seeded corpus), so the default
    threshold separates with a wide margin.

    Scale shape: candidates come from the multi-table hyperplane
    sign-LSH (equi-join on (table, bucket) — never an all-pairs
    nested loop; plan-guarded), and the exact cosine verify runs only
    on candidates. Pruning is *lossless for the pairs this operator
    exists to find*: a byte-exact duplicate has the identical feature
    vector, hence identical buckets in every table. The oracle
    mirrors the identical hyperplane literals.
    """
    from .portable import pround
    from .similarity import _cosine, lsh_candidate_pairs

    # three consumers below (bucketing + both verify sides) — cut the
    # lineage so the Arrow decode kernel runs once, not per branch
    feats = extract_media_features(media).select(
        "media_id", F.col("feat").cast("array<double>").alias("v"),
    ).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(feats, "media_id", "v",
                               media_lsh_planes())
    va = feats.select(F.col("media_id").alias("id_a"),
                      F.col("v").alias("va"))
    vb = feats.select(F.col("media_id").alias("id_b"),
                      F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select(F.col("id_a").alias("media_a"),
                F.col("id_b").alias("media_b"),
                _cosine(F.col("va"), F.col("vb")).alias("raw"))
        .where(F.col("raw") >= threshold)
        .select("media_a", "media_b",
                pround(F.col("raw"), 6).alias("cos_sim"))
    )
