"""Multimodal plumbing: schemas, determinism, batching, 1→N explode."""

import numpy as np
import pytest

from credit_ocr_system_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    fake_decode,
    gen_media_rows,
    media_df,
    resize_images,
    sample_video_frames,
)

N = 120


def test_real_decode_rejects_non_stdlib_formats():
    # the opaque synthetic payloads are not PNG/BMP/WAV — the real
    # decoder refuses them honestly (entropy-coded formats need
    # PIL/pyav at the same seam); real formats are covered in
    # tests/test_codecs.py
    rows = gen_media_rows(3)
    with pytest.raises(NotImplementedError):
        decode_media(rows[0]["payload"], rows[0]["kind"], rows[0]["meta"])


def test_generation_is_deterministic_and_mixed():
    a = gen_media_rows(N)
    b = gen_media_rows(N)
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_fake_decode_shapes():
    for r in gen_media_rows(30):
        arr = fake_decode(r["payload"], r["kind"], r["meta"])
        m = r["meta"]
        if r["kind"] == "image":
            assert arr.shape == (m["height"], m["width"], 3)
            assert arr.dtype == np.uint8
        elif r["kind"] == "audio":
            assert arr.ndim == 1 and arr.dtype == np.float32
            assert float(arr.max()) <= 1.0 and float(arr.min()) >= -1.0
        else:
            assert arr.shape == (m["n_frames"], m["height"], m["width"], 3)


def test_feature_extraction(spark):
    media = media_df(spark, N)
    feats = extract_media_features(media).collect()
    assert len(feats) == N
    by_id = {r["media_id"]: r for r in feats}
    # spot-check against the local fake decode
    for r in gen_media_rows(N)[:10]:
        arr = fake_decode(r["payload"], r["kind"], r["meta"])
        got = by_id[r["media_id"]]
        assert got["kind"] == r["kind"]
        assert got["mean_val"] == float(arr.astype(np.float64).mean())
        assert len(got["feat"]) == 16
        assert abs(sum(got["feat"]) - 1.0) < 1e-6  # normalized histogram


def test_frame_sampling_counts(spark):
    media = media_df(spark, N)
    frames = sample_video_frames(media, every_n=4).collect()
    expected = 0
    for r in gen_media_rows(N):
        if r["kind"] == "video":
            expected += len(range(0, r["meta"]["n_frames"], 4))
    assert len(frames) == expected
    for f in frames[:5]:
        assert len(f["frame"]) == f["width"] * f["height"] * 3


def test_resize_images(spark):
    media = media_df(spark, N)
    out = resize_images(media, out_w=8, out_h=8).collect()
    n_images = sum(1 for r in gen_media_rows(N) if r["kind"] == "image")
    assert len(out) == n_images
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in out)


def test_real_video_frames_through_spark(spark):
    """MJPEG-AVI payloads frame-sample through the REAL RIFF walk +
    JPEG decode in the Arrow UDF, matching the driver-side pure run
    frame-for-frame (the x_media_real_frames golden contract)."""
    from credit_ocr_system_spark.operators.multimodal import (
        gen_real_media_rows,
        real_media_df,
        sample_video_frames,
        video_frame_rows,
    )

    n = 60
    rows = gen_real_media_rows(n)
    vids = [r for r in rows if r["kind"] == "video"]
    assert vids, "generator must emit Motion-JPEG video rows"
    containers = {r["payload"][8:12] if r["payload"][:4] == b"RIFF"
                  else r["payload"][4:8] for r in vids}
    assert containers <= {b"AVI ", b"ftyp"}
    assert containers == {b"AVI ", b"ftyp"}, \
        "corpus must carry BOTH video containers (AVI and MP4)"

    want = []
    for r in rows:
        want.extend(video_frame_rows(r, 2, decode_media))
    got = sample_video_frames(
        real_media_df(spark, n), every_n=2,
        decode=decode_media).collect()
    assert len(got) == len(want) > 0
    want_by_key = {(w["media_id"], w["frame_idx"]): w for w in want}
    for g in got:
        w = want_by_key[(g.media_id, g.frame_idx)]
        assert bytes(g.frame) == w["frame"]
        assert (g.width, g.height) == (w["width"], w["height"])


def test_real_video_features_use_decoded_pixels():
    """Feature rows for AVI payloads histogram the DECODED frames —
    deterministic, full-range, with the metadata round-tripped."""
    from credit_ocr_system_spark.operators.multimodal import (
        gen_real_media_rows,
        media_feature_row,
    )

    vids = [r for r in gen_real_media_rows(60)
            if r["kind"] == "video"]
    row = media_feature_row(vids[0], decode_media)
    assert row["n_frames"] == vids[0]["meta"]["n_frames"]
    assert abs(sum(row["feat"]) - 1.0) < 1e-5  # histogram sums to 1
    assert row == media_feature_row(vids[0], decode_media)


def test_real_media_corpus_carries_new_codec_variants():
    """The x_media_real corpus must exercise the full codec surface:
    progressive JPEGs, Adam7 PNGs, float/24-bit WAVs — and every
    payload must decode through the real dispatcher."""
    from credit_ocr_system_spark.operators.multimodal import (
        decode_media, gen_real_media_rows)
    rows = gen_real_media_rows(240)
    seen = set()
    for r in rows:
        p = r["payload"]
        if p[:2] == b"\xff\xd8":
            seen.add("jpeg_prog" if b"\xff\xc2" in p else "jpeg_base")
            if b"\xff\xdd" in p:
                seen.add("jpeg_rst")
        elif p[:8] == b"\x89PNG\r\n\x1a\n":
            seen.add("png_adam7" if p[28] == 1 else "png_seq")
        elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            seen.add("video_avi")
        elif p[4:8] == b"ftyp":
            seen.add("video_mp4")
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            import struct as _s
            at = p.index(b"fmt ")
            tag, bits = (_s.unpack_from("<H", p, at + 8)[0],
                         _s.unpack_from("<H", p, at + 22)[0])
            seen.add(f"wav_{tag}_{bits}")
        out = decode_media(p, r["kind"], r["meta"])
        assert out.size > 0
    assert {"jpeg_prog", "jpeg_base", "jpeg_rst", "png_adam7",
            "png_seq", "wav_1_16", "wav_1_24", "wav_3_32",
            "video_avi", "video_mp4"} <= seen, seen


def test_real_resize_through_decode_seam(spark):
    """resize_images(decode=decode_media) must resize DECODED pixels
    of real payloads, not reinterpret compressed bytes — pinned by
    recomputing the expected nearest-neighbour grid from decode_media
    driver-side."""
    import numpy as np

    from credit_ocr_system_spark.operators.multimodal import (
        gen_real_media_rows,
        real_media_df,
        resize_images,
    )

    n = 40
    rows = [r for r in gen_real_media_rows(n) if r["kind"] == "image"]
    assert rows
    got = {r.media_id: r for r in resize_images(
        real_media_df(spark, n), out_w=4, out_h=4,
        decode=decode_media).collect()}
    assert set(got) == {r["media_id"] for r in rows}
    for r in rows:
        img = decode_media(r["payload"], "image", r["meta"])
        ys = np.linspace(0, img.shape[0] - 1, 4).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, 4).astype(int)
        assert bytes(got[r["media_id"]].pixels) == \
            img[ys][:, xs].tobytes()
