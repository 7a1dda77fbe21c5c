"""Multimodal tests: REAL pure-Python decoders (WAV/PCM-16, PPM-P6, 24-bit
BMP) against known signals, schema/batch plumbing via mapInPandas, fake
fallback for undecodable codecs, frame-sampling fan-out, thumbnail resize."""

import numpy as np
import pytest

from ztdf_spark import mmops


def test_decode_unknown_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mmops.decode_media(b"xx", "image")


def test_decode_fake_deterministic():
    a = mmops.decode_media(b"payload", "image", deterministic_fake=True)
    b = mmops.decode_media(b"payload", "image", deterministic_fake=True)
    c = mmops.decode_media(b"payload", "audio", deterministic_fake=True)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)  # media_type keys the hash
    assert a.shape == (16,) and a.dtype == np.float32


def test_wav_decode_known_signal():
    sr = 8000
    t = np.arange(sr)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / sr) * 16384).astype(np.int16)
    f = mmops.decode_media(mmops.make_wav(sine, sr, 1), "audio")
    assert f[0] == 1.0  # channels
    assert f[1] == pytest.approx(8.0)  # sample rate / 1000
    assert f[2] == pytest.approx(1.0)  # duration s
    assert f[3] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)  # rms of 0.5 sine
    assert f[4] == pytest.approx(0.5, rel=1e-3)  # peak
    # 440 Hz sine: 880 zero crossings per second
    assert f[6] == pytest.approx(880 / sr, rel=0.02)
    assert abs(float(f[7])) < 1e-3  # ~zero dc offset
    # constant-positive signal: zero crossings = 0, dc = peak
    const = np.full(1000, 8192, dtype=np.int16)
    g = mmops.decode_media(mmops.make_wav(const, 16000, 2), "audio")
    assert g[0] == 2.0 and g[6] == 0.0
    assert g[7] == pytest.approx(0.25)


def test_image_decode_known_pixels_ppm_bmp_agree():
    px = np.zeros((5, 7, 3), dtype=np.uint8)
    px[..., 0] = 200  # solid-ish red with a gradient row
    px[2, :, 1] = np.arange(7) * 30
    fp = mmops.decode_media(mmops.make_ppm(px), "image")
    fb = mmops.decode_media(mmops.make_bmp(px), "image")
    assert fp[0] == 7.0 and fp[1] == 5.0  # width, height
    assert fp[2] == pytest.approx(200.0)  # mean R
    # identical pixels through two different containers → identical features
    # except the format tag
    assert np.array_equal(fp[:15], fb[:15])
    assert fp[15] == 1.0 and fb[15] == 2.0


def test_ppm_comment_and_bmp_padding():
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    ppm = b"P6\n# a comment\n3 3\n255\n" + px.tobytes()
    assert np.array_equal(mmops._ppm_pixels(ppm), px)
    # width 3 → stride padding exercised in bmp
    assert np.array_equal(mmops._bmp_pixels(mmops.make_bmp(px)), px)


def test_sniffed_but_unsupported_falls_back():
    # 'BM' magic with an 8-bit depth header → ValueError inside → fake path
    bogus = b"BM" + b"\x00" * 60
    out = mmops.decode_media(bogus, "image", deterministic_fake=True)
    assert out.shape == (16,)
    with pytest.raises(NotImplementedError):
        mmops.decode_media(bogus, "image")


def test_extract_features_real_and_fake(spark):
    media = mmops.synthetic_media(spark, n=12)
    feats = mmops.extract_features(media).collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    rows = mmops.synthetic_media_rows(12)
    for mid, mtype, payload, meta in rows:
        r = by_id[mid]
        assert len(r["feature"]) == 16
        if mtype == "image":  # real decode: width/height recovered
            assert r["feature"][0] == float(meta[0])
            assert r["feature"][1] == float(meta[1])
        if mtype == "audio":  # real decode: sample rate recovered
            assert r["feature"][1] in (8.0, 16.0)
    again = {r["media_id"]: r["feature"] for r in mmops.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)


def test_resize_images(spark):
    media = mmops.synthetic_media(spark, n=12)
    out = mmops.resize_images(media, out_w=8, out_h=8).toPandas()
    # payload-sniffed: every image row PLUS animated-GIF / AVI-MJPEG
    # video rows (poster-frame thumbnail)
    expected_ids = {
        r[0]
        for r in mmops.synthetic_media_rows(12)
        if r[1] == "image"
        or (r[1] == "video" and bytes(r[2])[:3] in (b"GIF", b"RIF"))
    }
    assert set(out["media_id"]) == expected_ids
    assert (out["out_w"] == 8).all() and (out["out_h"] == 8).all()
    # deterministic across runs
    again = mmops.resize_images(media, out_w=8, out_h=8).toPandas()
    assert sorted(out["resized_md5"]) == sorted(again["resized_md5"])


def test_sample_frames_only_video(spark):
    media = mmops.synthetic_media(spark, n=12)
    frames = mmops.sample_frames(media, every_ms=1000).toPandas()
    video_ids = {r["media_id"] for r in media.filter("media_type='video'").collect()}
    assert set(frames["media_id"]) == video_ids
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()


def test_y4m_decode_known_planes():
    """Builder and decoder are separate code paths: hand-built C444 and
    C420 streams must round-trip the exact planes and header fields."""
    y0 = np.full((4, 6), 10, dtype=np.uint8)
    y1 = np.full((4, 6), 200, dtype=np.uint8)
    u = np.full((4, 6), 50, dtype=np.uint8)
    v = np.full((4, 6), 90, dtype=np.uint8)
    blob = mmops.make_y4m([(y0, u, v), (y1, u, v)], fps_num=4, colorspace="C444")
    frames, fps, w, h = mmops._y4m_frames(blob)
    assert (w, h, fps, len(frames)) == (6, 4, 4.0, 2)
    assert np.array_equal(frames[0][0], y0) and np.array_equal(frames[1][0], y1)
    assert np.array_equal(frames[0][1], u) and np.array_equal(frames[1][2], v)
    # C420: half-size chroma planes
    uq = np.full((2, 3), 7, dtype=np.uint8)
    blob420 = mmops.make_y4m([(y0, uq, uq)], fps_num=25, colorspace="C420jpeg")
    frames420, fps420, w420, h420 = mmops._y4m_frames(blob420)
    assert (w420, h420, fps420) == (6, 4, 25.0)
    assert frames420[0][1].shape == (2, 3)
    # features: geometry + luma stats from the real planes
    f = mmops.decode_media(blob, "video")
    assert f[0] == 6.0 and f[1] == 4.0 and f[2] == 2.0 and f[3] == 4.0
    assert abs(f[4] - 105.0) < 1e-3  # mean luma of 10 and 200
    assert f[8] == 10.0 and f[9] == 200.0  # first/last frame luma
    assert abs(f[10] - 190.0) < 1e-3  # inter-frame motion
    assert f[15] == 3.0


def test_y4m_frame_sampling_stride_and_content(spark):
    """sample_frames on a real Y4M stream: the stride follows the frame
    rate (one sampled frame per every_ms) and the hash fingerprints the
    sampled frame's OWN plane bytes — distinct frames, distinct hashes."""
    import hashlib

    rng = np.random.default_rng(7)
    frames = [
        (
            rng.integers(0, 256, size=(4, 4), dtype=np.uint8),
            rng.integers(0, 256, size=(2, 2), dtype=np.uint8),
            rng.integers(0, 256, size=(2, 2), dtype=np.uint8),
        )
        for _ in range(6)
    ]
    blob = mmops.make_y4m(frames, fps_num=2, colorspace="C420jpeg")
    media = spark.createDataFrame(
        [(0, "video", bytearray(blob), (4, 4, 3000, "y4m"))], mmops.MEDIA_SCHEMA
    )
    out = mmops.sample_frames(media, every_ms=1000).toPandas().sort_values("frame_idx")
    # 2 fps, 1000 ms → every 2nd frame: indices 0, 2, 4
    assert list(out["frame_idx"]) == [0, 2, 4]
    expect = [
        hashlib.blake2b(
            frames[i][0].tobytes() + frames[i][1].tobytes() + frames[i][2].tobytes(),
            digest_size=8,
        ).hexdigest()
        for i in (0, 2, 4)
    ]
    assert list(out["frame_hash"]) == expect
    # real decode path: no dependence on the duration metadata stand-in
    media_wrong_meta = spark.createDataFrame(
        [(0, "video", bytearray(blob), (4, 4, 999999, "y4m"))], mmops.MEDIA_SCHEMA
    )
    out2 = mmops.sample_frames(media_wrong_meta, every_ms=1000).toPandas()
    assert list(out2.sort_values("frame_idx")["frame_hash"]) == expect


def test_y4m_null_meta_still_decodes(spark):
    """A decodable Y4M row with NULL metadata is still sampled: the real
    decode derives geometry/fps from the payload alone and never reads
    meta (ADVICE r4 #4) — only the duration-based fake path (compressed
    codecs) skips meta-less rows."""
    y = np.full((4, 4), 42, dtype=np.uint8)
    blob = mmops.make_y4m([(y, y, y)], fps_num=1, colorspace="C444")
    media = spark.createDataFrame(
        [
            (0, "video", bytearray(blob), None),  # y4m, null meta → decoded
            (1, "video", bytearray(b"\x00\x00\x00\x01h264ish"), None),  # fake path, null meta → skipped
        ],
        mmops.MEDIA_SCHEMA,
    )
    out = mmops.sample_frames(media, every_ms=1000).toPandas()
    assert sorted(out["media_id"]) == [0]


def test_y4m_truncated_falls_back_not_crashes(spark):
    """A sniffed-but-truncated Y4M row must take the positional fallback
    (duration-driven fan-out), never fail the job — the same per-record
    tolerance contract as decode_media."""
    good = mmops.make_y4m(
        [(np.zeros((4, 4), np.uint8),) * 3], fps_num=2, colorspace="C444"
    )
    bad = good[: len(good) - 10]  # truncate mid-frame
    media = spark.createDataFrame(
        [(0, "video", bytearray(bad), (4, 4, 2000, "y4m"))], mmops.MEDIA_SCHEMA
    )
    out = mmops.sample_frames(media, every_ms=1000).toPandas()
    assert list(out["frame_idx"]) == [0, 1]  # duration-driven stand-in


def test_gif_sampling_stride_and_poster(spark):
    """Animated GIF through the real paths: sample_frames' stride derives
    from the stream's own per-frame delay, frame_hash fingerprints the
    COMPOSITED canvas (changing one sampled frame changes only its hash),
    and decode_media recovers geometry from the first composited frame."""
    import hashlib

    from ztdf_spark.gif import encode_gif

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, size=(5, 7), dtype=np.uint8) for _ in range(6)]
    # 50 cs per frame -> 2 fps -> at every_ms=1000 the stride is 2
    blob = encode_gif(frames, pal, delays_cs=[50] * 6)
    gframes, fps = mmops._gif_frames(blob)
    assert fps == 2.0 and len(gframes) == 6
    feat = mmops.decode_media(blob, "video")
    assert feat[0] == 7.0 and feat[1] == 5.0 and feat[15] == 6.0  # w, h, tag

    media = spark.createDataFrame(
        [(0, "video", bytearray(blob), (7, 5, 3000, "gif"))], mmops.MEDIA_SCHEMA
    )
    out = mmops.sample_frames(media, every_ms=1000).toPandas().sort_values("frame_idx")
    assert list(out["frame_idx"]) == [0, 2, 4]
    expect = [
        hashlib.blake2b(gframes[i].tobytes(), digest_size=8).hexdigest()
        for i in (0, 2, 4)
    ]
    assert list(out["frame_hash"]) == expect

    # perturb frame 2 only: its composited hash changes, frame 0's doesn't
    frames2 = [f.copy() for f in frames]
    frames2[2] = (frames2[2] + 1) % 8
    g2, _ = mmops._gif_frames(encode_gif(frames2, pal, delays_cs=[50] * 6))
    assert (
        hashlib.blake2b(g2[2].tobytes(), digest_size=8).hexdigest() != expect[1]
    )
    assert (
        hashlib.blake2b(g2[0].tobytes(), digest_size=8).hexdigest() == expect[0]
    )
