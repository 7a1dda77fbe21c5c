"""Pure-Python JPEG codec (ztdf_spark/jpeg.py — baseline SOF0 and
progressive SOF2 with spectral selection + successive approximation) and
its mmops integration. The independent check for the decoder is the PRE-ENCODE
source pixels: with flat quantization the loss is DCT + color-convert
rounding, so decode(encode(px)) must match px within a small fixed bound — an
encoder/decoder pair that merely mirrored each other's bugs could not
land back on the source values. Since round 6 the driver's mm fixture
ALSO hash-checks jpeg decode end to end (AVI/MJPEG rows vs the
independent bit-exact decoder in tools/check_oracles.py); this file
remains the source-pixel pin for the bare-jpeg paths."""

import numpy as np
import pytest

from ztdf_spark import mmops
from ztdf_spark.jpeg import ZIGZAG, decode_jpeg, encode_jpeg


def test_zigzag_is_interchange_order():
    """The scan order is the JPEG interchange order (not merely a
    self-consistent permutation) — pinned so our streams stay readable
    by real decoders."""
    assert len(ZIGZAG) == 64 and len(set(ZIGZAG)) == 64
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_roundtrip_gray_and_rgb_flat_quant():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg(g))
    assert dg.shape == g.shape
    assert np.abs(dg.astype(int) - g.astype(int)).max() <= 2
    px = rng.integers(0, 256, size=(31, 19, 3), dtype=np.uint8)
    dp = decode_jpeg(encode_jpeg(px))
    assert dp.shape == px.shape
    # RGB pays color-convert rounding on top of DCT rounding: +-3
    assert np.abs(dp.astype(int) - px.astype(int)).max() <= 3


@pytest.mark.parametrize("shape", [(8, 8), (9, 7), (24, 32), (33, 17)])
def test_roundtrip_420_smooth(shape):
    """4:2:0 halves the chroma planes, so exactness only holds where
    chroma is locally constant — a smooth gradient bounds the error."""
    h, w = shape
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    px = np.stack(
        [(xx * 3) % 256, (yy * 2) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    dp = decode_jpeg(encode_jpeg(px, subsampling="420"))
    assert dp.shape == px.shape
    # luma stays tight; chroma subsample + modulo wrap seams dominate the max
    assert np.abs(dp.astype(int) - px.astype(int)).mean() <= 4.0


def test_roundtrip_seeded_random_sizes():
    rng = np.random.default_rng(7)
    for _ in range(6):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        dp = decode_jpeg(encode_jpeg(px))
        assert dp.shape == px.shape
        assert np.abs(dp.astype(int) - px.astype(int)).max() <= 3


def test_lossy_tables_still_decode():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dp = decode_jpeg(encode_jpeg(px, lossy=True))
    assert dp.shape == px.shape
    # lossy quant: bounded by table magnitude, not exact
    assert np.abs(dp.astype(int) - px.astype(int)).mean() < 32


def test_decoder_rejects_unsupported():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")  # no SOI
    # flip SOF0 -> SOF9 (arithmetic coding): refuse, don't mis-decode
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg(bytes(blob))
    # flip SOF0 -> SOF2: the baseline full-band scan header is ILLEGAL in
    # progressive mode (Ss=0 with Se=63) — refuse, don't mis-decode
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(bytes(encode_jpeg(px))[:40])  # truncated


def test_mm_features_jpeg_vs_source_pixels(spark):
    """extract_features on jpeg rows: decoded features must match the
    features of the PRE-ENCODE pixels within the flat-quant decode bound
    — the independent data-path check (w/h/fmt exact, stats within a few
    counts)."""
    rng = np.random.default_rng(11)
    rows = []
    srcs = {}
    for i in range(6):
        w, h = int(rng.integers(5, 30)), int(rng.integers(5, 30))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        srcs[i] = px
        rows.append((i, "image", bytearray(encode_jpeg(px)), (w, h, 0, "jpeg")))
    media = spark.createDataFrame(rows, mmops.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mmops.extract_features(media).collect()}
    assert set(out) == set(srcs)
    for i, px in srcs.items():
        got = np.array(out[i]["feature"], dtype=np.float64)
        want = mmops._rgb_features(px, fmt_tag=4.0).astype(np.float64)
        assert got[0] == want[0] and got[1] == want[1]  # exact w, h
        assert got[15] == 4.0  # jpeg fmt tag — the REAL decode path ran
        # means/stds/luma within the ±2/sample decode bound; gradients a
        # touch looser (differences of two ±2 values)
        assert np.allclose(got[2:11], want[2:11], atol=3.5), (got, want)
        assert np.allclose(got[11:13], want[11:13], atol=5.0)


def test_mm_resize_jpeg_rows(spark):
    """resize_images handles jpeg rows: the emitted md5 equals the
    nearest-neighbor resample of the decoded pixels (pins the Spark-side
    plumbing; decoder correctness is pinned by the round-trip tests)."""
    import hashlib

    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, size=(20, 14, 3), dtype=np.uint8)
    blob = encode_jpeg(px)
    media = spark.createDataFrame(
        [(0, "image", bytearray(blob), (14, 20, 0, "jpeg"))], mmops.MEDIA_SCHEMA
    )
    out = mmops.resize_images(media, out_w=8, out_h=8).collect()
    assert len(out) == 1
    dec = decode_jpeg(blob)
    ri = (np.arange(8) * dec.shape[0]) // 8
    ci = (np.arange(8) * dec.shape[1]) // 8
    want = hashlib.md5(dec[np.ix_(ri, ci)].tobytes()).hexdigest()
    assert out[0]["resized_md5"] == want


def test_arithmetic_jpeg_falls_back_to_fake(spark):
    """A sniffed-but-unsupported jpeg (arithmetic-coded SOF9) must not
    fail the job: decode_media falls through to the deterministic fake.
    (Progressive SOF2 is REAL-decoded since round 6 — covered below.)"""
    px = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC9
    feat = mmops.decode_media(bytes(blob), "image", deterministic_fake=True)
    assert feat.shape == (mmops.FEAT_DIM,)
    with pytest.raises(NotImplementedError):
        mmops.decode_media(bytes(blob), "image", deterministic_fake=False)


@pytest.mark.parametrize("mode", ["gray", "444", "420"])
def test_progressive_decodes_bit_identical_to_baseline(mode):
    """The same quantized coefficients reach the IDCT through either SOF
    path, so progressive output must EQUAL baseline output bit for bit —
    across subsampling modes, ragged sizes (incl. the 420 padded-grid /
    true-grid mismatch), both scan scripts (spectral-selection-only and
    +successive-approximation)."""
    from ztdf_spark.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(20)
    for h, w in [(8, 8), (17, 23), (24, 24), (24, 17), (33, 40)]:
        if mode == "gray":
            px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(px))
        else:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            base = decode_jpeg(encode_jpeg(px, subsampling=mode))
        kw = {} if mode == "gray" else {"subsampling": mode}
        prog = decode_jpeg(encode_jpeg_progressive(px, **kw))
        assert np.array_equal(base, prog), (mode, h, w, "successive-approx")
        ss_only = decode_jpeg(
            encode_jpeg_progressive(px, approx_bits=0, bands=((1, 63),), **kw)
        )
        assert np.array_equal(base, ss_only), (mode, h, w, "spectral-only")


def test_progressive_roundtrip_matches_source_pixels():
    """decode(encode_progressive(px)) lands back on the SOURCE pixels
    within the flat-quant bound — the encoder/decoder pair cannot merely
    mirror each other's bugs against the pre-encode data."""
    from ztdf_spark.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, size=(19, 27), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg_progressive(g))
    assert np.abs(dg.astype(int) - g.astype(int)).max() <= 2
    px = rng.integers(0, 256, size=(22, 18, 3), dtype=np.uint8)
    dp = decode_jpeg(encode_jpeg_progressive(px))
    assert np.abs(dp.astype(int) - px.astype(int)).max() <= 3
    # lossy tables through the progressive path stay a real image too
    dl = decode_jpeg(encode_jpeg_progressive(px, lossy=True))
    assert dl.shape == px.shape


def test_progressive_through_decode_media(spark):
    """mm plumbing: a progressive jpeg payload real-decodes through
    decode_media (fmt_tag 4.0, true dims) — no fake fallback."""
    from ztdf_spark.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, size=(14, 26, 3), dtype=np.uint8)
    feat = mmops.decode_media(
        encode_jpeg_progressive(px), "image", deterministic_fake=False
    )
    assert feat[15] == 4.0 and feat[0] == 26.0 and feat[1] == 14.0


def test_restart_markers_roundtrip_identical():
    """DRI/RSTn streams (the error-resilience structure real MJPEG
    cameras emit) must decode to EXACTLY the same pixels as the
    restart-free encoding: 1-padded byte alignment consumed, DC
    predictors reset on the MCU cadence, marker sequence skipped."""
    rng = np.random.default_rng(31)
    for w, h, sub, ri in ((9, 7, "444", 1), (33, 18, "420", 2), (16, 16, "444", 3), (40, 8, "420", 7)):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for lossy in (False, True):
            base = decode_jpeg(encode_jpeg(px, subsampling=sub, lossy=lossy))
            rst = decode_jpeg(encode_jpeg(px, subsampling=sub, lossy=lossy, restart_interval=ri))
            assert np.array_equal(base, rst)
    g = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(g)), decode_jpeg(encode_jpeg(g, restart_interval=2)))


def test_restart_stream_contains_dri_and_rst_markers():
    rng = np.random.default_rng(32)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    blob = encode_jpeg(px, restart_interval=1)
    assert b"\xff\xdd" in blob  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))  # RSTn
