"""PNG codec (ztdf_spark/png.py): lossless round trips through every
filter type, a hand-assembled known-answer stream (pins the decoder
independently of the encoder — a mirrored filter-math bug pair cannot
pass it), color-type handling, malformed-input rejection, and the Spark
mmops integration."""

import struct
import zlib

import numpy as np
import pytest

from ztdf_spark.png import _chunk, decode_png, encode_png


def _px(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_lossless_roundtrip_every_filter(ftype):
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 31)]:
        px = _px(h, w, seed=h * 100 + w)
        out = decode_png(encode_png(px, filter_type=ftype))
        assert out.shape == px.shape and np.array_equal(out, px)


def test_known_answer_hand_assembled_stream():
    """2x2 RGB assembled BYTE BY BYTE with hand-computed Sub/Up filter
    deltas — decoded pixels must equal the hand-written expectation, so
    the decoder's un-filter arithmetic is pinned without the encoder."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    # target image rows: [(10,20,30),(15,25,35)] / [(12,22,32),(18,28,38)]
    # row 0 uses Sub:  first pixel raw, second = delta (5,5,5)
    # row 1 uses Up:   deltas vs row 0 = (2,2,2) and (3,3,3)
    raw = bytes([1, 10, 20, 30, 5, 5, 5]) + bytes([2, 2, 2, 2, 3, 3, 3])
    idat = _chunk(b"IDAT", zlib.compress(raw))
    iend = _chunk(b"IEND", b"")
    got = decode_png(sig + ihdr + idat + iend)
    want = np.array(
        [[[10, 20, 30], [15, 25, 35]], [[12, 22, 32], [18, 28, 38]]], dtype=np.uint8
    )
    assert np.array_equal(got, want)


def test_gray_palette_rgba_color_types():
    # gray (color 0) replicates to RGB
    gray_raw = b"".join(bytes([0]) + bytes([v, v + 1]) for v in (7, 100))
    sig = b"\x89PNG\r\n\x1a\n"
    png = (
        sig
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(gray_raw))
        + _chunk(b"IEND", b"")
    )
    g = decode_png(png)
    assert g.shape == (2, 2, 3) and (g[0, 0] == [7, 7, 7]).all() and (g[1, 1] == [101, 101, 101]).all()
    # palette (color 3) resolves through PLTE
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx_raw = bytes([0, 0, 2]) + bytes([0, 1, 1])
    png_p = (
        sig
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(idx_raw))
        + _chunk(b"IEND", b"")
    )
    p = decode_png(png_p)
    assert (p[0] == [[255, 0, 0], [0, 0, 255]]).all() and (p[1] == [[0, 255, 0], [0, 255, 0]]).all()
    # RGBA (color 6) drops alpha
    rgba_raw = bytes([0]) + bytes([1, 2, 3, 200, 4, 5, 6, 10])
    png_a = (
        sig
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(rgba_raw))
        + _chunk(b"IEND", b"")
    )
    a = decode_png(png_a)
    assert a.shape == (1, 2, 3) and (a[0, 0] == [1, 2, 3]).all() and (a[0, 1] == [4, 5, 6]).all()


def test_malformed_inputs_raise_never_wrong_pixels():
    px = _px(4, 4)
    good = encode_png(px)
    # flipped payload byte → CRC failure
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:30])  # truncated
    with pytest.raises(ValueError):
        decode_png(b"NOPE" + good[4:])
    # interlaced and 16-bit profiles refuse (fall-through contract)
    ih = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + ih + _chunk(b"IDAT", zlib.compress(b"\0" * 14)) + _chunk(b"IEND", b""))


def test_spark_mm_integration_png(spark):
    from ztdf_spark import mmops

    px = _px(9, 13, seed=42)
    rows = [
        (1, "image", bytearray(encode_png(px, filter_type=4))),
        (2, "image", bytearray(b"\x89PNG\r\n\x1a\nGARBAGE")),  # malformed → skipped/fake
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    feats = {r["media_id"]: r for r in mmops.extract_features(df).collect()}
    assert feats[1]["feature"][-1] == 5.0  # fmt_tag: REAL png decode path
    # feature vector matches decoding the pre-encode pixels directly
    want = mmops._rgb_features(px, fmt_tag=5.0)
    got = np.array(feats[1]["feature"], dtype=np.float32)
    assert np.allclose(got, want, atol=1e-5)
    # resize emits the md5 of the real resample; the garbage row is skipped
    rs = {r["media_id"]: r["resized_md5"] for r in mmops.resize_images(df).collect()}
    import hashlib

    ri = (np.arange(8) * 9) // 8
    ci = (np.arange(8) * 13) // 8
    assert rs == {1: hashlib.md5(px[np.ix_(ri, ci)].tobytes()).hexdigest()}


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_interlaced_roundtrip_every_filter(ftype):
    """Adam7: lossless round trip at sizes that exercise empty passes
    (dims < pass offsets) and ragged sub-image grids."""
    for h, w in [(1, 1), (1, 9), (9, 1), (3, 3), (7, 5), (8, 8), (13, 17)]:
        px = _px(h, w, seed=h * 100 + w + ftype)
        out = decode_png(encode_png(px, filter_type=ftype, interlace=True))
        assert out.shape == px.shape and np.array_equal(out, px)


def test_interlaced_and_plain_decode_identically():
    px = _px(12, 10, seed=9)
    plain, adam7 = encode_png(px), encode_png(px, interlace=True)
    assert plain != adam7  # genuinely different byte streams
    assert np.array_equal(decode_png(plain), decode_png(adam7))


def test_interlaced_known_answer_hand_assembled_stream():
    """3x3 Adam7 stream assembled BYTE BY BYTE from the spec's pass grids
    (pass 1 -> (0,0); 4 -> (0,2); 5 -> (2,0),(2,2); 6 -> (0,1),(2,1);
    7 -> row y=1), filter 0 throughout — pins the de-interlace scatter
    independently of the encoder."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1))
    want = np.zeros((3, 3, 3), dtype=np.uint8)
    for y in range(3):
        for x in range(3):
            want[y, x] = (y * 10 + x, 50 + x, 90 + y)

    def pix(y, x):
        return bytes(int(v) for v in want[y, x])

    raw = (
        bytes([0]) + pix(0, 0)                    # pass 1: 1x1
        + bytes([0]) + pix(0, 2)                  # pass 4: 1x1
        + bytes([0]) + pix(2, 0) + pix(2, 2)      # pass 5: 1x2
        + bytes([0]) + pix(0, 1)                  # pass 6 row 0
        + bytes([0]) + pix(2, 1)                  # pass 6 row 1
        + bytes([0]) + pix(1, 0) + pix(1, 1) + pix(1, 2)  # pass 7: y=1
    )
    png = sig + ihdr + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    assert np.array_equal(decode_png(png), want)


def test_interlaced_truncated_stream_rejected():
    """An Adam7 stream missing its final pass must raise, not mis-decode."""
    px = _px(8, 8, seed=4)
    good = encode_png(px, interlace=True)
    # walk the chunks, shorten the decompressed scanlines by the last
    # pass (pass 7 of an 8x8: 4 rows of 1+24 bytes), re-assemble
    pos, parts = 8, {}
    while pos + 8 <= len(good):
        (length,) = struct.unpack(">I", good[pos : pos + 4])
        ctype = good[pos + 4 : pos + 8]
        parts[ctype] = good[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(parts[b"IDAT"])
    bad = (
        good[:8]
        + _chunk(b"IHDR", parts[b"IHDR"])
        + _chunk(b"IDAT", zlib.compress(raw[: -4 * 25]))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad)


# ---------------------------------------------------------------------------
# Round-6 full static profile: depths 1/2/4/8/16, color types 0/2/3/4/6
# ---------------------------------------------------------------------------

from ztdf_spark.png import _CHANNELS, _VALID_DEPTHS, encode_png_ex


@pytest.mark.parametrize(
    "color,depth",
    [(c, d) for c, ds in sorted(_VALID_DEPTHS.items()) for d in ds],
)
def test_every_depth_color_combo_roundtrips(color, depth):
    """Lossless round trip for EVERY spec-legal (color, depth) pair, both
    plain and Adam7, across all five filters — 16-bit samples encode
    left-bit-replicated (v*257) so the high-byte reduction is the exact
    inverse; sub-byte gray levels left-bit-replicate on decode."""
    rng = np.random.default_rng(color * 100 + depth)
    ch = _CHANNELS[color]
    for h, w in [(1, 1), (3, 5), (9, 13)]:
        for ftype in (0, 1, 2, 3, 4):
            for interlace in (False, True):
                if color == 3:
                    k = min(1 << depth, 11)
                    pal = rng.integers(0, 256, size=(k, 3), dtype=np.uint8)
                    idx = rng.integers(0, k, size=(h, w), dtype=np.uint8)
                    blob = encode_png_ex(idx, 3, depth, ftype, interlace, palette=pal)
                    want = pal[idx]
                else:
                    shape = (h, w) if ch == 1 else (h, w, ch)
                    if depth == 16:
                        v8 = rng.integers(0, 256, size=shape, dtype=np.uint16)
                        s, e8 = (v8 * 257).astype(np.uint16), v8.astype(np.uint8)
                    else:
                        s = rng.integers(0, 1 << depth, size=shape).astype(np.uint16)
                        e8 = (s * (255 // ((1 << depth) - 1))).astype(np.uint8)
                    blob = encode_png_ex(s, color, depth, ftype, interlace)
                    if ch == 1:
                        e8 = e8[:, :, None]
                    if color in (0, 4):
                        want = np.repeat(e8[:, :, :1], 3, axis=2)
                    else:
                        want = e8[:, :, :3]
                got = decode_png(blob)
                assert got.shape == (h, w, 3) and np.array_equal(got, want), (
                    color, depth, h, w, ftype, interlace)


def test_known_answer_sub_byte_bit_packing():
    """5x2 2-bit gray assembled BYTE BY BYTE: row 0 unfiltered with
    hand-packed MSB-first bit groups (levels 0,1,2,3,0 -> 0x1B 0x00),
    row 1 Sub-filtered at the sub-byte bpp=1 distance (levels 3,2,1,0,3
    -> packed 0xE4 0xC0 -> deltas 0xE4 0xDC). Pins bit unpacking AND the
    byte-level filter distance independently of the encoder."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 2, 0, 0, 0, 0))
    raw = bytes([0, 0x1B, 0x00]) + bytes([1, 0xE4, 0xDC])
    png = sig + ihdr + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    got = decode_png(png)
    lv = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]], dtype=np.uint8) * 85
    assert np.array_equal(got, np.repeat(lv[:, :, None], 3, axis=2))


def test_known_answer_16bit_filters():
    """16-bit gray assembled BYTE BY BYTE: Up filtering works on BYTES
    (row 1 = byte deltas vs row 0), Sub works at the 2-byte bpp distance;
    decode reduces each big-endian sample to its high byte."""
    sig = b"\x89PNG\r\n\x1a\n"
    # 1x2: row0 = 0x1234 (None), row1 = 0xABCD via Up deltas (0x99, 0x99)
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 2, 16, 0, 0, 0, 0))
    raw = bytes([0, 0x12, 0x34]) + bytes([2, 0x99, 0x99])
    png = sig + ihdr + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    got = decode_png(png)
    assert got[0, 0, 0] == 0x12 and got[1, 0, 0] == 0xAB
    # 2x1: Sub at bpp=2 — second sample's bytes delta against the first's
    ihdr2 = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
    raw2 = bytes([1, 0x01, 0x02, 0x02, 0x04])  # 0x0102 then 0x0306
    png2 = sig + ihdr2 + _chunk(b"IDAT", zlib.compress(raw2)) + _chunk(b"IEND", b"")
    got2 = decode_png(png2)
    assert got2[0, 0, 0] == 0x01 and got2[0, 1, 0] == 0x03


def test_gray_alpha_color_type():
    """Color type 4 (gray+alpha): gray replicates to RGB, alpha dropped."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0))
    raw = bytes([0, 10, 200, 20, 30])  # (gray=10,a=200), (gray=20,a=30)
    png = sig + ihdr + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    got = decode_png(png)
    assert np.array_equal(got, [[[10, 10, 10], [20, 20, 20]]])


def test_illegal_depth_color_combos_rejected():
    """Spec-ILLEGAL pairs must refuse on both encode and decode."""
    for color, depth in [(3, 16), (2, 4), (4, 2), (6, 1)]:
        with pytest.raises(ValueError):
            encode_png_ex(np.zeros((2, 2, _CHANNELS[color]), np.uint16), color, depth)
        ih = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, 0))
        blob = (
            b"\x89PNG\r\n\x1a\n" + ih
            + _chunk(b"IDAT", zlib.compress(b"\0" * 20)) + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(blob)


def test_fixture_variants_cross_check_independent_oracle():
    """Every rotating image variant the media fixture emits (incl. the
    new 16-bit RGB and 4-bit palette PNGs) decodes identically under
    png.py and the tools/check_oracles.py INDEPENDENT parser."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracles import _oracle_png_pixels

    from ztdf_spark import mmops

    rows = mmops.synthetic_media_rows(42)
    n_png = 0
    for _, mtype, payload, meta in rows:
        if mtype == "image" and bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
            n_png += 1
            assert np.array_equal(decode_png(bytes(payload)), _oracle_png_pixels(bytes(payload)))
    # 14 images over the 7-variant rotation (gif joined in round 6) = two
    # full cycles -> each of the four PNG variants appears twice
    assert n_png >= 8
