"""GIF codec tests: LZW round trips across every width boundary, full
encode→decode pixel equality (plain/interlaced, palette sizes 2..256),
animation (delays, transparency, placement rects, disposal 1/2/3), a
hand-assembled known-answer byte stream (pins the bit-level format
independently of the encoder), and malformed-stream rejection."""

import numpy as np
import numpy.testing as npt
import pytest

from ztdf_spark.gif import (
    GifError,
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def test_lzw_round_trip_incompressible():
    rng = np.random.default_rng(0)
    for mcs in (2, 4, 8):
        for n in (1, 10, 300, 20000):
            data = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
            assert lzw_decode(lzw_encode(data, mcs), mcs, expected=n) == data


def test_lzw_round_trip_repetitive_and_overflow():
    # long repeats force KwKwK codes; 21k symbols at mcs=2 forces the
    # 4096-entry table overflow -> mid-stream CLEAR path
    data = b"\x01\x02\x03" * 7000
    assert lzw_decode(lzw_encode(data, 2), 2) == data
    data = bytes([i % 4 for i in range(5000)])
    assert lzw_decode(lzw_encode(data, 2), 2, expected=5000) == data


def test_lzw_rejects_garbage():
    with pytest.raises(GifError):
        lzw_decode(b"", 2, expected=4)
    with pytest.raises(GifError):
        # first code = KwKwK with no previous string
        lzw_decode(bytes([0b00000110]), 2, expected=1)


def test_single_frame_round_trip_all_palettes():
    rng = np.random.default_rng(1)
    for npal in (2, 3, 16, 256):
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        for h, w in ((1, 1), (3, 5), (16, 16), (31, 7)):
            idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
            for interlace in (False, True):
                frames, delays = decode_gif(encode_gif([idx], pal, interlace=interlace))
                assert len(frames) == 1 and delays == [0]
                npt.assert_array_equal(frames[0], pal[idx])


def test_large_image_multi_subblock():
    """>255 bytes of LZW data exercises the sub-block framing."""
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    g = encode_gif([idx], pal)
    assert len(g) > 600
    frames, _ = decode_gif(g)
    npt.assert_array_equal(frames[0], pal[idx])


def test_animation_delays_and_frames():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    fr = [rng.integers(0, 8, size=(6, 9), dtype=np.uint8) for _ in range(4)]
    frames, delays = decode_gif(encode_gif(fr, pal, delays_cs=[10, 20, 30, 40]))
    assert delays == [10, 20, 30, 40]
    for got, idx in zip(frames, fr):
        npt.assert_array_equal(got, pal[idx])


def test_transparency_and_placement_rect():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    base = np.zeros((5, 6), np.uint8)
    patch = np.array([[1, 2, 3], [3, 0, 1]], np.uint8)  # 0 = transparent
    frames, _ = decode_gif(
        encode_gif([base, patch], pal, rects=[(0, 0), (2, 1)], transparent_idx=0)
    )
    # frame 0 is all transparent -> shows the background color (pal[0])
    npt.assert_array_equal(frames[0], np.tile(pal[0], (5, 6, 1)))
    exp = frames[0].copy()
    region = exp[1:3, 2:5]
    opaque = patch != 0
    region[opaque] = pal[patch][opaque]
    npt.assert_array_equal(frames[1], exp)


def test_disposal_restore_background_and_previous():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    f0 = np.full((4, 4), 2, np.uint8)
    f1 = np.full((2, 2), 3, np.uint8)
    f2 = np.full((2, 2), 5, np.uint8)
    # disposal 2: f1's rect reverts to background before f2 (placed elsewhere)
    frames, _ = decode_gif(
        encode_gif(
            [f0, f1, f2], pal, rects=[(0, 0), (1, 1), (2, 2)],
            disposals=[1, 2, 1], delays_cs=[5, 5, 5],
        )
    )
    npt.assert_array_equal(frames[0], pal[f0])
    e1 = pal[f0].copy()
    e1[1:3, 1:3] = pal[3]
    npt.assert_array_equal(frames[1], e1)
    e2 = pal[f0].copy()
    e2[1:3, 1:3] = pal[0]  # restored to bg
    e2[2:4, 2:4] = pal[5]
    npt.assert_array_equal(frames[2], e2)
    # disposal 3: canvas reverts to the pre-frame state
    frames, _ = decode_gif(
        encode_gif(
            [f0, f1, f2], pal, rects=[(0, 0), (1, 1), (1, 1)],
            disposals=[1, 3, 1], delays_cs=[5, 5, 5],
        )
    )
    e2 = pal[f0].copy()
    e2[1:3, 1:3] = pal[5]
    npt.assert_array_equal(frames[2], e2)


def test_hand_assembled_known_answer():
    """3x1 GIF87a assembled byte-by-byte (LZW codes 4,1,2,2,5 packed
    LSB-first at 3 bits = 0x8C 0x54): pins signature parsing, LSD/GCT
    layout, descriptor fields, sub-block framing, and LZW bit order
    against the spec rather than against our own encoder."""
    gct = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])
    g = (
        b"GIF87a"
        + bytes([3, 0, 1, 0, 0x81, 0, 0])  # 3x1, GCT of 4, bg 0
        + gct
        + bytes([0x2C, 0, 0, 0, 0, 3, 0, 1, 0, 0x00])  # full-rect image
        + bytes([0x02])  # LZW min code size
        + bytes([0x02, 0x8C, 0x54, 0x00])  # one sub-block + terminator
        + bytes([0x3B])
    )
    frames, delays = decode_gif(g)
    assert delays == [0]
    npt.assert_array_equal(
        frames[0], np.array([[[0, 255, 0], [0, 0, 255], [0, 0, 255]]], np.uint8)
    )


def test_rejects_malformed():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(8, 8), dtype=np.uint8)
    g = encode_gif([idx], pal)
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" + g)
    with pytest.raises(GifError):
        decode_gif(g[:20])  # truncated mid-structure
    with pytest.raises(GifError):
        decode_gif(g[:-1])  # missing trailer
    # image rect outside the logical screen
    bad = bytearray(g)
    # LSD width at offset 6 -> shrink the screen below the image rect
    bad[6:8] = (4).to_bytes(2, "little")
    with pytest.raises(GifError):
        decode_gif(bytes(bad))


def test_encoder_determinism():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    fr = [rng.integers(0, 16, size=(10, 10), dtype=np.uint8) for _ in range(3)]
    a = encode_gif(fr, pal, delays_cs=[1, 2, 3])
    b = encode_gif([f.copy() for f in fr], pal.copy(), delays_cs=[1, 2, 3])
    assert a == b
