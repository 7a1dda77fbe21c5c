"""H.264 I_PCM codec tests: lossless round-trip (the correctness anchor —
I_PCM carries raw samples, so decode(encode(x)) must equal x bit-for-bit),
emulation-prevention escaping, cropping, VUI frame rate, and the honest
NotImplementedError boundary for residual-coded streams."""

import numpy as np
import pytest

from ztdf_spark.h264 import _escape, _unescape, decode_h264, encode_h264


def _frames(rng, w, h, n):
    return [
        (
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        )
        for _ in range(n)
    ]


def test_roundtrip_lossless_multiframe():
    rng = np.random.default_rng(2)
    for w, h, n in [(16, 16, 1), (32, 48, 3), (10, 6, 2), (34, 18, 4)]:
        fr = _frames(rng, w, h, n)
        dec, fps, dw, dh = decode_h264(encode_h264(fr, fps=5))
        assert (dw, dh, fps, len(dec)) == (w, h, 5.0, n)
        for a, b in zip(fr, dec):
            assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_emulation_prevention_on_zero_runs():
    # all-zero PCM forces 00 00 0x patterns: escaping must be present and
    # the round-trip still bit-exact
    z = [(np.zeros((16, 16), np.uint8), np.zeros((8, 8), np.uint8),
          np.zeros((8, 8), np.uint8))]
    bs = encode_h264(z, fps=3)
    assert bs.count(b"\x00\x00\x03") > 100
    dec, fps, _, _ = decode_h264(bs)
    assert np.array_equal(dec[0][0], z[0][0]) and fps == 3.0
    # the escape pair is its own inverse on raw byte strings
    raw = bytes([0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0])
    assert _unescape(_escape(raw)) == raw


def test_cropping_non_multiple_of_16():
    rng = np.random.default_rng(4)
    fr = _frames(rng, 18, 10, 2)  # pads to 32x16 with crop offsets
    bs = encode_h264(fr, fps=2)
    dec, _, w, h = decode_h264(bs)
    assert (w, h) == (18, 10)
    assert dec[0][0].shape == (10, 18) and dec[0][1].shape == (5, 9)
    assert np.array_equal(dec[1][0], fr[1][0])


def test_gates_and_errors():
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError, match="even"):
        encode_h264([(np.zeros((15, 16), np.uint8), np.zeros((7, 8), np.uint8),
                      np.zeros((7, 8), np.uint8))], fps=1)
    with pytest.raises(ValueError, match="frames"):
        encode_h264([], fps=1)
    with pytest.raises(ValueError):
        decode_h264(b"not an annex-b stream")
    # flipping the mb_type bits of a valid stream → residual-coded path
    # must raise NotImplementedError, never return wrong pixels
    bs = bytearray(encode_h264(_frames(rng, 16, 16, 1), fps=1))
    # the IDR NAL is the last one; mb_type ue(25) sits right after the
    # slice header — corrupt the first slice-data byte
    idr = bs.rfind(b"\x00\x00\x00\x01") + 5
    bs[idr + 2] ^= 0xFF
    with pytest.raises((NotImplementedError, ValueError)):
        decode_h264(bytes(bs))


def test_vui_fps_drives_sampling_stride():
    rng = np.random.default_rng(6)
    fr = _frames(rng, 16, 16, 6)
    for fps in (2, 3, 6):
        _, got, _, _ = decode_h264(encode_h264(fr, fps=fps))
        assert got == float(fps)
