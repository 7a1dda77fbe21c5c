"""Pure-Python FLAC codec (ztdf_spark/flac.py). Two independent checks:
(a) LOSSLESSNESS — decode(encode(x)) must equal x bit-for-bit, so an
encoder/decoder pair that merely mirrored each other's bugs could not
land back on the source samples; (b) hand-assembled bitstreams pin the
decoder paths the encoder never emits (stereo decorrelation modes, LPC
prediction, rice escape partitions, partition order > 0, wasted bits)
against the spec, not the encoder."""

import struct

import numpy as np
import pytest

from ztdf_spark import mmops
from ztdf_spark.flac import _BW, _crc8, _crc16, _utf8_num, decode_flac, encode_flac


def test_roundtrip_lossless_all_shapes():
    rng = np.random.default_rng(2)
    cases = [
        ((8000 * np.sin(2 * np.pi * np.arange(10000) / 100)).astype(np.int16), 8000, 1),
        (rng.integers(-32768, 32768, size=9000 * 2, dtype=np.int16), 16000, 2),
        (np.full(5000, -123, np.int16), 8000, 1),
        (np.array([1, -2, 3], np.int16), 8000, 1),
        (np.arange(-16000, 16000, 2, dtype=np.int16), 22050, 1),
        (np.array([32767, -32768] * 100, np.int16), 8000, 2),  # extremes
    ]
    for x, sr, nch in cases:
        y, sr2, nch2 = decode_flac(encode_flac(x, sr, nch))
        assert (sr2, nch2) == (sr, nch)
        assert np.array_equal(x, y)


def test_compression_actually_compresses_smooth_signals():
    sine = (8000 * np.sin(2 * np.pi * np.arange(20000) / 100)).astype(np.int16)
    assert len(encode_flac(sine, 8000, 1)) < 0.6 * sine.nbytes


def test_rejects_malformed():
    x = np.arange(100, dtype=np.int16)
    blob = bytearray(encode_flac(x, 8000, 1))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(blob[4:]))
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[: len(blob) // 2]))  # truncated
    blob[-3] ^= 0xFF  # corrupt inside the last frame's payload/crc region
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


# --- hand-assembled streams: decoder paths the encoder never emits ---


def _stream(frames: bytes, sr: int, nch: int, total: int) -> bytes:
    si = _BW()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # bps 16
    si.write(total, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + frames


def _frame_header(blk: int, ch_code: int) -> bytearray:
    h = _BW()
    h.write(0b11111111111110, 14)
    h.write(0, 2)  # reserved + fixed blocking
    h.write(0b0111, 4)  # 16-bit blocksize at end
    h.write(0, 4)  # sr from streaminfo
    h.write(ch_code, 4)
    h.write(0b100, 3)  # bps 16
    h.write(0, 1)
    out = bytearray(h.bytes())
    out += _utf8_num(0)
    out += struct.pack(">H", blk - 1)
    out.append(_crc8(bytes(out)))
    return out


def _verbatim(bw: _BW, vals, bits):
    bw.write(0, 1)
    bw.write(0b000001, 6)
    bw.write(0, 1)
    for v in vals:
        bw.write(int(v) & ((1 << bits) - 1), bits)


def _finish(head: bytearray, body: _BW) -> bytes:
    body.align()
    f = bytes(head) + body.bytes()
    return f + struct.pack(">H", _crc16(f))


@pytest.mark.parametrize(
    "ch_code,mode",
    [(8, "left_side"), (9, "right_side"), (10, "mid_side")],
)
def test_stereo_decorrelation_modes(ch_code, mode):
    left = [100, -50, 32000, -32768]
    right = [90, -60, 31990, -32760]
    side = [l - r for l, r in zip(left, right)]
    head = _frame_header(4, ch_code)
    body = _BW()
    if mode == "left_side":
        _verbatim(body, left, 16)
        _verbatim(body, side, 17)
    elif mode == "right_side":
        _verbatim(body, side, 17)
        _verbatim(body, right, 16)
    else:
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        _verbatim(body, mid, 16)
        _verbatim(body, side, 17)
    blob = _stream(_finish(head, body), 8000, 2, 4)
    y, sr, nch = decode_flac(blob)
    assert (sr, nch) == (8000, 2)
    assert list(y[0::2]) == left and list(y[1::2]) == right


def test_lpc_subframe():
    """LPC order 2, coefs (2,-1), shift 0 — algebraically the FIXED-2
    predictor, so expectation is computable by hand."""
    warm = [10, 20]
    res = [3, -4, 5]
    head = _frame_header(5, 0)  # mono
    body = _BW()
    body.write(0, 1)
    body.write(0b100000 | 1, 6)  # LPC, order-1 = 1 -> order 2
    body.write(0, 1)
    for v in warm:
        body.write(v & 0xFFFF, 16)
    body.write(14, 4)  # precision-1 -> 15 bits
    body.write(0, 5)  # shift 0
    body.write(2 & 0x7FFF, 15)  # coef a1 = 2
    body.write(-1 & 0x7FFF, 15)  # coef a2 = -1
    body.write(0, 2)  # residual method 0
    body.write(0, 4)  # partition order 0
    body.write(4, 4)  # rice k=4
    for v in res:
        zz = 2 * v if v >= 0 else -2 * v - 1
        body.unary(zz >> 4)
        body.write(zz & 0xF, 4)
    blob = _stream(_finish(head, body), 8000, 1, 5)
    y, _sr, _nch = decode_flac(blob)
    exp = list(warm)
    for r in res:
        exp.append(r + 2 * exp[-1] - exp[-2])
    assert list(y) == exp


def test_rice_escape_partition_and_order1():
    """Partition order 1 (two partitions), first rice-coded, second the
    5-bit ESCAPE (raw 8-bit residuals)."""
    head = _frame_header(8, 0)
    body = _BW()
    body.write(0, 1)
    body.write(0b001000, 6)  # FIXED order 0 (residual = signal)
    body.write(0, 1)
    body.write(0, 2)  # method 0
    body.write(1, 4)  # partition order 1 -> 2 partitions of 4
    body.write(2, 4)  # partition 1: rice k=2
    p1, p2 = [1, -1, 2, 0], [100, -100, 7, -8]
    for v in p1:
        zz = 2 * v if v >= 0 else -2 * v - 1
        body.unary(zz >> 2)
        body.write(zz & 3, 2)
    body.write(0xF, 4)  # partition 2: escape
    body.write(8, 5)  # raw 8-bit residuals
    for v in p2:
        body.write(v & 0xFF, 8)
    blob = _stream(_finish(head, body), 8000, 1, 8)
    y, _sr, _nch = decode_flac(blob)
    assert list(y) == p1 + p2


def test_wasted_bits_shift():
    head = _frame_header(3, 0)
    body = _BW()
    body.write(0, 1)
    body.write(0b000001, 6)  # verbatim
    body.write(1, 1)  # wasted-bits flag
    body.write(1, 1)  # unary 0 -> 1 wasted bit
    for v in (5, -3, 7):  # 15-bit effective samples
        body.write(v & 0x7FFF, 15)
    blob = _stream(_finish(head, body), 8000, 1, 3)
    y, _sr, _nch = decode_flac(blob)
    assert list(y) == [10, -6, 14]  # shifted back up by the wasted bit


def test_mm_integration_flac(spark):
    """sniff + decode_media + fixture rows + independent-oracle parity."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracles import _oracle_decode

    sine = (9000 * np.sin(2 * np.pi * np.arange(3000) / 60)).astype(np.int16)
    blob = encode_flac(sine, 16000, 1)
    assert mmops.sniff_format(blob) == "flac"
    feat = mmops.decode_media(blob, "audio")
    assert feat[0] == 1.0 and feat[1] == pytest.approx(16.0)
    assert feat[2] == pytest.approx(3000 / 16000)
    assert np.array_equal(feat, _oracle_decode(blob, "audio"))
