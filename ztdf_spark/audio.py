"""Pure-numpy compressed-audio codecs: G.711 µ-law / A-law and IMA ADPCM.

Gives the media operators REAL compressed-audio decode paths (the classic
telephony and 4:1 nibble codecs carried inside WAV containers — format
tags 7, 6 and 0x11) alongside PCM-16; only codecs that genuinely need an
external library (opus/mp3) remain behind the disclosed fake.

All decoders are vectorized numpy except the inherently sequential ADPCM
predictor loop, which runs per payload inside the same Arrow-batched
``mapInPandas`` workers as the rest of :mod:`ztdf_spark.mmops` — one blob
per row, no shared state, embarrassingly parallel at 100 TB.

Formulas follow the public ITU-T G.711 companding definitions (the
classic public-domain g711.c segment tables) and the IMA ADPCM spec
(step/index tables, 4-byte block headers in WAV format 0x11).

No reference-repo counterpart (the reference has no media operators).
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "mulaw_encode", "mulaw_decode", "alaw_encode", "alaw_decode",
    "adpcm_ima_encode", "adpcm_ima_decode",
]

_SEG_EDGES = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear -> µ-law byte (G.711: bias 0x84, 8 segments, bit-complemented)."""
    x = np.asarray(x, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    seg = np.searchsorted(_SEG_EDGES, mag, side="left").astype(np.int32)
    mant = (mag >> (seg + 3)) & 0xF
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """µ-law byte -> int16 linear."""
    u = (~np.asarray(u, dtype=np.int32)) & 0xFF
    t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 0x7)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


_A_EDGES = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 linear -> A-law byte (G.711: 13-bit domain, 0x55 toggle;
    the A-law transmission sign bit marks POSITIVE values)."""
    x13 = np.asarray(x, dtype=np.int32) >> 3
    neg = x13 < 0
    mag = np.where(neg, -x13 - 1, x13)
    seg = np.searchsorted(_A_EDGES, mag, side="left").astype(np.int32)
    clip = seg >= 8
    seg = np.minimum(seg, 7)
    mant = np.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    aval = np.where(clip, 0x7F, (seg << 4) | mant)
    return ((aval ^ np.where(neg, 0x55, 0xD5)) & 0xFF).astype(np.uint8)


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """A-law byte -> int16 linear (classic g711.c alaw2linear)."""
    a = np.asarray(a, dtype=np.int32) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a >> 4) & 0x7
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767,
], dtype=np.int32)
_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM predictor update: (new_pred, new_index)."""
    step = int(_STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_INDEX_TABLE[nibble & 7])))
    return pred, index


def adpcm_ima_encode(samples: np.ndarray, samples_per_block: int = 505) -> bytes:
    """Mono int16 -> IMA ADPCM WAV-format-0x11 blocks.

    Each block: 4-byte header (predictor int16, step index uint8, pad)
    whose predictor IS the block's first output sample, then
    ``samples_per_block - 1`` nibbles packed low-first. The encoder runs
    the decoder's own predictor update, so decode(encode(x)) equals the
    encoder's internal reconstruction exactly."""
    x = np.asarray(samples, dtype=np.int32)
    if (samples_per_block - 1) % 2:
        raise ValueError("adpcm: samples_per_block must be odd (whole data bytes)")
    out = bytearray()
    # seed the step index from the first sample delta (classic warm-start:
    # index 0 = step 7 would lag a steep signal for the whole first ramp)
    d0 = int(abs(int(x[1]) - int(x[0]))) if len(x) > 1 else 0
    index = int(min(np.searchsorted(_STEP_TABLE, max(d0, 1)), 88))
    for b0 in range(0, len(x), samples_per_block):
        blk = x[b0 : b0 + samples_per_block]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in blk[1:]:
            step = int(_STEP_TABLE[index])
            delta = int(s) - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            pred, index = _adpcm_step(nib, pred, index)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_ima_decode(data: bytes, samples_per_block: int = 505, n_samples: int | None = None) -> np.ndarray:
    """IMA ADPCM WAV-format-0x11 blocks -> mono int16."""
    data = bytes(data)
    block_bytes = 4 + (samples_per_block - 1) // 2
    out: list[int] = []
    for b0 in range(0, len(data), block_bytes):
        blk = data[b0 : b0 + block_bytes]
        if len(blk) < 4:
            raise ValueError("adpcm: truncated block header")
        pred, index, _pad = struct.unpack_from("<hBB", blk, 0)
        index = max(0, min(88, index))
        out.append(pred)
        for byte in blk[4:]:
            for nib in (byte & 0xF, byte >> 4):
                pred, index = _adpcm_step(nib, pred, index)
                out.append(pred)
    arr = np.asarray(out, dtype=np.int16)
    return arr[:n_samples] if n_samples is not None else arr
