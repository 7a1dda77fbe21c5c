"""Pure-Python PNG codec (stdlib ``zlib`` only) — the round-5 playbook
(PPM/BMP/Y4M/JPEG) applied to the other ubiquitous image format. PNG is
DEFLATE + per-scanline prediction filters, both fully implementable from
the public spec (RFC 2083 / W3C PNG): the decoder is a REAL interchange
decoder (chunk walk with CRC verification, IHDR validation, multi-IDAT
reassembly, all five filter types, 8-bit gray / RGB / RGBA / palette),
not a fixture-shaped stand-in.

Scope (raises ``ValueError`` outside it, so ``mmops.decode_media`` falls
through to its disclosed fake): bit depth 8, interlace none OR Adam7
(round 6 — seven independently-filtered reduced images scattered on the
spec's (start, step) grids), color types 0 (gray), 2 (RGB), 3 (palette),
6 (RGBA). Output is always HxWx3 uint8 RGB (gray replicated, alpha
dropped, palette resolved).

Correctness argument (mirrors jpeg.py): the format is LOSSLESS, so
``decode(encode(px, filter_type=f)) == px`` must hold EXACTLY for every
filter type — and a mirrored encoder/decoder bug pair is pinned down by
a known-answer test that decodes a HAND-ASSEMBLED byte stream (explicit
filter bytes, hand-computed predictions) in tests/test_png.py.

Reference parity note: the reference (opentdf/nifi) has no media path at
all — this belongs to the training-data-pipeline surface the brief adds
(multimodal columns over binary payloads, SURVEY.md §2.4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}

# Adam7 interlace passes: (x_start, y_start, x_step, y_step). Each pass is
# an independently-filtered reduced image; pixels scatter back on the
# (start, step) grid (W3C PNG §8.2).
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _paeth(a: int, b: int, c: int) -> int:
    """The spec's Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, offset: int, n_rows: int, stride: int, ch: int):
    """Reverse per-scanline filtering for one (sub-)image of ``n_rows``
    rows of ``stride`` bytes each (filter byte + data per row). Returns
    (rows uint8 (n_rows, stride), next offset). The ``prev`` row resets to
    zeros — each interlace pass filters independently."""
    need = n_rows * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("decompressed size mismatch")
    out = np.zeros((n_rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(n_rows):
        row_start = offset + y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub (sequential left dependency)
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up (vectorized)
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + need


def _pass_dims(w: int, h: int, p: tuple[int, int, int, int]) -> tuple[int, int]:
    x0, y0, dx, dy = p
    pw = (w - x0 + dx - 1) // dx if w > x0 else 0
    ph = (h - y0 + dy - 1) // dy if h > y0 else 0
    return pw, ph


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB. ``ValueError`` on anything malformed
    or outside the supported profile (never a wrong image)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    seen_iend = False
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError("unknown interlace method")
    if depth != 8 or color not in _CHANNELS:
        raise ValueError(f"unsupported depth/color ({depth}/{color})")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, end = _unfilter(raw, 0, h, w * ch, ch)
        px = rows.reshape(h, w, ch)
    else:
        # Adam7: seven independently-filtered reduced images, scattered
        # back onto the (start, step) pixel grid
        px = np.zeros((h, w, ch), dtype=np.uint8)
        end = 0
        for p in _ADAM7:
            pw, ph = _pass_dims(w, h, p)
            if pw == 0 or ph == 0:
                continue
            rows, end = _unfilter(raw, end, ph, pw * ch, ch)
            x0, y0, dx, dy = p
            px[y0::dy, x0::dx] = rows.reshape(ph, pw, ch)
    if end != len(raw):
        raise ValueError("decompressed size mismatch")
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 6:
        return px[:, :, :3].copy()
    # palette
    if plte is None or len(plte) % 3:
        raise ValueError("palette image without valid PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("palette index out of range")
    return pal[idx]


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_rows(flat: np.ndarray, ch: int, filter_type: int) -> bytes:
    """Apply one filter type to every row of a (sub-)image ((n, stride)
    int32) and emit the spec's filter-byte-prefixed scanlines. ``prev``
    starts at zeros — each interlace pass filters independently."""
    n, stride = flat.shape
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(n):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            pred = np.array(
                [_paeth(int(left[i]), int(prev[i]), int(ul[i])) for i in range(stride)],
                dtype=np.int32,
            )
            enc = (cur - pred) & 0xFF
        lines.append(filter_type)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur
    return bytes(lines)


def encode_png(px: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB → PNG bytes, every scanline filtered with
    ``filter_type`` (0..4); ``interlace=True`` emits Adam7 (seven
    independently-filtered reduced images). The non-default modes exist so
    the decoder's un-filter and de-interlace paths are exercised by
    lossless round trips; a real encoder would pick per-row — irrelevant
    for correctness, only for size."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("need HxWx3 uint8 RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    h, w, _ = px.shape
    ch = 3
    if not interlace:
        raw = _filter_rows(px.reshape(h, w * ch).astype(np.int32), ch, filter_type)
    else:
        parts = []
        for p in _ADAM7:
            pw, ph = _pass_dims(w, h, p)
            if pw == 0 or ph == 0:
                continue
            x0, y0, dx, dy = p
            sub = px[y0::dy, x0::dx]
            parts.append(
                _filter_rows(sub.reshape(ph, pw * ch).astype(np.int32), ch, filter_type)
            )
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )
