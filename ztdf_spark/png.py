"""Pure-Python PNG codec (stdlib ``zlib`` only) — the round-5 playbook
(PPM/BMP/Y4M/JPEG) applied to the other ubiquitous image format. PNG is
DEFLATE + per-scanline prediction filters, both fully implementable from
the public spec (RFC 2083 / W3C PNG): the decoder is a REAL interchange
decoder (chunk walk with CRC verification, IHDR validation, multi-IDAT
reassembly, all five filter types), not a fixture-shaped stand-in.

Scope (round 6 completes the static-PNG profile): every spec-legal
bit-depth/color-type combination —

  color 0 (gray)        depths 1, 2, 4, 8, 16
  color 2 (RGB)         depths 8, 16
  color 3 (palette)     depths 1, 2, 4, 8
  color 4 (gray+alpha)  depths 8, 16
  color 6 (RGBA)        depths 8, 16

— with interlace none OR Adam7 (seven independently-filtered reduced
images scattered on the spec's (start, step) grids). Filtering operates
on BYTES with the spec's ``bpp = max(1, channels*depth/8)`` left
distance; sub-byte rows are bit-packed MSB-first with per-scanline byte
padding. Output is always HxWx3 uint8 RGB: gray replicated, alpha
dropped, palette resolved, 16-bit samples reduced to their high byte
(the exact inverse of the spec's left-bit-replication 8→16 scaling
v*257), sub-byte gray levels left-bit-replicated (v * 255/(2^d−1)).
Anything malformed or outside the profile raises ``ValueError`` (never a
wrong image) so ``mmops.decode_media`` falls through to its disclosed
fake — after round 6 that fall-through list no longer contains any PNG.

Correctness argument (mirrors jpeg.py): the format is LOSSLESS, so
``decode(encode(px, ...)) == px`` must hold EXACTLY for every filter
type, depth, and color type — and a mirrored encoder/decoder bug pair is
pinned down by known-answer tests that decode HAND-ASSEMBLED byte
streams (explicit filter bytes, hand-computed predictions, hand-packed
sub-byte rows) in tests/test_png.py.

Reference parity note: the reference (opentdf/nifi) has no media path at
all — this belongs to the training-data-pipeline surface the brief adds
(multimodal columns over binary payloads, SURVEY.md §2.4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# spec-legal bit depths per color type (W3C PNG §11.2.2, Table 11.1)
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}

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


def _stride(pw: int, ch: int, depth: int) -> int:
    """Bytes per packed scanline of ``pw`` pixels (bit rows byte-padded)."""
    return (pw * ch * depth + 7) // 8


def _unfilter(raw: bytes, offset: int, n_rows: int, stride: int, bpp: int):
    """Reverse per-scanline filtering for one (sub-)image of ``n_rows``
    rows of ``stride`` bytes each (filter byte + data per row); ``bpp`` is
    the spec's filter left-distance max(1, channels*depth/8). Returns
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
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up (vectorized)
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + need


def _rows_to_samples(rows: np.ndarray, pw: int, ch: int, depth: int, is_palette: bool):
    """Packed scanline bytes (n, stride) → per-pixel 8-bit samples
    (n, pw, ch) uint8. 16-bit takes the high byte (inverse of the spec's
    left-bit-replication v*257); sub-byte gray levels left-bit-replicate
    to 8 bits; palette indices stay raw (they index PLTE, not intensity)."""
    n = rows.shape[0]
    if depth == 8:
        return rows[:, : pw * ch].reshape(n, pw, ch)
    if depth == 16:
        return rows[:, : pw * ch * 2].reshape(n, pw, ch, 2)[:, :, :, 0]
    # depth 1/2/4: MSB-first bit groups, rows byte-padded
    bits = np.unpackbits(rows, axis=1)  # (n, stride*8)
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(n, -1, depth) * weights).sum(axis=2)[:, : pw * ch]
    if not is_palette:
        vals = vals * (255 // ((1 << depth) - 1))  # left-bit replication
    return vals.astype(np.uint8).reshape(n, pw, ch)


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
    if color not in _CHANNELS or depth not in _VALID_DEPTHS[color]:
        raise ValueError(f"illegal depth/color ({depth}/{color})")
    if w == 0 or h == 0 or w * h > 64_000_000:
        raise ValueError("bad dimensions")
    ch = _CHANNELS[color]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        rows, end = _unfilter(raw, 0, h, _stride(w, ch, depth), bpp)
        px = _rows_to_samples(rows, w, ch, depth, color == 3)
    else:
        # Adam7: seven independently-filtered reduced images, scattered
        # back onto the (start, step) pixel grid
        px = np.zeros((h, w, ch), dtype=np.uint8)
        end = 0
        for p in _ADAM7:
            pw, ph = _pass_dims(w, h, p)
            if pw == 0 or ph == 0:
                continue
            rows, end = _unfilter(raw, end, ph, _stride(pw, ch, depth), bpp)
            x0, y0, dx, dy = p
            px[y0::dy, x0::dx] = _rows_to_samples(rows, pw, ch, depth, color == 3)
    if end != len(raw):
        raise ValueError("decompressed size mismatch")
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 4:  # gray+alpha: gray replicated, alpha dropped
        return np.repeat(px[:, :, :1], 3, axis=2)
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


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """Per-pixel raw samples (n, pw, ch) → packed scanline bytes
    (n, stride). 16-bit big-endian; sub-byte MSB-first bit groups with
    per-row byte padding."""
    n, pw, ch = samples.shape
    if depth == 8:
        return samples.astype(np.uint8).reshape(n, pw * ch)
    if depth == 16:
        flat = samples.astype(">u2").reshape(n, pw * ch)
        return flat.view(np.uint8).reshape(n, pw * ch * 2)
    vals = samples.reshape(n, pw * ch).astype(np.uint8)
    shifts = np.arange(depth - 1, -1, -1)
    bits = ((vals[:, :, None] >> shifts) & 1).reshape(n, -1).astype(np.uint8)
    pad = _stride(pw, ch, depth) * 8 - bits.shape[1]
    if pad:
        bits = np.concatenate([bits, np.zeros((n, pad), np.uint8)], axis=1)
    return np.packbits(bits, axis=1)


def _filter_rows(flat: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Apply one filter type to every row of a (sub-)image's packed bytes
    ((n, stride) int32) and emit the spec's filter-byte-prefixed
    scanlines; ``bpp`` is the filter left-distance. ``prev`` starts at
    zeros — each interlace pass filters independently."""
    n, stride = flat.shape
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(n):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            pred = np.array(
                [_paeth(int(left[i]), int(prev[i]), int(ul[i])) for i in range(stride)],
                dtype=np.int32,
            )
            enc = (cur - pred) & 0xFF
        lines.append(filter_type)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur
    return bytes(lines)


def encode_png_ex(
    samples: np.ndarray,
    color_type: int,
    bit_depth: int,
    filter_type: int = 0,
    interlace: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """General PNG encoder over RAW SAMPLE VALUES at the target depth:
    ``samples`` is (h, w) for gray/palette or (h, w, ch) for multi-channel
    color types, every value < 2**bit_depth (uint16 allowed for 16-bit).
    Palette images need ``palette`` (K, 3) uint8. The non-default filter /
    interlace / depth modes exist so the decoder's un-filter, unpack, and
    de-interlace paths are exercised by lossless round trips; a real
    encoder would pick per-row — irrelevant for correctness, only size."""
    if color_type not in _CHANNELS or bit_depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(f"illegal depth/color ({bit_depth}/{color_type})")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    ch = _CHANNELS[color_type]
    if samples.ndim == 2:
        samples = samples[:, :, None]
    if samples.ndim != 3 or samples.shape[2] != ch:
        raise ValueError(f"need {ch} channel(s) for color type {color_type}")
    if bit_depth < 16 and int(samples.max(initial=0)) >= (1 << bit_depth):
        raise ValueError("sample out of range for bit depth")
    h, w = samples.shape[:2]
    bpp = max(1, ch * bit_depth // 8)
    if not interlace:
        raw = _filter_rows(_pack_rows(samples, bit_depth).astype(np.int32), bpp, filter_type)
    else:
        parts = []
        for p in _ADAM7:
            pw, ph = _pass_dims(w, h, p)
            if pw == 0 or ph == 0:
                continue
            x0, y0, dx, dy = p
            sub = samples[y0::dy, x0::dx]
            parts.append(_filter_rows(_pack_rows(sub, bit_depth).astype(np.int32), bpp, filter_type))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image needs a palette")
        out += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw, 9)) + _chunk(b"IEND", b"")


def encode_png(px: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB → 8-bit color-type-2 PNG (the common case;
    ``encode_png_ex`` covers every other depth/color combination)."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("need HxWx3 uint8 RGB")
    return encode_png_ex(px, 2, 8, filter_type=filter_type, interlace=interlace)
