"""Pure-Python GIF87a/GIF89a codec (decode + encode), no external libs.

Implements the public GIF specification (CompuServe GIF89a, 1990; also
W3C's archived copy): logical screen descriptor, global/local color
tables, variable-width LSB-first LZW with CLEAR/EOI codes and the 12-bit
dictionary cap, four-pass row interlacing, and GIF89a graphic-control
extensions (per-frame delay, transparency, disposal methods 0-3) with
full multi-frame canvas composition — so animated GIFs decode to real
composited RGB frames.

Role in the engine (same as jpeg.py / png.py): the reference
(opentdf/nifi) has no media operators; the brief's multimodal training
pipeline does, and web-scraped corpora are full of (animated) GIFs. This
gives mm_features / mm_resize / mm_frames a real multi-frame IMAGE codec
alongside the Y4M video path, keeping the mapInPandas plumbing identical
whether the decoder is this one or a drop-in PIL/ffmpeg.

Determinism: encoder output is a pure function of its inputs (greedy LZW,
fixed sub-block packing), so fixtures are byte-stable across runs and
executors.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class GifError(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZW (variable-width, LSB-first, as specified in GIF89a appendix F)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> bytes:
    """Decode a GIF LZW stream (sub-block framing already removed).

    ``expected`` (pixel count) bounds output so a corrupt stream can't
    balloon; raises GifError on any malformed construct."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as (prefix_code, last_byte); roots are (-1, i)
    prefix = [-1] * 4096
    last = [0] * 4096
    for i in range(clear):
        last[i] = i
    next_code = eoi + 1
    prev = -1
    out = bytearray()
    acc = bits = pos = 0
    n = len(data)

    def entry_bytes(code: int) -> bytes:
        # walk the prefix chain; chain length is bounded by table size
        chunk = bytearray()
        c = code
        while c != -1:
            chunk.append(last[c])
            c = prefix[c]
        chunk.reverse()
        return bytes(chunk)

    while True:
        while bits < width:
            if pos >= n:
                # stream ended without EOI: spec-tolerant decoders accept
                # this when the pixel count is already satisfied
                if expected is not None and len(out) >= expected:
                    return bytes(out[:expected])
                raise GifError("LZW stream truncated")
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if code == next_code:
            if prev == -1:
                raise GifError("LZW KwKwK code with no previous string")
            seq = entry_bytes(prev)
            seq = seq + seq[:1]
        elif code < next_code:
            seq = entry_bytes(code)
        else:
            raise GifError(f"LZW code {code} out of range (next={next_code})")
        out += seq
        if prev != -1 and next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = seq[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if expected is not None and len(out) > expected:
            raise GifError("LZW produced more pixels than the image holds")
    if expected is not None and len(out) != expected:
        raise GifError(f"LZW pixel count {len(out)} != expected {expected}")
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy GIF LZW encoder (emits CLEAR first, CLEAR again on table
    overflow, EOI last) — deterministic, round-trips with lzw_decode."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    s = b""
    for b in indices:
        sc = s + bytes([b])
        if sc in table:
            s = sc
            continue
        emit(table[s])
        if next_code < 4096:
            table[sc] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([b])
    if s:
        emit(table[s])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _subblocks(data: bytes) -> bytes:
    """Pack raw bytes into 255-byte-max GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(b):
            raise GifError("unterminated sub-block sequence")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise GifError("sub-block overruns payload")
        out += b[pos : pos + n]
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    return rows[order]


def decode_gif(data: bytes):
    """Decode a GIF into ``(frames, delays_cs)``: composited uint8 RGB
    frames (H, W, 3) on the logical-screen canvas, honoring frame
    placement rects, transparency, and disposal methods 0-3; delays in
    centiseconds (one per frame, 0 when absent)."""
    b = bytes(data)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF signature")
    if len(b) < 13:
        raise GifError("truncated logical screen descriptor")
    width, height, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if width == 0 or height == 0:
        raise GifError("zero-sized logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise GifError("truncated global color table")
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    # canvas starts as the background color (transparent regions of the
    # first frame therefore show it — deterministic, matches single-image
    # viewers; zeros when there is no GCT)
    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (height, width, 1)).astype(np.uint8)
        bg_rgb = gct[bg_idx]
    else:
        canvas = np.zeros((height, width, 3), np.uint8)
        bg_rgb = np.zeros(3, np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state (applies to the next image block)
    delay_cs, transp_idx, disposal = 0, -1, 0
    while True:
        if pos >= len(b):
            raise GifError("missing trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise GifError("truncated extension")
            label = b[pos]
            pos += 1
            payload, pos = _read_subblocks(b, pos)
            if label == 0xF9:  # graphic control
                if len(payload) < 4:
                    raise GifError("short graphic control extension")
                flags = payload[0]
                delay_cs = int.from_bytes(payload[1:3], "little")
                disposal = (flags >> 2) & 0x07
                transp_idx = payload[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise GifError(f"unknown block introducer 0x{block:02x}")
        if pos + 9 > len(b):
            raise GifError("truncated image descriptor")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if iw == 0 or ih == 0 or left + iw > width or top + ih > height:
            raise GifError("image rect outside logical screen")
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(b):
                raise GifError("truncated local color table")
            table = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifError("image has neither local nor global color table")
        if pos >= len(b):
            raise GifError("missing LZW min code size")
        mcs = b[pos]
        pos += 1
        stream, pos = _read_subblocks(b, pos)
        idx = np.frombuffer(
            lzw_decode(stream, mcs, expected=iw * ih), np.uint8
        ).reshape(ih, iw)
        if idx.max(initial=0) >= len(table):
            raise GifError("pixel index outside color table")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + ih, left : left + iw]
        rgb = table[idx]
        if transp_idx >= 0:
            opaque = idx != transp_idx
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:  # restore rect to background
            canvas[top : top + ih, left : left + iw] = bg_rgb
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        delay_cs, transp_idx, disposal = 0, -1, 0
    if not frames:
        raise GifError("GIF contains no image blocks")
    return frames, delays


def encode_gif(
    index_frames,
    palette: np.ndarray,
    *,
    delays_cs=None,
    interlace: bool = False,
    transparent_idx: int | None = None,
    disposals=None,
    rects=None,
    bg_idx: int = 0,
) -> bytes:
    """Encode index frames (uint8 arrays) + one global palette (N, 3)
    into a GIF. Multi-frame inputs get GIF89a graphic-control extensions
    (delays in centiseconds, optional transparency index and per-frame
    disposal); ``rects`` places frame k at (left, top) on the logical
    screen (defaults to (0, 0), screen size = frame 0's size)."""
    frames = [np.asarray(f, np.uint8) for f in index_frames]
    if not frames:
        raise GifError("need at least one frame")
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= len(pal) <= 256:
        raise GifError("palette must be (N,3) with 2 <= N <= 256")
    n_pal = 1 << max(1, (len(pal) - 1).bit_length())  # pad to power of 2
    gct_bits = n_pal.bit_length() - 1
    mcs = max(2, gct_bits)
    h0, w0 = frames[0].shape
    rects = rects or [(0, 0)] * len(frames)
    screen_w = max(left + f.shape[1] for (left, _t), f in zip(rects, frames))
    screen_h = max(top + f.shape[0] for (_l, top), f in zip(rects, frames))
    screen_w, screen_h = max(screen_w, w0), max(screen_h, h0)
    delays = delays_cs or [0] * len(frames)
    disposals = disposals or [1] * len(frames)
    animated = len(frames) > 1 or transparent_idx is not None or any(delays)
    out = bytearray()
    out += b"GIF89a" if animated else b"GIF87a"
    out += struct.pack("<HHBBB", screen_w, screen_h, 0x80 | (gct_bits - 1), bg_idx, 0)
    out += pal.tobytes() + b"\x00" * (3 * (n_pal - len(pal)))
    for f, (left, top), delay, disp in zip(frames, rects, delays, disposals):
        if f.max(initial=0) >= len(pal):
            raise GifError("frame index outside palette")
        if animated:
            flags = (disp & 0x07) << 2
            tidx = 0
            if transparent_idx is not None:
                flags |= 0x01
                tidx = transparent_idx
            out += b"\x21\xf9\x04" + struct.pack("<BHB", flags, delay, tidx) + b"\x00"
        fh, fw = f.shape
        ipacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, ipacked)
        rows = _interlace(f) if interlace else f
        out.append(mcs)
        out += _subblocks(lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)
