"""Pure-Python AVI (RIFF) container codec carrying MJPEG video.

Implements the public AVI RIFF file format (Microsoft "AVI RIFF File
Reference": RIFF('AVI ') -> LIST('hdrl'){avih + LIST('strl'){strh,strf}}
+ LIST('movi'){'00dc' chunks} + 'idx1') with Motion-JPEG frames — each
'00dc' chunk is a complete baseline JPEG coded by :mod:`ztdf_spark.jpeg`.
This gives the media operators a REAL compressed-video decode path
(container walk + per-frame entropy decode); only codecs that genuinely
need ffmpeg (h264/opus) remain behind the disclosed fake.

Scale note: like the rest of :mod:`ztdf_spark.mmops`, this codec runs
inside Arrow-batched ``mapInPandas`` workers — one payload per row, no
shared state, so a 100 TB media table decodes embarrassingly parallel.

No reference-repo counterpart (the reference has no media operators);
format per the public Microsoft AVI RIFF spec and ITU-T T.81 for the
embedded JPEG frames.
"""
from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "decode_avi_mjpeg"]

_AVIIF_KEYFRAME = 0x10
_AVIF_HASINDEX = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + size + payload, word-aligned (pad byte
    after odd-sized payloads is required by the RIFF spec)."""
    return fourcc + struct.pack("<I", len(payload)) + payload + (b"\x00" if len(payload) & 1 else b"")


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int, *, lossy: bool = False, subsampling: str = "444"
) -> bytes:
    """Encode HxWx3 uint8 RGB frames as an AVI/MJPG file at ``fps``.

    Every frame becomes a standalone baseline JPEG in a '00dc' chunk
    (the defining property of Motion-JPEG: no inter-frame prediction,
    so any frame is independently decodable — which is also why frame
    sampling never has to decode more than the sampled frames)."""
    if not frames:
        raise ValueError("avi: need at least one frame")
    if fps <= 0:
        raise ValueError("avi: fps must be positive")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != frames[0].shape:
            raise ValueError("avi: all frames must share one geometry")
    payloads = [encode_jpeg(f, subsampling=subsampling, lossy=lossy) for f in frames]
    max_sz = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_sz * fps,              # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        _AVIF_HASINDEX,            # dwFlags
        len(frames),               # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_sz,                    # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,          # dwWidth, dwHeight, dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG",
        0, 0, 0,                   # dwFlags, wPriority, wLanguage
        0,                         # dwInitialFrames
        1, fps,                    # dwScale, dwRate -> fps = rate/scale
        0, len(frames),            # dwStart, dwLength (frames)
        max_sz,                    # dwSuggestedBufferSize
        -1, 0,                     # dwQuality, dwSampleSize
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = bytearray()
    index = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc; the fourcc
        # itself is 4 bytes, so the first chunk sits at offset 4
        index += struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, 4 + len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
    body = hdrl + _list(b"movi", bytes(movi_body)) + _chunk(b"idx1", bytes(index))
    return _chunk(b"RIFF", b"AVI " + body)


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking word-aligned
    RIFF chunks in buf[pos:end]; truncated chunks raise."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        if pos + 8 + sz > end:
            raise ValueError("avi: truncated chunk")
        yield fourcc, pos + 8, sz
        pos += 8 + sz + (sz & 1)


def decode_avi_mjpeg(data: bytes) -> tuple[list[np.ndarray], float]:
    """Decode an AVI/MJPG payload to (RGB frames, fps).

    fps comes from the stream header's dwRate/dwScale (falling back to
    avih's dwMicroSecPerFrame when the stream header is absent); frames
    come from '00dc' chunks inside LIST('movi'), each decoded as a
    standalone JPEG. Non-MJPG video streams raise (h264 etc. need
    ffmpeg — the caller's disclosed-fake seam)."""
    b = bytes(data)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI payload")
    (riff_sz,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_sz)

    fps = None
    usec_per_frame = None
    handler = None
    frames: list[np.ndarray] = []
    for fourcc, start, sz in _iter_chunks(b, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = b[start : start + 4]
        if ltype == b"hdrl":
            for c4, s2, z2 in _iter_chunks(b, start + 4, start + sz):
                if c4 == b"avih":
                    (usec_per_frame,) = struct.unpack_from("<I", b, s2)
                elif c4 == b"LIST" and b[s2 : s2 + 4] == b"strl":
                    for c3, s3, z3 in _iter_chunks(b, s2 + 4, s2 + z2):
                        if c3 == b"strh" and b[s3 : s3 + 4] == b"vids":
                            handler = b[s3 + 4 : s3 + 8]
                            scale, rate = struct.unpack_from("<II", b, s3 + 20)
                            if scale > 0 and rate > 0:
                                fps = rate / scale
        elif ltype == b"movi":
            for c4, s2, z2 in _iter_chunks(b, start + 4, start + sz):
                if c4[2:4] == b"dc":
                    frames.append(decode_jpeg(b[s2 : s2 + z2]))
    if handler is not None and handler not in (b"MJPG", b"mjpg"):
        raise ValueError(f"avi: unsupported video codec {handler!r} (MJPG only)")
    if not frames:
        raise ValueError("avi: no decodable MJPG frames")
    if fps is None:
        if not usec_per_frame:
            raise ValueError("avi: no frame-rate information")
        fps = 1_000_000.0 / usec_per_frame
    return frames, float(fps)
