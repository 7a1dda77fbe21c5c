"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode status (round 6): REAL pure-Python decoders for at least one
container per modality — WAV audio in PCM-16 (stdlib ``wave``) plus the
G.711 µ-law/A-law and IMA-ADPCM compressed codecs
(``ztdf_spark/audio.py``) and lossless FLAC (rice/fixed/LPC bitstream,
``ztdf_spark/flac.py``), PPM (P6),
BMP (24-bit uncompressed), JPEG (baseline SOF0 AND progressive SOF2,
``ztdf_spark/jpeg.py``), PNG (every spec-legal static profile:
depths 1/2/4/8/16, gray/RGB/palette/gray-alpha/RGBA, plain + Adam7
interlaced, ``ztdf_spark/png.py``) and GIF (87a/89a LZW, interlace,
transparency/disposal composition incl. ANIMATED multi-frame,
``ztdf_spark/gif.py``) images, Y4M (YUV4MPEG2, C444 + C420*),
animated-GIF, AVI/MJPEG (RIFF container walk + per-frame baseline
JPEG, ``ztdf_spark/avi.py``) and H.264 Annex-B I_PCM (real NAL/SPS/PPS/
slice parsing, Exp-Golomb, emulation prevention, VUI frame rate,
``ztdf_spark/h264.py``) video — no external media libraries
needed. Formats this container cannot decode
(residual-coded h264 — CAVLC/CABAC macroblocks, opus,
arithmetic-coded jpeg) still fall back to the
disclosed deterministic fake (content-hash-derived vector) when
``deterministic_fake=True``, else ``NotImplementedError``; a real codec
library (PIL/ffmpeg/torchaudio) drops in behind the same ``decode_media``
signature.

Scale notes: media blobs dominate row size → ``spark.sql.files.
maxPartitionBytes`` and Arrow ``maxRecordsPerBatch`` must be tuned so one
Arrow batch of blobs fits executor memory; feature extraction / resize /
frame sampling are embarrassingly parallel (no shuffle), and outputs are
narrow rows, so the pattern is scan-heavy map-only — the ideal 100 TB
shape.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"
RESIZE_SCHEMA = "media_id long, out_w int, out_h int, resized_md5 string"

FEAT_DIM = 16


# ---------------------------------------------------------------------------
# Fixture builders (manual struct packing — deliberately a DIFFERENT code
# path from the decoders below, so an encode/decode bug cannot cancel out)
# ---------------------------------------------------------------------------


def make_wav(samples: np.ndarray, sample_rate: int, n_channels: int) -> bytes:
    """Minimal RIFF/WAVE PCM-16 container around interleaved int16 samples."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def make_ppm(pixels: np.ndarray, maxval: int = 255) -> bytes:
    """Binary PPM (P6): ASCII header + raw RGB bytes. pixels: (h, w, 3) u8."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n{maxval}\n".encode() + np.asarray(pixels, dtype=np.uint8).tobytes()


def make_y4m(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    fps_num: int,
    fps_den: int = 1,
    colorspace: str = "C444",
) -> bytes:
    """YUV4MPEG2 container: ASCII stream header + ``FRAME``-delimited raw
    YUV planes — the uncompressed video format parseable without ffmpeg
    (the video analog of the PPM/BMP fixtures). ``frames``: (y, u, v) u8
    planes; C444 = full-size chroma, C420* = half-size chroma."""
    y0 = frames[0][0]
    h, w = y0.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 {colorspace}\n".encode()]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.asarray(y, dtype=np.uint8).tobytes())
        out.append(np.asarray(u, dtype=np.uint8).tobytes())
        out.append(np.asarray(v, dtype=np.uint8).tobytes())
    return b"".join(out)


def make_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit bottom-up BMP. pixels: (h, w, 3) u8 in RGB order."""
    h, w, _ = pixels.shape
    row_pad = (-(w * 3)) % 4
    body = b"".join(
        pixels[r, :, ::-1].tobytes() + b"\x00" * row_pad  # rows bottom-up, BGR
        for r in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"\x00\x00\x00\x01" or payload[:3] == b"\x00\x00\x01":
        return "h264"  # Annex-B elementary stream
    return None


def make_wav_ex(samples: np.ndarray, sample_rate: int, n_channels: int, codec: str = "pcm") -> bytes:
    """WAV container around int16 samples under a chosen codec: ``pcm``
    (format tag 1, the make_wav path), ``ulaw``/``alaw`` (G.711, tags
    7/6, one byte per sample) or ``adpcm`` (IMA ADPCM, tag 0x11, mono,
    4-bit nibbles in 505-sample blocks). Non-PCM codecs carry the
    spec-required extended fmt (cbSize) and a fact chunk with the true
    sample count (needed to trim ADPCM block padding on decode)."""
    from . import audio as _audio

    s = np.asarray(samples, dtype="<i2")
    if codec == "pcm":
        return make_wav(s, sample_rate, n_channels)
    if codec in ("ulaw", "alaw"):
        enc = _audio.mulaw_encode(s) if codec == "ulaw" else _audio.alaw_encode(s)
        data = enc.tobytes()
        tag, block_align, bits, extra = (7 if codec == "ulaw" else 6), n_channels, 8, b"\x00\x00"
        spb = None
    elif codec == "adpcm":
        if n_channels != 1:
            raise ValueError("adpcm wav: mono only")
        spb = 505
        data = _audio.adpcm_ima_encode(s, samples_per_block=spb)
        tag, block_align, bits = 0x11, 4 + (spb - 1) // 2, 4
        extra = struct.pack("<HH", 2, spb)  # cbSize=2, samplesPerBlock
    else:
        raise ValueError(f"unknown wav codec {codec!r}")
    avg_bps = sample_rate * block_align // spb if spb else sample_rate * n_channels
    fmt = struct.pack("<HHIIHH", tag, n_channels, sample_rate, avg_bps, block_align, bits) + extra
    fact = struct.pack("<I", len(s) // n_channels)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_pcm(payload: bytes) -> tuple[np.ndarray, int, int]:
    """(interleaved int16 samples, sample_rate, n_channels). PCM-16 goes
    through stdlib wave; compressed tags (G.711 µ-law/A-law, IMA ADPCM)
    take a manual RIFF walk + the REAL pure-numpy expanders in
    ztdf_spark/audio.py."""
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                raise ValueError("only PCM-16 wav supported")
            sr, nch = wf.getframerate(), wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
        return np.frombuffer(raw, dtype="<i2"), sr, nch
    except wave.Error:
        pass  # non-PCM format tag: decode below
    from . import audio as _audio

    b = bytes(payload)
    pos, fmt_raw, data, n_samp = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            fmt_raw = b[pos + 8 : pos + 8 + sz]
        elif cid == b"fact":
            (n_samp,) = struct.unpack_from("<I", b, pos + 8)
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if fmt_raw is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    tag, nch, sr = struct.unpack_from("<HHI", fmt_raw, 0)
    if tag == 7:
        s = _audio.mulaw_decode(np.frombuffer(data, np.uint8))
    elif tag == 6:
        s = _audio.alaw_decode(np.frombuffer(data, np.uint8))
    elif tag == 0x11:
        if nch != 1:
            raise ValueError("adpcm wav: mono only")
        (spb,) = struct.unpack_from("<H", fmt_raw, 18)
        s = _audio.adpcm_ima_decode(data, samples_per_block=spb, n_samples=n_samp)
    else:
        raise ValueError(f"wav: unsupported format tag {tag}")
    if n_samp is not None:
        s = s[: n_samp * nch]
    return s, sr, nch


def _wav_features(payload: bytes) -> np.ndarray:
    return _audio_features(*_wav_pcm(payload))


def _flac_features(payload: bytes) -> np.ndarray:
    """REAL FLAC decode (ztdf_spark/flac.py — lossless rice/fixed/LPC
    bitstream) → the same audio statistic family as the WAV path."""
    from .flac import decode_flac

    return _audio_features(*decode_flac(payload))


def _audio_features(s: np.ndarray, sr: int, nch: int) -> np.ndarray:
    x = s.astype(np.float64) / 32768.0
    n = max(1, len(x))
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
    seg = np.array_split(x, 8)
    seg_rms = [float(np.sqrt(np.mean(p * p))) if len(p) else 0.0 for p in seg]
    feats = [
        float(nch),
        sr / 1000.0,
        (len(x) / nch) / sr,  # duration seconds
        float(np.sqrt(np.mean(x * x))),
        float(np.max(np.abs(x))) if len(x) else 0.0,
        float(np.mean(np.abs(x))),
        zc,
        float(np.mean(x)),  # dc offset
        *seg_rms,
    ]
    return np.asarray(feats, dtype=np.float32)


def _png_rgb(payload: bytes) -> np.ndarray:
    """REAL PNG decode (ztdf_spark/png.py — chunk walk, CRC, inflate,
    all five prediction filters); unsupported profiles raise ValueError."""
    from .png import decode_png

    return decode_png(bytes(payload))


def _jpeg_rgb(payload: bytes) -> np.ndarray:
    """Baseline-JPEG decode to HxWx3 (grayscale sources replicated)."""
    from .jpeg import decode_jpeg

    px = decode_jpeg(payload)
    return np.stack([px] * 3, axis=-1) if px.ndim == 2 else px


def _gif_rgb(payload: bytes) -> np.ndarray:
    """REAL GIF decode (ztdf_spark/gif.py — LZW, interlace, palettes),
    first composited frame; malformed streams raise ValueError."""
    from .gif import decode_gif

    return decode_gif(bytes(payload))[0][0]


def _gif_frames(payload: bytes):
    """(composited RGB frames, fps) for a (possibly animated) GIF: fps
    from the first frame's delay (centiseconds; GIF's conventional 10 cs
    default when absent/zero)."""
    from .gif import decode_gif

    frames, delays = decode_gif(bytes(payload))
    delay_cs = delays[0] if delays and delays[0] > 0 else 10
    return frames, 100.0 / delay_cs


def _h264_features(payload: bytes) -> np.ndarray:
    """Video feature vector from REALLY decoded H.264 I_PCM planes
    (ztdf_spark/h264.py): same statistic layout as _y4m_features, fps
    from the stream's own VUI timing. fmt_tag 8.0."""
    from .h264 import decode_h264

    frames, fps, w, h = decode_h264(payload)
    ys = np.stack([f[0].astype(np.float64) for f in frames])
    feats = [
        float(w), float(h), float(len(frames)), fps,
        float(ys.mean()), float(ys.std()),
        float(np.mean([f[1].astype(np.float64).mean() for f in frames])),
        float(np.mean([f[2].astype(np.float64).mean() for f in frames])),
        float(ys[0].mean()), float(ys[-1].mean()),
        float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
        0.0, 0.0, 0.0, 0.0, 8.0,
    ]
    return np.asarray(feats, dtype=np.float32)


def _rgb_features(px: np.ndarray, fmt_tag: float) -> np.ndarray:
    h, w, _ = px.shape
    f = px.astype(np.float64)
    mean = f.mean(axis=(0, 1))
    std = f.std(axis=(0, 1))
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    gx = float(np.mean(np.abs(np.diff(luma, axis=1)))) if w > 1 else 0.0
    gy = float(np.mean(np.abs(np.diff(luma, axis=0)))) if h > 1 else 0.0
    feats = [
        float(w), float(h),
        mean[0], mean[1], mean[2],
        std[0], std[1], std[2],
        float(f.min()), float(f.max()),
        float(luma.mean()), gx, gy,
        0.0, 0.0, fmt_tag,
    ]
    return np.asarray(feats, dtype=np.float32)


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """Parse binary PPM (P6) incl. comments → (h, w, 3) u8."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _bmp_pixels(payload: bytes) -> np.ndarray:
    """Parse uncompressed 24-bit BMP → (h, w, 3) u8 RGB, top-down."""
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off).reshape(w, 3)
        rows.append(row[:, ::-1])  # BGR → RGB
    px = np.stack(rows)
    return px[::-1] if bottom_up else px


def _y4m_frames(payload: bytes) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray]], float, int, int]:
    """Parse YUV4MPEG2 → ([(y, u, v) u8 planes per frame], fps, w, h).
    Supports C444 (full chroma) and the C420* family (half-size chroma);
    interlacing/aspect params are tolerated and ignored."""
    nl = payload.index(b"\n")
    w = h = None
    fps = 25.0
    cs = "C420jpeg"  # the Y4M default when no C param is present
    for tok in payload[9:nl].split():
        t = tok.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t.startswith("C"):
            cs = t
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if cs.startswith("C444"):
        cw, ch = w, h
    elif cs.startswith("C420"):
        cw, ch = w // 2, h // 2
    else:
        raise ValueError(f"unsupported y4m colorspace {cs}")
    ysz, csz = w * h, cw * ch
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m frame marker missing")
        pos = payload.index(b"\n", pos) + 1  # frame params tolerated
        if pos + ysz + 2 * csz > len(payload):
            raise ValueError("truncated y4m frame")
        y = np.frombuffer(payload, np.uint8, count=ysz, offset=pos).reshape(h, w)
        u = np.frombuffer(payload, np.uint8, count=csz, offset=pos + ysz).reshape(ch, cw)
        v = np.frombuffer(payload, np.uint8, count=csz, offset=pos + ysz + csz).reshape(ch, cw)
        frames.append((y, u, v))
        pos += ysz + 2 * csz
    if not frames:
        raise ValueError("y4m stream holds no frames")
    return frames, fps, w, h


def _y4m_features(payload: bytes) -> np.ndarray:
    """Video feature vector from the real decoded planes: geometry, frame
    rate, luma/chroma statistics, first/last-frame luma, inter-frame luma
    motion. fmt_tag 3.0."""
    frames, fps, w, h = _y4m_frames(payload)
    ys = np.stack([f[0].astype(np.float64) for f in frames])
    feats = [
        float(w), float(h), float(len(frames)), fps,
        float(ys.mean()), float(ys.std()),
        float(np.mean([f[1].astype(np.float64).mean() for f in frames])),
        float(np.mean([f[2].astype(np.float64).mean() for f in frames])),
        float(ys[0].mean()), float(ys[-1].mean()),
        float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
        0.0, 0.0, 0.0, 0.0, 3.0,
    ]
    return np.asarray(feats, dtype=np.float32)


def _rgb_to_ycc(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF/BT.601 full-range RGB→YCbCr in float64 (the deterministic
    basis for the video feature statistics below)."""
    f = frame.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _avi_features(payload: bytes) -> np.ndarray:
    """Video feature vector from REAL AVI/MJPEG decode (container walk +
    per-frame baseline-JPEG entropy decode): geometry, frame rate,
    luma/chroma statistics, first/last-frame luma, inter-frame motion —
    the same statistic family as the Y4M path, derived from the decoded
    RGB frames. fmt_tag 7.0."""
    frames, fps = _avi_frames(payload)
    yccs = [_rgb_to_ycc(f) for f in frames]
    ys = np.stack([y for y, _cb, _cr in yccs])
    h, w = frames[0].shape[:2]
    feats = [
        float(w), float(h), float(len(frames)), fps,
        float(ys.mean()), float(ys.std()),
        float(np.mean([cb.mean() for _y, cb, _cr in yccs])),
        float(np.mean([cr.mean() for _y, _cb, cr in yccs])),
        float(ys[0].mean()), float(ys[-1].mean()),
        float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
        0.0, 0.0, 0.0, 0.0, 7.0,
    ]
    return np.asarray(feats, dtype=np.float32)


def _avi_frames(payload: bytes) -> tuple[list[np.ndarray], float]:
    """REAL AVI/MJPEG decode (ztdf_spark/avi.py): (RGB frames, fps)."""
    from .avi import decode_avi_mjpeg

    return decode_avi_mjpeg(payload)


def decode_media(payload: bytes, media_type: str, *, deterministic_fake: bool = False) -> np.ndarray:
    """Decode a media blob into a FEAT_DIM-dim float32 feature vector.

    Real decode for WAV (PCM-16, G.711 µ-law/A-law, IMA ADPCM) and
    FLAC audio, PPM-P6 and 24-bit BMP (image) —
    pure Python/numpy, no external libs. Unrecognized or compressed
    formats: the deterministic fake (content-hash-derived vector, stable
    across runs/executors/parallelism) when ``deterministic_fake=True``,
    else ``NotImplementedError`` — the drop-in point for PIL/ffmpeg."""
    fmt = sniff_format(bytes(payload))
    try:
        if fmt == "wav":
            return _wav_features(bytes(payload))
        if fmt == "flac":
            # REAL lossless compressed-audio decode (round 6)
            return _flac_features(bytes(payload))
        if fmt == "ppm":
            return _rgb_features(_ppm_pixels(bytes(payload)), fmt_tag=1.0)
        if fmt == "bmp":
            return _rgb_features(_bmp_pixels(bytes(payload)), fmt_tag=2.0)
        if fmt == "y4m":
            return _y4m_features(bytes(payload))
        if fmt == "avi":
            # REAL compressed-video decode (ztdf_spark/avi.py, round 6):
            # MJPEG frames; non-MJPG AVI (h264…) raises → fall through
            return _avi_features(bytes(payload))
        if fmt == "jpeg":
            # REAL JPEG decode (ztdf_spark/jpeg.py): baseline SOF0 (round 5)
            # AND progressive SOF2 with spectral selection + successive
            # approximation (round 6); arithmetic/12-bit raise → fall through
            return _rgb_features(_jpeg_rgb(bytes(payload)), fmt_tag=4.0)
        if fmt == "png":
            # REAL PNG decode (ztdf_spark/png.py, round 5; Adam7 interlace +
            # every spec-legal depth/color round 6); malformed → fall through
            return _rgb_features(_png_rgb(bytes(payload)), fmt_tag=5.0)
        if fmt == "gif":
            # REAL GIF decode (ztdf_spark/gif.py, round 6): first composited
            # frame; animation is sample_frames' concern
            return _rgb_features(_gif_rgb(bytes(payload)), fmt_tag=6.0)
        if fmt == "h264":
            # REAL H.264 decode (ztdf_spark/h264.py, round 6): I_PCM-only
            # baseline streams; residual-coded macroblocks (CAVLC/CABAC)
            # raise NotImplementedError → disclosed fall-through
            return _h264_features(bytes(payload))
    except (ValueError, NotImplementedError):
        pass  # sniffed but malformed/unsupported variant → fall through
    if not deterministic_fake:
        raise NotImplementedError(
            "no pure-Python decoder for this format (wav/ppm/bmp are supported; "
            "compressed codecs need image/audio libs not present in this container); "
            "pass deterministic_fake=True for the test double"
        )
    digest = hashlib.blake2b(bytes(payload), digest_size=64, key=media_type.encode()[:16]).digest()
    return (np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / np.float32(2**32))[:FEAT_DIM]


# ---------------------------------------------------------------------------
# Spark operators (all map-only mapInPandas)
# ---------------------------------------------------------------------------


def extract_features(media: DataFrame, *, deterministic_fake: bool = True) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (map-only, no shuffle).
    wav/ppm/bmp rows get REAL decoded features; others the fake (or raise)."""

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(bytes(p), t, deterministic_fake=deterministic_fake).tolist()
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of REAL decodable images (ppm/bmp/jpeg/
    png/gif payloads — format-sniffed, so animated-GIF and AVI/MJPEG
    VIDEO rows yield a poster-frame thumbnail too) to (out_w, out_h);
    emits an md5 of the
    resized RGB bytes — a deterministic, engine-independent fingerprint
    of the resample. Undecodable rows are skipped (map-only; at scale
    this is the thumbnail stage)."""

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, sums = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                fmt = sniff_format(b)
                try:
                    if fmt == "ppm":
                        px = _ppm_pixels(b)
                    elif fmt == "bmp":
                        px = _bmp_pixels(b)
                    elif fmt == "jpeg":
                        px = _jpeg_rgb(b)
                    elif fmt == "png":
                        px = _png_rgb(b)
                    elif fmt == "gif":
                        px = _gif_rgb(b)
                    elif fmt == "avi":
                        px = _avi_frames(b)[0][0]  # MJPEG poster frame
                    else:
                        continue
                except ValueError:
                    continue
                h, w, _ = px.shape
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                small = px[np.ix_(ri, ci)]
                ids.append(mid)
                ws.append(out_w)
                hs.append(out_h)
                sums.append(hashlib.md5(small.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "out_w": pd.Series(ws, dtype="int32"),
                 "out_h": pd.Series(hs, dtype="int32"), "resized_md5": sums}
            )

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, *, deterministic_fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Y4M (YUV4MPEG2), H.264 I_PCM, AVI/MJPEG and animated-GIF rows are
    REALLY decoded — the sampling stride comes from the stream's own
    frame rate (one frame per ``every_ms``, never below 1) and
    ``frame_hash`` fingerprints the sampled frame's actual decoded bytes,
    so a parse or stride bug changes the output. Residual-coded video
    (CAVLC/CABAC h264, vp9...) cannot be decoded without ffmpeg — those
    rows keep the disclosed positional stand-in (fan-out driven by
    duration metadata) when ``deterministic_fake=True``, else raise."""

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mtype != "video":
                    continue
                b = bytes(payload)
                # NOTE: null meta is checked only on the duration-based fake
                # path below — the real Y4M decode derives geometry/fps from
                # the payload alone and must not drop decodable rows whose
                # metadata is missing (ADVICE r4 #4)
                if sniff_format(b) == "y4m":
                    try:
                        frames, fps, _w, _h = _y4m_frames(b)
                    except ValueError:
                        frames = None  # truncated/malformed: per-row fallback,
                        # never a job failure (same contract as decode_media)
                    if frames is not None:
                        step = max(1, round(fps * every_ms / 1000.0))
                        for fi in range(0, len(frames), step):
                            y, u, v = frames[fi]
                            ids.append(mid)
                            idxs.append(fi)
                            hashes.append(
                                hashlib.blake2b(
                                    y.tobytes() + u.tobytes() + v.tobytes(), digest_size=8
                                ).hexdigest()
                            )
                        continue
                if sniff_format(b) == "h264":
                    # REAL H.264 I_PCM decode (round 6): stride from the
                    # stream's own VUI frame rate, frame_hash over decoded
                    # YUV planes (every frame is an IDR — independently
                    # decodable, so at scale only sampled frames need work)
                    from .h264 import decode_h264

                    try:
                        hframes, hfps, _w, _h = decode_h264(b)
                    except (ValueError, NotImplementedError):
                        hframes = None  # residual-coded/malformed → fake path
                    if hframes is not None:
                        step = max(1, round(hfps * every_ms / 1000.0)) if hfps else 1
                        for fi in range(0, len(hframes), step):
                            y, u, v = hframes[fi]
                            ids.append(mid)
                            idxs.append(fi)
                            hashes.append(
                                hashlib.blake2b(
                                    y.tobytes() + u.tobytes() + v.tobytes(),
                                    digest_size=8,
                                ).hexdigest()
                            )
                        continue
                if sniff_format(b) == "avi":
                    # REAL AVI/MJPEG decode (round 6): stride from the
                    # stream header's own rate, frame_hash over the decoded
                    # RGB pixels (MJPEG frames are independently decodable,
                    # so at scale only the sampled frames need decoding)
                    try:
                        aframes, afps = _avi_frames(b)
                    except (ValueError, NotImplementedError):
                        aframes = None
                    if aframes is not None:
                        step = max(1, round(afps * every_ms / 1000.0))
                        for fi in range(0, len(aframes), step):
                            ids.append(mid)
                            idxs.append(fi)
                            hashes.append(
                                hashlib.blake2b(
                                    aframes[fi].tobytes(), digest_size=8
                                ).hexdigest()
                            )
                        continue
                if sniff_format(b) == "gif":
                    # REAL animated-GIF decode (round 6): sampling stride
                    # from the stream's own frame delay, frame_hash over the
                    # COMPOSITED RGB canvas (so disposal/transparency bugs
                    # change the output)
                    try:
                        gframes, gfps = _gif_frames(b)
                    except ValueError:
                        gframes = None
                    if gframes is not None:
                        step = max(1, round(gfps * every_ms / 1000.0))
                        for fi in range(0, len(gframes), step):
                            ids.append(mid)
                            idxs.append(fi)
                            hashes.append(
                                hashlib.blake2b(
                                    gframes[fi].tobytes(), digest_size=8
                                ).hexdigest()
                            )
                        continue
                if not deterministic_fake:
                    raise NotImplementedError("compressed video frame decode requires ffmpeg")
                if meta is None:
                    continue  # fake fan-out needs duration metadata
                dur = int(meta["duration_ms"] or 0)
                for fi in range(max(1, dur // every_ms)):
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.blake2b(b + fi.to_bytes(4, "little"), digest_size=8).hexdigest()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Fixture
# ---------------------------------------------------------------------------


def synthetic_media_rows(n: int = 20, seed: int = 42) -> list:
    """Deterministic media rows: REAL WAV/FLAC payloads for audio, REAL
    PPM/BMP/PNG (rotating: Paeth, Adam7-interlaced, 16-bit RGB, 4-bit
    palette) for images, REAL Y4M / animated-GIF / AVI-MJPEG / H.264
    I_PCM payloads for video. Shared
    by the Spark fixture below and the independent pandas oracle (the
    fixture is test INPUT; the decode path under test is not shared)."""
    from .gif import encode_gif
    from .png import encode_png, encode_png_ex

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if mtype == "image":
            w, h = int(rng.integers(4, 32)), int(rng.integers(4, 32))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            variant = (i // 3) % 7
            if variant == 0:
                payload, codec = make_ppm(px), "ppm"
            elif variant == 1:
                payload, codec = make_bmp(px), "bmp"
            elif variant == 2:
                # real compressed PNG, Paeth-filtered scanlines
                payload, codec = encode_png(px, filter_type=4), "png"
            elif variant == 3:
                # real Adam7-interlaced PNG (round-6 decode path)
                payload, codec = encode_png(px, filter_type=2, interlace=True), "png"
            elif variant == 4:
                # 16-bit RGB PNG (left-bit-replicated samples decode back
                # to exactly px via the high byte), Sub-filtered at bpp=6
                payload = encode_png_ex(px.astype(np.uint16) * 257, 2, 16, filter_type=1)
                codec = "png"
            elif variant == 5:
                # 4-bit palette PNG: quantize px onto a 16-color palette
                pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
                idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
                px = pal[idx]  # meta/oracle see the palette-resolved pixels
                payload = encode_png_ex(idx, 3, 4, filter_type=3, palette=pal)
                codec = "png"
            else:
                # real LZW GIF (round 6), interlace alternating; 32-color
                # global palette
                pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
                idx = rng.integers(0, 32, size=(h, w), dtype=np.uint8)
                px = pal[idx]
                payload = encode_gif([idx], pal, interlace=bool(i % 2))
                codec = "gif"
            meta = (w, h, 0, codec)
        elif mtype == "audio":
            sr = (8000, 16000)[(i // 3) % 2]
            nch = 1 + (i // 3) % 2
            nsamp = int(rng.integers(256, 2048))
            # rotate REAL audio codecs: PCM-16, G.711 µ-law/A-law, IMA
            # ADPCM, FLAC (round 6; adpcm is mono per the WAV 0x11 layout)
            wcodec = ("pcm", "ulaw", "alaw", "adpcm", "flac")[(i // 3) % 5]
            if wcodec == "adpcm":
                nch = 1
            samples = rng.integers(-32768, 32768, size=nsamp * nch, dtype=np.int16)
            if wcodec == "flac":
                from .flac import encode_flac

                payload = encode_flac(samples, sr, nch)
            else:
                payload = make_wav_ex(samples, sr, nch, codec=wcodec)
            meta = (
                0, 0, int(nsamp * 1000 / sr),
                {"pcm": "pcm_s16le", "ulaw": "g711_ulaw", "alaw": "g711_alaw",
                 "adpcm": "adpcm_ima", "flac": "flac"}[wcodec],
            )
        elif (i // 3) % 4 == 1:
            # REAL animated GIF video: per-frame delays drive the sampling
            # stride; composited RGB frames drive the hashes
            w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
            n_frames = int(rng.integers(2, 9))
            delay_cs = int(rng.integers(4, 21))
            pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
            gframes = [
                rng.integers(0, 16, size=(h, w), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            payload = encode_gif(gframes, pal, delays_cs=[delay_cs] * n_frames)
            meta = (w, h, n_frames * delay_cs * 10, "gif")
        elif (i // 3) % 4 == 0:
            # REAL video: uncompressed Y4M, alternating full and subsampled
            # chroma; duration derives from the stream's own frame count/rate
            w, h = int(rng.integers(2, 9)) * 2, int(rng.integers(2, 9)) * 2
            fps = int(rng.integers(2, 7))
            n_frames = int(rng.integers(2, 9))
            cs = "C444" if (i // 6) % 2 == 0 else "C420jpeg"
            cw, ch = (w, h) if cs == "C444" else (w // 2, h // 2)
            frames = [
                (
                    rng.integers(0, 256, size=(h, w), dtype=np.uint8),
                    rng.integers(0, 256, size=(ch, cw), dtype=np.uint8),
                    rng.integers(0, 256, size=(ch, cw), dtype=np.uint8),
                )
                for _ in range(n_frames)
            ]
            payload = make_y4m(frames, fps, colorspace=cs)
            meta = (w, h, int(n_frames * 1000 / fps), "y4m")
        elif (i // 3) % 4 == 2:
            # REAL compressed video: AVI/MJPEG (round 6) — every frame a
            # standalone baseline JPEG inside RIFF '00dc' chunks
            from .avi import encode_avi_mjpeg

            w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
            fps = int(rng.integers(2, 7))
            n_frames = int(rng.integers(2, 9))
            rframes = [
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                for _ in range(n_frames)
            ]
            payload = encode_avi_mjpeg(rframes, fps, lossy=bool(i % 2))
            meta = (w, h, int(n_frames * 1000 / fps), "mjpeg")
        else:
            # REAL H.264: Annex-B baseline stream of I_PCM IDR frames
            # (round 6) — NAL/SPS/PPS/slice headers, Exp-Golomb, emulation
            # prevention and VUI frame rate all on the real decode path
            from .h264 import encode_h264

            w, h = int(rng.integers(2, 13)) * 2, int(rng.integers(2, 13)) * 2
            fps = int(rng.integers(2, 7))
            n_frames = int(rng.integers(2, 7))
            hframes = [
                (
                    rng.integers(0, 256, size=(h, w), dtype=np.uint8),
                    rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.uint8),
                    rng.integers(0, 256, size=(h // 2, w // 2), dtype=np.uint8),
                )
                for _ in range(n_frames)
            ]
            payload = encode_h264(hframes, fps)
            meta = (w, h, int(n_frames * 1000 / fps), "h264")
        rows.append((i, mtype, bytearray(payload), meta))
    return rows


def synthetic_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), MEDIA_SCHEMA)
