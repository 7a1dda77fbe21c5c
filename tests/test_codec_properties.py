"""Property-based fuzz over the pure-Python codecs (hypothesis): the
invariants that must hold for EVERY input, not just the fixtures —
FLAC/AVI losslessness-or-bounded-loss, G.711 idempotence, ADPCM output
length, WAV container round-trip. Spark-free (codec layer only), so the
whole file runs in milliseconds per example."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ztdf_spark import mmops
from ztdf_spark.audio import alaw_decode, alaw_encode, mulaw_decode, mulaw_encode
from ztdf_spark.avi import decode_avi_mjpeg, encode_avi_mjpeg
from ztdf_spark.flac import decode_flac, encode_flac

_i16 = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=30, deadline=None)
@given(st.lists(_i16, min_size=1, max_size=600), st.sampled_from([1, 2]),
       st.sampled_from([8000, 44100]))
def test_flac_lossless_for_any_input(vals, nch, sr):
    x = np.asarray(vals[: len(vals) // nch * nch] or vals[:nch] * nch, dtype=np.int16)
    if len(x) % nch:
        x = x[: len(x) // nch * nch]
    if not len(x):
        return
    y, sr2, nch2 = decode_flac(encode_flac(x, sr, nch))
    assert (sr2, nch2) == (sr, nch)
    assert np.array_equal(x, y)


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=4), st.integers(min_value=1, max_value=12),
       st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=10),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_avi_mjpeg_roundtrip_for_any_geometry(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]
    dec, got_fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps))
    assert got_fps == float(fps) and len(dec) == n
    for a, b in zip(dec, frames):
        assert a.shape == b.shape
        assert int(np.max(np.abs(a.astype(int) - b.astype(int)))) <= 3


@settings(max_examples=50, deadline=None)
@given(st.lists(_i16, min_size=1, max_size=200))
def test_g711_second_pass_is_identity(vals):
    """Companding reaches its fixed point after one round: a second
    encode/decode pass must change nothing (codec stability)."""
    x = np.asarray(vals, dtype=np.int16)
    mu1 = mulaw_decode(mulaw_encode(x))
    assert np.array_equal(mulaw_decode(mulaw_encode(mu1)), mu1)
    a1 = alaw_decode(alaw_encode(x))
    assert np.array_equal(alaw_decode(alaw_encode(a1)), a1)


@settings(max_examples=25, deadline=None)
@given(st.lists(_i16, min_size=1, max_size=1200),
       st.sampled_from(["pcm", "ulaw", "alaw", "adpcm"]))
def test_wav_container_roundtrip_any_codec(vals, codec):
    x = np.asarray(vals, dtype=np.int16)
    blob = mmops.make_wav_ex(x, 8000, 1, codec=codec)
    s, sr, nch = mmops._wav_pcm(blob)
    assert (sr, nch, len(s)) == (8000, 1, len(x))
    if codec == "pcm":
        assert np.array_equal(s, x)
    feat = mmops.decode_media(blob, "audio")
    assert feat[0] == 1.0 and feat[2] > 0


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=1, max_value=3), st.integers(min_value=1, max_value=10),
       st.integers(min_value=1, max_value=10), st.integers(min_value=1, max_value=10),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_h264_ipcm_lossless_for_any_geometry(n, h2, w2, fps, seed):
    """I_PCM carries raw samples: decode(encode(x)) == x bit-for-bit for
    EVERY even geometry, frame count, and content — including the
    zero-heavy inputs that force emulation-prevention escapes."""
    from ztdf_spark.h264 import decode_h264, encode_h264

    w, h = 2 * w2, 2 * h2
    rng = np.random.default_rng(seed)
    frames = [
        (rng.integers(0, 256, (h, w), dtype=np.uint8),
         rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
         rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8))
        for _ in range(n)
    ]
    if seed % 3 == 0:  # zero-run-heavy variant: escape-path pressure
        frames = [(y // 64 * 0, u, v) for y, u, v in frames]
    dec, got_fps, dw, dh = decode_h264(encode_h264(frames, fps))
    assert (dw, dh, got_fps, len(dec)) == (w, h, float(fps), n)
    for a, b in zip(frames, dec):
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
