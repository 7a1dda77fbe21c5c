"""Compressed-audio codecs (ztdf_spark/audio.py: G.711 µ-law/A-law, IMA
ADPCM) and their WAV/mmops integration. Pins: exact 256-code
idempotence (the algebraic fixed-point property of companding),
full-range quantization bounds, ADPCM predictor tracking, and bit-exact
agreement with the INDEPENDENT table/loop-style decoders in
tools/check_oracles.py — the property that admits compressed-audio rows
into the driver's hash-compared mm fixture."""

import numpy as np
import pytest

from ztdf_spark import mmops
from ztdf_spark.audio import (
    adpcm_ima_decode,
    adpcm_ima_encode,
    alaw_decode,
    alaw_encode,
    mulaw_decode,
    mulaw_encode,
)


def test_g711_code_idempotence():
    """encode(decode(code)) == code for every byte — except µ-law 0x7F
    (negative zero), which canonically collapses to positive zero 0xFF
    (same behavior as the classic g711.c tables)."""
    codes = np.arange(256, dtype=np.uint8)
    a_round = alaw_encode(alaw_decode(codes))
    assert np.array_equal(a_round, codes)
    m_round = mulaw_encode(mulaw_decode(codes))
    (diff,) = np.where(m_round != codes)
    assert diff.tolist() == [0x7F]
    assert mulaw_decode(np.array([0x7F], np.uint8))[0] == 0 and m_round[0x7F] == 0xFF


def test_g711_full_range_quantization_bounds():
    x = np.arange(-32768, 32768, dtype=np.int16)
    em = np.abs(mulaw_decode(mulaw_encode(x)).astype(int) - x.astype(int))
    ea = np.abs(alaw_decode(alaw_encode(x)).astype(int) - x.astype(int))
    # top-segment step + clip: µ-law saturates at ±32124, A-law at ±32256
    assert em.max() <= 32767 - 32124 + 1
    assert ea.max() <= 32767 - 32256 + 1
    # small signals are near-transparent (the point of companding)
    small = np.abs(x.astype(int)) <= 1000
    assert em[small].max() <= 32 and ea[small].max() <= 16


def test_g711_decode_sign_symmetry():
    x = np.arange(1, 32000, 7, dtype=np.int16)
    assert np.array_equal(
        mulaw_decode(mulaw_encode(x)), -mulaw_decode(mulaw_encode((-x).astype(np.int16)))
    )


def test_adpcm_tracks_smooth_signal():
    t = np.arange(3000)
    sine = (10000 * np.sin(2 * np.pi * t / 100)).astype(np.int16)
    dec = adpcm_ima_decode(adpcm_ima_encode(sine), n_samples=3000)
    assert len(dec) == 3000
    assert int(np.max(np.abs(dec.astype(int) - sine.astype(int)))) < 200


def test_adpcm_constant_and_short_exact():
    for sig in (np.zeros(7, np.int16), np.full(504, 123, np.int16), np.array([5], np.int16)):
        dec = adpcm_ima_decode(adpcm_ima_encode(sig), n_samples=len(sig))
        assert np.array_equal(dec, sig)


def test_adpcm_multi_block_state_carries():
    """The step index carries across block boundaries (encoder) while
    each block header remains independently decodable."""
    rng = np.random.default_rng(11)
    ramp = np.cumsum(rng.integers(-300, 301, size=1600)).clip(-30000, 30000).astype(np.int16)
    enc = adpcm_ima_encode(ramp, samples_per_block=505)
    # 3 full blocks + one partial (85 samples -> 42 nibble bytes + header)
    assert len(enc) == 3 * (4 + 252) + (4 + 42)
    dec = adpcm_ima_decode(enc, samples_per_block=505, n_samples=1600)
    assert int(np.max(np.abs(dec.astype(int) - ramp.astype(int)))) < 400


def test_wav_container_roundtrip_all_codecs():
    rng = np.random.default_rng(4)
    for codec, nch in (("pcm", 2), ("ulaw", 2), ("alaw", 1), ("adpcm", 1)):
        x = rng.integers(-32768, 32768, size=600 * nch, dtype=np.int16)
        blob = mmops.make_wav_ex(x, 8000, nch, codec=codec)
        assert mmops.sniff_format(blob) == "wav"
        s, sr, got_nch = mmops._wav_pcm(blob)
        assert (sr, got_nch) == (8000, nch) and len(s) == 600 * nch
        if codec == "pcm":
            assert np.array_equal(s, x)
        elif codec == "ulaw":
            assert np.array_equal(s, mulaw_decode(mulaw_encode(x)))
        elif codec == "alaw":
            assert np.array_equal(s, alaw_decode(alaw_encode(x)))
        else:
            assert np.array_equal(s, adpcm_ima_decode(adpcm_ima_encode(x), n_samples=600))


def test_wav_adpcm_rejects_stereo():
    x = np.zeros(100, np.int16)
    with pytest.raises(ValueError, match="mono"):
        mmops.make_wav_ex(x, 8000, 2, codec="adpcm")


def test_decode_media_real_features_compressed_audio():
    sr, n = 16000, 1200
    t = np.arange(n)
    sig = (8000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
    for codec in ("ulaw", "alaw", "adpcm"):
        feat = mmops.decode_media(mmops.make_wav_ex(sig, sr, 1, codec=codec), "audio")
        assert feat[0] == 1.0 and feat[1] == pytest.approx(16.0)  # nch, kHz
        assert feat[2] == pytest.approx(n / sr)  # duration from true count
        # RMS of the decoded sine ~ 8000/32768/sqrt(2), codec loss small
        assert feat[3] == pytest.approx(8000 / 32768 / np.sqrt(2), rel=0.05)


def test_oracle_decoders_bit_exact():
    """audio.py's vectorized decoders vs check_oracles' independent
    table/loop decoders: identical int16 streams, feature-hash parity."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracles import _oracle_decode

    rng = np.random.default_rng(21)
    for codec, nch in (("ulaw", 2), ("alaw", 1), ("adpcm", 1)):
        x = rng.integers(-32768, 32768, size=900 * nch, dtype=np.int16)
        blob = mmops.make_wav_ex(x, 8000, nch, codec=codec)
        assert np.array_equal(
            mmops.decode_media(blob, "audio"), _oracle_decode(blob, "audio")
        )
