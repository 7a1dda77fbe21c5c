"""AVI/MJPEG container codec (ztdf_spark/avi.py) and its mmops
integration. Two independent checks pin the decode path: (a) the
PRE-ENCODE source frames — flat-quant MJPEG loss is DCT + color
rounding, so decode(encode(frames)) must land within the same fixed
bound the jpeg tests pin; (b) the tools/check_oracles.py INDEPENDENT
decoder chain (MINCODE/MAXCODE huffman + per-block separable IDCT +
flat RIFF scan), which must agree with the engine BIT-EXACTLY — that
exactness is what lets AVI rows live inside the driver's hash-compared
mm fixture even though MJPEG itself is lossy."""

import numpy as np
import pytest

from ztdf_spark import mmops
from ztdf_spark.avi import decode_avi_mjpeg, encode_avi_mjpeg


def _frames(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_roundtrip_flat_quant_bound_and_fps():
    frames = _frames(6, 14, 11)
    blob = encode_avi_mjpeg(frames, 5)
    dec, fps = decode_avi_mjpeg(blob)
    assert fps == 5.0 and len(dec) == 6
    for d, f in zip(dec, frames):
        assert d.shape == f.shape
        assert int(np.max(np.abs(d.astype(int) - f.astype(int)))) <= 3


def test_roundtrip_lossy_and_subsampled():
    # smooth gradient frames: lossy 4:2:0 must stay close on low-frequency
    # content (random noise would legitimately be quantized away)
    gx, gy = np.meshgrid(np.arange(16), np.arange(16))
    frames = [
        np.stack([(gx * 8 + k * 20) % 256, (gy * 8) % 256, ((gx + gy) * 4) % 256], axis=-1).astype(np.uint8)
        for k in range(3)
    ]
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, 2, lossy=True, subsampling="420"))
    assert len(dec) == 3 and fps == 2.0
    for d, f in zip(dec, frames):
        a, b = d.astype(np.float64).ravel(), f.astype(np.float64).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.9


def test_encode_validations():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], 5)
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(_frames(1, 4, 4), 0)
    f = _frames(1, 4, 4) + _frames(1, 6, 4)
    with pytest.raises(ValueError, match="geometry"):
        encode_avi_mjpeg(f, 5)


def test_decode_rejects_malformed():
    blob = encode_avi_mjpeg(_frames(2, 8, 8), 4)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    with pytest.raises(ValueError):
        decode_avi_mjpeg(blob[:40])  # truncated inside hdrl
    # a non-MJPG vids stream must refuse, not mis-decode
    h264 = bytearray(blob)
    i = h264.find(b"MJPG")  # strh fccHandler (first occurrence)
    h264[i : i + 4] = b"h264"
    with pytest.raises(ValueError, match="unsupported video codec"):
        decode_avi_mjpeg(bytes(h264))


def test_oracle_decoder_chain_is_bit_exact():
    """The independent check_oracles decode (flat RIFF scan + spec-F.2
    huffman + separable IDCT) must agree with the engine bit-exactly —
    the property that admits MJPEG into the hash-compared fixture."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracles import _oracle_avi

    for seed, lossy in ((1, False), (2, True)):
        frames = _frames(4, 13, 10, seed=seed)
        blob = encode_avi_mjpeg(frames, 3, lossy=lossy)
        got, fps = decode_avi_mjpeg(blob)
        oracle, ofps = _oracle_avi(blob)
        assert fps == ofps == 3.0
        assert len(got) == len(oracle) == 4
        for a, b in zip(got, oracle):
            assert np.array_equal(a, b)


def test_sniff_and_features_tag():
    blob = encode_avi_mjpeg(_frames(3, 10, 12), 2)
    assert mmops.sniff_format(blob) == "avi"
    feat = mmops.decode_media(blob, "video")
    assert feat[15] == 7.0  # the REAL avi path ran, not the fake
    assert (feat[0], feat[1], feat[2], feat[3]) == (12.0, 10.0, 3.0, 2.0)


def test_sample_frames_real_avi(spark):
    """sample_frames on AVI rows: stride from the stream's own rate and
    hashes over the DECODED RGB pixels (recomputed here from the engine
    decoder directly — a container/stride bug changes the rows)."""
    import hashlib

    frames = _frames(7, 9, 9, seed=5)
    blob = encode_avi_mjpeg(frames, 3)
    df = spark.createDataFrame(
        [(1, "video", bytearray(blob), (9, 9, 2333, "mjpeg"))], mmops.MEDIA_SCHEMA
    )
    got = {(r.frame_idx, r.frame_hash) for r in mmops.sample_frames(df, every_ms=1000).collect()}
    dec, fps = decode_avi_mjpeg(blob)
    step = max(1, round(fps))
    want = {
        (fi, hashlib.blake2b(dec[fi].tobytes(), digest_size=8).hexdigest())
        for fi in range(0, len(dec), step)
    }
    assert got == want and len(want) == 3  # frames 0, 3, 6


def test_resize_poster_frame(spark):
    frames = _frames(2, 20, 20, seed=8)
    blob = encode_avi_mjpeg(frames, 2)
    df = spark.createDataFrame(
        [(1, "video", bytearray(blob), (20, 20, 1000, "mjpeg"))], mmops.MEDIA_SCHEMA
    )
    rows = mmops.resize_images(df, out_w=4, out_h=4).collect()
    assert len(rows) == 1
    import hashlib

    px = decode_avi_mjpeg(blob)[0][0]
    small = px[np.ix_((np.arange(4) * 20) // 4, (np.arange(4) * 20) // 4)]
    assert rows[0].resized_md5 == hashlib.md5(small.tobytes()).hexdigest()
