"""Multimodal plumbing tests: schema, mapInPandas batch shape, stubbed
decoder determinism, frame sampling fan-out."""

import numpy as np
import pytest

from ztdf_spark import mmops


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mmops.decode_media(b"xx", "image")


def test_decode_fake_deterministic():
    a = mmops.decode_media(b"payload", "image", deterministic_fake=True)
    b = mmops.decode_media(b"payload", "image", deterministic_fake=True)
    c = mmops.decode_media(b"payload", "audio", deterministic_fake=True)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)  # media_type keys the hash
    assert a.shape == (16,) and a.dtype == np.float32


def test_extract_features_plumbing(spark):
    media = mmops.synthetic_media(spark, n=12)
    feats = mmops.extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] >= 64
    again = {r["media_id"]: r["feature"] for r in mmops.extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)


def test_sample_frames_only_video(spark):
    media = mmops.synthetic_media(spark, n=12)
    frames = mmops.sample_frames(media, every_ms=1000).toPandas()
    video_ids = {r["media_id"] for r in media.filter("media_type='video'").collect()}
    assert set(frames["media_id"]) == video_ids
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()
