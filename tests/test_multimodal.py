"""Multimodal plumbing tests: Arrow-batched feature extraction,
aspect-preserving resize (stubbed codec), frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepdb_public_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    frame_sample_plan,
    resize_images,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=48).persist()


def test_extract_features_shape_and_determinism(media):
    feats = extract_features(media).collect()
    assert len(feats) == 48
    by_id = {r.media_id: r for r in feats}
    for r in feats:
        assert r.n_bytes > 0 and len(r.feature) == 8
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert all(by_id[i].feature == again[i].feature for i in by_id)


def test_fake_decode_loud_on_missing_payload():
    with pytest.raises(NotImplementedError):
        fake_decode(None)


def test_resize_images_aspect_and_passthrough(media):
    out = {r.media_id: r for r in resize_images(media, target_width=64).collect()}
    orig = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        o = orig[mid]
        if o.kind == "image":
            assert r.meta_width == 64
            # aspect preserved: h' = round-half-UP(64 * h / w), >= 1
            # (Spark F.round is HALF_UP; Python round() is banker's)
            import math

            want_h = max(1, math.floor(64 * o.meta_height / max(o.meta_width, 1) + 0.5))
            assert r.meta_height == want_h
            assert r.payload != o.payload  # stub produced new bytes
        else:
            assert r.meta_width == o.meta_width
            assert r.payload == o.payload  # untouched passthrough


def test_resize_images_deterministic(media):
    a = {r.media_id: bytes(r.payload) for r in resize_images(media, 32).collect()}
    b = {r.media_id: bytes(r.payload) for r in resize_images(media, 32).collect()}
    assert a == b


def test_frame_sample_plan_counts(media):
    frames = frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    vids = {r.media_id: r for r in media.filter(F.col("kind") == "video").collect()}
    assert rows, "fixture should contain videos"
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_ts_ms)
    for mid, ts in per.items():
        dur = vids[mid].meta_duration_ms
        assert ts == list(range(0, dur + 1, 1000))
