"""Multimodal binary-column plumbing tests (decode is a deterministic
stub — the Spark-side schema/batching/partitioning is what's real)."""

from __future__ import annotations

import hashlib

import pytest

from twitch_chat_analyser_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("image/png", 100, 80, None)),
        (2, "image", b"\x89PNG-fake-bytes-22", ("image/png", 64, 64, None)),
        (3, "video", b"\x00\x00ftyp-fake", ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"xx")


def test_decode_features_deterministic(media):
    out = {r["media_id"]: r for r in multimodal.decode_features(media).collect()}
    assert len(out) == 3
    payload = b"\x89PNG-fake-bytes-1"
    h = hashlib.sha256(payload).digest()
    assert out[1]["width"] == 16 + h[0] % 64
    assert out[1]["height"] == 16 + h[1] % 64
    assert out[1]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert out[1]["n_bytes"] == len(payload)
    # run twice -> identical (stateless, content-derived)
    again = {r["media_id"]: r for r in multimodal.decode_features(media).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_frame_sample_plan(media):
    out = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in out)
    assert ts == [0, 1000, 2000, 3000]  # duration 3500 -> frames at 0..3s
    assert all(r["media_id"] == 3 for r in out)


def test_decode_drops_payload_column(media):
    df = multimodal.decode_features(media)
    assert "payload" not in df.columns


def test_resize_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(b"xx", 8, 8)


def test_resize_images_shape_and_determinism(media):
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    # only images pass through; the video row is filtered out
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["target_w"] == 8 and r["target_h"] == 4
        assert len(r["out_bytes"]) == 8 * 4  # byte budget scales with geometry
        assert hashlib.sha256(bytes(r["out_bytes"])).hexdigest() == r["out_sha256"]
    # deterministic: same input -> identical bytes
    again = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    assert bytes(again[1]["out_bytes"]) == bytes(out[1]["out_bytes"])
    # different geometry -> different content
    other = {r["media_id"]: r for r in multimodal.resize_images(media, 4, 4).collect()}
    assert bytes(other[1]["out_bytes"]) != bytes(out[1]["out_bytes"])[:16]


def test_audio_features_stub_and_plumbing(spark):
    rows = [
        (10, "audio", b"RIFF-fake-wav-payload" * 100, ("audio/wav", None, None, 2500)),
        (11, "image", b"\x89PNG-x", ("image/png", 8, 8, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        multimodal.audio_features_stub(b"xx")
    out = multimodal.audio_features(media).collect()
    assert len(out) == 1 and out[0].media_id == 10  # image filtered out
    r = out[0]
    assert r.n_bytes == 2100
    assert r.est_sample_rate in {8000, 16000, 24000, 32000, 40000}
    assert r.est_duration_ms >= 1 and r.rms > 0
    # deterministic
    again = multimodal.audio_features(media).collect()[0]
    assert (again.est_sample_rate, again.est_duration_ms, again.rms) == (
        r.est_sample_rate, r.est_duration_ms, r.rms
    )
