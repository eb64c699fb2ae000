"""Multimodal plumbing tests: schema/batch shape of the mapInPandas
kernels, per-kind routing, frame explode arithmetic, and the stubbed
resize raising NotImplementedError."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sec_xbrl_finwarehouse_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
)


def _media_df(spark):
    def meta(**kw):
        base = dict(width=None, height=None, channels=None,
                    sample_rate=None, duration_ms=None, format=None)
        base.update(kw)
        return (base["width"], base["height"], base["channels"],
                base["sample_rate"], base["duration_ms"], base["format"])

    rows = [
        (1, "image", bytes(range(256)), meta(width=16, height=16, channels=3,
                                             format="fake-rgb")),
        (2, "image", b"\x10" * 64, meta(width=8, height=8, channels=1,
                                        format="fake-gray")),
        (3, "audio", struct.pack("<4h", 100, -100, 200, -200),
         meta(sample_rate=16000, duration_ms=250, format="fake-pcm")),
        (4, "video", bytes(5000), meta(width=32, height=32, duration_ms=5000,
                                       format="fake-mjpeg")),
        (5, "image", b"", meta(width=0, height=0, format="fake-rgb")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_values_and_schema(spark):
    out = image_features(_media_df(spark))
    assert out.columns == ["media_id", "n_bytes", "mean_byte", "std_byte",
                           "content_sha", "width", "height"]
    got = {r["media_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 5}  # only kind == image
    assert got[1]["n_bytes"] == 256
    assert got[1]["mean_byte"] == pytest.approx(127.5)
    a = np.arange(256, dtype=np.float64)
    assert got[1]["std_byte"] == pytest.approx(float(a.std()))
    assert got[2]["mean_byte"] == pytest.approx(16.0)
    assert got[2]["std_byte"] == 0.0
    assert got[5]["n_bytes"] == 0 and got[5]["mean_byte"] == 0.0
    assert got[1]["width"] == 16 and got[2]["height"] == 8


def test_image_features_deterministic_hash(spark):
    out1 = {r["media_id"]: r["content_sha"]
            for r in image_features(_media_df(spark)).collect()}
    out2 = {r["media_id"]: r["content_sha"]
            for r in image_features(_media_df(spark)).collect()}
    assert out1 == out2
    assert out1[1] != out1[2]


def test_audio_features_rms_peak(spark):
    got = {r["media_id"]: r for r in audio_features(_media_df(spark)).collect()}
    assert set(got) == {3}
    pcm = np.array([100.0, -100.0, 200.0, -200.0])
    assert got[3]["n_samples"] == 4
    assert got[3]["rms"] == pytest.approx(float(np.sqrt((pcm ** 2).mean())))
    assert got[3]["peak"] == 200.0
    assert got[3]["sample_rate"] == 16000


def test_sample_frames_explode_arithmetic(spark):
    out = sample_frames(_media_df(spark), every_n=2, chunk_bytes=1024).collect()
    # 5000 bytes -> 5 chunks -> kept frames 0, 2, 4
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert all(r["media_id"] == 4 for r in out)
    assert len(out[0]["frame_bytes"]) == 1024
    assert len(out[-1]["frame_bytes"]) == 5000 - 4 * 1024


def test_resize_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError, match="codec"):
        resize_images(_media_df(spark), 8, 8)
