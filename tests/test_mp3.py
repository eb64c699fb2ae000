"""MP3 frame-header parser + audio_metadata operator tests, against
byte-exact synthesized MPEG streams (headers computed from the spec
tables; payloads are junk — the parser is header-level by design)."""

from __future__ import annotations

import struct

import pytest

from sec_xbrl_finwarehouse_spark.functions.mp3 import parse_mp3


def _frame(version_bits=3, layer_bits=1, bitrate_idx=9, rate_idx=0,
           padding=0, channel_mode=0) -> bytes:
    """One MPEG audio frame with a spec-correct header and junk body.
    Defaults: MPEG-1 Layer III, 128 kbps, 44100 Hz, stereo."""
    h = (0x7FF << 21) | (version_bits << 19) | (layer_bits << 17) \
        | (1 << 16) | (bitrate_idx << 12) | (rate_idx << 10) \
        | (padding << 9) | (channel_mode << 6)
    hdr = h.to_bytes(4, "big")
    bitrates = {9: 128000, 11: 192000, 5: 64000}
    bitrate = bitrates[bitrate_idx]
    sample_rate = {0: 44100, 1: 48000, 2: 32000}[rate_idx]
    if layer_bits == 3:   # Layer I
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        frame_len = 144 * bitrate // sample_rate + padding
    return hdr + b"\xAA" * (frame_len - 4)


def _id3v2(size: int) -> bytes:
    return b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
         (size >> 7) & 0x7F, size & 0x7F]
    ) + b"\x00" * size


def test_cbr_stream_frame_walk():
    stream = _frame() * 10
    meta = parse_mp3(stream)
    assert meta == {
        "codec": "mp3v1L3", "sample_rate": 44100, "channels": 2,
        "n_frames": 10, "n_samples": 11520,
        "duration_ms": round(11520 * 1000 / 44100),
        "avg_bitrate_kbps": 128,
    }


def test_vbr_average_bitrate_is_measured():
    stream = _frame(bitrate_idx=9) * 5 + _frame(bitrate_idx=11) * 5
    meta = parse_mp3(stream)
    assert meta["n_frames"] == 10
    assert meta["avg_bitrate_kbps"] == 160  # (128*5 + 192*5) / 10


def test_id3v2_tag_is_skipped():
    stream = _id3v2(100) + _frame() * 3
    meta = parse_mp3(stream)
    assert meta["n_frames"] == 3


def test_mono_and_padding_and_layer2():
    # MPEG-1 Layer II (layer_bits=2), mono, padded frames
    h = (0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16) | (9 << 12) \
        | (0 << 10) | (1 << 9) | (3 << 6)
    hdr = h.to_bytes(4, "big")
    frame_len = 144 * 160000 // 44100 + 1  # L2 idx 9 = 160 kbps
    stream = (hdr + b"\x00" * (frame_len - 4)) * 4
    meta = parse_mp3(stream)
    assert meta["channels"] == 1 and meta["codec"] == "mp3v1L2"
    assert meta["n_samples"] == 4 * 1152


def test_garbage_and_lone_sync_rejected():
    assert parse_mp3(b"\x00" * 4096) is None
    assert parse_mp3(_frame()[:200] + b"\x00" * 500) is None  # 1 frame only
    assert parse_mp3(b"RIFF1234WAVE") is None


def test_audio_metadata_operator(spark):
    import wave as _unused  # noqa: F401  (stdlib presence sanity)

    from sec_xbrl_finwarehouse_spark.functions.multimodal import (
        audio_metadata,
    )

    # WAV: 16-bit mono 8000 Hz, 100 frames of silence
    data = b"\x00\x00" * 100
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    mp3 = _frame() * 6
    rows = [
        (1, "audio", bytearray(wav), (None, None, 1, 8000, 999, "wav")),
        (2, "audio", bytearray(mp3), (None, None, 2, 44100, 999, "mp3")),
        (3, "audio", bytearray(b"\x01\x02" * 50),
         (None, None, 2, 22050, 1234, "opus")),
        (4, "image", bytearray(b"png..."), (8, 8, 3, None, None, "png")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,"
        "duration_ms:int,format:string>",
    )
    got = {r["media_id"]: r for r in audio_metadata(media).collect()}
    assert set(got) == {1, 2, 3}  # image rows pruned
    assert got[1]["codec"] == "wav-pcm" and got[1]["parsed_real"]
    # 100 frames @ 8000 Hz = 12.5 ms; round-half-even -> 12
    assert got[1]["n_samples"] == 100 and got[1]["duration_ms"] == 12
    assert got[2]["codec"] == "mp3v1L3" and got[2]["parsed_real"]
    assert got[2]["sample_rate"] == 44100
    assert got[2]["n_samples"] == 6 * 1152
    # unknown codec: declared meta passed through, flagged not-real
    assert got[3]["codec"] == "unknown" and not got[3]["parsed_real"]
    assert got[3]["sample_rate"] == 22050 and got[3]["duration_ms"] == 1234


def test_declared_vs_actual_audit_shape():
    """parse_mp3 powers a declared-vs-actual audit: a payload whose
    real sample rate differs from the stored meta is detectable."""
    stream = _frame(rate_idx=2)  # 32000 Hz
    meta = parse_mp3(stream * 3)
    assert meta["sample_rate"] == 32000  # != a declared 44100
