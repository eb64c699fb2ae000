"""MP4 container parser tests (functions/mp4.py) against a synthesized
unfragmented MP4 with a known sample table -- boxes are plain
length-prefixed structures, so the fixture is exact ground truth."""

from __future__ import annotations

import struct

import pytest

from sec_xbrl_finwarehouse_spark.functions.mp4 import parse_mp4_samples
from sec_xbrl_finwarehouse_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    sample_frames,
)


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), typ) + payload


def full(typ: bytes, payload: bytes) -> bytes:
    return box(typ, b"\x00\x00\x00\x00" + payload)


def make_mp4(sample_sizes, samples_per_chunk=2, keyframes=(1, 3)) -> bytes:
    """Unfragmented MP4: one video track, chunks of ``samples_per_chunk``
    samples laid consecutively in mdat."""
    n = len(sample_sizes)
    mdat_payload = b"".join(
        bytes([i + 1]) * sz for i, sz in enumerate(sample_sizes)
    )
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    stsz = full(b"stsz", struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", s) for s in sample_sizes))
    n_chunks = -(-n // samples_per_chunk)
    stsc = full(b"stsc", struct.pack(">I", 1)
                + struct.pack(">III", 1, samples_per_chunk, 1))
    stss = full(b"stss", struct.pack(">I", len(keyframes))
                + b"".join(struct.pack(">I", k) for k in keyframes))
    hdlr = full(b"hdlr", b"\x00\x00\x00\x00" + b"vide" + b"\x00" * 12)

    # chunk offsets depend on the final header length; build twice
    def assemble(offsets):
        stco = full(b"stco", struct.pack(">I", n_chunks)
                    + b"".join(struct.pack(">I", o) for o in offsets))
        stbl = box(b"stbl", stsz + stsc + stco + stss)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        return ftyp + moov + box(b"mdat", mdat_payload)

    draft = assemble([0] * n_chunks)
    mdat_start = len(draft) - len(mdat_payload)
    offsets, off, si = [], mdat_start, 0
    for _ in range(n_chunks):
        offsets.append(off)
        for _ in range(samples_per_chunk):
            if si < n:
                off += sample_sizes[si]
                si += 1
    return assemble(offsets)


SIZES = [5, 7, 3, 9, 4]


def test_parse_samples_offsets_sizes_keyframes():
    payload = make_mp4(SIZES)
    samples = parse_mp4_samples(payload)
    assert [s["size"] for s in samples] == SIZES
    assert [s["index"] for s in samples] == [0, 1, 2, 3, 4]
    # each sample's bytes are its 1-based index repeated (mdat layout)
    for s in samples:
        chunk = payload[s["offset"]:s["offset"] + s["size"]]
        assert chunk == bytes([s["index"] + 1]) * s["size"]
    assert [s["keyframe"] for s in samples] == [True, False, True, False, False]


def test_parse_no_stss_means_all_keyframes():
    payload = make_mp4(SIZES, keyframes=())
    # empty stss table -> zero sync samples is technically "none"; drop
    # the box entirely for the all-keyframe default instead
    payload = payload.replace(
        full(b"stss", struct.pack(">I", 0)), b""
    )
    samples = parse_mp4_samples(payload)
    assert all(s["keyframe"] for s in samples)


def test_parse_rejects_non_mp4():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_samples(b"\x00" * 32)


def test_sample_frames_real_mp4_and_non_mp4_excluded(spark):
    mp4 = make_mp4(SIZES)
    rows = [
        (1, "video", mp4, (None, None, None, None, 1000, "mp4")),
        (2, "video", bytes(3000), (None, None, None, None, 1000, "raw")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, every_n=2).collect()
    real = [r for r in out if r["media_id"] == 1]
    # every 2nd codec sample: indices 0, 2, 4 with exact sample bytes
    assert [(r["frame_idx"], bytes(r["frame_bytes"])) for r in real] == [
        (0, b"\x01" * 5), (2, b"\x03" * 3), (4, b"\x05" * 4),
    ]
    assert all(r["container"] == "mp4" and r["extracted_real"] for r in real)
    assert [r["keyframe"] for r in real] == [True, True, False]
    # non-MP4 payload: excluded, never chunk-faked
    assert [r for r in out if r["media_id"] == 2] == []
