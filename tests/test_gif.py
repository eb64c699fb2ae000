"""GIF decoder tests against byte-exact hand-encoded GIFs (the test
carries its own minimal GIF-LZW encoder, width-growth matched to the
decoder's table semantics, so every pixel is asserted exactly)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sec_xbrl_finwarehouse_spark.functions.gif import decode_gif

PALETTE = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]


def _lzw_encode(indices, mcs=2) -> bytes:
    """Literals-only GIF-LZW encoder whose width growth mirrors the
    decoder: the table grows by one entry per code from the SECOND
    code after a clear, and width bumps when the table reaches
    2^width."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table_len = eoi + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, sym in enumerate(indices):
        emit(sym)
        if i > 0:
            table_len += 1
            if table_len >= (1 << width) and width < 12:
                width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_block(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def _gif(frames, w, h, interlace=False, gce=None) -> bytes:
    """frames: list of index grids (h x w). gce: (delay_ms, tindex)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # 4-entry GCT
    for rgb in PALETTE:
        out += bytes(rgb)
    for fi, grid in enumerate(frames):
        if gce is not None:
            delay_ms, tindex = gce[fi]
            flags = 0x01 if tindex is not None else 0x00
            out += bytes([0x21, 0xF9])
            out += _sub_block(struct.pack(
                "<BHB", flags, delay_ms // 10,
                tindex if tindex is not None else 0))
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00)
        rows = list(range(h))
        if interlace:
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order += list(range(start, h, step))
            rows = order
        flat = [grid[r][c] for r in rows for c in range(w)]
        out += bytes([2]) + _sub_block(_lzw_encode(flat))
        gce_done = True
    out += bytes([0x3B])
    return bytes(out)


def _expected(grid) -> np.ndarray:
    return np.array([[PALETTE[i] for i in row] for row in grid], np.uint8)


GRID = [[0, 1, 2, 3],
        [3, 2, 1, 0],
        [1, 1, 2, 2],
        [0, 3, 0, 3]]


def test_single_frame_exact_pixels():
    payload = _gif([GRID], 4, 4)
    frames = decode_gif(payload)
    assert len(frames) == 1
    assert np.array_equal(frames[0]["rgb"], _expected(GRID))


def test_interlaced_frame_deinterlaces():
    grid = [[(r + c) % 4 for c in range(4)] for r in range(8)]
    payload = _gif([grid], 4, 8, interlace=True)
    frames = decode_gif(payload)
    assert np.array_equal(frames[0]["rgb"], _expected(grid))


def test_animation_compositing_and_delay():
    base = [[1] * 4 for _ in range(4)]
    # frame 2 overwrites only where not transparent (index 0 = clear)
    overlay = [[0, 0, 2, 2],
               [0, 0, 2, 2],
               [0, 0, 0, 0],
               [0, 0, 0, 0]]
    payload = _gif([base, overlay], 4, 4,
                   gce=[(0, None), (120, 0)])
    frames = decode_gif(payload)
    assert len(frames) == 2
    assert frames[1]["delay_ms"] == 120
    want = _expected(base).copy()
    want[0:2, 2:4] = PALETTE[2]  # only the opaque quarter painted
    assert np.array_equal(frames[1]["rgb"], want)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_gif(b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)


def test_media_kernel_real_decode(spark):
    from pyspark.sql import functions as F

    from sec_xbrl_finwarehouse_spark.functions.multimodal import (
        image_features,
    )

    payload = _gif([GRID], 4, 4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), (4, 4, 3, None, None, "gif"))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,"
        "duration_ms:int,format:string>",
    )
    row = image_features(media).collect()[0]
    assert row["codec"] == "gif" and row["decoded_real"] is True
    assert row["mean_byte"] == pytest.approx(
        float(_expected(GRID).mean()))
