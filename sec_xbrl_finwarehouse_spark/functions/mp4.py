"""Minimal MP4/ISO-BMFF container parser, stdlib-only: locates the
video track's samples (file offset + size + keyframe flag) so frame
sampling can slice REAL codec samples out of the payload instead of
fixed-size byte chunks. No codec decode happens here -- frame sampling
for training pipelines needs the sample boundaries and keyframe
structure, not the pixels (decode, when needed, is a separate kernel).

Scope: unfragmented MP4 (moov/trak/mdia/minf/stbl with stsz + stsc +
stco/co64 + optional stss), any brand; fragmented (moof) files raise
ValueError naming the feature. Structures follow ISO/IEC 14496-12.
"""

from __future__ import annotations

import struct


def _boxes(data: bytes, start: int, end: int):
    """Yield (box_type, payload_start, payload_end) for the top-level
    boxes in data[start:end]."""
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack(">I4s", data[pos:pos + 8])
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:         # box extends to end of enclosing scope
            size = end - pos
        if size < hdr:
            raise ValueError("malformed MP4 box size")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == typ:
            return s, e
    return None


def _full_box(data: bytes, start: int) -> int:
    """Skip a FullBox's version/flags, returning the field start."""
    return start + 4


def parse_mp4_samples(payload: bytes) -> list[dict]:
    """Video-track samples as [{index, offset, size, keyframe}] in
    decode order. Offsets are absolute file offsets into ``payload``."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp)")
    if _find(payload, 0, len(payload), b"moof") is not None:
        raise ValueError("fragmented MP4 (moof) not supported")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for t, ts, te in _boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, ts, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[_full_box(payload, hdlr[0]) + 4:
                                   _full_box(payload, hdlr[0]) + 8] != b"vide":
            continue
        minf = _find(payload, *mdia, b"minf")
        stbl = _find(payload, *minf, b"stbl") if minf else None
        if stbl is None:
            continue
        return _stbl_samples(payload, *stbl)
    raise ValueError("MP4 has no video track")


def _stbl_samples(data: bytes, start: int, end: int) -> list[dict]:
    stsz = _find(data, start, end, b"stsz")
    stsc = _find(data, start, end, b"stsc")
    stco = _find(data, start, end, b"stco")
    co64 = _find(data, start, end, b"co64")
    stss = _find(data, start, end, b"stss")
    if stsz is None or stsc is None or (stco is None and co64 is None):
        raise ValueError("MP4 stbl missing stsz/stsc/stco")

    p = _full_box(data, stsz[0])
    uniform, count = struct.unpack(">II", data[p:p + 8])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", data[p + 8:p + 8 + 4 * count]))

    if stco is not None:
        p = _full_box(data, stco[0])
        n = struct.unpack(">I", data[p:p + 4])[0]
        offsets = list(struct.unpack(f">{n}I", data[p + 4:p + 4 + 4 * n]))
    else:
        p = _full_box(data, co64[0])
        n = struct.unpack(">I", data[p:p + 4])[0]
        offsets = list(struct.unpack(f">{n}Q", data[p + 4:p + 4 + 8 * n]))

    p = _full_box(data, stsc[0])
    n = struct.unpack(">I", data[p:p + 4])[0]
    runs = [struct.unpack(">III", data[p + 4 + 12 * i:p + 16 + 12 * i])
            for i in range(n)]  # (first_chunk 1-based, samples_per_chunk, _)

    keyframes = None
    if stss is not None:
        p = _full_box(data, stss[0])
        n = struct.unpack(">I", data[p:p + 4])[0]
        keyframes = {
            struct.unpack(">I", data[p + 4 + 4 * i:p + 8 + 4 * i])[0]
            for i in range(n)
        }  # 1-based sample numbers

    samples = []
    si = 0
    for ri, (first, per_chunk, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(offsets)
        for chunk in range(first, last + 1):
            off = offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                samples.append({
                    "index": si,
                    "offset": off,
                    "size": sizes[si],
                    "keyframe": keyframes is None or (si + 1) in keyframes,
                })
                off += sizes[si]
                si += 1
    return samples
