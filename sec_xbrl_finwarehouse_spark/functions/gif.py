"""GIF decoder — stdlib + numpy only (GIF87a/89a, LZW, interlace,
animated multi-frame with per-frame delays and transparency index).

Structure (GIF89a spec): header + logical screen descriptor
[+ global color table], then a block stream of extensions (0x21,
sub-block chains; the graphic control extension carries delay +
transparent index) and image descriptors (0x2C: geometry, optional
local color table, interlace flag, LZW-compressed index data), ended
by the trailer (0x3B).

The LZW here is the GIF variant: variable code width starting at
``min_code_size + 1``, clear/EOI codes, width grows when the next
dictionary slot would not fit, capped at 12 bits (no width growth
past 4096 entries until a clear).

This powers the real-decode path of ``functions/multimodal.py`` for
GIF payloads; like the PNG/JPEG/WAV decoders it exists so the media
kernels run on actual pixels, not byte stats.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9

# interlace pass start rows and strides (GIF89a appendix E)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (data, position after the 0-length terminator)."""
    out = bytearray()
    while True:
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += b[pos:pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: returns the color-index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_init = [[i] for i in range(clear)] + [None, None]
    table = list(dict_init)
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_init)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
                out.extend(entry)
                prev = entry
                continue
            if code < len(table) and table[code] is not None:
                entry = table[code]
            elif code == len(table):
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"bad LZW code {code}")
            out.extend(entry)
            table.append(prev + [entry[0]])
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return out


def decode_gif(payload: bytes) -> list[dict]:
    """Decode every frame; each dict holds ``rgb`` (H x W x 3 uint8 on
    the logical screen, frames composited over the previous one —
    disposal method 'do not dispose'), ``delay_ms``, and
    ``transparent`` (palette index or None). Raises ValueError on
    non-GIF input."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n], np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    screen = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None and bg < len(gct):
        screen[:, :] = gct[bg]
    frames: list[dict] = []
    delay_ms = 0
    transparent = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE_LABEL and len(data) >= 4:
                gflags, delay_cs, tindex = struct.unpack("<BHB", data[:4])
                delay_ms = delay_cs * 10
                transparent = tindex if gflags & 0x01 else None
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", payload[pos:pos + 9])
        pos += 9
        palette = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                payload[pos:pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame without any color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.array(_lzw_decode(data, mcs)[: w * h], np.int32)
        if idx.size < w * h:
            idx = np.pad(idx, (0, w * h - idx.size))
        if iflags & 0x40:  # interlaced: reorder rows
            rows = idx.reshape(h, w)
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE:
                for r in range(start, h, step):
                    out_rows[r] = rows[src]
                    src += 1
            idx = out_rows.reshape(-1)
        frame_rgb = palette[np.clip(idx, 0, len(palette) - 1)]
        frame_rgb = frame_rgb.reshape(h, w, 3)
        region = screen[top:top + h, left:left + w]
        if transparent is not None:
            mask = (idx.reshape(h, w) != transparent)[..., None]
            region[:] = np.where(mask, frame_rgb, region)
        else:
            region[:] = frame_rgb
        frames.append({
            "rgb": screen.copy(),
            "delay_ms": delay_ms,
            "transparent": transparent,
        })
        delay_ms, transparent = 0, None
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames
