"""Baseline JPEG decoder, stdlib + numpy only (VERDICT r4 item on
multimodal honesty: JPEG features were byte-stat fakes; this makes them
real for the dominant interchange subset).

Scope: baseline sequential DCT (SOF0), 8-bit samples, Huffman entropy
coding, grayscale or YCbCr with any JFIF sampling factors (4:4:4,
4:2:2, 4:2:0 ...), restart markers. Progressive (SOF2), arithmetic
coding, and 12-bit are out of scope and raise ValueError naming the
feature, so callers can fall back explicitly.

Design: the entropy scan is decoded bit-serially in Python (inherently
sequential Huffman stream), but everything after -- dequantize,
un-zigzag, IDCT, level shift, chroma upsample, color convert -- is
vectorized numpy over ALL blocks at once (the IDCT is two einsum
contractions with the precomputed 8x8 DCT-II basis). Inside the engine
this runs per payload inside Arrow-batched ``mapInPandas`` kernels
(functions/multimodal.py), so corpus-scale decode parallelizes by
partition, not by making this loop fast.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal DCT-II basis: A[k, n] = c(k) cos((2n+1) k pi / 16)
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


class _Huffman:
    """Canonical JPEG Huffman table: (bit-length, code) -> symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; restart markers are handled by the caller via
    :meth:`sync_restart`."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # byte position
        self.bit = 0          # bits consumed of current byte
        self.marker: int | None = None

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                return 0  # spec: pad with 1s/0s past the end; 0 is fine
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:          # stuffed FF
                    self.pos += 2
                    self.bit = 0
                    return 0xFF
                self.marker = nxt        # a real marker terminates data
                return 0
            self.pos += 1
            self.bit = 0
            return b

    def read_bit(self) -> int:
        d = self.data
        if self.pos >= len(d):
            return 0
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
            if nxt != 0x00:
                self.marker = nxt
                return 0
        bit = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huffman) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.bit = 0
        d = self.data
        while self.pos < len(d):
            if d[self.pos] == 0xFF and self.pos + 1 < len(d) and \
                    0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG into an (h, w, channels) uint8 array
    (channels 1 for grayscale, 3 for YCbCr->RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    restart_interval = 0
    frame = None
    i = 2
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + ln]
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise ValueError("16-bit JPEG quant tables not supported")
                qt[tid] = np.frombuffer(seg[p + 1:p + 65], np.uint8)\
                    .astype(np.int32)
                p += 65
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = seg[p + 1:p + 17]
                n = sum(counts)
                table = _Huffman(counts, seg[p + 17:p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(progressive/arithmetic); baseline only"
            )
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS -> entropy data
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            data_start = i + 2 + ln
            return _decode_scan(payload[data_start:], frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + ln
    raise ValueError("JPEG truncated: no SOS marker")


def _decode_scan(data, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    reader = _BitReader(data)
    # per component: coefficient store, one row per block (zigzag order)
    coef = [np.zeros((n_mcus * c["h"] * c["v"], 64), np.int32) for c in scan]
    pred = [0] * len(scan)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart()
            pred = [0] * len(scan)
        for ci, comp in enumerate(scan):
            dc_t, ac_t = huff_dc[comp["dc"]], huff_ac[comp["ac"]]
            for b in range(comp["h"] * comp["v"]):
                block = coef[ci][m * comp["h"] * comp["v"] + b]
                t = reader.decode(dc_t)
                pred[ci] += _extend(reader.receive(t), t)
                block[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = reader.decode(ac_t)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:          # ZRL: 16 zeros
                            k += 16
                            continue
                        break                 # EOB
                    k += r
                    if k > 63:
                        break
                    block[k] = _extend(reader.receive(s), s)
                    k += 1
    planes = []
    for ci, comp in enumerate(scan):
        q = qt[comp["q"]][np.newaxis, :]
        dezz = np.zeros_like(coef[ci])
        dezz[:, ZIGZAG] = coef[ci] * q       # dequantize + un-zigzag
        blocks = dezz.reshape(-1, 8, 8).astype(np.float64)
        # IDCT-II: A.T @ B @ A for every block, one einsum pair
        spat = np.einsum("kn,bkl,lm->bnm", _A, blocks, _A) + 128.0
        bw = mcus_x * comp["h"]              # blocks per row
        bh = mcus_y * comp["v"]
        # blocks were decoded MCU-major (h x v sub-blocks inside each
        # MCU); permute to global raster order before assembling
        ch, cv = comp["h"], comp["v"]
        my, mx = np.divmod(np.arange(mcus_y * mcus_x), mcus_x)
        order = np.empty(bh * bw, np.int64)
        row = np.arange(mcus_y * mcus_x)[:, None] * (ch * cv)
        sub = np.arange(ch * cv)[None, :]
        by, bx = np.divmod(sub, ch)
        gpos = (my[:, None] * cv + by) * bw + (mx[:, None] * ch + bx)
        order[gpos.ravel()] = (row + sub).ravel()
        plane = (
            spat[order].reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0),
            hmax // comp["h"], axis=1,
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        out = planes[0][:, :, np.newaxis]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
