"""Audio perceptual fingerprinting -- the AUDIO member of the
perceptual-dedup family (Chromaprint/Shazam territory, reduced to the
engine's exact-integer contract).

The construction composes what the repo already has: decoded PCM
(:func:`.multimodal.decode_wav`) is framed, each frame projected onto
the SAME quantized DCT basis the image pHash uses (functions/phash.py
COS_T -- round(cos * 2**14), a shared constant), frame spectra are
pooled into a 32x32 time-frequency ENERGY GRID normalized to [0, 255]
by integer scaling, and that grid is hashed by the image kernel
:func:`.phash.phash64_batch` verbatim. A re-encoded, resampled-in-
amplitude, or mildly noisy copy of a clip lands within a few Hamming
bits; different material lands far -- the banded Hamming join from
plans/image_queries.py then works unchanged on the resulting hashes.

Everything after the PCM floats is integer: samples are re-quantized
to int16 once, frame spectra are |T @ frame| sums of int64 products,
the grid normalization is ``e * 255 // max_e``, and phash64's
arithmetic is already exact -- so equal payloads hash equally on any
platform, and the locality properties are pinned by tests
(tests/test_audiofp.py), not luck.

Like the other multimodal kernels this is test-corpus-only surface:
the driver's parquet tables ship no audio column, so there is no
driver query/oracle pair -- the fingerprint is exercised against
synthesized WAV fixtures through the real decoder, exactly like the
PNG/JPEG/GIF codec tests. No counterpart in `/root/reference/`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phash import PHASH_N, _T, phash64_batch

# time-frequency grid: PHASH_N frames x PHASH_N spectral bins
FP_FRAME = 256  # samples per analysis frame (hop = frame, no overlap)


def _spectrum_rows(frames: np.ndarray) -> np.ndarray:
    """|DCT| spectral magnitudes of int16 frames, 32 bins per frame.

    The frame (length 256) is energy-decimated to a 32-sample envelope
    by summing CONSECUTIVE 8-sample blocks (a boxcar low-pass + 8x
    downsample -- integer, order-preserving in time), and the full
    32x32 quantized DCT-II of that envelope is taken with the extended
    table below; bins therefore describe the envelope's spectral
    shape up to the decimated Nyquist, which is what survives
    re-encoding. All integer: |sum(int * table)| < 2**53."""
    t32 = _ext_table()
    folded = frames.reshape(frames.shape[0], PHASH_N, -1).sum(axis=2)
    return np.abs(folded @ t32.T)


_EXT: np.ndarray | None = None


def _ext_table() -> np.ndarray:
    """The full 32x32 quantized DCT-II basis: rows 0..7 are byte-equal
    to the image kernel's COS_T table (shared constant, asserted in
    tests); rows 8..31 extend it with the same round(cos * 2**14)
    quantization."""
    global _EXT
    if _EXT is None:
        import math

        from .phash import PHASH_SCALE

        ext = np.array(
            [
                [
                    round(
                        math.cos((2 * r + 1) * u * math.pi / (2 * PHASH_N))
                        * PHASH_SCALE
                    )
                    for r in range(PHASH_N)
                ]
                for u in range(PHASH_N)
            ],
            dtype=np.int64,
        )
        assert (ext[: _T.shape[0]] == _T).all()
        _EXT = ext
    return _EXT


def audio_fingerprint_np(samples: np.ndarray) -> int | None:
    """64-bit perceptual fingerprint of a mono-foldable PCM buffer
    ((n, ch) float in [-1, 1) or 1-D), or None when the clip is too
    short to fill one analysis frame.

    Pipeline: mono fold -> int16 re-quantization -> 256-sample frames
    -> 32-bin integer DCT magnitudes per frame -> frames pooled into
    32 equal time slots (integer mean) -> grid scaled to [0, 255] by
    e * 255 // max_e -> :func:`..functions.phash.phash64_batch`."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int64)
    n_frames = len(pcm) // FP_FRAME
    if n_frames == 0:
        return None
    frames = pcm[: n_frames * FP_FRAME].reshape(n_frames, FP_FRAME)
    spec = _spectrum_rows(frames)  # (n_frames, 32)
    # pool frames into 32 equal time slots (integer mean, cumsum form)
    bounds = (np.arange(PHASH_N + 1, dtype=np.int64) * n_frames) // PHASH_N
    cs = np.concatenate(
        [np.zeros((1, PHASH_N), dtype=np.int64), np.cumsum(spec, axis=0)]
    )
    cnt = np.maximum(bounds[1:] - bounds[:-1], 1)[:, None]
    grid = (cs[bounds[1:]] - cs[bounds[:-1]]) // cnt  # (32 slots, 32 bins)
    mx = int(grid.max())
    if mx <= 0:
        return 0
    grid255 = (grid * 255) // mx
    return int(phash64_batch(grid255.reshape(1, PHASH_N, PHASH_N))[0])


def audio_fingerprint_features(media: DataFrame) -> DataFrame:
    """Per-clip perceptual fingerprint over REAL decoded WAV PCM,
    Arrow-batched -- the audio twin of
    :func:`..functions.phash.image_phash_features`. Column-pruned to
    (media_id, payload); non-WAV or too-short payloads yield
    ``afp NULL, decoded_real false`` (undecodable clips are excluded,
    never faked -- the multimodal family's contract)."""
    from collections.abc import Iterator

    from .multimodal import decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps, real = [], []
            for payload in pdf["payload"]:
                try:
                    samples, _sr = decode_wav(payload)
                    fp = audio_fingerprint_np(samples)
                    fps.append(fp)
                    real.append(fp is not None)
                except Exception:
                    fps.append(None)
                    real.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "afp": pd.array(fps, dtype="Int64"),
                "decoded_real": real,
            })

    pruned = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    )
    return pruned.mapInPandas(
        kernel, "media_id long, afp long, decoded_real boolean"
    )
