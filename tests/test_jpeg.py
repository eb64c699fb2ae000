"""Baseline JPEG decoder tests (functions/jpeg.py), validated against
the Spark JVM's javax.imageio on the baseline JPEGs Spark ships in its
own data directory -- a spec-independent oracle with no new deps."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from sec_xbrl_finwarehouse_spark.functions.jpeg import decode_jpeg
from sec_xbrl_finwarehouse_spark.functions.multimodal import decode_image

KITTENS = sorted(glob.glob(
    "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"
))


def _imageio_rgb(spark, path):
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
    w, h = img.getWidth(), img.getHeight()
    arr = img.getRGB(0, 0, w, h, None, 0, w)
    a = np.array(arr, dtype=np.int64).reshape(h, w)
    return np.stack(
        [(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF], axis=-1
    ).astype(np.int32)


@pytest.mark.skipif(not KITTENS, reason="Spark sample JPEGs not found")
@pytest.mark.parametrize("path", KITTENS, ids=lambda p: p.split("/")[-1])
def test_decode_matches_jvm_imageio(spark, path):
    """Every baseline sample decodes to the JVM reference within IDCT/
    chroma-upsampling rounding: mean |diff| < 0.75 levels, p99 <= 3."""
    mine = decode_jpeg(open(path, "rb").read()).astype(np.int32)
    ref = _imageio_rgb(spark, path)
    assert mine.shape == ref.shape
    diff = np.abs(mine - ref)
    assert diff.mean() < 0.75
    assert np.percentile(diff, 99) <= 3


PROGRESSIVE_COLOR = sorted(glob.glob("/usr/share/doc/nodejs/*stripe.jpg"))
PROGRESSIVE_GRAY = glob.glob(
    "/opt/spark-*/data/mllib/images/origin/multi-channel/grayscale.jpg"
)


@pytest.mark.skipif(not PROGRESSIVE_COLOR, reason="no progressive samples")
@pytest.mark.parametrize(
    "path", PROGRESSIVE_COLOR, ids=lambda p: p.split("/")[-1]
)
def test_progressive_color_matches_imageio(spark, path):
    """SOF2 multi-scan decode (spectral selection + successive
    approximation + EOB runs) matches the JVM reference."""
    mine = decode_jpeg(open(path, "rb").read()).astype(np.int32)
    ref = _imageio_rgb(spark, path)
    assert mine.shape == ref.shape
    diff = np.abs(mine - ref)
    assert diff.mean() < 0.75 and np.percentile(diff, 99) <= 3


@pytest.mark.skipif(not PROGRESSIVE_GRAY, reason="no progressive gray sample")
def test_progressive_grayscale_matches_raster(spark):
    """Grayscale progressive compares against the RAW raster samples --
    ImageIO's getRGB applies a gray->sRGB conversion that would skew a
    pixel comparison; the raster is the codec-level truth."""
    path = PROGRESSIVE_GRAY[0]
    img = spark._jvm.javax.imageio.ImageIO.read(
        spark._jvm.java.io.File(path)
    )
    w, h = img.getWidth(), img.getHeight()
    ref = np.array(
        img.getRaster().getSamples(0, 0, w, h, 0, None), dtype=np.int64
    ).reshape(h, w)
    mine = decode_jpeg(open(path, "rb").read())[:, :, 0].astype(np.int64)
    diff = np.abs(mine - ref)
    assert diff.max() <= 1 and diff.mean() < 0.1


def test_non_jpeg_rejected():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(ValueError, match="unsupported image container"):
        decode_image(b"RIFFxxxxWAVE")


def test_decode_image_dispatches_jpeg():
    if not KITTENS:
        pytest.skip("Spark sample JPEGs not found")
    img = decode_image(open(KITTENS[0], "rb").read())
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
