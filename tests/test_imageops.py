"""Image preprocessing transforms: integer-exact contracts (nearest
resize / crop / grayscale), bilinear properties, composition, and the
transform_blobs Spark stage."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sif_spark.operators import imageops as io
from sif_spark.operators import multimodal as mm
from sif_spark.operators import video as vv


def _img(rng, h=16, w=20):
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_resize_nearest_integer_mapping():
    rng = np.random.default_rng(51)
    img = _img(rng)
    assert np.array_equal(io.resize_nearest(img, 16, 20), img)  # identity
    r = io.resize_nearest(img, 8, 10)
    # the half-pixel-center mapping, spelled out independently
    for y2 in range(8):
        for x2 in range(10):
            sy = ((2 * y2 + 1) * 16) // 16
            sx = ((2 * x2 + 1) * 20) // 20
            assert np.array_equal(r[y2, x2], img[sy, sx])
    up = io.resize_nearest(img, 33, 7)  # non-integral up + down mix
    assert up.shape == (33, 7, 3)
    gray2d = io.resize_nearest(img[:, :, 0], 5, 5)
    assert gray2d.shape == (5, 5)
    with pytest.raises(ValueError, match="invalid output size"):
        io.resize_nearest(img, 0, 5)
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        io.resize_nearest(img, 1 << 20, 1 << 20)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    oh=st.integers(1, 40), ow=st.integers(1, 40),
    seed=st.integers(0, 10_000),
)
def test_resize_bilinear_properties(h, w, oh, ow, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    out = io.resize_bilinear(img, oh, ow)
    assert out.shape == (oh, ow, 3) and out.dtype == np.uint8
    # interpolation never exits the input's value range
    assert out.min() >= img.min() and out.max() <= img.max()
    if (oh, ow) == (h, w):
        assert np.array_equal(out, img)
    const = np.full((h, w, 3), 77, np.uint8)
    assert np.array_equal(io.resize_bilinear(const, oh, ow), np.full((oh, ow, 3), 77))


def test_bilinear_monotone_on_ramp():
    ramp = np.tile(np.arange(0, 200, 2, np.uint8)[None, :, None], (10, 1, 3))
    up = io.resize_bilinear(ramp, 10, 250)
    assert np.all(np.diff(up[0, :, 0].astype(int)) >= 0)


def test_crop_gray_flip_contracts():
    rng = np.random.default_rng(52)
    img = _img(rng)
    assert np.array_equal(io.center_crop(img, 6, 6), img[5:11, 7:13])
    assert np.array_equal(io.center_crop(img, 16, 20), img)
    with pytest.raises(ValueError, match="crop"):
        io.center_crop(img, 17, 5)
    x = img.astype(np.int64)
    want = ((299 * x[:, :, 0] + 587 * x[:, :, 1] + 114 * x[:, :, 2] + 500) // 1000)
    assert np.array_equal(io.to_grayscale(img), want.astype(np.uint8))
    with pytest.raises(ValueError, match="grayscale"):
        io.to_grayscale(img[:, :, 0])
    assert np.array_equal(io.hflip(io.hflip(img)), img)
    assert np.array_equal(io.vflip(img), img[::-1])


def test_compose_order():
    rng = np.random.default_rng(53)
    img = _img(rng)
    pipe = io.compose(
        lambda a: io.resize_nearest(a, 8, 10),
        lambda a: io.center_crop(a, 6, 6),
        io.to_grayscale,
    )
    manual = io.to_grayscale(io.center_crop(io.resize_nearest(img, 8, 10), 6, 6))
    assert np.array_equal(pipe(img), manual)


def test_transform_blobs_spark_stage(spark):
    """blob → transformed blob over every input format the decoder
    sniffs, with on_error='null' tolerance and chainability into
    decode_features."""
    rng = np.random.default_rng(54)
    img = _img(rng)
    rows = [
        (1, mm.encode_ppm(img)),
        (2, mm.encode_png(img)),
        (3, vv.encode_avi([img] * 2, codec="DIB ")),  # first frame
        (4, b"ID3" + bytes(30)),  # gated format → NULL
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    pipe = io.compose(lambda a: io.resize_nearest(a, 8, 10), io.to_grayscale)
    out = {
        r["doc_id"]: (bytes(r["blob"]) if r["blob"] is not None else None)
        for r in io.transform_blobs(df, "blob", "doc_id", pipe, on_error="null").collect()
    }
    want = pipe(img)
    for did in (1, 2, 3):
        assert np.array_equal(mm.decode_ppm(out[did]), want), did
    assert out[4] is None and out[5] is None

    # raise mode propagates the typed error
    with pytest.raises(Exception):
        io.transform_blobs(df, "blob", "doc_id", pipe, on_error="raise").collect()

    # a float-producing transform is a loud contract error
    bad = io.compose(lambda a: a.astype(np.float32))
    assert (
        io.transform_blobs(df.filter("doc_id = 1"), "blob", "doc_id", bad,
                           on_error="null")
        .collect()[0]["blob"]
        is None
    )
