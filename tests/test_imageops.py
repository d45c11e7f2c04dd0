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


def test_dhash_brightness_invariance_and_bits():
    rng = np.random.default_rng(55)
    v = rng.integers(0, 180, (16, 18), np.int64)
    img = np.stack([v, v + 30, v + 50], axis=2).astype(np.uint8)
    h = io.dhash64(img)
    # uniform brightness shift: gradients unchanged, hash identical
    shifted = (img.astype(np.int64) + 20).astype(np.uint8)
    assert io.dhash64(shifted) == h
    # bit layout replayed independently: luma == v + 23 exactly for
    # this channel construction, sampled at odd rows/cols
    g = v + 23
    want = 0
    for y in range(8):
        for x in range(8):
            if g[2 * y + 1, 2 * x + 1] > g[2 * y + 1, 2 * x + 3]:
                want |= 1 << (y * 8 + x)
    if want >> 63:
        want -= 1 << 64
    assert h == want
    # hamming distance counts flipped gradient bits: cell (1,1) feeds
    # exactly ONE comparison (bit y=0,x=0: g[1,1] > g[1,3]) — force
    # that comparison to flip and nothing else
    v2 = v.copy()
    v2[1, 1] = v[1, 3] + 1 if v[1, 1] <= v[1, 3] else v[1, 3]
    img2 = np.stack([v2, v2 + 30, v2 + 50], axis=2).astype(np.uint8)
    d = bin((io.dhash64(img2) ^ h) & ((1 << 64) - 1)).count("1")
    assert d == 1
    # grayscale input accepted directly
    assert isinstance(io.dhash64(v.astype(np.uint8)), int)


def test_image_near_dup_pairs_matches_brute_force(spark):
    """Banded pairs == all-pairs Hamming filter on the same hashes
    (pigeonhole exactness at max_hamming + 1 bands), brightness pairs
    found, undecodable blobs tolerated."""
    from sif_spark.operators import multimodal as mm

    rng = np.random.default_rng(56)
    rows, hashes = [], {}
    for k in range(6):
        v = rng.integers(0, 180, (16, 18), np.int64)
        img = np.stack([v, v + 30, v + 50], axis=2).astype(np.uint8)
        bright = (img.astype(np.int64) + 15).astype(np.uint8)
        rows.append((2 * k, mm.encode_png(img)))
        rows.append((2 * k + 1, mm.encode_ppm(bright)))
        hashes[2 * k] = io.dhash64(img)
        hashes[2 * k + 1] = io.dhash64(bright)
    rows.append((99, b"ID3" + bytes(20)))  # undecodable
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in io.image_near_dup_pairs(
            df, "blob", "doc_id", max_hamming=6, on_error="null"
        ).collect()
    )
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    want = sorted(
        (a, b, ham(hashes[a], hashes[b]))
        for a in hashes
        for b in hashes
        if a < b and ham(hashes[a], hashes[b]) <= 6
    )
    assert got == want
    # every brightness pair is present at hamming 0
    for k in range(6):
        assert (2 * k, 2 * k + 1, 0) in got
