"""Baseline JPEG codec tests (sif_spark/operators/jpeg.py).

Three independent validation layers, mirroring the PNG/GIF strategy:
round-trips through this repo's own encoder (near-lossless at
quant=1), HAND-ASSEMBLED spec byte streams with hand-computed expected
pixels (external known-answer — catches bugs an encode/decode pair
implements symmetrically), and typed-error gates on malformed or
out-of-scope streams."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sif_spark.operators import multimodal as mm
from sif_spark.operators.jpeg import decode_jpeg, encode_jpeg

RNG = np.random.default_rng(42)


# -------------------------------------------------------------------
# Round trips (quant=1: the only loss is FDCT-coefficient rounding,
# analytically bounded by sum |0.5 * C_ux * C_vy| <= 8 per sample)
# -------------------------------------------------------------------


def test_gray_roundtrip_tight():
    a = RNG.integers(0, 256, (24, 17), np.uint8)
    b = decode_jpeg(encode_jpeg(a))
    assert b.shape == a.shape and b.dtype == np.uint8
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_block_constant_gray_is_exact():
    """Per-8x8-block constants survive exactly (the q110 oracle mode):
    all AC terms are analytically zero, DC is integral."""
    bvals = RNG.integers(0, 256, (3, 4), np.uint8)
    a = np.repeat(np.repeat(bvals, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(a)), a)
    # and with restart markers interleaved (DRI/RST path)
    assert np.array_equal(decode_jpeg(encode_jpeg(a, restart_interval=2)), a)


def test_color_roundtrips_all_samplings():
    a = RNG.integers(0, 256, (19, 21, 3), np.uint8)
    b = decode_jpeg(encode_jpeg(a, subsampling="4:4:4"))
    assert b.shape == a.shape
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 4
    for sub in ("4:2:2", "4:2:0"):  # noise loses chroma detail: shape
        assert decode_jpeg(encode_jpeg(a, subsampling=sub)).shape == a.shape
    # subsampled chroma is only comparable on smooth content
    x = np.linspace(0, 255, 32)
    g1, g2 = np.meshgrid(x, x)
    smooth = np.stack([g1, g2, np.full_like(g1, 80.0)], -1).astype(np.uint8)
    for sub in ("4:2:2", "4:2:0"):
        b = decode_jpeg(encode_jpeg(smooth, subsampling=sub))
        assert np.abs(smooth.astype(int) - b.astype(int)).max() <= 12


def test_restart_interval_equals_no_restart():
    """RSTn segmentation must be a pure framing change — identical
    pixels with and without it (predictor resets included)."""
    a = RNG.integers(0, 256, (40, 33), np.uint8)
    plain = decode_jpeg(encode_jpeg(a))
    for ri in (1, 3, 7):
        assert np.array_equal(decode_jpeg(encode_jpeg(a, restart_interval=ri)), plain)


def test_quant_table_applies():
    """A coarse quant table must still decode (lossy), and a 64-entry
    table round-trips through DQT."""
    a = RNG.integers(0, 256, (16, 16), np.uint8)
    q = np.full(64, 16, np.int32)
    b = decode_jpeg(encode_jpeg(a, quant=q))
    assert b.shape == a.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 32


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 25),
    w=st.integers(1, 25),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w), np.uint8)
    b = decode_jpeg(encode_jpeg(a))
    assert b.shape == a.shape
    # analytic worst case for quant=1 coefficient rounding is 8
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 8


# -------------------------------------------------------------------
# External known-answer: byte streams assembled BY HAND from the T.81
# spec tables in this test (independent of encode_jpeg), expected
# pixels computed by hand.
# -------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc, th, bits, vals):
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


# spec Annex K tables, restated here independently
_K_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_K_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
# minimal AC tables sufficient for EOB-only blocks: EOB (0x00) gets a
# 2-bit code by construction
_MINI_AC = ([0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0x00])


def _bits_to_bytes(bitstr: str) -> bytes:
    bitstr += "1" * (-len(bitstr) % 8)  # pad with 1s per spec
    return bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))


def test_known_answer_gray_solid():
    """Hand-assembled 8x8 grayscale, quant[0]=16.

    Case A (mid-gray): level-shifted DC diff 0 -> DC category 0
    (canonical luminance DC code '00'), EOB ('00' in the minimal AC
    table). Expected: all 128.

    Case B (white): DC quantized value round(8*127/16) = 64 ->
    category 7 (luminance DC canonical code '11110'), 7 magnitude bits
    '1000000', EOB. Dequantized DC 1024 -> IDCT constant 1024/8 = 128
    -> +128 = 256 -> clipped 255. Expected: all 255."""
    q = bytes([16] + [1] * 63)
    head = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + q)
        + _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
        + _seg(0xC4, _dht_payload(0, 0, *_K_DC_LUM))
        + _seg(0xC4, _dht_payload(1, 0, *_MINI_AC))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    gray = head + _bits_to_bytes("00" + "00") + b"\xff\xd9"
    out = decode_jpeg(gray)
    assert out.shape == (8, 8) and (out == 128).all()

    white = head + _bits_to_bytes("11110" + "1000000" + "00") + b"\xff\xd9"
    out = decode_jpeg(white)
    assert (out == 255).all()


def test_known_answer_color_solid():
    """Hand-assembled 8x8 4:4:4 color block: Y=128 (DC diff 0),
    Cb=128 (DC diff 0), Cr quantized DC 64 -> dequantized 1024 ->
    Cr plane = clip(128 + 128) = 255. Expected RGB everywhere:
    R = clip(round(128 + 1.402*(255-128)))        = 255
    G = round(128 - 0.714136*(255-128))           = 37
    B = round(128 + 1.772*(128-128))              = 128
    Chrominance DC canonical codes: category 0 -> '00' (2 bits),
    category 7 -> '1111110' (7 bits)."""
    q = bytes([16] + [1] * 63)
    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    head = (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + q)
        + _seg(0xC0, sof)
        + _seg(0xC4, _dht_payload(0, 0, *_K_DC_LUM))
        + _seg(0xC4, _dht_payload(1, 0, *_MINI_AC))
        + _seg(0xC4, _dht_payload(0, 1, *_K_DC_CHR))
        + _seg(0xC4, _dht_payload(1, 1, *_MINI_AC))
        + _seg(0xDA, sos)
    )
    bits = (
        "00" + "00"                       # Y:  DC cat0, EOB
        + "00" + "00"                     # Cb: DC cat0, EOB
        + "1111110" + "1000000" + "00"    # Cr: DC cat7, +64, EOB
    )
    out = decode_jpeg(head + _bits_to_bytes(bits) + b"\xff\xd9")
    assert out.shape == (8, 8, 3)
    assert (out[..., 0] == 255).all()
    assert (out[..., 1] == 37).all()
    assert (out[..., 2] == 128).all()


# -------------------------------------------------------------------
# Typed gates and dispatch
# -------------------------------------------------------------------


def test_arithmetic_and_malformed_progressive_gate():
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC9  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="coding process"):
        decode_jpeg(bytes(blob))
    # a baseline stream whose SOF is flipped to SOF2 is MALFORMED
    # progressive (its single scan spans 0-63, mixing DC and AC) —
    # typed ValueError, not a silent wrong decode
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(bytes(blob))


# -------------------------------------------------------------------
# Progressive (SOF2): decode must reproduce the baseline decode
# bit-for-bit for the same quantized coefficients — the refinement
# reconstruction (Annex G successive approximation) is exact.
# -------------------------------------------------------------------


def test_progressive_equals_baseline_gray():
    from sif_spark.operators.jpeg import encode_jpeg_progressive

    a = RNG.integers(0, 256, (24, 17), np.uint8)
    base = decode_jpeg(encode_jpeg(a))
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(a)), base)
    # no successive approximation (al=0: initial scans only)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive(a, al=0)), base)


def test_progressive_equals_baseline_color_all_samplings():
    from sif_spark.operators.jpeg import encode_jpeg_progressive

    c = RNG.integers(0, 256, (19, 21, 3), np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        base = decode_jpeg(encode_jpeg(c, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(c, subsampling=sub))
        assert np.array_equal(prog, base), sub


def test_progressive_deep_approximation_and_bands():
    """Three spectral bands, successive approximation from Al=3: the
    decoder runs 1 DC-initial + 3 DC-refine + per-band AC-initial +
    3 per-band AC-refine scans per component and must still land on
    the exact baseline reconstruction."""
    from sif_spark.operators.jpeg import encode_jpeg_progressive

    c = RNG.integers(0, 256, (19, 21, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(c, quant=16, subsampling="4:2:0"))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            c, quant=16, subsampling="4:2:0", al=3,
            bands=((1, 2), (3, 9), (10, 63)),
        )
    )
    assert np.array_equal(prog, base)


def test_progressive_media_decoder_dispatch():
    import sif_spark.operators.multimodal as mm
    from sif_spark.operators.jpeg import encode_jpeg_progressive

    a = RNG.integers(0, 256, (2, 3), np.uint8)
    img = np.repeat(np.repeat(a, 8, axis=0), 8, axis=1)
    blob = encode_jpeg_progressive(img)
    assert blob[:3] == b"\xff\xd8\xff"
    assert np.array_equal(mm.media_decoder(blob), img)


def test_malformed_typed_errors():
    good = encode_jpeg(np.full((8, 8), 77, np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])  # truncated mid-segment
    # entropy stream cut mid-block -> truncated, typed
    a = RNG.integers(0, 256, (16, 16), np.uint8)
    full = encode_jpeg(a)
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) - 40] + b"\xff\xd9")
    # forged giant dimensions refuse before allocating
    blob = bytearray(good)
    i = blob.index(b"\xff\xc0")
    blob[i + 5 : i + 7] = (60000).to_bytes(2, "big")
    blob[i + 7 : i + 9] = (60000).to_bytes(2, "big")
    with pytest.raises(ValueError, match="MAX_DECODE_PIXELS"):
        decode_jpeg(bytes(blob))


def test_short_sof_sos_segments_raise_typed():
    """Pinned from the round-8 fuzz sweep (6,400 cases): an SOS/SOF
    whose declared component count overruns the segment payload leaked
    a bare IndexError; both must raise typed ValueError."""
    good = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = good.index(b"\xff\xda")
    short_sos = bytes(good[: i + 2]) + (4).to_bytes(2, "big") + bytes([3, 1])
    with pytest.raises(ValueError, match="truncated JPEG SOS"):
        decode_jpeg(short_sos)
    j = good.index(b"\xff\xc0")
    sof = bytearray(good)
    sof[j + 2 : j + 4] = (8).to_bytes(2, "big")  # shrink SOF payload
    del sof[j + 10 : j + 13]
    with pytest.raises(ValueError, match="truncated JPEG SOF"):
        decode_jpeg(bytes(sof))


def test_media_decoder_dispatches_jpeg():
    a = RNG.integers(0, 256, (3, 2), np.uint8)
    bvals = np.repeat(np.repeat(a, 8, axis=0), 8, axis=1)
    blob = encode_jpeg(bvals)
    assert blob[:3] == b"\xff\xd8\xff"
    assert np.array_equal(mm.media_decoder(blob), bvals)
    # gzip-wrapped JPEG decodes through the unwrap path too
    import gzip

    assert np.array_equal(mm.media_decoder(gzip.compress(blob)), bvals)
