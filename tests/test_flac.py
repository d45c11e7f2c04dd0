"""FLAC codec: bit-exact round trips across subframe types / stereo
modes / bit depths, a HAND-ASSEMBLED spec-byte known answer
(independent of the encoder — symmetric-bug proof), the typed-error +
CRC contract, decompression-bomb bounds, fuzz, and the media_decoder /
sample_frames / probe dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import flac as fl
from sif_spark.operators import multimodal as mm
from sif_spark.operators import probe as pb


def test_flac_roundtrip_matrix():
    rng = np.random.default_rng(41)
    t = np.arange(3000)
    smooth = (2500 * np.sin(t / 40) + rng.integers(-15, 16, 3000)).astype(np.int32)

    b = fl.encode_flac(smooth, 22050, 16, block_size=1024)
    pcm, info = fl.decode_flac_pcm(b)
    assert np.array_equal(pcm[:, 0], smooth)
    assert info == {
        "sample_rate": 22050,
        "channels": 1,
        "bits_per_sample": 16,
        "total_samples": 3000,
    }
    # a FIXED predictor must actually compress the smooth signal
    assert len(b) < 2 * 3000 * 0.7

    stereo = np.stack([smooth, smooth // 2 + 99], axis=1)
    for mode in ("independent", "left_side", "mid_side"):
        bb = fl.encode_flac(stereo, 44100, 16, block_size=512, stereo_mode=mode)
        assert np.array_equal(fl.decode_flac_pcm(bb)[0], stereo), mode

    for bits in (8, 12, 16, 24):
        lim = 1 << (bits - 1)
        y = rng.integers(-lim, lim, 511).astype(np.int64)  # noise → verbatim-ish
        assert np.array_equal(
            fl.decode_flac_pcm(fl.encode_flac(y, 8000, bits, block_size=128))[0][:, 0],
            y,
        ), bits

    const = np.full(300, -5, np.int32)
    cb = fl.encode_flac(const, 8000, 16, block_size=64)
    assert np.array_equal(fl.decode_flac_pcm(cb)[0][:, 0], const)
    assert len(cb) < 150  # CONSTANT subframes: ~7 bytes a frame


def _ref_crc8(data: bytes) -> int:
    """Independent in-test CRC-8 (poly 0x07) — table-driven, unlike the
    module's bitwise loop."""
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    crc = 0
    for b in data:
        crc = table[crc ^ b]
    return crc


def _ref_crc16(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


def test_flac_hand_assembled_spec_bytes():
    """A 2-sample 8-bit mono VERBATIM stream assembled field-by-field
    from RFC 9639 — never touches the encoder. Samples 5 and -3."""
    streaminfo = (
        (2).to_bytes(2, "big")  # min blocksize
        + (2).to_bytes(2, "big")  # max blocksize
        + bytes(3) + bytes(3)  # min/max framesize unset
        + ((8000 << 44) | (0 << 41) | (7 << 36) | 2).to_bytes(8, "big")
        + bytes(16)  # md5 unset
    )
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + streaminfo

    # frame header: sync+reserved+blocking = FF F8; bs_code 6, rate 0
    # = 60; chan 0, size 001 (8-bit), reserved = 02; frame#0 = 00;
    # blocksize-1 = 01; then CRC-8
    fh = bytes([0xFF, 0xF8, 0x60, 0x02, 0x00, 0x01])
    fh += bytes([_ref_crc8(fh)])
    # subframe: pad 0 + type 000001 (VERBATIM) + wasted 0 = 02, then
    # the two 8-bit signed samples
    body = bytes([0x02, 0x05, 0xFD])
    frame = fh + body
    blob = header + frame + _ref_crc16(frame).to_bytes(2, "big")

    pcm, info = fl.decode_flac_pcm(blob)
    assert pcm.tolist() == [[5], [-3]]
    assert info["sample_rate"] == 8000 and info["bits_per_sample"] == 8

    # and the module's CRCs agree with the independent table-driven ones
    assert fl._crc8(fh[:-1]) == _ref_crc8(fh[:-1])
    assert fl._crc16(frame) == _ref_crc16(frame)


def test_flac_typed_errors_and_bomb_bounds():
    x = np.arange(500, dtype=np.int32)
    blob = fl.encode_flac(x, 8000, 16, block_size=128)

    flipped = bytearray(blob)
    flipped[len(blob) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        fl.decode_flac_pcm(bytes(flipped))

    with pytest.raises(ValueError, match="truncated"):
        fl.decode_flac_pcm(blob[: len(blob) - 10])
    with pytest.raises(ValueError, match="not a FLAC"):
        fl.decode_flac_pcm(b"fLaX" + blob[4:])
    with pytest.raises(ValueError, match="no STREAMINFO"):
        fl.decode_flac_pcm(b"fLaC" + bytes([0x81, 0, 0, 2, 0, 0]))

    # forged 2^36-sample STREAMINFO refuses before allocating
    forged = bytearray(blob)
    forged[21] = 0xFF  # top bits of the 36-bit total_samples field
    with pytest.raises(ValueError, match="MAX_DECODE_SAMPLES"):
        fl.decode_flac_pcm(bytes(forged))

    # encoder input validation
    with pytest.raises(ValueError, match="exceed 8-bit"):
        fl.encode_flac(np.array([300]), bits_per_sample=8)
    with pytest.raises(ValueError, match="2 channels"):
        fl.encode_flac(x, stereo_mode="mid_side")


def test_flac_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(42)
    base = bytearray(
        fl.encode_flac(
            (1000 * np.sin(np.arange(600) / 9)).astype(np.int32), 8000, 16, 256
        )
    )
    clean = 0
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            fl.decode_flac_pcm(bytes(b))
            clean += 1
        except (ValueError, NotImplementedError):
            pass
    # CRCs make silent survival of random corruption very unlikely
    assert clean < 30


def test_flac_dispatch_media_decoder_probe_and_frames():
    rng = np.random.default_rng(43)
    x = (3000 * np.sin(np.arange(4000) / 30)).astype(np.int32)
    stereo = np.stack([x, -x // 3], axis=1)
    blob = fl.encode_flac(stereo, 16000, 16, block_size=1024, stereo_mode="mid_side")

    dec = mm.media_decoder(blob)
    assert dec.dtype == np.float32 and dec.shape == (4000, 2)
    assert np.array_equal(
        np.rint(dec.astype(np.float64) * 32768).astype(np.int64), stereo
    )

    got = pb.probe_media(blob)
    assert got["format"] == "flac" and got["sample_rate"] == 16000
    assert got["channels"] == 2 and got["n_frames"] == 4000
    assert got["duration_s"] == 4000 / 16000

    # frame windows match the WAV path on identical PCM content
    wav = mm.encode_wav(stereo.astype(np.int16), sample_rate=16000)
    assert mm.media_frame_decoder(blob, 2) == mm.media_frame_decoder(wav, 2)


def test_flac_sample_frames_over_spark(spark):
    x = (2000 * np.sin(np.arange(3000) / 25)).astype(np.int32)
    blob = fl.encode_flac(x, 8000, 16, block_size=512)
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    rows = mm.sample_frames(df, "blob", "doc_id", every_n=2).collect()
    # 3000 samples → 3 windows of 1024 → keep windows 0 and 2
    assert [r["frame_idx"] for r in rows] == [0, 1]
    w0 = np.frombuffer(bytes(rows[0]["frame"]), "<i2")
    assert np.array_equal(w0, x[:1024])
