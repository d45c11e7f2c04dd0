"""MPEG-1 Layer I codec: round-trip quality, bitstream syntax, CRC,
typed errors, fuzz, and the decoder-INJECTION demo through the Spark
operators (the round-9 deliverable: a real codec exercising the
``decoder=`` extension point end-to-end)."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import mpeg1 as M
from sif_spark.operators import multimodal as mm


def _tone(n: int, period: float, amp: float = 0.8, phase: float | None = None) -> np.ndarray:
    t = np.arange(n)
    ph = np.pi / period if phase is None else phase
    return amp * np.sin(2 * np.pi * t / period + ph)


def _snr(x: np.ndarray, y: np.ndarray, skip: int = 384) -> float:
    seg = slice(skip, len(x) - skip)
    err = y[seg] - x[seg]
    return 10 * np.log10((x[seg] ** 2).sum() / max((err**2).sum(), 1e-30))


def test_roundtrip_tones_all_rates_and_modes():
    n = 384 * 10
    for fs, ch, per in ((48000, 1, 12), (44100, 2, 10), (32000, 1, 16)):
        x = _tone(n, per)
        if ch == 2:
            x = np.stack([x, 0.5 * _tone(n, per + 2, 0.8, 0.3)], axis=1)
        blob = M.encode_mpeg1_layer1(x, fs, 448)
        pcm, info = M.decode_mpeg1(blob)
        assert info["sample_rate"] == fs and info["channels"] == ch
        assert pcm.shape[0] == info["n_frames"] * 384 and pcm.dtype == np.float32
        x2 = x if x.ndim == 2 else x[:, None]
        for c in range(ch):
            assert _snr(x2[:, c], pcm[: n, c].astype(np.float64)) > 50, (fs, ch, c)


def test_sample_alignment_from_index_zero():
    """decode(encode(x)) must be sample-aligned with x (the encoder
    tail-pads by CODEC_DELAY; the decoder drops its delay). Pinned by
    a shaped-noise cross-correlation whose peak must sit at lag 0."""
    rng = np.random.default_rng(11)
    x = np.convolve(rng.standard_normal(384 * 8), np.ones(8) / 8, "same") * 0.4
    pcm, _ = M.decode_mpeg1(M.encode_mpeg1_layer1(x, 48000, 448))
    y = pcm[: len(x), 0].astype(np.float64)
    lags = np.arange(-64, 65)
    xc = [y[512 + lag : 2512 + lag] @ x[512:2512] for lag in lags]
    assert lags[int(np.argmax(xc))] == 0
    assert _snr(x, y) > 35


def test_filterbank_worst_case_snr_including_crossovers():
    """The generated near-PR prototype's floor: tones at exact subband
    crossovers (the pseudo-QMF worst case) must still round-trip
    through analysis+synthesis at >= 45 dB; in-band tones >= 55 dB."""
    n = 384 * 12
    for per, floor in ((16, 45), (6.4, 45), (64, 45), (2.13, 45),
                       (12, 55), (10, 55), (200, 55), (3.01, 55)):
        x = _tone(n, per, 0.9)
        y = M._synthesize(M._analyze(x))
        assert _snr(x, y[: len(x)], skip=500) > floor, per


def test_noise_roundtrip_and_bitrate_ladder():
    rng = np.random.default_rng(5)
    x = 0.3 * rng.standard_normal(384 * 8)
    prev = -99.0
    for kbps in (192, 288, 448):
        pcm, _ = M.decode_mpeg1(M.encode_mpeg1_layer1(x, 48000, kbps))
        s = _snr(x, pcm[: len(x), 0].astype(np.float64))
        assert s > prev - 1.0  # more bits never meaningfully worse
        prev = max(prev, s)
    assert prev > 35


def test_crc_protection_verified():
    x = _tone(384 * 3, 12, 0.5)
    blob = M.encode_mpeg1_layer1(x, 48000, 448, protection=True)
    M.decode_mpeg1(blob)  # clean CRC passes
    bad = bytearray(blob)
    bad[7] ^= 0x40  # flip an allocation bit inside the CRC coverage
    with pytest.raises(ValueError, match="CRC mismatch"):
        M.decode_mpeg1(bytes(bad))


def test_padding_accumulator_at_44100():
    """44.1 kHz frames are not slot-integral: the fraction accumulator
    must emit padded frames the decoder walks correctly (frame sizes
    differ across the stream)."""
    x = _tone(384 * 20, 10, 0.6)
    blob = M.encode_mpeg1_layer1(x, 44100, 448)
    pcm, info = M.decode_mpeg1(blob)
    assert info["n_frames"] >= 21
    assert _snr(x, pcm[: len(x), 0].astype(np.float64)) > 50


def test_typed_errors():
    x = _tone(384, 12, 0.5)
    good = M.encode_mpeg1_layer1(x, 48000, 448)
    # Layer II/III gate loudly, naming the layer
    b = bytearray(good)
    b[1] = (b[1] & ~0x06) | 0x04  # layer bits 10 -> Layer II
    with pytest.raises(NotImplementedError, match="Layer II"):
        M.decode_mpeg1(bytes(b))
    b[1] = (b[1] & ~0x06) | 0x02  # Layer III
    with pytest.raises(NotImplementedError, match="Layer III"):
        M.decode_mpeg1(bytes(b))
    # MPEG-2 gate
    b = bytearray(good)
    b[1] &= ~0x08
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        M.decode_mpeg1(bytes(b))
    # free-format / forbidden bitrate, reserved rate
    b = bytearray(good)
    b[2] &= 0x0F
    with pytest.raises(ValueError, match="bitrate"):
        M.decode_mpeg1(bytes(b))
    b = bytearray(good)
    b[2] |= 0x0C
    with pytest.raises(ValueError, match="sample-rate"):
        M.decode_mpeg1(bytes(b))
    # truncation
    with pytest.raises(ValueError, match="runs past"):
        M.decode_mpeg1(good[:100])
    with pytest.raises(ValueError, match="sync|truncated|frames"):
        M.decode_mpeg1(b"garbage!")
    # encoder input validation
    with pytest.raises(ValueError, match="sample rate"):
        M.encode_mpeg1_layer1(x, 22050, 448)
    with pytest.raises(ValueError, match="bitrate"):
        M.encode_mpeg1_layer1(x, 48000, 447)
    with pytest.raises(ValueError, match="pcm must be"):
        M.encode_mpeg1_layer1(np.zeros((10, 3)), 48000, 448)
    with pytest.raises(ValueError, match="cannot fit"):
        # broadband noise wants all 64 stereo bands at 32 kbps
        M.encode_mpeg1_layer1(
            np.random.default_rng(0).standard_normal((768, 2)) * 0.3, 48000, 32
        )


def test_id3v2_prefix_skipped():
    from sif_spark.operators.probe import encode_id3

    x = _tone(384 * 3, 12, 0.5)
    blob = encode_id3({"TIT2": "tone"}, 4) + M.encode_mpeg1_layer1(x, 48000, 448)
    pcm, info = M.decode_mpeg1(blob)
    assert info["n_frames"] >= 4


def test_mutation_fuzz_never_hangs():
    rng = np.random.default_rng(23)
    base = M.encode_mpeg1_layer1(_tone(384 * 2, 12, 0.5), 48000, 448)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            M.decode_mpeg1(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_set_prototype_contract():
    with pytest.raises(ValueError, match="512 taps"):
        M.set_prototype(np.zeros(100))
    orig = M._PROTO.copy()
    try:
        M.set_prototype(orig * 1.0)  # same prototype -> same behavior
        x = _tone(384 * 4, 12, 0.6)
        pcm, _ = M.decode_mpeg1(M.encode_mpeg1_layer1(x, 48000, 448))
        assert _snr(x, pcm[: len(x), 0].astype(np.float64)) > 50
    finally:
        M.set_prototype(orig)


# ---------------------------------------------------------------------
# The injection demo: mpeg1_decoder through the Spark operators.
# ---------------------------------------------------------------------


def test_media_decoder_still_gates_mpeg_audio():
    """The built-in dispatch must keep REFUSING MPEG audio — this
    module is the thing a user INJECTS, not a new built-in."""
    blob = M.encode_mpeg1_layer1(_tone(384, 12, 0.5), 48000, 448)
    with pytest.raises(NotImplementedError, match="decoder="):
        mm.media_decoder(blob)


def test_injected_decoder_through_audio_frame_features(spark):
    from sif_spark.operators.audio import audio_frame_features, frame_features_np

    x = _tone(384 * 4, 12, 0.7)
    blob = M.encode_mpeg1_layer1(x, 48000, 448)
    df = spark.createDataFrame(
        [(1, blob), (2, b"not mpeg"), (3, None)], "doc_id long, blob binary"
    )
    # without injection the default decoder refuses the format
    with pytest.raises(Exception):
        audio_frame_features(df, "blob", "doc_id").collect()
    got = audio_frame_features(
        df, "blob", "doc_id", frame_samples=384, decoder=M.mpeg1_decoder,
        on_error="null",
    ).collect()
    assert {r["doc_id"] for r in got} == {1}
    # Spark-side features match the local NumPy reference. NOT exactly:
    # the synthesis matmul's float32 reduction order varies with BLAS
    # threading between driver and executor processes (~3e-7 relative),
    # so energy/peak carry a tolerance; zcr is robust (samples never
    # near zero for this tone) and must be exact. Oracle entries bucket
    # with margins far beyond this wobble by construction.
    v = np.clip(np.rint(M.mpeg1_decoder(blob)[:, 0].astype(np.float64) * 32768.0),
                -32768, 32767).astype(np.int64)
    ref = frame_features_np(v, 384)
    by_idx = {r["frame_idx"]: (r["energy"], r["zcr"], r["peak"]) for r in got}
    for f, e, z, p in ref:
        ge, gz, gp = by_idx[f]
        assert gz == z and abs(gp - p) <= 2
        assert abs(ge - e) <= max(4, e * 1e-5)


def test_injected_decoder_through_decode_features(spark):
    from sif_spark.operators.multimodal import decode_features

    blob = M.encode_mpeg1_layer1(
        np.stack([_tone(384 * 2, 12, 0.7), _tone(384 * 2, 10, 0.4)], axis=1),
        44100,
        448,
    )
    df = spark.createDataFrame([(7, blob)], "doc_id long, blob binary")
    rows = decode_features(df, "blob", "doc_id", decoder=M.mpeg1_decoder).collect()
    assert len(rows) == 1 and len(rows[0]["features"]) == 16
    assert any(abs(f) > 1e-6 for f in rows[0]["features"])


def test_q155_fixture_bucket_margins():
    """The q155 oracle's bucket constants must hold with >= 0.2 bucket
    margin on BOTH the clean fixture signal and the decoded signal for
    every family and every gated frame — the guard that codec error
    (or a future prototype change) can never flip an oracle bucket."""
    from sif_spark.operators.audio import frame_features_np
    from sif_spark.queries_ext2 import _Q155_FAMS

    expected = {  # family -> (zcr, peak_bucket, energy_bucket), oracle literals
        0: (63, 47, 3), 1: (31, 48, 3), 2: (15, 80, 9), 3: (127, 115, 19),
        4: (7, 55, 4), 5: (63, 47, 3), 6: (31, 48, 3), 7: (15, 80, 9),
    }
    for fi, (fs, ch, per, nl, br, crc, _id3, amp) in enumerate(_Q155_FAMS):
        t = np.arange(384 * nl)
        x = amp * np.sin(2 * np.pi * (t % per) / per + np.pi / per)
        if ch == 2:
            x = np.stack([x, 0.5 * x], axis=1)
        pcm, _ = M.decode_mpeg1(M.encode_mpeg1_layer1(x, fs, br, protection=crc))
        clean = np.clip(
            np.rint((x if x.ndim == 1 else x[:, 0]) * 32768.0), -32768, 32767
        ).astype(np.int64)
        dec = np.clip(np.rint(pcm[:, 0].astype(np.float64) * 32768.0),
                      -32768, 32767).astype(np.int64)
        zc_e, pb_e, eb_e = expected[fi]
        for v in (clean, dec):
            for f, e, z, p in frame_features_np(v, 384):
                if not (1 <= f <= nl - 2):
                    continue
                assert z == zc_e, (fi, f)
                assert p >> 8 == pb_e and e >> 33 == eb_e, (fi, f)
                for val, width in ((p, 256), (e, 2**33)):
                    frac = (val % width) / width
                    assert 0.2 < frac < 0.8, (fi, f, val, width)
