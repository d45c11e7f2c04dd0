"""Audio frame features and silence trimming: integer contracts,
FLAC/WAV decoder parity, the Spark stages, and tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from sif_spark.operators import audio as au
from sif_spark.operators import flac as fl
from sif_spark.operators import multimodal as mm


def test_frame_features_integer_contract():
    v = np.array([3, -2, 0, 5, -5, -1, 2, 4, -7], dtype=np.int64)
    feats = au.frame_features_np(v, 4)
    # window 0: [3,-2,0,5] energy 9+4+0+25=38, flips: 3*-2<0, -2*0 no,
    # 0*5 no -> zcr 1, peak 5
    # window 1: [-5,-1,2,4] energy 25+1+4+16=46, flips: -1*2<0 -> 1, peak 5
    # window 2 (partial): [-7] energy 49, zcr 0, peak 7
    assert feats == [(0, 38, 1, 5), (1, 46, 1, 5), (2, 49, 0, 7)]
    with pytest.raises(ValueError, match="frame_samples"):
        au.frame_features_np(v, 0)


def test_trim_silence_window_boundaries():
    v = np.concatenate(
        [np.zeros(512), np.full(256, 1000), np.zeros(300)]
    ).astype(np.int64)
    s, e = au.trim_silence_np(v, 256, peak_threshold=200)
    assert (s, e) == (512, 768)
    assert au.trim_silence_np(np.zeros(1000, np.int64), 256, 200) == (0, 0)
    # threshold is strict: peak == threshold is silence
    s, e = au.trim_silence_np(np.full(100, 200, np.int64), 50, 200)
    assert (s, e) == (0, 0)


def test_audio_frame_features_spark_wav_flac_parity(spark):
    """The same PCM through WAV and FLAC blobs must produce identical
    feature rows (decoder-independence of the int16 grid)."""
    t = np.arange(5000)
    x = (2500 * np.sin(t / 21)).astype(np.int16)
    rows = [
        (1, mm.encode_wav(x, sample_rate=16000)),
        (2, fl.encode_flac(x.astype(np.int32), 16000, 16, block_size=512)),
        (3, b"ID3" + bytes(40)),  # undecodable under tolerance
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = au.audio_frame_features(
        df, "blob", "doc_id", frame_samples=1024, on_error="null"
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["frame_idx"], r["energy"], r["zcr"], r["peak"])
        )
    assert sorted(by_doc) == [1, 2]
    assert sorted(by_doc[1]) == sorted(by_doc[2])
    want = au.frame_features_np(x.astype(np.int64), 1024)
    assert sorted(by_doc[1]) == want
    assert len(want) == 5  # ceil(5000/1024)


def test_trim_silence_spark_roundtrip(spark):
    x = np.concatenate(
        [np.zeros(2048), 900 * np.ones(1024), np.zeros(2048)]
    ).astype(np.int16)
    df = spark.createDataFrame(
        [(1, mm.encode_wav(x, sample_rate=8000)), (2, mm.encode_wav(np.zeros(512, np.int16)))],
        "doc_id long, blob binary",
    )
    out = {
        r["doc_id"]: r
        for r in au.trim_silence(
            df, "blob", "doc_id", frame_samples=1024, peak_threshold=200,
            sample_rate=8000,
        ).collect()
    }
    assert out[1]["kept_samples"] == 1024
    kept = mm.decode_wav(bytes(out[1]["blob"]))
    assert kept.shape[0] == 1024
    assert np.allclose(kept[:, 0] * 32768, 900 * np.ones(1024))
    assert out[2]["blob"] is None and out[2]["kept_samples"] == 0
