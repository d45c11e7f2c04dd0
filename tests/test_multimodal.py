"""Multimodal column plumbing: metadata, sniffing, blob dedup, stubbed
decode/feature/frame-sample paths over mapInPandas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sif_spark.operators import multimodal as mm

PNG = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
JPG = b"\xff\xd8\xff\xe0" + bytes(100)
RAW = b"not-a-known-format" * 4


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(0, PNG), (1, JPG), (2, RAW), (3, PNG), (4, None)]
    return spark.createDataFrame(rows, "id long, blob binary")


def test_attach_metadata(spark, blobs):
    out = {r["id"]: r["meta"] for r in mm.attach_metadata(blobs, "blob").collect()}
    assert out[0]["format"] == "png"
    assert out[1]["format"] == "jpeg"
    assert out[2]["format"] == "unknown"
    assert out[0]["n_bytes"] == len(PNG)
    assert out[0]["content_sha256"] == hashlib.sha256(PNG).hexdigest()
    assert out[4]["content_sha256"] is None


def test_dedup_blobs(spark, blobs):
    ids = sorted(
        r["id"] for r in mm.dedup_blobs(blobs.filter(F.col("blob").isNotNull()), "blob", "id").collect()
    )
    assert ids == [0, 1, 2]  # 3 is a byte-identical dup of 0


def test_decode_features_stub_gate(spark, blobs):
    with pytest.raises(NotImplementedError):
        mm.decode_features(blobs, "blob", "id")


def test_decode_features_fake(spark, blobs):
    out = {
        r["id"]: r["features"]
        for r in mm.decode_features(blobs, "blob", "id", decoder=mm.fake_decoder).collect()
    }
    assert len(out[0]) == 16
    assert out[0] == out[3]      # identical blobs → identical features
    assert out[0] != out[1]
    assert out[4] is None        # null blob → null features
    # deterministic vs local computation
    expected = mm.fake_embedder(mm.fake_decoder(PNG)).tolist()
    assert out[0] == pytest.approx(expected)


def test_sample_frames_fake(spark, blobs):
    big = spark.createDataFrame([(9, bytes(256 * 7))], "id long, blob binary")
    rows = mm.sample_frames(big, "blob", "id", every_n=2, frame_decoder=mm.fake_frame_decoder).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    assert all(len(r["frame"]) == 256 for r in rows)


def test_sample_frames_stub_gate(spark, blobs):
    with pytest.raises(NotImplementedError):
        mm.sample_frames(blobs, "blob", "id")
