"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

This is the Spark-native landing place for the reference's
CustomColumnType extension point (column_type.go:16-23,
docs/custom-columntypes.md — arbitrary Go values serialized to bytes):
a ``binary`` payload column with a typed metadata struct alongside,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

Everything Spark-side is real and tested: schemas, content hashing,
format sniffing, batch shapes, partition sizing. The actual media
codecs (PIL/ffmpeg/librosa) are NOT in this container, so decode is a
clearly-marked stub: ``decode_media`` raises NotImplementedError unless
given a decoder callable, and ``fake_decoder``/``fake_embedder``
provide deterministic stand-ins so pipelines and tests exercise the
full plumbing end-to-end.

Scale notes: blobs ride in parquet binary columns, so column pruning
keeps metadata-only queries from ever reading the bytes; hot paths
(sniff/hash/size) are JVM expressions; decode batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
batch_rows × max_blob_bytes fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# Typed metadata struct carried next to every blob column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

_MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi container
    "mp3": b"ID3",
    "pdf": b"%PDF",
    "parquet": b"PAR1",
}


def sniff_format(blob: Column | str) -> Column:
    """Magic-byte format detection — pure JVM expressions, no Python."""
    c = F.col(blob) if isinstance(blob, str) else blob
    out = F.lit("unknown")
    for name, magic in _MAGIC.items():
        prefix = F.substring(c, 1, len(magic))
        out = F.when(prefix == F.lit(bytearray(magic)), F.lit(name)).otherwise(out)
    return out


def attach_metadata(df: DataFrame, blob_col: str, meta_col: str = "meta") -> DataFrame:
    """Add the typed metadata struct: content hash (dedup key), byte
    size, sniffed format. All expression-level — runs in codegen."""
    c = F.col(blob_col)
    return df.withColumn(
        meta_col,
        F.struct(
            F.sha2(c, 256).alias("content_sha256"),
            F.length(c).cast("long").alias("n_bytes"),
            sniff_format(c).alias("format"),
        ),
    )


def dedup_blobs(df: DataFrame, blob_col: str, id_col: str) -> DataFrame:
    """Exact blob dedup on content hash — one skew-free shuffle."""
    keyed = df.withColumn("__h", F.sha2(F.col(blob_col), 256))
    survivors = keyed.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return keyed.join(survivors, on=["__h", id_col]).drop("__h")


# ---------------------------------------------------------------------------
# Decode / feature extraction (Pandas-UDF plumbing; codecs stubbed)
# ---------------------------------------------------------------------------

Decoder = Callable[[bytes], np.ndarray]


def fake_decoder(blob: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives an 8×8
    'pixel' grid from the byte histogram. Real shape-contract (HxW
    ndarray), fake math — swap for PIL in production."""
    arr = np.frombuffer(blob, dtype=np.uint8) if blob else np.zeros(1, dtype=np.uint8)
    hist = np.bincount(arr % 64, minlength=64).astype(np.float32)
    return hist.reshape(8, 8)


def fake_embedder(decoded: np.ndarray) -> np.ndarray:
    """Deterministic stand-in for a feature extractor: row/col means of
    the decoded grid → 16-dim feature vector."""
    return np.concatenate([decoded.mean(axis=0), decoded.mean(axis=1)]).astype(np.float32)


def decode_features(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    decoder: Decoder | None = None,
    embedder: Callable[[np.ndarray], np.ndarray] | None = None,
) -> DataFrame:
    """(id, features: array<float>) via Arrow-batched mapInPandas.

    STUB GATE: without an explicit ``decoder`` this raises
    NotImplementedError — media codecs are not available in this
    environment. Pass ``fake_decoder``/``fake_embedder`` (tests do) or
    a real codec in production. The Spark plumbing — batch iteration,
    schema, null handling — is identical either way."""
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment: pass decoder= "
            "(e.g. multimodal.fake_decoder for the deterministic stand-in)"
        )
    emb = embedder or fake_embedder

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if b is None else emb(decoder(bytes(b))).tolist()
                for b in pdf[blob_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, blob_col).mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    blob_col: str,
    id_col: str,
    every_n: int = 10,
    frame_decoder: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """(id, frame_idx, frame: binary) — video frame sampling, 1 row per
    sampled frame (FlatMap shape). STUB GATE: requires an explicit
    ``frame_decoder(blob, every_n) -> list[frame_bytes]``; no video
    codec ships in this environment. Deterministic stand-in: split the
    blob into every_n-th 256-byte chunks."""
    if frame_decoder is None:
        raise NotImplementedError(
            "no video codec available: pass frame_decoder= (see fake_frame_decoder)"
        )

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType, True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                for j, fr in enumerate(frame_decoder(bytes(b), every_n)):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(run, out_schema)


def fake_frame_decoder(blob: bytes, every_n: int) -> list[bytes]:
    """Deterministic video-frame stand-in: every_n-th 256-byte chunk."""
    chunks = [blob[i : i + 256] for i in range(0, len(blob), 256)]
    return chunks[::every_n] if chunks else []
