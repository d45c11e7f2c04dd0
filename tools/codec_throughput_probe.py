"""Measure built-in media codec DECODE throughput (VERDICT r7 ask #3).

Turns the qualitative warning in multimodal.py's module doc ("serial
per-byte Python loops ... inject a native codec for bulk decode")
into numbers: decoded MB/s (of OUTPUT pixels/samples) and images/s
per format at three sizes, separating the NumPy-vectorized formats
(PPM/BMP/WAV/TIFF) from the serial-Python compressed paths (PNG per
filter type, GIF LZW, JPEG Huffman).

No Spark — this measures the pure decode kernel the Arrow batches
call; per-executor throughput scales linearly with cores since
decode is embarrassingly parallel across blobs.

Usage: python tools/codec_throughput_probe.py [--quick]
Prints a markdown table (paste into SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sif_spark.operators import multimodal as mm
from sif_spark.operators.jpeg import decode_jpeg, encode_jpeg

QUICK = "--quick" in sys.argv
SIZES = [(64, 64), (256, 256), (1024, 1024)]
MIN_SECONDS = 0.3 if QUICK else 1.0


def bench(decode, blob, out_bytes: int) -> tuple[float, float]:
    """(MB/s of decoded output, decodes/s) over >= MIN_SECONDS."""
    decode(blob)  # warmup
    n, t0 = 0, time.perf_counter()
    while True:
        decode(blob)
        n += 1
        dt = time.perf_counter() - t0
        if dt >= MIN_SECONDS:
            break
    return out_bytes * n / dt / 1e6, n / dt


def main() -> None:
    rng = np.random.default_rng(7)
    rows = []

    for h, w in SIZES:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        gray = rng.integers(0, 256, (h, w), np.uint8)
        out3 = h * w * 3

        rows.append(("ppm (vectorized)", f"{h}x{w}",
                     *bench(mm.decode_ppm, mm.encode_ppm(img), out3)))
        rows.append(("bmp (vectorized)", f"{h}x{w}",
                     *bench(mm.decode_bmp, mm.encode_bmp(img), out3)))
        rows.append(("tiff (vectorized)", f"{h}x{w}",
                     *bench(mm.decode_tiff, mm.encode_tiff(img), out3)))

        for ft, name in [(0, "none"), (2, "up"), (1, "sub"),
                         (3, "average"), (4, "paeth")]:
            rows.append((f"png filter={name}", f"{h}x{w}",
                         *bench(mm.decode_png, mm.encode_png(img, ft), out3)))

        pal = rng.integers(0, 256, (256, 3), np.uint8)
        gif_img = pal[rng.integers(0, 256, (h, w))]
        rows.append(("gif (LZW)", f"{h}x{w}",
                     *bench(mm.decode_gif, mm.encode_gif(gif_img), out3)))

        # JPEG at a realistic quant (Annex-K-like coarseness via flat
        # 16) — entropy symbol count, not pixel count, drives cost
        rows.append(("jpeg gray q16", f"{h}x{w}",
                     *bench(decode_jpeg, encode_jpeg(gray, quant=16), h * w)))
        rows.append(("jpeg 4:2:0 q16", f"{h}x{w}",
                     *bench(decode_jpeg,
                            encode_jpeg(img, quant=16, subsampling="4:2:0"),
                            out3)))

    # WAV: one second of 16 kHz stereo, scaled 1x/4x/16x
    for mult in (1, 4, 16):
        n = 16000 * mult
        pcm = rng.integers(-2000, 2000, (n, 2)).astype(np.int16)
        rows.append(("wav (vectorized)", f"{n}x2 s16",
                     *bench(mm.decode_wav, mm.encode_wav(pcm), n * 2 * 2)))

    # FLAC (round 8): rice/predictor bit walk — the audio analog of
    # the GIF-LZW serial boundary. Smooth signal = the favorable case.
    from sif_spark.operators.flac import decode_flac_pcm, encode_flac

    for mult in (1, 4):
        n = 16000 * mult
        t = np.arange(n)
        smooth = np.stack(
            [(2000 * np.sin(t / 50)).astype(np.int32),
             (1500 * np.sin(t / 37 + 1)).astype(np.int32)], axis=1)
        rows.append(("flac (rice bit walk)", f"{n}x2 s16",
                     *bench(decode_flac_pcm,
                            encode_flac(smooth, 16000, 16), n * 2 * 2)))

    # AVI container walk (round 8): per-frame overhead on top of the
    # frame codec — measured with DIB frames so the container cost is
    # isolated from entropy decode.
    from sif_spark.operators.video import encode_avi, iter_avi_frames

    for h, w in ([(64, 64), (256, 256)] if QUICK else SIZES):
        frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(8)]
        avi = encode_avi(frames, codec="DIB ")
        rows.append(("avi DIB (container walk)", f"8x{h}x{w}",
                     *bench(lambda b: list(iter_avi_frames(b)), avi,
                            8 * h * w * 3)))

    # MP4 container walk (round 8): sample-table resolution + per-
    # sample slicing — PCM tracks isolate the container cost (payload
    # decode is a frombuffer), MJPEG tracks ride the JPEG boundary.
    from sif_spark.operators.mp4 import (
        decode_mp4_audio,
        encode_mp4_mjpeg,
        encode_mp4_pcm,
        iter_mp4_frames,
    )

    for mult in (1, 16):
        n = 16000 * mult
        pcm = rng.integers(-2000, 2000, (n, 2)).astype(np.int16)
        rows.append(("mp4 PCM (container walk)", f"{n}x2 s16",
                     *bench(decode_mp4_audio, encode_mp4_pcm(pcm, 16000),
                            n * 2 * 2)))
    for h, w in ([(64, 64)] if QUICK else [(64, 64), (256, 256)]):
        frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(8)]
        m4 = encode_mp4_mjpeg(frames, quant=16)
        rows.append(("mp4 MJPEG (JPEG-bound)", f"8x{h}x{w}",
                     *bench(lambda b: list(iter_mp4_frames(b)), m4,
                            8 * h * w * 3)))

    # WebDataset tar walk (round 8): header checksums + slicing only.
    import io
    import tarfile

    from sif_spark.operators.webdataset import iter_tar_members

    for n_members, msize in ((100, 4096), (1000, 65536)):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            payload = bytes(msize)
            for i in range(n_members):
                ti = tarfile.TarInfo(f"{i:08d}.bin")
                ti.size = msize
                tf.addfile(ti, io.BytesIO(payload))
        shard = buf.getvalue()
        rows.append((f"tar walk ({n_members} members)", f"{len(shard)//1024}KB",
                     *bench(lambda b: list(iter_tar_members(b)), shard,
                            len(shard))))

    print(f"| format/path | size | decoded MB/s | decodes/s |")
    print(f"|---|---|---|---|")
    for name, size, mbs, ips in rows:
        print(f"| {name} | {size} | {mbs:.1f} | {ips:.1f} |")
    print(json.dumps({
        "probe": "codec_throughput",
        "rows": [
            {"path": n, "size": s, "mb_s": round(m, 2), "per_s": round(i, 2)}
            for n, s, m, i in rows
        ],
    }))


if __name__ == "__main__":
    main()
