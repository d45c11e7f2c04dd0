"""Product-quantization probe: measure the PQ tier's actual trade on
the 10×-scaled embeddings (20k × 64-dim vectors — run
`tools/scale_probe.py 10` first): codebook training time, encode
throughput, code-vs-raw storage, and flat-ADC / IVF-PQ search
wall-clock + recall@10 against exact brute-force on the same queries.

What the numbers mean: PQ's purpose is the memory/IO side — 2·m bytes
a vector instead of dim·4 (here 16 B vs 256 B, 16×), which at 10B
vectors is the difference between a corpus that fits executor memory
and one that doesn't. Search-time parity with bf-kNN at this toy
scale is NOT the point (both are one scan; the GEMM is BLAS-fast) —
at corpus scale the code table scans 16× less data and IVF probing
cuts the scanned fraction to n_probe/n_cells on top.

Usage: python tools/pq_probe.py — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sif_spark.operators import similarity as sim
from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table

SCALED = "/tmp/sif_scale_x10"


def main() -> None:
    spark = get_session("pq_probe")
    src = SCALED if os.path.exists(f"{SCALED}/embeddings.parquet") else "/root/testdata/sf0.1"
    corpus = read_table(spark, src, "embeddings").localCheckpoint(eager=True)
    n = corpus.count()
    queries = corpus.orderBy("vec_id").limit(50)

    t0 = time.time()
    cb = sim.train_pq(corpus, m=8, ksub=256, sample_rows=4096, iters=10)
    train_s = time.time() - t0

    t0 = time.time()
    codes = sim.pq_encode(corpus, cb).localCheckpoint(eager=True)
    codes.count()
    encode_s = time.time() - t0

    def timed(fn):
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        out = fn()
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    bf_s = timed(lambda: sim.brute_force_knn(corpus, queries, k=10))
    flat_s = timed(lambda: sim.pq_knn(codes, cb, queries, k=10))
    index = sim.build_ivf_index(corpus, n_cells=64)
    ivf_s = timed(
        lambda: sim.ivf_pq_knn(codes, cb, index, queries, k=10, n_probe=8)
    )

    truth: dict = {}
    for r in sim.brute_force_knn(corpus, queries, k=10).collect():
        truth.setdefault(r["qid"], set()).add(r["nid"])

    def recall(df):
        got: dict = {}
        for r in df.collect():
            got.setdefault(r["qid"], set()).add(r["nid"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return round(hits / sum(len(v) for v in truth.values()), 3)

    flat_rec = recall(sim.pq_knn(codes, cb, queries, k=10))
    ivf_rec = recall(sim.ivf_pq_knn(codes, cb, index, queries, k=10, n_probe=8))

    raw_bytes = n * cb.dim * 4
    code_bytes = n * cb.m * 2
    print(
        json.dumps(
            {
                "corpus_rows": n,
                "train_sec": round(train_s, 2),
                "encode_sec": round(encode_s, 2),
                "raw_bytes": raw_bytes,
                "code_bytes": code_bytes,
                "compression_x": round(raw_bytes / code_bytes, 1),
                "bf_knn_sec": round(bf_s, 2),
                "pq_flat_sec": round(flat_s, 2),
                "ivf_pq_sec": round(ivf_s, 2),
                "pq_flat_recall_at10": flat_rec,
                "ivf_pq_recall_at10": ivf_rec,
            }
        )
    )


if __name__ == "__main__":
    main()
