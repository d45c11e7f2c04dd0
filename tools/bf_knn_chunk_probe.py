"""Chunked-query EXACT bf-kNN probe (VERDICT r3 ask #8): drive
brute_force_knn's query_chunks tier with a query set at the edge of
sensible broadcast size — 2k queries against the 100k-vector corpus
(the 50×-scaled embeddings; run tools/scale_probe.py 50 first) — and
compare the single-broadcast plan against 8-way chunking on the same
inputs.

What the numbers mean: chunking trades wall-clock (N sequential corpus
scans) for a hard memory bound — driver and executors hold ONE chunk's
normalized query matrix at a time (|Q|/N × dim × 8B), where the
single-broadcast plan holds all of it. Exactness is free: every qid
lives in exactly one hash-chunk, so per-chunk ranking windows are
already global (pinned by test_brute_force_knn_chunked_identical).
The expected slowdown is sub-linear in N: each scan re-reads the
corpus but GEMMs only 1/N of the query columns.

Measured 2026-08-13 (local[32], warm + best-of-2):
single-broadcast 2.32s, 8-way chunked 4.77s — 2.1× wall-clock for an
8× smaller peak query-matrix footprint (sub-linear in N=8, as
predicted); the tier to reach for when exactness is required and the
query set alone exceeds executor memory.

Usage: python tools/bf_knn_chunk_probe.py — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sif_spark.operators.similarity import brute_force_knn
from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table

CORPUS_DIR = "/tmp/sif_scale_x50"
N_QUERIES = 2_000
CHUNKS = 8


def timed(fn, n: int = 2) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    if not os.path.exists(os.path.join(CORPUS_DIR, "embeddings.parquet")):
        raise SystemExit("run `python tools/scale_probe.py 50` first")
    spark = get_session("bf_knn_chunk_probe")
    corpus = read_table(spark, CORPUS_DIR, "embeddings")
    n_corpus = corpus.count()
    queries = (
        corpus.filter(F.col("vec_id") % 50 == 0).limit(N_QUERIES).localCheckpoint()
    )

    def run(chunks: int):
        brute_force_knn(corpus, queries, k=5, query_chunks=chunks).write.format(
            "noop"
        ).mode("overwrite").save()

    single_sec = timed(lambda: run(1))
    chunked_sec = timed(lambda: run(CHUNKS))

    print(
        json.dumps(
            {
                "corpus_rows": n_corpus,
                "query_rows": N_QUERIES,
                "chunks": CHUNKS,
                "single_broadcast_sec": single_sec,
                "chunked_sec": chunked_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
