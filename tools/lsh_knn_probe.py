"""Large-query-set LSH-kNN probe (VERDICT r2 ask #2): drive lsh_knn's
shuffle tier with a query set far beyond sensible broadcast size —
10k queries × 16 tables against a 100k-vector corpus (the 50×-scaled
embeddings; run tools/scale_probe.py 50 first to materialize them) —
and compare against the forced-broadcast tier on the same inputs.

What the numbers mean: the broadcast tier ships |queries|×tables
bucketized VECTOR rows to every executor (~10k×16×300B ≈ 50 MB here,
growing linearly with the query set — a driver/executor memory hazard
on a cluster) and drags vectors through the candidate dedup; the
shuffle tier moves id-only candidate rows through one skew-free
(table, bucket) exchange and joins vectors back onto the deduped pair
set. Tier equivalence is pinned by
tests/test_plans.py::test_lsh_knn_shuffle_tier; recall is parameter-
determined (tables × bits), identical for both tiers by construction
(same planes, same seed).

Measured 2026-08-13 (local[32], warm + best-of-2):
shuffle tier 24.0s, forced-broadcast tier 67.2s — the shuffle tier is
2.8× faster at 10k queries, before counting the broadcast's memory
ceiling.

Usage: python tools/lsh_knn_probe.py — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sif_spark.operators.similarity import lsh_knn
from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table

CORPUS_DIR = "/tmp/sif_scale_x50"
N_QUERIES = 10_000
KW = dict(k=5, dim=64, bits=8, tables=16, seed=42)


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
    spark = get_session("lsh_knn_probe")
    corpus = read_table(spark, CORPUS_DIR, "embeddings")
    n_corpus = corpus.count()
    # localCheckpoint: the query frame feeds both tiers repeatedly —
    # materialize the LIMIT once so every run sees the same rows
    queries = corpus.filter(F.col("vec_id") % 10 == 0).limit(N_QUERIES).localCheckpoint()

    def run(broadcast: bool):
        lsh_knn(corpus, queries, broadcast_queries=broadcast, **KW).write.format(
            "noop"
        ).mode("overwrite").save()

    shuffle_sec = timed(lambda: run(False))
    broadcast_sec = timed(lambda: run(True))

    print(
        json.dumps(
            {
                "corpus_rows": n_corpus,
                "query_rows": N_QUERIES,
                "tables": KW["tables"],
                "bits": KW["bits"],
                "shuffle_tier_sec": shuffle_sec,
                "broadcast_tier_sec": broadcast_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
