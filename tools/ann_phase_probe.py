"""Phase-timing probe for the incremental ANN entries (q181/q183/q187).

Measure-first instrument (guide §1): replicates each entry's body with
per-phase wall timers so the optimization round knows whether the time
goes to (a) the SifTable corpus build, (b) the one-time fit
(build_ivf_index / train_pq), (c) the streaming maintainer's
micro-batches, (d) the in-entry drift pin (exceptAll rebuild check), or
(e) the serving query itself. Pure instrumentation — no production code
path changes; results identical to the declared entries.

Usage: python tools/ann_phase_probe.py [q183|q181] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sif_spark.session import get_session
from sif_spark.sources.parquet import read_table


def probe_q183(spark, sf_dir: str) -> dict:
    from sif_spark.operators import similarity as sgsim
    from sif_spark.queries_table import _fresh_dir
    from sif_spark.table import SifTable

    t: dict[str, float] = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    corpus_path = _fresh_dir(sf_dir, "pq_corpus")
    idx_path = _fresh_dir(sf_dir, "pq_idx")
    ckpt = _fresh_dir(sf_dir, "pq_ckpt")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    k3 = F.col("vec_id") % 3
    day1 = emb.filter(k3 == 0)
    corpus = SifTable.create(spark, corpus_path, day1, key_col="vec_id")
    mark("create", t0)

    t0 = time.perf_counter()
    seed_index = sgsim.build_ivf_index(day1, n_cells=16, max_iter=2)
    mark("build_ivf_index", t0)
    t0 = time.perf_counter()
    cb = sgsim.train_pq(day1, m=8, ksub=256, sample_rows=4096, iters=8)
    mark("train_pq", t0)

    t0 = time.perf_counter()
    corpus.append(emb.filter(k3 == 1))
    corpus.append(emb.filter(k3 == 2))
    corpus.upsert(
        emb.filter(F.col("vec_id") % 10 == 3).select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    mark("appends_upsert", t0)

    t0 = time.perf_counter()
    q = sgsim.maintain_ivf_index_table(
        spark, corpus_path, idx_path, seed_index.centroids, ckpt,
        app_id="q183", max_versions_per_trigger=2, pq_codebook=cb,
        refresh_candidates=200, refresh_k=5, refresh_probe_queries=8,
        refresh_growth_check=2.0, refresh_margin=0.5,
        refresh_sample_rows=32768,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    mark("maintainer_stream", t0)

    t0 = time.perf_counter()
    idx_table = SifTable(spark, idx_path)
    final_corpus = corpus.read()
    meta, rows = sgsim.load_maintained_index(spark, idx_path)
    incr = rows.select("nid", "cell", "codes")
    fresh = sgsim.assign_cells(final_corpus, meta.centroids).join(
        sgsim.pq_encode(final_corpus, meta.codebook), "nid"
    )
    drift = incr.exceptAll(fresh).count() + fresh.exceptAll(incr).count()
    assert drift == 0
    mark("drift_pin", t0)

    t0 = time.perf_counter()
    queries = final_corpus.filter(F.col("vec_id") < 5)
    cand = (
        sgsim.pq_knn(incr.select("nid", "codes"), meta.codebook, queries, k=200)
        .select("nid")
        .distinct()
    )
    subset = final_corpus.join(cand, final_corpus.vec_id == cand.nid, "left_semi")
    out = sgsim.brute_force_knn(subset, queries, k=5).select("qid", "nid", "rank")
    out.write.format("noop").mode("overwrite").save()
    mark("serving", t0)
    return t


def probe_q181(spark, sf_dir: str) -> dict:
    from sif_spark.operators import similarity as sgsim
    from sif_spark.queries_table import _fresh_dir
    from sif_spark.table import SifTable

    t: dict[str, float] = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    corpus_path = _fresh_dir(sf_dir, "ann_corpus")
    idx_path = _fresh_dir(sf_dir, "ann_idx")
    ckpt = _fresh_dir(sf_dir, "ann_ckpt")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    k3 = F.col("vec_id") % 3
    corpus = SifTable.create(spark, corpus_path, emb.filter(k3 == 0), key_col="vec_id")
    mark("create", t0)
    t0 = time.perf_counter()
    seed_index = sgsim.build_ivf_index(emb.filter(k3 == 0), n_cells=16, max_iter=2)
    mark("build_ivf_index", t0)
    t0 = time.perf_counter()
    corpus.append(emb.filter(k3 == 1))
    corpus.append(emb.filter(k3 == 2))
    corpus.upsert(
        emb.filter(F.col("vec_id") % 10 == 3).select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    mark("appends_upsert", t0)
    t0 = time.perf_counter()
    q = sgsim.maintain_ivf_index_table(
        spark, corpus_path, idx_path, seed_index.centroids, ckpt,
        app_id="q181", max_versions_per_trigger=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    mark("maintainer_stream", t0)
    t0 = time.perf_counter()
    idx_table = SifTable(spark, idx_path)
    last = idx_table.last_txn_epoch("q181")
    v_before = idx_table._load()["version"]
    idx_table.upsert(idx_table.read().limit(5), txn=("q181", last))
    assert idx_table._load()["version"] == v_before
    mark("replay_pin", t0)
    t0 = time.perf_counter()
    final_corpus = corpus.read()
    incr = idx_table.read().select("nid", "cell")
    fresh = sgsim.assign_cells(final_corpus, seed_index.centroids)
    drift = incr.exceptAll(fresh).count() + fresh.exceptAll(incr).count()
    assert drift == 0
    mark("drift_pin", t0)
    t0 = time.perf_counter()
    index = sgsim.IVFIndex(
        seed_index.centroids, incr, vec_col="embedding",
        corpus_rows=final_corpus.count(),
    )
    queries = final_corpus.filter(F.col("vec_id") < 5)
    out = sgsim.ivf_knn(final_corpus, queries, k=5, n_probe=16, index=index).select(
        "qid", "nid", "rank"
    )
    out.write.format("noop").mode("overwrite").save()
    mark("serving", t0)
    return t


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "q183"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("ann_phase_probe")
    fn = {"q183": probe_q183, "q181": probe_q181}[which]
    fn(spark, sf_dir)  # warmup (codegen/JIT), untimed
    for i in range(2):
        phases = fn(spark, sf_dir)
        total = round(sum(phases.values()), 3)
        print(f"run{i}: total={total} {phases}", flush=True)


if __name__ == "__main__":
    main()
