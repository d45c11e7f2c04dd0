"""Scale probe: replicate the sf0.1 tables ~10× with shifted keys
(≈6M lineitem rows, 50k docs, 20k embeddings) into /tmp and run the
headline queries, comparing wall-clock against sf0.1. The point is the
*scaling exponent*, not the absolute numbers: a plan whose runtime
grows ~linearly with input is one AQE can scale out on a cluster; one
that grows quadratically is broken regardless of hardware.

Usage: python tools/scale_probe.py [replication_factor]
Writes nothing outside /tmp; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sif_spark.session import get_session
from sif_spark.queries import QUERIES
from sif_spark.sources.parquet import read_table

BASE = "/root/testdata/sf0.1"


def _jaccard_guarded(spark, sf_dir):
    """Exact Jaccard in its at-scale configuration (stop-shingle guard
    bounding hot-key postings — since round 2 the catalog's q13 runs
    guarded too, with the cap mirrored in its oracle)."""
    from sif_spark.operators.dedup import ngram_jaccard_pairs

    d = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.2,
                               max_shingle_freq=50)


# Probe set: plans whose cost is input-driven, so wall-clock ratio ≈
# scaling exponent. The near-dup operators (jaccard/minhash/simhash)
# are excluded: on replicated data their cost is OUTPUT-driven by
# design (a 10×-replicated corpus is 90% near-duplicates, so the
# candidate-pair set grows ~100×) — their scaling story is the
# stop-shingle guard and LSH banding, covered in dedup.py docstrings.
PROBE_QUERIES: dict = {
    "q01_pricing_summary": QUERIES["q01_pricing_summary"],   # scan + shuffle agg
    "q03_revenue_by_nation": QUERIES["q03_revenue_by_nation"],  # fact-fact join
    "q04_topk_orders_per_customer": QUERIES["q04_topk_orders_per_customer"],  # window
    "q08_exact_dedup": QUERIES["q08_exact_dedup"],           # hash-groupBy dedup
    "q11_knn_bruteforce": QUERIES["q11_knn_bruteforce"],     # GEMM scan
    "q10_events_hourly": QUERIES["q10_events_hourly"],       # time-window agg
    "q12_asof_purchase_click": QUERIES["q12_asof_purchase_click"],  # asof window
    # round-2 additions
    "q32_customer_quartiles": QUERIES["q32_customer_quartiles"],  # distributed ntile
    "q44_key_columns": QUERIES["q44_key_columns"],  # portable compound key scan
    "q49_heatmap": QUERIES["q49_heatmap"],           # grid reduce
    # round-5 additions (input-driven shapes only; q84/q85 are
    # near-dup-output-driven like jaccard/minhash, see note above)
    "q76_decontamination": QUERIES["q76_decontamination"],  # broadcast semi-join
    "q77_pii_redaction": QUERIES["q77_pii_redaction"],      # codegen regex scan
    "q80_sequence_packing": QUERIES["q80_sequence_packing"],  # bucket windows
    "q82_heavy_hitters": QUERIES["q82_heavy_hitters"],      # MG + recount
    "q83_incremental_dedup": QUERIES["q83_incremental_dedup"],  # fp anti-join
    # round-5b additions: all input-driven (line_dedup's cost is one
    # groupBy + one hash join regardless of duplicate multiplicity —
    # no pair explosion — so replicated data probes it fairly)
    "q89_line_dedup": QUERIES["q89_line_dedup"],      # line hash groupBy+join
    "q91_sessions": QUERIES["q91_sessions"],          # per-key lag windows
    "q93_value_outliers": QUERIES["q93_value_outliers"],  # stats + broadcast
    "q95_token_mixture": QUERIES["q95_token_mixture"],    # totals + hash gate
    "q96_late_shipment_priorities": QUERIES["q96_late_shipment_priorities"],  # semi join
    "q97_duplication_profile": QUERIES["q97_duplication_profile"],  # gram doc-freq
    "q101_gopher_repetition": QUERIES["q101_gopher_repetition"],    # per-doc rep battery
    "q102_local_supplier_volume": QUERIES["q102_local_supplier_volume"],  # 6-table join
    "q104_salted_join": QUERIES["q104_salted_join"],                # salted fact join
}

# id columns to shift per replica so keys stay distinct and
# key-cardinality scales with data (no artificial hot keys).
SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}
SHIFT = 10_000_000


def build_scaled(spark, out_dir: str, reps: int) -> None:
    for table, cols in SHIFT_COLS.items():
        base = read_table(spark, BASE, table)
        if not cols or table in ("nation", "region"):
            base.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
            continue
        parts = []
        for r in range(reps):
            df = base
            for c in cols:
                df = df.withColumn(c, F.col(c) + F.lit(r * SHIFT))
            # perturb doc text per replica so dedup/similarity work
            # scales in entity count, not in duplicate multiplicity
            if table == "documents":
                df = df.withColumn(
                    "text", F.concat_ws(" ", F.col("text"), F.lit(f"rep{r}"))
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    """Warmup + best-of-3: the host shows sporadic external load and
    JIT-storm noise worth 10×+ on single samples; the minimum is the
    plan's actual cost."""
    timings = {}
    for name, fn in PROBE_QUERIES.items():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 2)
        print(f"  {sf_dir.split('/')[-1]} {name}: {timings[name]}s", file=sys.stderr)
    return timings


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/tmp/sif_scale_x{reps}"
    spark = get_session("scale_probe")
    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        t0 = time.time()
        build_scaled(spark, out_dir, reps)
        print(f"built {out_dir} in {time.time()-t0:.0f}s", file=sys.stderr)
    # scaled phase first: a prior phase's JIT state can only make the
    # larger measurement look better, never worse
    scaled_t = time_queries(spark, out_dir)
    base_t = time_queries(spark, BASE)
    ratios = {
        k: round(scaled_t[k] / base_t[k], 1) if base_t[k] > 0.05 else None
        for k in base_t
    }
    print(
        json.dumps(
            {
                "replication": reps,
                "base_sec": base_t,
                "scaled_sec": scaled_t,
                "ratio": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
