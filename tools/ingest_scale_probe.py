"""Scale evidence for the two-epoch daily ingest (q119 /
`pipeline.daily_ingest`): prove the NIGHTLY cost is O(batch + stores),
not O(corpus).

The operator's 100 TB claim is that day-N ingest never re-reads
historical TEXT — history participates only as a 16-byte fingerprint
per doc (exact tier) and ``num_hashes`` longs per doc (MinHash tier).
So growing the historical corpus K× should grow the nightly epoch's
wall time by far less than K× (the store SCAN grows; the batch-side
shingling, banding, and joins do not).

Method: reuse dedup_scale_probe's corpus generator (token-salted
replicas of the sf0.01 documents table + 5% planted near-dups).
For each history factor H in --factors:
  1. build a fresh store dir; ingest the H× history as epoch "day1"
     (builds the fingerprint + signature stores; timed separately),
  2. ingest the SAME fixed 1× batch as epoch "day2" — TIMED; this is
     the nightly cost under test,
  3. record day-2 survivor count (sanity: stable across H, since the
     batch's relationship to the 1× base content is fixed — each
     history replica r>0 is token-salted, so only the r=0 slice ever
     collides with the batch).
PASS shape = day-2 time grows sublinearly in H (slope well under
H-proportional) with survivors constant.

Usage: python tools/ingest_scale_probe.py [--factors 1,5,10]
Prints one JSON line per factor + a summary. Writes only under /tmp.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

OUT = "/tmp/sif_ingest_scale_probe"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,5,10")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from pyspark.sql import functions as F

    from dedup_scale_probe import SHIFT, build_corpus
    from sif_spark.pipeline import daily_ingest
    from sif_spark.session import get_session
    from sif_spark.sources.parquet import read_table

    spark = get_session("ingest_scale_probe", shuffle_partitions=32)
    # fixed nightly batch: the 1x base with SHIFTED ids (so ids never
    # collide with history) — content-wise it fully duplicates the r=0
    # history slice, the worst case for store lookups
    base = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        (F.col("doc_id") + 50 * SHIFT).alias("doc_id"), "text"
    )
    batch_path = f"{OUT}/batch.parquet"
    base.coalesce(4).write.mode("overwrite").parquet(batch_path)
    batch = spark.read.parquet(batch_path)

    results = []
    for h in factors:
        hist_path = f"{OUT}/hist_{h}x.parquet"
        build_corpus(spark, h).coalesce(8).write.mode("overwrite").parquet(hist_path)
        history = spark.read.parquet(hist_path)
        n_hist = history.count()
        store = f"{OUT}/store_{h}x"
        shutil.rmtree(store, ignore_errors=True)
        t0 = time.time()
        daily_ingest(history, store, "day1").count()
        day1_s = round(time.time() - t0, 1)
        t0 = time.time()
        surv = daily_ingest(batch, store, "day2").count()
        day2_s = round(time.time() - t0, 1)
        rec = {
            "history_factor": h,
            "history_docs": n_hist,
            "day1_build_sec": day1_s,
            "day2_ingest_sec": day2_s,
            "day2_survivors": surv,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if len(results) >= 2:
        f0, fn = results[0], results[-1]
        print(
            json.dumps(
                {
                    "history_growth": round(
                        fn["history_docs"] / f0["history_docs"], 1
                    ),
                    "day2_time_growth": round(
                        fn["day2_ingest_sec"] / max(f0["day2_ingest_sec"], 0.1), 2
                    ),
                    "survivors_stable": all(
                        r["day2_survivors"] == f0["day2_survivors"] for r in results
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
