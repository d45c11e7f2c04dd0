"""Measure the stateful-streaming arm of the salting rule (VERDICT r6
"Next round" #4).

The round-6 adjudication (SCALE.md, operators/joins.py) established
"never salt batch shuffle joins under AQE" by measurement, and
ASSERTED the converse — salt stateful-streaming aggregation skew —
without a measurement. This probe produces that number.

Method: stage a skewed event set (90% of rows on hot key 0 — the
q118 generation), run the SAME custom stateful operator
(`running_reduce`, applyInPandasWithState) twice in separate child
processes with the event log enabled:
  unsalted: state keyed on skew_uid            — one state partition
                                                 owns the hot key
  salted:   state keyed on (skew_uid, hash%16) — hot key spread over 16
For each run, parse per-task shuffle-read record counts from the
event log, pick the stage that read the most shuffle records (the
stateful exchange feeding the state operator), and report
max_task_share = max(records per task) / sum(records).

Why applyInPandasWithState and not groupBy().agg(): built-in
streaming aggregations run a map-side PARTIAL aggregate before the
state exchange, so for algebraic aggs the shuffle carries one partial
row per (key, map-partition) and a hot KEY barely skews it (measured
here first: max_task_share 0.043 unsalted — nothing to fix; q118's
count/sum shape is safe unsalted). Custom stateful operators have NO
partial step — every raw row shuffles to the key's owner task — so
the hot key pins one task at its full share of the stream, fixed for
the query's LIFETIME (state partitioning never re-plans; AQE cannot
touch it). THAT is the shape salting fixes, and the shape this probe
measures.

Also cross-checks the salted result equals the unsalted result
(count+sum per key) — the same exactness contract q118 gates against
DuckDB.

Usage: python tools/stream_skew_probe.py [--rows 400000] [--buckets 16]
Prints one JSON line per run plus a summary. Writes only under /tmp.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

OUT = "/tmp/sif_stream_skew_probe"


def child(mode: str, rows: int, buckets: int) -> None:
    from pyspark.sql import functions as F

    from sif_spark.session import get_session
    from sif_spark.streaming.stream import combine_salted, salted_stream_agg

    evdir = f"{OUT}/evlog_{mode}"
    os.makedirs(evdir, exist_ok=True)
    spark = get_session(
        f"stream_skew_{mode}",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    stage_dir = f"{OUT}/src"
    if not os.path.exists(f"{stage_dir}/_SUCCESS"):
        src = spark.range(rows).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 997)
            .alias("skew_uid"),
            (F.col("id") % 1000).alias("value_cents"),
        )
        src.coalesce(4).write.mode("overwrite").parquet(stage_dir)
    stream = spark.readStream.schema(
        "event_id long, skew_uid long, value_cents long"
    ).parquet(stage_dir)
    from sif_spark.streaming.stream import running_reduce

    if mode == "salted":
        stream = stream.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(buckets))
        )
        agg = running_reduce(
            stream, ["skew_uid", "__salt"], count_col="n", sum_col="value_cents"
        )
    else:
        agg = running_reduce(stream, ["skew_uid"], count_col="n", sum_col="value_cents")
    name = f"skew_probe_{mode}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("skew_uid")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("value_cents_sum").cast("long").alias("value_sum"),
        )
    )
    rows_out = {
        r["skew_uid"]: (r["n_events"], int(r["value_sum"]))
        for r in final.collect()
    }
    with open(f"{OUT}/result_{mode}.json", "w") as f:
        json.dump({str(k): v for k, v in sorted(rows_out.items())}, f)
    spark.stop()
    print(f"CHILD_OK mode={mode} keys={len(rows_out)}", flush=True)


def parse_max_task_share(mode: str) -> dict:
    logs = sorted(glob.glob(f"{OUT}/evlog_{mode}/*"), key=os.path.getmtime)
    latest = logs[-1]
    files = (
        sorted(glob.glob(f"{latest}/events_*")) if os.path.isdir(latest) else [latest]
    )
    stage_tasks: dict[int, list[int]] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ev.get("Task Metrics") or {}
                sr = m.get("Shuffle Read Metrics") or {}
                rec = sr.get("Total Records Read", 0)
                if rec:
                    stage_tasks.setdefault(ev["Stage ID"], []).append(rec)
    if not stage_tasks:
        return {"error": "no shuffle-read tasks found"}
    # the stateful exchange = the stage with the most records read
    sid, recs = max(stage_tasks.items(), key=lambda kv: sum(kv[1]))
    total = sum(recs)
    return {
        "stage_id": sid,
        "tasks_with_reads": len(recs),
        "records_total": total,
        "records_max_task": max(recs),
        "max_task_share": round(max(recs) / total, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--child", metavar="MODE", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        child(args.child, args.rows, args.buckets)
        return
    os.makedirs(OUT, exist_ok=True)
    results = {}
    for mode in ("unsalted", "salted"):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--rows",
                str(args.rows),
                "--buckets",
                str(args.buckets),
                "--child",
                mode,
            ],
            capture_output=True,
            text=True,
            timeout=900,
        )
        if "CHILD_OK" not in proc.stdout:
            print(json.dumps({"mode": mode, "error": proc.stderr[-800:]}))
            return
        results[mode] = parse_max_task_share(mode)
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)
    with open(f"{OUT}/result_unsalted.json") as f:
        ru = json.load(f)
    with open(f"{OUT}/result_salted.json") as f:
        rs = json.load(f)
    print(
        json.dumps(
            {
                "rows": args.rows,
                "buckets": args.buckets,
                "results_equal": ru == rs,
                "unsalted_max_task_share": results["unsalted"].get("max_task_share"),
                "salted_max_task_share": results["salted"].get("max_task_share"),
            }
        )
    )


if __name__ == "__main__":
    main()
