"""Memory-pressure discipline probe (VERDICT r5 "Next round" #4).

The reference's one physical-layer virtue is graceful spill under a
64 MiB pcache watermark (internal/pcache/cache.go:19-127 — partitions
evict to LZ4 disk instead of OOMing, nyc_taxi_test.go:185 runs a full
pipeline under that pressure). The Spark rebuild delegates spill to
Spark's UnifiedMemoryManager; this probe PROVES that delegation holds
for the heaviest catalog compositions: the q69-shaped corpus-cleaning
pipeline (tokenize → exact dedup → inverted-index Jaccard pairs →
connected components → survivor anti-join) at 50× sf0.1 volume under
a deliberately starved heap.

Method: the parent builds the 50× corpus (controlled 5% duplicate
rate — dedup_scale_probe's generator) under a normal session, then
re-execs itself as a CHILD Spark session with
SPARK_GRAFT_DRIVER_MEM=$heap (default 1500m — local mode's executor
heap IS the driver JVM), few shuffle partitions (pressure per task),
and the event log enabled. The child runs the pipeline; the parent
parses the event log's TaskEnd metrics for
memory/disk bytes spilled, peak execution memory, and failed tasks.

PASS = pipeline completes with 0 failed-then-lost jobs under the
starved heap (spill-not-OOM); the spill bytes are the evidence that
memory pressure actually occurred (a run that never spills proves
nothing — raise --factor or lower --heap until it does).

The child runs --cpus task threads (default 8): a starved executor is
"few GB, few cores" — local[32] under a 1.5g heap is ~47 MB of
execution memory per task slot, below Spark's own per-executor
minimum and NOT a configuration any cluster manager would produce
(measured: straight OOM in the pair-join hashAgg). 8 slots × 1.5g
matches a 4-core/8-GB-executor's per-task budget at half scale.

Usage: python tools/memory_probe.py [--factor 50] [--heap 1500m]
                                    [--cpus 8] [--shuffle 8]
Prints one JSON line. Writes only under /tmp.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = "/tmp/sif_memory_probe"
EVLOG = f"{OUT}/eventlog"


def build(factor: int) -> str:
    from dedup_scale_probe import build_corpus  # noqa: E402

    from sif_spark.session import get_session

    path = f"{OUT}/corpus_{factor}x.parquet"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    spark = get_session("memory_probe_build")
    build_corpus(spark, factor).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def child(corpus_path: str) -> None:
    """Runs inside the starved JVM: the q69-shaped composition."""
    from pyspark.sql import functions as F

    from sif_spark.pipeline import CorpusPipeline
    from sif_spark.session import get_session

    spark = get_session(
        "memory_probe_child",
        shuffle_partitions=int(os.environ.get("PROBE_SHUFFLE", "8")),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVLOG}",
            "spark.eventLog.compress": "false",
        },
    )
    docs = spark.read.parquet(corpus_path)
    out = (
        CorpusPipeline()
        .exact_dedup()
        .near_dup_dedup(k=3, threshold=0.5, max_shingle_freq=100)
        .run(docs)
    )
    n = out.count()
    print(f"CHILD_OK rows={n}", flush=True)
    spark.stop()


def parse_eventlog() -> dict:
    logs = sorted(glob.glob(f"{EVLOG}/*"), key=os.path.getmtime)
    latest = logs[-1]
    # Spark 4 defaults to rolling event logs: a DIRECTORY of events_* files
    files = (
        sorted(glob.glob(f"{latest}/events_*")) if os.path.isdir(latest) else [latest]
    )
    mem_spill = disk_spill = peak = failed = tasks = 0
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tasks += 1
                if ev.get("Task End Reason", {}).get("Reason") != "Success":
                    failed += 1
                m = ev.get("Task Metrics") or {}
                mem_spill += m.get("Memory Bytes Spilled", 0)
                disk_spill += m.get("Disk Bytes Spilled", 0)
                peak = max(peak, m.get("Peak Execution Memory", 0))
    return {
        "tasks": tasks,
        "failed_tasks": failed,
        "memory_spilled_mb": round(mem_spill / 1e6, 1),
        "disk_spilled_mb": round(disk_spill / 1e6, 1),
        "peak_execution_memory_mb": round(peak / 1e6, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=50)
    ap.add_argument("--heap", default="1500m")
    ap.add_argument("--shuffle", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--child", metavar="CORPUS", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child(args.child)
        return

    os.makedirs(EVLOG, exist_ok=True)
    corpus = build(args.factor)
    env = dict(
        os.environ,
        SPARK_GRAFT_DRIVER_MEM=args.heap,
        SPARK_GRAFT_CPUS=str(args.cpus),
        PROBE_SHUFFLE=str(args.shuffle),
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", corpus],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
    result = {
        "factor": args.factor,
        "heap": args.heap,
        "shuffle_partitions": args.shuffle,
        "completed": ok,
        "wall_sec": wall,
    }
    if ok:
        result["rows"] = int(proc.stdout.split("rows=")[1].split()[0])
        result.update(parse_eventlog())
    else:
        result["stderr_tail"] = proc.stderr[-2000:]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
