"""Executor-loss fault injection under local-cluster (round 9,
VERDICT r8 "Next round" #3): SIGKILL one executor JVM mid-job and
prove the engine's promise the reference never made — Spark's lineage
+ task retry recovers the job with BIT-IDENTICAL results (reference:
no fault tolerance at all, a worker error fails the stage —
cluster/coordinator.go:151-183, SURVEY §4.2).

Two scenarios, both under local-cluster[2,8,2048] (two REAL worker
JVMs, real serialization, remote shuffle fetch):

  A. q69_corpus_clean (the heavy multi-stage batch entry: quality →
     lang → exact dedup → near-dup → budget): kill one
     CoarseGrainedExecutorBackend while its jobs are running; the run
     must complete and its rows must equal a clean run's exactly.
  B. q119's epoch-committed ingest shape (pipeline.daily_ingest, two
     epochs): kill an executor during day-2's ingest; the run must
     complete, the output must equal a clean two-epoch run in a fresh
     store, and the store must hold ONLY fully-committed epochs
     (every epoch dir listed by _list_committed_epochs has its
     survivors/_SUCCESS marker — the crash-safe commit contract).

Prints one JSON line; tests/test_fault_injection.py asserts on it.
Run directly:  python tools/fault_injection_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def _executor_pids() -> set[int]:
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    )
    return {int(p) for p in out.stdout.split()} if out.stdout else set()


def _kill_one_executor_when_job_active(spark, killed: dict) -> threading.Thread:
    """Background thread: wait until a Spark job is actually running,
    then SIGKILL one executor JVM (once)."""

    def run() -> None:
        tracker = spark.sparkContext.statusTracker()
        deadline = time.time() + 120
        while time.time() < deadline:
            if tracker.getActiveJobsIds():
                pids = _executor_pids()
                if pids:
                    victim = min(pids)
                    time.sleep(0.4)  # let tasks land on it
                    try:
                        os.kill(victim, signal.SIGKILL)
                        killed["pid"] = victim
                        killed["at_jobs"] = list(tracker.getActiveJobsIds())
                    except ProcessLookupError:
                        continue
                    return
            time.sleep(0.05)
        killed["error"] = "no active job appeared within 120s"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def main() -> int:
    from pyspark.sql import functions as F

    from sif_spark.pipeline import _list_committed_epochs, daily_ingest
    from sif_spark.queries import QUERIES
    from sif_spark.session import get_session
    from sif_spark.sources.parquet import read_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(
        "fault_injection",
        master="local-cluster[2,8,2048]",
        shuffle_partitions=16,
    )
    result: dict = {"master": "local-cluster[2,8,2048]", "sf_dir": sf_dir}

    # --- scenario A: heavy batch entry under executor loss ----------
    clean = sorted(map(tuple, QUERIES["q69_corpus_clean"](spark, sf_dir).collect()))
    killed: dict = {}
    t = _kill_one_executor_when_job_active(spark, killed)
    faulted = sorted(map(tuple, QUERIES["q69_corpus_clean"](spark, sf_dir).collect()))
    t.join(timeout=130)
    result["q69_killed_pid"] = killed.get("pid")
    result["q69_killed_during_jobs"] = killed.get("at_jobs")
    result["q69_kill_error"] = killed.get("error")
    result["q69_rows"] = len(faulted)
    result["q69_identical"] = faulted == clean

    # --- scenario B: epoch-committed ingest under executor loss -----
    base = "/tmp/sif_spark_fault_probe"
    shutil.rmtree(base, ignore_errors=True)
    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 19)
    not_bench = F.col("doc_id") % 20 != 19
    day1 = d.filter((F.col("doc_id") < 250) & not_bench)
    day2 = d.filter((F.col("doc_id") >= 250) & not_bench)

    # clean reference run in its own store
    daily_ingest(day1, f"{base}/clean", "day1", benchmark=bench, hash_fn="md5")
    ref = daily_ingest(day2, f"{base}/clean", "day2", benchmark=bench, hash_fn="md5")
    ref_rows = sorted((r["doc_id"], r["lang"]) for r in ref.select("doc_id", "lang").collect())

    # faulted run: day1 commits cleanly, an executor dies during day2
    daily_ingest(day1, f"{base}/fault", "day1", benchmark=bench, hash_fn="md5")
    killed2: dict = {}
    t2 = _kill_one_executor_when_job_active(spark, killed2)
    s2 = daily_ingest(day2, f"{base}/fault", "day2", benchmark=bench, hash_fn="md5")
    got_rows = sorted((r["doc_id"], r["lang"]) for r in s2.select("doc_id", "lang").collect())
    t2.join(timeout=130)
    result["ingest_killed_pid"] = killed2.get("pid")
    result["ingest_kill_error"] = killed2.get("error")
    result["ingest_identical"] = got_rows == ref_rows
    result["ingest_rows"] = len(got_rows)

    # commit contract: every epoch visible to history has its marker,
    # and exactly the two expected epochs are committed — no
    # half-written epoch is visible after the crash-recovery run
    epochs = _list_committed_epochs(spark, f"{base}/fault")
    result["committed_epochs"] = len(epochs)
    from sif_spark.pipeline import _has_success_marker

    result["all_epochs_marked"] = all(
        _has_success_marker(spark, f"{e}/survivors") for e in epochs
    )

    result["ok"] = bool(
        result["q69_identical"]
        and result["ingest_identical"]
        and result.get("q69_killed_pid")
        and result.get("ingest_killed_pid")
        and result["committed_epochs"] == 2
        and result["all_epochs_marked"]
    )
    print(json.dumps(result))
    spark.stop()
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
