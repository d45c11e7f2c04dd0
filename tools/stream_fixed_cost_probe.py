"""Probe the Python-DSV2 streaming source's per-QUERY fixed cost.

Measures, on one warm session: (a) three back-to-back no-data
sif_table stream queries (start -> processAllAvailable -> stop) to see
whether the per-query runner cost amortizes across queries; (b) the
process tree while a query is live, to see whether the runner is a
daemon fork (cheap) or a cold `python -m ...python_streaming_source_
runner` process (pays full interpreter + import startup per query);
(c) cold-import costs of the modules the runner must load.

Usage: python tools/stream_fixed_cost_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sif_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("stream_fixed_cost_probe")
    from sif_spark.queries_table import _fresh_dir
    from sif_spark.sources.table_stream import register_table_source
    from sif_spark.table import SifTable

    register_table_source(spark)
    base = _fresh_dir(sf_dir, "sfc_probe_table")
    SifTable.create(
        spark,
        base,
        spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        key_col="k",
    )
    # warm the session: one trivial action
    spark.range(1).count()

    def one_stream(i: int, snapshot_ps: bool) -> float:
        ckpt = _fresh_dir(sf_dir, f"sfc_probe_ckpt{i}")
        t0 = time.time()
        q = (
            spark.readStream.format("sif_table")
            .option("path", base)
            .option("starting_version", 1)  # after the create: no data
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        if snapshot_ps:
            time.sleep(0.3)
            out = subprocess.run(
                ["ps", "-eo", "pid,ppid,etimes,args"],
                capture_output=True,
                text=True,
            ).stdout
            for line in out.splitlines():
                if "python" in line and (
                    "daemon" in line or "runner" in line or "worker" in line
                ):
                    print("PS:", line[:200])
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        return time.time() - t0

    times = []
    for i in range(4):
        dt = one_stream(i, snapshot_ps=(i == 1))
        times.append(round(dt, 3))
        print(f"stream {i}: {dt:.3f} s", flush=True)
    print("per-query times:", times)

    # cold-import costs the runner pays if it is a fresh process
    for mod in (
        "pyspark",
        "pyspark.sql.datasource",
        "sif_spark.sources.table_stream",
        "sif_spark.table",
        "pyarrow",
        "numpy",
    ):
        r = subprocess.run(
            [sys.executable, "-c", f"import time; t=time.time(); import {mod}; print(round(time.time()-t,3))"],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
        )
        print(f"cold import {mod}: {r.stdout.strip()} {r.stderr.strip()[:120]}")
    spark.stop()


if __name__ == "__main__":
    main()
