"""SparkSession factory with scale-appropriate defaults.

The reference hand-rolls its execution substrate (LRU partition cache +
LZ4 spill, pull-based shuffle, range-bucketed sorted indexes — SURVEY.md
§4.2). All of that is built into Spark; the only thing this module owns
is configuration: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow on (vectorized Python interop), UTC
session timezone (oracle comparability), and a shuffle-partition count
sized to the local machine rather than the 200 default.

At cluster scale the same settings hold — `spark.sql.shuffle.partitions`
becomes a starting hint that AQE coalesces/splits at runtime, which is
exactly the behavior you want at 100 TB where static tuning is hopeless.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every Python<->JVM data transfer (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps vs the DuckDB oracle (naive-UTC).
    "spark.sql.session.timeZone": "UTC",
    # Lz4 matches the reference's spill/shuffle codec (SURVEY.md §4.2).
    "spark.io.compression.codec": "lz4",
    # FileOutputCommitter v2: task commits move files into the final
    # dir directly instead of a second job-commit rename pass. Every
    # sif_spark write lands in a fresh unique dir whose visibility is
    # gated by a separate commit (SifTable manifests, the epoch
    # stores' _SUCCESS marker), so v1's job-level atomicity buys
    # nothing here — v2 drops one rename per written file, which at
    # 100 TB (or on object stores) is the difference between an O(1)
    # and O(files) commit tail.
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    # Read parquet TIMESTAMP(NANOS) (which Spark has no native type for)
    # as long nanos; sources.parquet converts to microsecond timestamps.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Tz-less parquet timestamps read as plain (LTZ) TimestampType, not
    # TIMESTAMP_NTZ — with the UTC session zone the instant equals the
    # naive value, and no post-scan cast blocks date-filter pushdown.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_session(
    app_name: str = "sif_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with sif_spark defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at real
    cluster scale callers pass a value sized to input volume and let AQE
    coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # SPARK_GRAFT_MASTER lets any entry point (tests, bench,
        # check_oracle) run under a DISTRIBUTED master — e.g.
        # local-cluster[2,16,4096] for the 2-worker multi-process
        # validation (CLUSTER.md) — without code changes.
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # TWS protocol env must precede the JVM: local-mode python workers
    # inherit the environment the context STARTS with, so the protobuf
    # shim (sif_spark/streaming/tws_env.py) has to be on $PYTHONPATH
    # now for q167/q168's transformWithState to run in this session.
    # No-op when protobuf is installed; never fails session creation.
    try:
        from sif_spark.streaming.tws_env import ensure_protobuf_env

        ensure_protobuf_env()
    except Exception:
        pass

    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Local mode: one JVM; driver memory is the only knob. Leave headroom.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if not master.startswith("local["):
        _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship sif_spark to the executors as a zip (addPyFile).

    In ``local[n]`` the Python workers fork from the driver and inherit
    its sys.path, which silently masks a real-cluster failure mode: on
    any multi-process master (local-cluster, standalone, YARN, k8s)
    executors spawn their OWN workers, and every cloudpickled closure
    that references a sif_spark module unpickles with
    ModuleNotFoundError unless the package ships with the job — the
    exact failure the round-6 local-cluster validation surfaced on 16
    catalog entries (CLUSTER.md). This is the same mechanism
    spark-submit --py-files uses, so the fix IS the production deploy
    story, not a test shim.

    ADVICE r6 hardening: the zip is written to a PER-PROCESS unique
    temp name (a fixed path was racy — one process could rewrite the
    zip while another's executors were mid-fetch), ship-once is
    decided by checking the context's registered files up front
    (instead of a bare ``except Exception: pass`` around addPyFile,
    which could silently swallow a genuine shipping failure and
    reintroduce the very ModuleNotFoundError this code prevents), and
    any addPyFile error now propagates."""
    sc = spark.sparkContext
    try:
        already = any("sif_spark_pyfiles" in f for f in sc.listFiles)
    except Exception:
        already = False  # listFiles unavailable on this master — ship anyway
    if already:
        return
    sc.addPyFile(_build_pkg_zip())


def _build_pkg_zip() -> str:
    """Zip the sif_spark package (arcnames rooted at sif_spark/ — the
    layout addPyFile must see) into a per-process unique temp file.

    The zip is registered for atexit removal (ADVICE r7: repeated
    get_session calls across bench/test processes otherwise accumulate
    unbounded multi-MB zips in the temp dir). atexit — not eager
    unlink — because executors fetch the file lazily on first task;
    the path must outlive the SparkContext, and process exit is the
    one point that's guaranteed after every context stop."""
    import atexit
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="sif_spark_pyfiles_", suffix=".zip")
    os.close(fd)
    atexit.register(lambda p=zpath: os.path.exists(p) and os.unlink(p))
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    return zpath


def stop_session() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
