"""Skew-join probe: does a zipfian join key survive the q03-shaped
shuffle join? (VERDICT r2 ask #5 — SCALE.md covered volume, not skew.)

Setup: a 12M-row fact table joins a 2M-row keyed table (too large to
auto-broadcast) on `k`, then aggregates. Two variants of the fact:

- uniform: k ~ uniform over the 2M right-side keys
- zipf:    60% of all fact rows share ONE hot key (k=0), the rest
           uniform — a single shuffle partition holds >7M rows

Measured: uniform vs skewed wall-clock with AQE skew-join ON (the
default catalog config), plus the skewed case with AQE OFF as the
counterfactual. The local[32] dataset is far below AQE's default 256MB
skew threshold, so the probe lowers the skew/advisory sizes to 4MB —
emulating the partition-to-threshold ratio a 100× cluster would see,
which is the thing being probed (AQE decides by relative sizes).

Pass/fail bar (SCALE.md row): skewed/uniform ratio ≤ 2× with AQE on.

Usage: python tools/skew_probe.py  — prints one JSON line.
Writes nothing outside /tmp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sif_spark.session import get_session

OUT = "/tmp/sif_skew_probe"
N_FACT = 12_000_000
N_KEYS = 2_000_000
HOT_FRACTION = 0.6


def build(spark) -> None:
    right = (
        spark.range(0, N_KEYS)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).cast("double").alias("payload"),
            F.concat(F.lit("name_"), F.col("id")).alias("name"),  # pad past broadcast
        )
    )
    right.write.mode("overwrite").parquet(f"{OUT}/right.parquet")
    hot_rows = int(N_FACT * HOT_FRACTION)
    fact_uniform = spark.range(0, N_FACT).select(
        (F.xxhash64("id") % N_KEYS + N_KEYS) % N_KEYS,
        (F.col("id") % 97).cast("double").alias("v"),
    ).toDF("k", "v")
    fact_zipf = spark.range(0, N_FACT).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise((F.xxhash64("id") % N_KEYS + N_KEYS) % N_KEYS)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    fact_uniform.write.mode("overwrite").parquet(f"{OUT}/fact_uniform.parquet")
    fact_zipf.write.mode("overwrite").parquet(f"{OUT}/fact_zipf.parquet")


def run_join(spark, fact_name: str, salt: int = 0) -> None:
    fact = spark.read.parquet(f"{OUT}/{fact_name}.parquet")
    right = spark.read.parquet(f"{OUT}/right.parquet")
    if salt:
        from sif_spark.operators.joins import salted_join

        joined = salted_join(
            fact, right.withColumnRenamed("k", "rk"), on=[("k", "rk")], salt=salt
        ).select("k", "v", "payload")
    else:
        joined = fact.join(right, "k")
    (
        joined
        .groupBy((F.col("k") % 10).alias("g"))
        .agg(F.sum(F.col("v") * F.col("payload")).alias("s"))
        .write.format("noop").mode("overwrite").save()
    )


def timed(spark, fact_name: str, n: int = 3, salt: int = 0) -> float:
    run_join(spark, fact_name, salt)  # warmup
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        run_join(spark, fact_name, salt)
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_session("skew_probe")
    # disable auto-broadcast of the 2M-row side: the probe targets the
    # shuffle-join path (a broadcastable right side is skew-immune by
    # construction and needs no probe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # scale AQE's size thresholds to the probe's data (see docstring)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    if not os.path.exists(f"{OUT}/right.parquet"):
        t0 = time.time()
        build(spark)
        print(f"built {OUT} in {time.time()-t0:.0f}s", file=sys.stderr)

    uniform = timed(spark, "fact_uniform")
    skewed = timed(spark, "fact_zipf")
    # AQE-vs-manual-salting adjudication (VERDICT r5 ask #7): the same
    # hot-key join through salted_join, with AQE skew-join on and off.
    # Salting replicates the 2M-row build side `salt`× — that cost is
    # real and part of the verdict.
    skewed_salted = timed(spark, "fact_zipf", salt=8)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    skewed_noaqe = timed(spark, "fact_zipf")
    skewed_salted_noaqe = timed(spark, "fact_zipf", salt=8)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(
        json.dumps(
            {
                "fact_rows": N_FACT,
                "right_rows": N_KEYS,
                "hot_fraction": HOT_FRACTION,
                "uniform_sec": uniform,
                "skewed_sec": skewed,
                "skewed_salted_sec": skewed_salted,
                "skewed_no_skewjoin_sec": skewed_noaqe,
                "skewed_salted_no_skewjoin_sec": skewed_salted_noaqe,
                "skew_ratio": round(skewed / uniform, 2) if uniform else None,
                "salted_vs_aqe": round(skewed_salted / skewed, 2) if skewed else None,
            }
        )
    )


if __name__ == "__main__":
    main()
