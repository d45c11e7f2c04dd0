"""Time-series resampling: bucket, gap-fill, and carry-forward.

The reference engine's row/window primitives leave regularization to
the user; this module provides it as first-class relational plans
(reference parity surface: sif's windowed accumulators cover *present*
rows only — `internal/dataframe` ops never synthesize missing buckets).

Scale design: the dense grid is |keys| x |buckets| — generated
executor-side by exploding a `sequence()` per key, never on the
driver. The only driver-visible data is the 2-value global time span
(one tiny agg job, same class as a `count()`). The fill join is keyed
by (key, bucket): uniform by construction, skew-free, and the
carry-forward window partitions per key — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    interval_seconds: int = 3600,
    fill: str = "zero",
) -> DataFrame:
    """Regularize an event stream into a dense per-key time grid:
    (key, bucket, n_events, total) with one row for EVERY
    ``interval_seconds`` bucket in the global [min, max] span and every
    key — including empty buckets. ``fill="zero"`` leaves missing
    totals at 0; ``fill="locf"`` carries the last observed total
    forward per key (NULL before a key's first observation).

    Plan: one partial-agg bucketing pass; one 2-value span agg; grid =
    distinct keys x `sequence()` explode (executor-side); left join on
    the uniform (key, bucket) pair; LOCF via a per-key
    `last(ignorenulls)` window.

    Rows with a NULL key or NULL timestamp are excluded up front: a
    NULL key can't join the dense grid (non-null-safe key equality
    would silently zero its counts — review r5) and a NULL timestamp
    belongs to no bucket."""
    if fill not in ("zero", "locf"):
        raise ValueError(f"fill must be 'zero' or 'locf', got {fill!r}")
    df = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    step = F.lit(interval_seconds)
    # floor division, not cast — cast truncates toward zero, which
    # shifts pre-1970 (negative-epoch) timestamps into the WRONG
    # bucket (review r5)
    bucket = F.to_timestamp(
        F.from_unixtime(
            F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
        )
    )
    per_bucket = (
        df.select(F.col(key_col).alias("key"), bucket.alias("bucket"), F.col(value_col).alias("__v"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("__v").alias("total"))
    )
    span = df.select(
        F.min(bucket).alias("lo"), F.max(bucket).alias("hi")
    ).collect()[0]
    if span["lo"] is None:
        return per_bucket.withColumn("total", F.col("total").cast("double"))
    grid = (
        df.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.lit(span["lo"]),
                    F.lit(span["hi"]),
                    F.expr(f"INTERVAL {interval_seconds} SECONDS"),
                )
            ).alias("bucket"),
        )
    )
    dense = grid.join(per_bucket, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("total").cast("double").alias("total"),
    )
    if fill == "zero":
        return dense.withColumn("total", F.coalesce("total", F.lit(0.0)))
    w = Window.partitionBy("key").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dense.withColumn("total", F.last("total", ignorenulls=True).over(w))
