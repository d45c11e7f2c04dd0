"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the union-of-tagged-streams trick: tag left/right rows,
union, then one window pass per key carries the latest right-side row
forward (``last(..., ignorenulls=True)``) onto each left row. This is
the scale-correct strategy: ONE shuffle on the join key (same as any
equi-join), no range cross-product, no per-group pandas.

Skew caveat: the window partitions by the join key, so ONE logical key
is ONE window task — a pathologically hot key (say 20% of a 100 TB
stream under a single user_id) serializes onto a single core no matter
how many executors exist. AQE cannot split a window partition (unlike a
join). For that shape pass ``hot_key_bucket``: the window then
partitions by (key, time-bucket) — bounded per-task work — and a
second, tiny per-(key, bucket) pass (one row per bucket) carries state
across bucket boundaries. Costs one extra broadcast-sized join, so keep
it off unless keys are actually pathological.

Semantics match DuckDB/standard ASOF JOIN: for each left row, the
right row with the greatest ``right_time <= left_time`` (inclusive) on
the same key; null columns when no such row exists (left behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    hot_key_bucket: str | None = None,
) -> DataFrame:
    """Return ``left`` with, per row, the columns of the most recent
    ``right`` row at-or-before ``left[left_time]`` sharing ``on`` keys.

    ``right_cols``: right columns to carry (default: all non-key,
    non-time). Carried columns are suffixed if they collide with left.

    ``hot_key_bucket``: optional ``date_trunc`` unit (``'day'``,
    ``'hour'``, …). When set, the carry window partitions by
    (key, bucket) instead of (key) so a hot key's work spreads over
    #buckets tasks; cross-bucket carry-in is reconstructed exactly from
    a per-(key, bucket) summary (one row per bucket — see module
    docstring). Output is identical to the default mode.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_time]
    carried = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    l_tagged = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    for rc, out in carried.items():
        l_tagged = l_tagged.withColumn(out, F.lit(None).cast(right.schema[rc].dataType))

    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(rc).alias(out) for rc, out in carried.items()],
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged)
    outs = list(carried.values())

    if hot_key_bucket is None:
        # Right rows sort before left rows at equal timestamps (__side
        # 0 < 1) so an equal-time right row is visible to the left row —
        # inclusive as-of semantics, matching SQL ASOF JOIN's >=.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned
        for out in outs:
            filled = filled.withColumn(out, F.last(F.col(out), ignorenulls=True).over(w))
        return filled.filter(F.col("__side") == 1).drop("__t", "__side")

    # --- hot-key mode: (key, time-bucket) partitioned two-phase carry ---
    unioned = unioned.withColumn("__b", F.date_trunc(hot_key_bucket, F.col("__t")))

    # phase 1: within-bucket carry — per-task work bounded by bucket size
    w_in = (
        Window.partitionBy(*on, "__b")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for out in outs:
        filled = filled.withColumn(out, F.last(F.col(out), ignorenulls=True).over(w_in))

    # phase 2: cross-bucket carry-in — ONE row per (key, bucket), so the
    # per-key window here is #buckets rows even for the hottest key
    right_last = (
        unioned.filter(F.col("__side") == 0)
        .groupBy(*on, "__b")
        .agg(F.max_by(F.struct(*outs), F.col("__t")).alias("__last"))
    )
    all_buckets = unioned.select(*on, "__b").distinct()
    w_carry = (
        Window.partitionBy(*on)
        .orderBy(F.col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(right_last, [*on, "__b"], "left")
        .withColumn("__carry", F.last(F.col("__last"), ignorenulls=True).over(w_carry))
        .select(*on, "__b", "__carry")
    )

    joined = filled.join(carry, [*on, "__b"], "left")
    for out in outs:
        joined = joined.withColumn(
            out, F.coalesce(F.col(out), F.col(f"__carry.{out}"))
        )
    return (
        joined.filter(F.col("__side") == 1).drop("__t", "__side", "__b", "__carry")
    )
