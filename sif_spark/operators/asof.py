"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the union-of-tagged-streams trick: tag left/right rows,
union, then one window pass per key carries the latest right-side row
forward (``last(..., ignorenulls=True)``) onto each left row. This is
the scale-correct strategy: ONE shuffle on the join key (same as any
equi-join), no range cross-product, no per-group pandas. Skewed keys
are handled by AQE like any other window/shuffle.

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
) -> DataFrame:
    """Return ``left`` with, per row, the columns of the most recent
    ``right`` row at-or-before ``left[left_time]`` sharing ``on`` keys.

    ``right_cols``: right columns to carry (default: all non-key,
    non-time). Carried columns are suffixed if they collide with left.
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
    # Right rows sort before left rows at equal timestamps (__side 0 < 1)
    # so an equal-time right row is visible to the left row — inclusive
    # as-of semantics, matching SQL ASOF JOIN's >=.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for _, out in carried.items():
        filled = filled.withColumn(out, F.last(F.col(out), ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).drop("__t", "__side")
