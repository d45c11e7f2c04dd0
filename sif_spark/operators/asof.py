"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the union-of-tagged-streams trick: tag left/right rows,
union, then one window pass per key carries the latest right-side ROW
forward onto each left row. The carried columns are packed into a
single struct and carried with ``last(struct, ignorenulls=True)`` —
row semantics: the match is the latest right row AS A WHOLE, including
any NULL columns it has (matching SQL ASOF JOIN; carrying each column
independently would resurrect older non-null values, ADVICE r3).
This is the scale-correct strategy: ONE shuffle on the join key (same
as any equi-join), no range cross-product, no per-group pandas.

Skew caveat: the window partitions by the join key, so ONE logical key
is ONE window task — a pathologically hot key (say 20% of a 100 TB
stream under a single user_id) serializes onto a single core no matter
how many executors exist. AQE cannot split a window partition (unlike a
join). For that shape pass ``hot_key_bucket``: the window then
partitions by (key, time-bucket) — bounded per-task work — and a
second, tiny per-(key, bucket) pass (one row per bucket) carries state
across bucket boundaries. Costs one extra broadcast-sized join, so keep
it off unless keys are actually pathological. ``hot_key_bucket="auto"``
runs a sampled key-histogram probe and picks a granularity only when a
key actually exceeds ``hot_key_threshold`` of the (sampled) rows — the
100 TB user usually doesn't know their key is hot until the job hangs.

Semantics match DuckDB/standard ASOF JOIN: for each left row, the
right row with the greatest ``right_time <= left_time`` (inclusive) on
the same key; null columns when no such row exists (left behavior).
NULL join keys group together (SQL window/GROUP BY semantics, not
equi-join semantics): the hot-key mode's internal carry joins use
null-safe equality so both modes agree on NULL keys. Right rows with
a NULL timestamp are dropped before the union — ``right_time <=
left_time`` is NULL for them in SQL, so they can never be the match
(DuckDB ASOF agrees; without the filter the default mode's
NULLS-FIRST window ordering would carry them, review r4). Left rows
with a NULL timestamp get NULL carried columns — no right row
satisfies the comparison — which the NULLS-FIRST ordering produces
naturally. Ordering AMONG equal (timestamp, side) right rows is
engine-dependent in both modes, as in any ASOF tie.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, Window, functions as F, types as T

# "auto" probe: units coarse→fine; pick the coarsest giving >= _MIN_BUCKETS
# buckets over the observed time span (enough tasks to spread a hot key).
_BUCKET_UNITS = [
    ("week", 7 * 86400.0),
    ("day", 86400.0),
    ("hour", 3600.0),
    ("minute", 60.0),
    ("second", 1.0),
]
_MIN_BUCKETS = 64


def detect_hot_key_bucket(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    threshold: float = 0.2,
    sample_fraction: float = 0.01,
    seed: int = 42,
) -> str | None:
    """Sampled key-histogram probe: return a ``date_trunc`` unit when
    some key holds more than ``threshold`` of the sampled (left+right)
    rows, else None. The unit is the coarsest one yielding at least
    ~64 buckets over the sampled time span, so the hot key's window
    work spreads across enough tasks without exploding the carry join.

    Cost: ONE small eager job over a ``sample_fraction`` sample — the
    key histogram and the time span ride the same per-key aggregation
    (ADVICE r4: these used to be two separate jobs over an uncached
    sample, scanning left+right twice per "auto" call) — that is the
    price of "auto"; callers who know their key distribution pass an
    explicit unit (or None) and pay nothing.

    Non-timestamp (numeric epoch) time columns make the probe DECLINE
    (return None — units are unknowable): "auto" then falls back to
    the default single-window mode, which handles numeric time fine
    (ADVICE r4: this used to raise AttributeError).
    """
    keyed = left.select(
        *[F.col(_q(k)).alias(k) for k in on], F.col(_q(left_time)).alias("__t")
    ).unionByName(
        right.select(
            *[F.col(_q(k)).alias(k) for k in on], F.col(_q(right_time)).alias("__t")
        )
    )
    if sample_fraction < 1.0:
        keyed = keyed.sample(withReplacement=False, fraction=sample_fraction, seed=seed)
    per_key = keyed.groupBy(*[F.col(_q(k)) for k in on]).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__t").alias("__lo"),
        F.max("__t").alias("__hi"),
    )
    stats = per_key.agg(
        F.sum("__n").alias("total"),
        F.max("__n").alias("top"),
        F.min("__lo").alias("lo"),
        F.max("__hi").alias("hi"),
    ).first()
    if stats is None or not stats["total"]:
        return None
    if stats["top"] / stats["total"] < threshold:
        return None
    if stats["lo"] is None or stats["hi"] is None:
        return None
    try:
        span_sec = (stats["hi"] - stats["lo"]).total_seconds()
    except (AttributeError, TypeError):
        return None  # numeric epoch time — decline; default mode handles it
    for unit, unit_sec in _BUCKET_UNITS:
        if span_sec / unit_sec >= _MIN_BUCKETS:
            return unit
    return _BUCKET_UNITS[-1][0]


def _q(name: str) -> str:
    """Backtick-quote a user-supplied column name so F.col / select /
    partitionBy resolve it VERBATIM — unquoted names containing dots
    would parse as nested-field paths (review r4)."""
    return f"`{name.replace('`', '``')}`"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    hot_key_bucket: str | None = None,
    hot_key_threshold: float = 0.2,
    hot_key_sample_fraction: float = 0.01,
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
    docstring). Output is identical to the default mode (both carry
    the latest right row as a unit, NULL columns included, and both
    group NULL keys together). ``"auto"`` probes a sampled key
    histogram first (``detect_hot_key_bucket``) and stays in the
    default single-window mode unless a key exceeds
    ``hot_key_threshold`` of sampled rows.
    """
    if hot_key_bucket == "auto":
        hot_key_bucket = detect_hot_key_bucket(
            left, right, on, left_time, right_time,
            threshold=hot_key_threshold,
            sample_fraction=hot_key_sample_fraction,
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_time]
    carried = {c: (c + suffix if c in left.columns else c) for c in right_cols}
    outs = list(carried.values())
    row_type = T.StructType(
        [T.StructField(out, right.schema[rc].dataType) for rc, out in carried.items()]
    )

    # The carried columns travel as ONE struct: non-null for every right
    # row (even if all its fields are NULL), absent for left rows — so
    # last(__row, ignorenulls=True) picks the latest right ROW, never a
    # per-column mix of rows.
    l_tagged = left.select(
        "*",
        F.col(_q(left_time)).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(row_type).alias("__row"),
    )
    # NULL-timestamp right rows can never be the as-of match (the
    # right_time <= left_time comparison is NULL in SQL) — filter them
    # here so the window's NULLS-FIRST ordering can't carry them.
    r_tagged = right.filter(F.col(_q(right_time)).isNotNull()).select(
        *[F.col(_q(k)).alias(k) for k in on],
        F.col(_q(right_time)).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(_q(rc)).alias(out) for rc, out in carried.items()]
        ).alias("__row"),
    )
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(l_tagged.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged)

    def unpack(df: DataFrame) -> DataFrame:
        # getField + withColumns (not "__row.<name>" column paths):
        # carried column names may themselves contain dots, which F.col
        # would misparse as nested field access (review r4). Left
        # columns pass through untouched; outs append in order.
        out = df.filter(F.col("__side") == 1)
        out = out.withColumns(
            {o: F.col("__row").getField(o) for o in outs}
        )
        return out.drop("__t", "__side", "__b", "__row")

    if hot_key_bucket is None:
        # Right rows sort before left rows at equal timestamps (__side
        # 0 < 1) so an equal-time right row is visible to the left row —
        # inclusive as-of semantics, matching SQL ASOF JOIN's >=.
        w = (
            Window.partitionBy(*[F.col(_q(k)) for k in on])
            .orderBy(F.col("__t"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.withColumn("__row", F.last("__row", ignorenulls=True).over(w))
        return unpack(filled)

    # --- hot-key mode: (key, time-bucket) partitioned two-phase carry ---
    unioned = unioned.withColumn("__b", F.date_trunc(hot_key_bucket, F.col("__t")))

    # phase 1: within-bucket carry — per-task work bounded by bucket size
    w_in = (
        Window.partitionBy(*[F.col(_q(k)) for k in on], F.col("__b"))
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__row", F.last("__row", ignorenulls=True).over(w_in))

    # phase 2: cross-bucket carry-in — ONE row per (key, bucket), so the
    # per-key window here is #buckets rows even for the hottest key.
    # max_by(__row, __t) = latest right row of the bucket AS A UNIT.
    # The right side of each internal join renames its key columns to
    # reserved __-prefixed names: no ambiguous references, and no
    # "alias.column" string paths that would misparse dotted user
    # column names (review r4).
    right_last = (
        unioned.filter(F.col("__side") == 0)
        .groupBy(*[F.col(_q(k)) for k in on], F.col("__b"))
        .agg(F.max_by(F.col("__row"), F.col("__t")).alias("__last"))
    )
    rl = right_last.select(
        *[F.col(_q(k)).alias(f"__rk{i}") for i, k in enumerate(on)],
        F.col("__b").alias("__rb"),
        "__last",
    )
    all_buckets = unioned.select(*[F.col(_q(k)).alias(k) for k in on], "__b").distinct()
    carry_cond = functools.reduce(
        operator.and_,
        [all_buckets[_q(k)].eqNullSafe(rl[f"__rk{i}"]) for i, k in enumerate(on)]
        + [all_buckets["__b"].eqNullSafe(rl["__rb"])],
    )
    w_carry = (
        Window.partitionBy(*[F.col(_q(k)) for k in on])
        .orderBy(F.col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_buckets.join(rl, carry_cond, "left")
        .withColumn("__carry", F.last(F.col("__last"), ignorenulls=True).over(w_carry))
        .select(*[F.col(_q(k)).alias(k) for k in on], "__b", "__carry")
    )
    cr = carry.select(
        *[F.col(_q(k)).alias(f"__ck{i}") for i, k in enumerate(on)],
        F.col("__b").alias("__cb"),
        "__carry",
    )
    join_cond = functools.reduce(
        operator.and_,
        [filled[_q(k)].eqNullSafe(cr[f"__ck{i}"]) for i, k in enumerate(on)]
        + [filled["__b"].eqNullSafe(cr["__cb"])],
    )
    joined = (
        filled.join(cr, join_cond, "left")
        .withColumn("__row", F.coalesce(filled["__row"], cr["__carry"]))
        .drop("__carry", "__cb", *[f"__ck{i}" for i in range(len(on))])
    )
    return unpack(joined)
