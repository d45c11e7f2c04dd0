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


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-key session index to every event: a new session
    starts at a key's first event and whenever the gap since the
    previous event exceeds ``gap_seconds`` (batch analog of the
    streaming session windows in streaming/stream.py — same gap
    semantics, replayable over history).

    Adds ``session_idx`` (long, 1-based per key). Plan: one lag + one
    running-sum window, both partitioned BY KEY — never a global sort.
    Equal timestamps within a key order arbitrarily between
    themselves, but a zero gap can't open a session, so the assignment
    is deterministic regardless of tie order.

    Scale: per-key window state is bounded by that key's event count.
    A single key with billions of events is inherently sequential
    under gap semantics (each boundary depends on the previous event);
    shard such keys upstream by coarse time range and stitch at the
    range seams if one key outgrows an executor.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    new_sess = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_sess).over(run).cast("long"))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Collapse :func:`sessionize` output to one row per session:
    ``(key, session_idx, n_events, start_ts, end_ts, duration_s)``.
    One partial-agg shuffle on the uniform (key, session_idx) pair."""
    s = sessionize(df, key_col, ts_col, gap_seconds)
    return s.groupBy(key_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).cast("long").alias("duration_s"),
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 2.0,
    scale: int = 100,
) -> DataFrame:
    """Flag per-group z-score outliers deterministically: adds
    ``is_outlier`` (|value − mean| > threshold·σ, population σ)
    without ever computing a float mean or σ from float sums. Values
    are fixed-pointed at ``scale`` (default cents); s = Σv and q = Σv²
    aggregate EXACTLY in int64, and the cross-multiplied test

        (n·v − s)² > t² · (n·q − s²)        [units of scale²]

    is then evaluated in DOUBLE over those exact integers: both
    engines perform the identical IEEE operation sequence on identical
    inputs, so the flags are bit-reproducible — there is no
    engine-specific float SUMMATION order anywhere (the only float
    ops are the final products/compare, deterministic given the
    integer sums). The double evaluation is what keeps the identity
    overflow-free at scale: its n² term overflows int64 at only ~10^5
    rows/group at cents scale (the 10× scale probe caught exactly
    this — see SCALE.md round 5), while double headroom is 10^308
    with ≤1-ulp boundary sensitivity.

    The group stats are one partial-agg shuffle over ``group_col``;
    the 1-row-per-group result broadcast joins back onto the events
    (map-side, no second shuffle of the fact table).

    Int64 headroom for the exact sums themselves: q = Σv² needs
    rows·(scale·vmax)² < 2^63 — at cents and vmax 10^3 that is ~10^9
    rows per group; raise ``scale`` awareness or pre-aggregate beyond.
    """
    from pyspark.sql.functions import broadcast

    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold!r}")
    t2 = threshold * threshold
    v = F.round(F.col(value_col) * scale).cast("long")
    stats = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(v).alias("__s"),
            F.sum(v * v).alias("__q"),
        )
    )
    # doubles from here: exact int64 inputs, identical op order in the
    # oracle — deterministic, and free of the int64 n² overflow
    n_d = F.col("__n").cast("double")
    s_d = F.col("__s").cast("double")
    q_d = F.col("__q").cast("double")
    dev = n_d * v.cast("double") - s_d
    var_n2 = n_d * q_d - s_d * s_d
    return (
        df.join(broadcast(stats), group_col, "left")
        .withColumn(
            "is_outlier",
            F.when(
                F.col(value_col).isNull() | F.col("__n").isNull(),
                F.lit(False),
            ).otherwise(dev * dev > F.lit(t2) * var_n2),
        )
        .drop("__n", "__s", "__q")
    )


# 1.4826 in 1e-4 fixed point: the consistency constant that makes MAD
# estimate sigma for normal data (MAD ~ 0.6745 sigma)
MAD_SIGMA_E4 = 14_826


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    scale: int = 100,
) -> DataFrame:
    """Robust per-group outliers: |v − median| > k·1.4826·MAD, decided
    entirely in exact integer arithmetic — the robust complement to
    :func:`zscore_outliers` (mean/σ are themselves dragged by the very
    outliers being hunted; median/MAD have a 50% breakdown point, so
    a contaminated feed still flags correctly).

    Median and MAD are PERCENTILE_DISC picks (q60's rank rule:
    smallest value with cumulative rank ≥ ⌈n/2⌉) over fixed-point
    values — integers in both engines, no interpolation, no floats
    anywhere: the test is ``dev·10⁴ > k_e4·MAD`` with
    ``k_e4 = round(k·14826)``. Two per-group rank windows (partitioned
    — scale-bounded by group size like q60) + broadcast joins of the
    1-row-per-group stats.

    Caveat (standard for MAD): a group where >50% of values are
    identical has MAD 0, flagging every deviating row; pre-filter
    such degenerate groups if that is not intended."""
    from pyspark.sql.functions import broadcast

    if k <= 0:
        raise ValueError(f"k must be positive, got {k!r}")
    k_e4 = int(round(k * MAD_SIGMA_E4))
    v = F.round(F.col(value_col) * scale).cast("long")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )

    def disc_p50(frame: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("__g").orderBy(col)
        n = Window.partitionBy("__g")
        ranked = frame.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(n)
        )
        return ranked.groupBy("__g").agg(
            F.min(
                F.when(
                    F.col("__rn") >= F.ceil(F.lit(0.5) * F.col("__n")),
                    F.col(col),
                )
            ).alias("__pick")
        )

    med = disc_p50(vals, "__v").withColumnRenamed("__pick", "__med")
    dev = vals.join(broadcast(med), "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__med")).alias("__d")
    )
    mad = disc_p50(dev, "__d").withColumnRenamed("__pick", "__mad")
    stats = med.join(mad, "__g")
    out = df.join(
        broadcast(stats),
        df[group_col] == F.col("__g"),
        "left",
    )
    dev_row = F.abs(v - F.col("__med"))
    return out.withColumn(
        "is_outlier",
        F.when(
            F.col(value_col).isNull() | F.col("__med").isNull(), F.lit(False)
        ).otherwise(dev_row * F.lit(10_000) > F.lit(k_e4) * F.col("__mad")),
    ).drop("__g", "__med", "__mad")


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a change log —
    the lakehouse "apply changes" shape: for every entity key, each
    attribute change opens a validity interval ``[valid_from,
    valid_to)`` with NULL ``valid_to`` (and ``is_current=true``) on
    the latest version. ``collapse_unchanged=True`` drops no-op
    change records (all attrs equal to the previous version), so
    re-delivered upstream rows never fragment the history — the
    idempotence CDC consumers rely on. Ties on (key, ts) are broken
    deterministically by the attr tuple (last wins within a tie is
    NOT assumed; identical-ts distinct-attr rows each open an
    interval, ordered by value, so reruns reproduce byte-identical
    history).

    Scale design: everything is per-key windows over the change log —
    one hash shuffle on the entity key, no joins, no state; at 100 TB
    the history build is a single sort-within-partition pass per key
    group. The output is the standard join target for `asof_join` /
    `as-of` snapshot queries (filter valid_from <= t < valid_to).
    """
    order = [F.col(ts_col)] + [F.col(a) for a in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = df.select(*key_cols, ts_col, *attr_cols)
    if collapse_unchanged:
        changed = F.lit(False)
        for a in attr_cols:
            prev = F.lag(a).over(w)
            changed = changed | ~(
                (F.col(a) == prev) | (F.col(a).isNull() & prev.isNull())
            )
        first = F.row_number().over(w) == 1
        out = out.withColumn("__keep", first | changed).filter(
            F.col("__keep")
        ).drop("__keep")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        out.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )


def scd2_snapshot(
    intervals: DataFrame, at, ts_type: str = "timestamp"
) -> DataFrame:
    """The as-of view of an SCD2 interval table: the one version of
    each entity valid at ``at`` (valid_from <= at < valid_to). Pure
    filter — partition-prunable when the table is stored partitioned
    or z-ordered on validity bounds."""
    t = F.lit(at).cast(ts_type)
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("is_current")
