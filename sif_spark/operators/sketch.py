"""Sketch-based operators: bounded-memory heavy hitters and mergeable
distinct-count sketches.

These are the approximate/scale companions to the exact catalog
entries (q07 exact top-k tokens, q34 exact distinct): at 100 TB the
exact forms still work (partial agg + top-k), but their shuffle
carries EVERY distinct key. The operators here bound that:

- `heavy_hitters` never shuffles the key universe: pass 1 runs
  Misra-Gries summaries per partition (fixed memory, Arrow-batched)
  and unions the tiny candidate sets; pass 2 exactly recounts ONLY the
  candidates via a broadcast semi-join. By the averaging argument, any
  key with global count > N/capacity must exceed its share in at least
  one partition, so the union of per-partition survivors contains
  every global heavy hitter — REGARDLESS of partitioning. If the true
  k-th count clears that threshold, the output is exact and
  partitioning-independent (the catalog entry runs in that regime, so
  a plain SQL top-k is a true oracle).
- `hll_distinct` / `hll_merge` wrap Spark's Apache DataSketches HLL
  exprs: per-group partial sketches are persistable columns that merge
  across days/partitions without re-scanning — the production shape
  for distinct-user counting over a year of 100 TB days.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], col: str, capacity: int
) -> Iterator[pd.DataFrame]:
    # Mergeable-summaries formulation (Agarwal et al.): per Arrow batch,
    # count exactly with C-speed value_counts, merge into the running
    # summary, then truncate back to `capacity` by subtracting the
    # (capacity+1)-th largest counter and dropping non-positives. Each
    # truncation subtracts equally from every key, so the classic MG
    # undercount bound (<= n_partition/(capacity+1)) — and with it the
    # heavy-hitter guarantee — is preserved, at ~50x the throughput of
    # the element-at-a-time textbook loop (measured at sf0.1).
    counters: dict = {}
    for pdf in batches:
        for v, c in pdf[col].value_counts().items():
            counters[v] = counters.get(v, 0) + int(c)
        if len(counters) > capacity:
            cut = sorted(counters.values(), reverse=True)[capacity]
            counters = {v: c - cut for v, c in counters.items() if c > cut}
    yield pd.DataFrame({col: list(counters.keys())})


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Top-``k`` values of ``col`` by exact count, computed WITHOUT
    shuffling the full key universe: Misra-Gries candidate generation
    per partition (fixed ``capacity`` counters, Arrow-batched) →
    distinct candidate union (tiny) → broadcast semi-join + exact
    recount of candidates only → top-k with deterministic (count desc,
    value asc) ordering.

    Exactness regime: every key with global count > N/``capacity`` is
    guaranteed a candidate under ANY partitioning; when the true k-th
    count clears that bar (the common Zipfian case), the result equals
    the exact top-k. Size ``capacity`` >> k accordingly."""
    src = df.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    candidates = (
        src.mapInPandas(
            lambda it: _misra_gries_partition(it, "__v", capacity),
            schema="__v " + dict(src.dtypes)["__v"],
        )
        .distinct()
    )
    counts = (
        src.join(F.broadcast(candidates), "__v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("__v"))
        .limit(k)
    )
    return counts.withColumnRenamed("__v", col)


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: "list[str] | None" = None,
    lgk: int = 12,
) -> DataFrame:
    """Approximate distinct count per group via Apache DataSketches
    HLL (`hll_sketch_agg`): returns group cols + `approx_distinct` +
    the binary `sketch` itself, so partial results persist and merge
    later (see `hll_merge`) without re-reading the source — the
    incremental-rollup shape exact countDistinct can't give you."""
    groups = group_cols or []
    agg = df.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("sketch")
    )
    return agg.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch")
    )


def hll_merge(df: DataFrame, group_cols: "list[str] | None" = None) -> DataFrame:
    """Merge persisted HLL sketches (e.g. per-day partials) into
    coarser groups: union the binary sketches, then estimate. The
    merge reads ONLY the sketch column — never the original corpus."""
    groups = group_cols or []
    merged = df.groupBy(*groups).agg(F.hll_union_agg("sketch").alias("sketch"))
    return merged.withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))


def approx_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: "list[float]" = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Mergeable approximate percentiles per group — the sketch
    companion to the exact-percentile catalog entry (q60): at 100 TB
    an exact percentile needs a per-group sort (or a full
    count-histogram shuffle), while `percentile_approx` aggregates a
    bounded GK-style summary with map-side partial merge — one
    ordinary partial-agg shuffle, state O(accuracy) per group
    regardless of row count.

    The guarantee is RANK error ≤ n/accuracy, and the returned value
    is always an ELEMENT of the column (discrete percentile, lower
    convention — matches DuckDB's quantile_disc, verified value-exact
    at gate scale). With ``accuracy ≥ n`` the summary is lossless and
    the result is the exact discrete percentile — the catalog entry
    runs in that regime so plain SQL is a true oracle (the q25/q35
    recall-gate pattern); production lowers ``accuracy`` to bound
    memory and keeps the rank-error contract.

    Output: (group_col, p<NN> for each percentile, n_values). NULL
    values are excluded from both the sketch and the count (Spark agg
    semantics), matching WHERE value IS NOT NULL oracles."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"p{str(p * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        )
        for p in percentiles
    ]
    aggs.append(F.count(value_col).alias("n_values"))
    return df.groupBy(group_col).agg(*aggs)
