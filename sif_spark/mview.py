"""Incremental materialized views over SifTable change feeds.

`incremental_aggregate_view` maintains

    dst = src.groupBy(key).agg(SUM(expr) AS name, ...)

without ever re-scanning `src`: the `sif_table` streaming source
(sources/table_stream.py) delivers each committed version's ADDED rows
exactly once, the batch folds them into per-key partials (one small
shuffle over the batch, never the table), and the partials merge into
the view with a key-joined upsert — additive aggregates compose, so
old + partial is the exact new value. Exactly-once end to end:

- upstream: version offsets through the streaming checkpoint;
- downstream: `SifTable.upsert(..., txn=(app_id, epoch))` — the
  manifest's txn high-water makes a crash-replayed micro-batch a
  committed no-op, so the merge can never double-count (the same
  contract stream_into_table proves for appends, here on upsert).

Scope: ADDITIVE aggregates (SUM; COUNT is SUM(1)). Two source modes:

- default (append feed): the source table must stay add-only, and the
  assumption is ENFORCED, not assumed — the stream reader plans with
  fail_on_content_removal (it refuses any version whose exact
  replaced_rows/deleted_rows counter is non-zero or unrecorded), and
  merge_partials re-checks the manifests of every version it folds.
  The r10 silent-drift case (an upsert's post-image folding on top of
  the already-folded old value) is now a typed error, never a wrong
  sum.
- ``cdf=True`` (change-data feed): the source was created with
  SifTable.create(..., cdf=True); every fold is SIGNED —
  insert/update_postimage add, update_preimage/delete subtract — so
  upserts and deletes maintain the view EXACTLY (still additive-only;
  MIN/percentiles under retraction need a recompute by design).

AVG et al. decompose into (sum, count) pairs by the caller.

Single writer per view: the merge frame embeds the view values read
BEFORE the upsert, so only the view's own (serial) streaming query may
write the view table — exactly what a Structured Streaming query is.
A second concurrent writer to the SAME view would make a CAS-retried
merge stale; the txn guard still prevents double-folds of the same
epoch, but cross-writer merges are not a supported topology.

100 TB notes: per micro-batch the cost is O(batch) + an upsert that
rewrites only the view groups holding touched keys (key-range + bloom
file skipping) — the view itself is never fully rewritten. The view
table can be bucketed on its key for zero-shuffle downstream joins.

Reference basis: go-sif has neither storage nor incremental queries
(SURVEY §2.1/§3.3); this is north-star surface composing this repo's
table layer with Structured Streaming, in the spirit of the public
lakehouse engines' MV maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def incremental_aggregate_view(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    key: str,
    sums: dict[str, str],
    checkpoint_dir: str,
    app_id: str = "mv",
    starting_version: int = 0,
    trigger_seconds: float = 0.0,
    max_versions_per_trigger: int = 0,
    cdf: bool = False,
) -> StreamingQuery:
    """Start maintaining ``dst = src.groupBy(key).agg(SUM(expr))``.

    ``sums`` maps output column name → a SQL expression over the source
    columns (evaluated per change row, then SUM-folded; in cdf mode the
    fold is signed by _change_type, so replaced/deleted rows retract).
    Returns the StreamingQuery; stop it and restart with the same
    checkpoint to resume incrementally."""
    from sif_spark.sources.table_stream import register_table_source

    register_table_source(spark)

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        merge_partials(
            batch_df, int(epoch_id), dst_path, key, sums, app_id,
            src_path=src_path, cdf=cdf,
        )

    reader = (
        spark.readStream.format("sif_table")
        .option("path", src_path)
        .option("starting_version", starting_version)
    )
    if cdf:
        reader = reader.option("cdf", "true")
    else:
        # the append-only assumption is ENFORCED at plan time: any
        # version that replaced/removed rows fails the query instead
        # of silently drifting the view
        reader = reader.option("fail_on_content_removal", "true")
    if max_versions_per_trigger:
        reader = reader.option(
            "max_versions_per_trigger", max_versions_per_trigger
        ).option("rate_anchor_dir", f"{checkpoint_dir}/sif_anchor")
    stream = reader.load()
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def merge_partials(
    batch_df: DataFrame,
    epoch_id: int,
    dst_path: str,
    key: str,
    sums: dict[str, str],
    app_id: str,
    src_path: str | None = None,
    cdf: bool = False,
) -> None:
    """One micro-batch of change rows → fold into the view table.
    Idempotent per (app_id, epoch_id): a crash-replayed batch is a
    committed no-op at BOTH guards (the early epoch check and the
    upsert's own txn high-water), so the additive merge can never
    double-count. With ``src_path`` and cdf=False, the fold REFUSES
    versions whose manifest records replacements (belt to the stream
    reader's plan-time braces — a fold that reached here with an
    upsert's post-images would silently stack them on the folded old
    values). With cdf=True the fold is signed by _change_type and
    replacements/deletes maintain the view exactly."""
    from sif_spark.table import ChangeFeedIncompleteError, SifTable

    from pyspark.sql import Observation

    session = batch_df.sparkSession
    names = list(sums)
    # ONE read of the Python streaming source per fold: the emptiness
    # check, the version-window set and the partial aggregate all come
    # off this in-memory checkpoint instead of re-planning the DSV2
    # source per action (guide §4.1). The row count AND the distinct
    # version set ride the checkpoint job itself as observed metrics —
    # the old isEmpty + distinct().collect() pair cost two more action
    # waves per micro-batch for numbers the materialization job
    # already knows.
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n")]
    if not cdf and src_path is not None:
        aggs.append(F.collect_set("_commit_version").alias("vers"))
    batch_df = batch_df.observe(obs, *aggs).localCheckpoint(eager=True)
    row = obs.get
    if int(row["n"]) == 0:
        # a version window of deletes/compactions feeds an empty batch:
        # nothing to fold, nothing to commit — skipping is replay-safe
        # because an epoch that committed nothing can't double anything
        # (the txn high-water stays behind; it only needs monotonicity)
        return
    if not cdf and src_path is not None:
        src = SifTable(session, src_path)
        row_versions = [int(x) for x in row["vers"]]
        # Scan the full CONTIGUOUS manifest range covered by this
        # batch, not just the versions that contributed rows: a pure
        # removal version (delete/restore) emits no rows, so a
        # rows-only scan could never see it (ADVICE r11 low). A
        # removal version strictly AFTER the last row-bearing version
        # of the window is still invisible to this fold-level belt —
        # that case is covered by the stream reader's plan-time
        # fail_on_content_removal guard, which iterates EVERY version
        # in the offset window (incremental_view always sets it).
        batch_versions = [
            v
            for v in src._versions()
            if min(row_versions) <= v <= max(row_versions)
        ]
        for v in batch_versions:
            m = src._load(int(v))
            op = m.get("op")
            if op in ("restore", "overwrite"):
                raise ChangeFeedIncompleteError(
                    f"mview fold over append feed hit version {v} ({op}) "
                    "— its removals are not representable; rebuild the "
                    "view or start after it."
                )
            if op == "upsert":
                r = m.get("replaced_rows")
                if r is None or r > 0:
                    raise ChangeFeedIncompleteError(
                        f"mview fold over append feed hit version {v} "
                        f"(upsert, {'unrecorded' if r is None else r} "
                        "replaced rows) — folding its post-images would "
                        "corrupt the view. Use cdf=True on a table "
                        "created with cdf=True."
                    )
            if op == "delete":
                d = m.get("deleted_rows")
                if d is None or d > 0:
                    raise ChangeFeedIncompleteError(
                        f"mview fold over append feed hit version {v} "
                        f"(delete, {'unrecorded' if d is None else d} "
                        "removed rows) — the view would never hear the "
                        "removals. Use cdf=True."
                    )
            if op == "merge":
                for counter in ("replaced_rows", "deleted_rows"):
                    c = m.get(counter)
                    if c is None or c > 0:
                        raise ChangeFeedIncompleteError(
                            f"mview fold over append feed hit version {v} "
                            f"(merge, {counter}="
                            f"{'unrecorded' if c is None else c}) — "
                            "folding it would corrupt the view. Use "
                            "cdf=True."
                        )
    if cdf:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        partial = batch_df.groupBy(key).agg(
            *[
                F.sum(F.expr(expr) * sign).alias(n)
                for n, expr in sums.items()
            ]
        )
    else:
        partial = batch_df.groupBy(key).agg(
            *[F.sum(F.expr(expr)).alias(n) for n, expr in sums.items()]
        )
    dst = SifTable(session, dst_path)
    try:
        dst._load()
    except FileNotFoundError:
        SifTable.create(
            session, dst_path, partial, key_col=key, txn=(app_id, epoch_id)
        )
        return
    if dst.last_txn_epoch(app_id) >= epoch_id:
        return  # replayed epoch: the merge already committed
    current = dst.read().select(
        F.col(key), *[F.col(n).alias(f"__cur_{n}") for n in names]
    )
    merged = partial.join(current, on=key, how="left").select(
        F.col(key),
        *[
            (F.coalesce(F.col(f"__cur_{n}"), F.lit(0)) + F.col(n)).alias(n)
            for n in names
        ],
    )
    # batch-sized (left join keeps only the batch's keys); materialize
    # once so the upsert's bounds/probe/write actions don't each re-scan
    # the whole view for the join
    merged = merged.localCheckpoint(eager=True)
    dst.upsert(merged, txn=(app_id, epoch_id))
