"""Runtime statistics — parity for the reference's RuntimeStatistics.

Reference (stats.go:5-24): start time, total runtime, rows/partitions
processed per stage, per-stage transform/shuffle runtimes. Spark's
equivalents are first-class:

- ``observe_rows`` uses the public Observation API to count rows
  flowing past any point in a plan (the reference's per-stage row
  counts, but attachable anywhere, not just stage boundaries).
- ``RuntimeStats`` wraps the SparkContext status tracker for
  job/stage/task progress — Spark stages ARE the reference's stages
  (shuffle-bounded), and task counts are its partition counts.

Stage *runtimes* beyond these come from the Spark UI / event log in
production; local mode exposes what the tracker records.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F


def observe_rows(df: DataFrame, name: str, *extra: Column) -> tuple[DataFrame, Observation]:
    """Attach a row-count (plus optional extra aggregate) observer at
    this point in the plan. Metrics are collected as a side effect of
    the next action — zero extra passes over the data (unlike a
    ``count()`` which re-executes the plan).

        df2, obs = observe_rows(frame.df, "after_filter")
        df2.write...   # any action
        obs.get["rows"]
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra), obs


@dataclass
class StageProgress:
    stage_id: int
    num_tasks: int
    completed_tasks: int
    failed_tasks: int


class RuntimeStats:
    """Pipeline-level runtime statistics (reference: stats.go:5-24).

    Stage/task progress is read from the status tracker; 'partitions
    processed' in the reference maps to completed tasks (one task per
    partition per stage in Spark).
    """

    def __init__(self, spark: SparkSession, job_group: str | None = None):
        """``job_group``: scope statistics to jobs launched under this
        group (set via ``spark.sparkContext.setJobGroup``) — without it
        the tracker reports every job the session ever ran."""
        self._spark = spark
        self._sc = spark.sparkContext
        self._group = job_group
        if job_group is not None:
            self._sc.setJobGroup(job_group, f"sif_spark stats group {job_group}")
        self._start = time.time()

    @property
    def start_time(self) -> float:
        return self._start

    @property
    def runtime_seconds(self) -> float:
        return time.time() - self._start

    def job_ids(self) -> list[int]:
        return sorted(self._sc.statusTracker().getJobIdsForGroup(self._group))

    def stage_progress(self) -> list[StageProgress]:
        tracker = self._sc.statusTracker()
        out: list[StageProgress] = []
        seen: set[int] = set()
        for job_id in tracker.getJobIdsForGroup(self._group):
            info = tracker.getJobInfo(job_id)
            if info is None:
                continue
            for stage_id in info.stageIds:
                if stage_id in seen:
                    continue
                seen.add(stage_id)
                s = tracker.getStageInfo(stage_id)
                if s is None:
                    continue
                out.append(
                    StageProgress(
                        stage_id=stage_id,
                        num_tasks=s.numTasks,
                        completed_tasks=s.numCompletedTasks,
                        failed_tasks=s.numFailedTasks,
                    )
                )
        return sorted(out, key=lambda s: s.stage_id)

    def partitions_processed(self) -> int:
        """Total completed tasks across stages — the reference's
        GetNumPartitionsProcessed, summed."""
        return sum(s.completed_tasks for s in self.stage_progress())
