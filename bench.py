"""Per-round benchmark: run the query catalog at $SPARK_GRAFT_SF_DIR
(default sf0.1) and print ONE JSON line with per-query seconds.

Protocol (round 7 — regression-detecting, VERDICT r6 ask #1): each
query runs once untimed (warmup: JVM JIT + codegen cache; first-run
codegen costs 5-10× steady state and would swamp a 600k-row
measurement) then N=3 timed runs (fresh plan each run, same session),
recording the MEDIAN as the headline per-entry number plus min and
relative spread ((max-min)/median). Rationale: the two round-6
captures disagreed by ±30% on 2-4s entries (q24 3.14 vs 4.03s, q101
2.74 vs 3.52s) because a min-of-2 on a host with sporadic external
load is itself a noisy statistic — a real 30% regression was
invisible. The median of 3 is robust to one loaded sample, and the
recorded spread gives tools/bench_compare.py a per-entry noise bound
to adjudicate flagged ratios against. Execution is forced through the
`noop` sink so the full plan runs (all columns materialized) without
driver-side collect overhead. The headline value is the sum of
per-query medians.

Calibration lesson (round 7, measured twice): the frozen scan-agg
probe (VERDICT r4 ask #4) is kept ONLY as a coarse cross-round
host-speed indicator, captured at one fixed lifecycle point (fresh
session, before the first entry) — it CANNOT normalize per-entry
regressions. Two failure modes were measured this round: (a) host
weather drifts WITHIN a run (the probe swung 0.385 s → 0.704 s in
back-to-back runs the same afternoon, flagging 13 phantom
regressions whose raw times were stable), and (b) an interleaved
probe measures its own JIT/page-cache progression, not host speed
(probe samples decayed 0.435 → 0.14 s across 15 blocks while entry
times held flat — the probe executes 60×/run, entries 4×).
tools/bench_compare.py therefore detects regressions by
SELF-NORMALIZATION: each entry's raw ratio is divided by the median
ratio over all shared entries (the bulk of the catalog is unchanged
in any round, so the median IS the host drift), and only
drift-corrected outliers beyond the entry's own noise bound flag.

Output schema: `queries` maps entry → MEDIAN seconds (the field the
driver and bench_compare consume); `queries_detail` maps entry →
{median, min, spread, plan_fp}; `calibration`/`calibration_detail`
get the same treatment. `plan_fp` (round 8) is the normalized
physical-plan hash (sif_spark/plans/audit.py:plan_fingerprint) that
lets bench_compare auto-adjudicate a timing flag: fingerprints differ
→ the plan really changed (true regression suspect); identical → the
code path is byte-for-byte the same plan and the flag is host
weather, confirmed or cleared by a standalone re-measure
(tools/bench_single.py) instead of human argument.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sif_spark.session import get_session
from sif_spark.queries import QUERIES

N_TIMED = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Control basket (VERDICT r12 "Next round" #5): a FIXED sample of
# cheap, historically plan-stable entries spanning the catalog,
# re-timed at three lifecycle points (start / mid-catalog / end).
# Two captures' basket ratios give a drift estimator with a
# measurable noise bound — unlike the single scan-agg calibration
# probe, whose one start-of-run sample cannot distinguish "flat"
# from a uniform ~15% shift (the r12 adjudication ambiguity). The
# basket entries execute at the SAME lifecycle points in every
# capture, so JIT/page-cache state cancels capture-to-capture.
# Keep this list FROZEN (append-only) — a removed entry breaks
# cross-round comparability.
CONTROL_BASKET = [
    "q02_filter_project",
    "q09_text_stats_by_lang",
    "q15_event_funnel",
    "q31_moving_avg",
    "q100_grouping_sets",
    "q119_daily_ingest",
    "q135_deterministic_split",
    "q150_promo_revenue",
]


def _run_basket(spark, sf_dir: str, warm: bool) -> dict[str, float]:
    """One timed pass of the control basket (warmup first on the cold
    start phase only — mid/end are already JIT-warm from the catalog
    loop). Failures record -1, never crash the bench."""
    out: dict[str, float] = {}
    for name in CONTROL_BASKET:
        fn = QUERIES.get(name)
        if fn is None:
            out[name] = -1.0
            continue
        try:
            run = (
                lambda: fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            if warm:
                run()
            t0 = time.time()
            run()
            out[name] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"control basket error in {name}: {e}", file=sys.stderr)
            out[name] = -1.0
    return out


def calibration_query(spark, sf_dir: str):
    """Fixed host-speed probe (VERDICT r4 "Next round" #4): a constant
    parquet scan-agg whose plan never changes round to round, so a
    judge can normalize cross-round host drift (this host has shown
    1.6-2× absolute-seconds drift between rounds) by dividing catalog
    times by the calibration time instead of re-deriving the drift
    from plan-identical entries. Keep this query FROZEN."""
    from pyspark.sql import functions as F

    from sif_spark.sources.parquet import read_table

    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sum_qty"),
        )
    )


def timed_runs(fn) -> dict:
    """warmup + N_TIMED timed executions → {median, min, spread}."""
    fn()  # warmup: codegen + JIT, untimed
    samples = []
    for _ in range(N_TIMED):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    med = statistics.median(samples)
    return {
        "median": round(med, 3),
        "min": round(min(samples), 3),
        "spread": round((max(samples) - min(samples)) / med, 3) if med > 0 else 0.0,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_session("bench")

    # One calibration capture at a FIXED lifecycle point (fresh
    # session, before any entry) — comparable round-to-round, and
    # explicitly NOT used for per-entry normalization (module doc).
    calib_detail = timed_runs(
        lambda: calibration_query(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    from sif_spark.plans.audit import plan_fingerprint

    control_phases: dict[str, dict[str, float]] = {}
    control_phases["start"] = _run_basket(spark, sf_dir, warm=True)

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    names = list(QUERIES)
    mid_at = len(names) // 2
    for idx, name in enumerate(names):
        if idx == mid_at:
            control_phases["mid"] = _run_basket(spark, sf_dir, warm=False)
        try:
            d = timed_runs(
                lambda: QUERIES[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            # Normalized physical-plan hash (VERDICT r7 ask #1): lets
            # bench_compare split a timing flag into "plan changed"
            # (real suspect) vs "plan identical" (host weather →
            # standalone re-measure) mechanically. Captured AFTER the
            # timed runs so one more build is the only extra cost.
            try:
                d["plan_fp"] = plan_fingerprint(QUERIES[name](spark, sf_dir))
            except Exception:
                d["plan_fp"] = None
            timings[name] = d["median"]
            detail[name] = d
        except Exception as e:  # a failing query records -1, not a crash
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        # Drop py4j refs so the ContextCleaner can reclaim the
        # localCheckpoint RDDs several catalog entries materialize —
        # 115 queries × 4 runs otherwise accumulate executor-memory
        # blocks and later queries pay the GC bill (q32 measured 2.5×
        # slower at the tail of a full run than standalone).
        gc.collect()

    control_phases["end"] = _run_basket(spark, sf_dir, warm=False)
    import statistics as _st

    control = {
        e: {
            **{ph: control_phases[ph][e] for ph in control_phases},
            "median": round(
                _st.median(
                    [
                        control_phases[ph][e]
                        for ph in control_phases
                        if control_phases[ph][e] >= 0
                    ]
                    or [-1.0]
                ),
                3,
            ),
        }
        for e in CONTROL_BASKET
    }

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    line = json.dumps(
        {
            "metric": "query_catalog_total_sec",
            "value": total,
            "unit": "sec",
            "calibration": calib_detail["median"],
            "calibration_detail": calib_detail,
            "control": control,
            "runs_per_entry": N_TIMED,
            "queries": timings,
            "queries_detail": detail,
            "sf": float(sf),
        }
    )
    print(line)
    # The driver's BENCH_r{N}.json capture truncates to the last 2000
    # chars, losing the early entries (VERDICT r5 "What's wrong" #3) —
    # persist the FULL artifact in-repo so tools/bench_compare.py can
    # diff complete rounds. Committed per round as bench_local_r{N}.json.
    out = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_local_latest.json"),
    )
    with open(out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
