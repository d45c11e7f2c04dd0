"""Standalone re-measure of ONE catalog entry in a fresh session.

This is the adjudication arm of the plan-fingerprinted bench protocol
(bench.py module doc): when tools/bench_compare.py finds an entry
whose timing flagged but whose normalized plan fingerprint is
IDENTICAL across the two captures, the flag is either host weather or
a genuine same-plan slowdown (e.g. data change). A fresh-process,
fresh-JVM, N=5 re-measure of just that entry settles it without a
human arguing from rotating-flag patterns.

Usage:
    python tools/bench_single.py q112_waiting_suppliers [--runs 5] \
        [--sf-dir /root/testdata/sf0.1]

Prints ONE JSON line: {"entry": ..., "median": s, "min": s,
"spread": ..., "plan_fp": ..., "runs": N, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("entry")
    p.add_argument("--runs", type=int, default=5)
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = p.parse_args()

    os.environ["SPARK_GRAFT_BENCH_RUNS"] = str(args.runs)
    from bench import timed_runs  # reuse the exact warmup+median protocol

    from sif_spark.plans.audit import plan_fingerprint
    from sif_spark.queries import QUERIES
    from sif_spark.session import get_session

    if args.entry not in QUERIES:
        print(f"unknown entry {args.entry!r}", file=sys.stderr)
        sys.exit(2)

    spark = get_session("bench-single")
    d = timed_runs(
        lambda: QUERIES[args.entry](spark, args.sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    d["plan_fp"] = plan_fingerprint(QUERIES[args.entry](spark, args.sf_dir))
    d.update(entry=args.entry, runs=args.runs, sf_dir=args.sf_dir)
    print(json.dumps(d))


if __name__ == "__main__":
    main()
