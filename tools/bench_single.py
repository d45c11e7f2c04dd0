"""Standalone re-measure of catalog entries in ONE fresh session.

This is the adjudication arm of the plan-fingerprinted bench protocol
(bench.py module doc): when tools/bench_compare.py finds an entry
whose timing flagged but whose normalized plan fingerprint is
identical across the two captures, the flag is either host weather or
a genuine same-plan slowdown. A fresh-process re-measure settles it —
but a fresh session is SYSTEMATICALLY slower than the same entry
mid-catalog (measured round 8: q22 0.24-0.34 s in-catalog vs
0.36-0.71 s standalone — shared JVM JIT, parquet footer caches, and
Python worker pools are warm after 100+ prior entries). So a raw
standalone-vs-capture comparison confirms phantom flags. The caller
therefore passes the flagged entries INTERLEAVED with a reference
bundle of known-stable entries; everything runs in one session under
the same freshness, and bench_compare normalizes the flagged entries'
ratios by the reference bundle's median ratio — the bench's own
self-normalization logic, applied at re-measure time.

Usage:
    python tools/bench_single.py ENTRY [ENTRY ...] [--runs 5] \
        [--sf-dir /root/testdata/sf0.1]

Prints ONE JSON line:
  {"entries": {name: {median, min, spread, plan_fp}}, "runs": N,
   "sf_dir": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("entries", nargs="+")
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

    unknown = [e for e in args.entries if e not in QUERIES]
    if unknown:
        print(f"unknown entries {unknown!r}", file=sys.stderr)
        sys.exit(2)

    spark = get_session("bench-single")
    out: dict[str, dict] = {}
    for entry in args.entries:
        d = timed_runs(
            lambda e=entry: QUERIES[e](spark, args.sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        try:
            d["plan_fp"] = plan_fingerprint(QUERIES[entry](spark, args.sf_dir))
        except Exception:
            d["plan_fp"] = None
        out[entry] = d
    print(json.dumps({"entries": out, "runs": args.runs, "sf_dir": args.sf_dir}))


if __name__ == "__main__":
    main()
