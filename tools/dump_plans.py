"""Dump `.explain("formatted")` for catalog entries to files.

Round-14 optimization instrument: capture the physical plan of each
entry BEFORE and AFTER a change so the judge can check plan claims
("2 Exchange -> 1", "per-group scans -> per-class scans") against
committed artifacts without running Spark.

Usage:
    python tools/dump_plans.py --out plans/r14 --suffix _before q158_table_time_travel ...
    python tools/dump_plans.py --out plans/r14 --suffix _after  q158_table_time_travel ...

Writes <out>/<entry><suffix>.txt containing the NORMALIZED formatted
plan (sif_spark/plans/audit.py:normalized_plan — volatile tokens like
expression ids and temp paths stripped, so before/after diffs show
only real plan changes).

NOTE: building an entry's DataFrame executes its side work (table
builds, streaming maintenance) — dumping a heavy entry costs roughly
one bench run of it.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("entries", nargs="+")
    p.add_argument("--out", default="plans/r14")
    p.add_argument("--suffix", default="_before")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = p.parse_args()

    from sif_spark.plans.audit import normalized_plan
    from sif_spark.queries import QUERIES
    from sif_spark.session import get_session

    spark = get_session("dump_plans")
    os.makedirs(args.out, exist_ok=True)
    for name in args.entries:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in catalog", file=sys.stderr)
            continue
        try:
            df = fn(spark, args.sf_dir)
            text = normalized_plan(df)
        except Exception as e:  # capture the failure, don't abort the batch
            text = f"ERROR building {name}: {e}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
