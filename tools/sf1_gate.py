"""The sf1 standing gate (VERDICT r10 "Next round" #7): every NEW
catalog entry must ship with (a) a DuckDB-oracle PASS at the 10×
decade-step dataset and (b) a recorded scaling exponent, before it
lands. The round-10 sweep was a one-shot audit; this wraps the same
two tools into one command so the convention ROUND10.md followed
informally is now a gate:

    python tools/build_sf1.py                 # once per machine (/tmp/sif_sf1)
    python tools/sf1_gate.py q179_x q180_y    # per new entry

Runs tools/check_oracle.py against /tmp/sif_sf1 (correctness at 10×)
and tools/decade_sweep.py for the same entries (exponent at 10×),
prints one JSON line {entry: {"oracle": "PASS"|..., "ratio": r,
"exponent": e}} and exits non-zero if any oracle failed or any run
errored. Timeouts/exponents are REPORTED, not auto-failed — a >1
exponent needs adjudication (see SCALE.md "The decade step"), not a
blind revert.

Usage: python tools/sf1_gate.py [--sf1 /tmp/sif_sf1]
           [--timeout 900] [--out /tmp/sf1_gate.json] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sif_sf1")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--out", default="/tmp/sf1_gate.json")
    ap.add_argument(
        "--resweep",
        nargs=2,
        metavar=("OLD_BENCH", "NEW_BENCH"),
        help="two bench captures (bench_local_*.json): every EXISTING "
        "entry whose plan_fp differs between them is re-swept at sf1 "
        "alongside the named new entries — VERDICT r11 #7's rule that "
        "a plan change re-earns its 10x evidence, not just new code",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    resweep: list[str] = []
    if args.resweep:
        with open(args.resweep[0]) as fh:
            old_fp = {
                k: v.get("plan_fp")
                for k, v in json.load(fh).get("queries_detail", {}).items()
            }
        with open(args.resweep[1]) as fh:
            new_fp = {
                k: v.get("plan_fp")
                for k, v in json.load(fh).get("queries_detail", {}).items()
            }
        resweep = sorted(
            k
            for k in old_fp.keys() & new_fp.keys()
            if old_fp[k] is not None
            and new_fp[k] is not None
            and old_fp[k] != new_fp[k]
            and k not in args.queries
        )
        if resweep:
            print(
                f"plan_fp changed since {args.resweep[0]} — re-sweeping: "
                + " ".join(resweep),
                file=sys.stderr,
            )
        args.queries = list(args.queries) + resweep
    if not args.queries:
        out = {"resweep": resweep, "note": "no entries to gate"}
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps(out))
        return 0
    if not os.path.isdir(args.sf1):
        print(
            f"sf1 dataset missing at {args.sf1} — run tools/build_sf1.py",
            file=sys.stderr,
        )
        return 2

    results: dict[str, dict] = {q: {} for q in args.queries}

    # 1) oracle at sf1 (subprocess: check_oracle owns its own session)
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "check_oracle.py"), args.sf1]
        + args.queries,
        capture_output=True,
        text=True,
    )
    for line in proc.stdout.splitlines():
        for q in args.queries:
            if q in line and ("PASS" in line or "FAIL" in line or "ok?" in line):
                results[q]["oracle"] = line.split()[0]
    oracle_ok = proc.returncode == 0 and all(
        results[q].get("oracle") in ("PASS", "ok?") for q in args.queries
    )
    if not oracle_ok:
        print(proc.stdout[-4000:], file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)

    # 2) scaling exponent (decade sweep on just these entries)
    sweep_out = args.out + ".sweep"
    proc2 = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "decade_sweep.py"),
            "--sf1",
            args.sf1,
            "--timeout",
            str(args.timeout),
            "--out",
            sweep_out,
        ]
        + args.queries,
        capture_output=True,
        text=True,
    )
    sweep_ok = proc2.returncode == 0
    if os.path.exists(sweep_out):
        with open(sweep_out) as fh:
            sweep = json.load(fh)
        for q in args.queries:
            e = sweep.get("results", {}).get(q)
            if isinstance(e, dict):
                results[q]["t_sf01"] = e.get("t_sf01")
                results[q]["t_sf1"] = e.get("t_sf1")
                results[q]["ratio"] = e.get("ratio")
                results[q]["exponent"] = e.get("exponent")
                if e.get("status") not in (None, "ok"):
                    results[q]["sweep_status"] = e.get("status")
    if not sweep_ok:
        print(proc2.stdout[-2000:], file=sys.stderr)
        print(proc2.stderr[-2000:], file=sys.stderr)

    if resweep:
        results["_resweep"] = resweep  # type: ignore[assignment]
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    return 0 if (oracle_ok and sweep_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
