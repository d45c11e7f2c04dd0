"""Compare two bench captures with host-drift normalization: divide
each entry's seconds by its run's `calibration` value (the fixed
scan-agg bench.py times first — VERDICT r4 ask #4), so cross-round
comparisons measure PLAN changes, not host weather (this host has
shown 1.4-2× round-to-round drift; see ROUND4/ROUND5 bench notes).

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
Prints per-entry normalized ratios (new/old), worst regressions
first, then a summary line. Entries present in only one capture are
listed separately. Ratios on sub-100ms entries are noise — flagged.
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> tuple[dict[str, float], float]:
    """Accept either bench.py's own JSON line or the driver's
    BENCH_r{N}.json wrapper, whose `tail` field holds a (possibly
    front-truncated) capture of that line — entries are
    regex-recovered, so a truncated head only loses the entries it
    physically cut off."""
    with open(path) as f:
        text = f.read()
    queries: dict[str, float] = {}
    cal = None
    for candidate in (text, text.strip().splitlines()[-1]):
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            queries = d["queries"]
            cal = d.get("calibration")
        elif isinstance(d, dict) and "tail" in d:
            text = d["tail"]
        break
    if not queries:
        # driver tail captures may hold the bench line re-escaped
        # (\" around keys) — tolerate an optional backslash
        for m in re.finditer(r'\\?"(q\d+[a-z0-9_]*)\\?"\s*:\s*([0-9.]+)', text):
            queries[m.group(1)] = float(m.group(2))
        mcal = re.search(r'\\?"calibration\\?"\s*:\s*([0-9.]+)', text)
        cal = float(mcal.group(1)) if mcal else None
    if not cal:
        print(f"warning: {path} has no calibration field; using 1.0", file=sys.stderr)
        cal = 1.0
    return queries, float(cal)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    old_q, old_cal = load(sys.argv[1])
    new_q, new_cal = load(sys.argv[2])
    shared = sorted(set(old_q) & set(new_q))
    rows = []
    for q in shared:
        o, n = old_q[q] / old_cal, new_q[q] / new_cal
        rows.append((n / o if o > 0 else float("inf"), q, old_q[q], new_q[q]))
    rows.sort(reverse=True)
    print(f"calibration: old={old_cal:.3f}s new={new_cal:.3f}s "
          f"(host speed ratio {new_cal/old_cal:.2f}x)")
    print(f"{'entry':38s} {'old_s':>7s} {'new_s':>7s} {'norm_ratio':>10s}")
    for ratio, q, o_s, n_s in rows:
        noise = "  (sub-100ms: noise)" if max(o_s, n_s) < 0.1 else ""
        flag = " <-- regression" if ratio > 1.5 and max(o_s, n_s) >= 0.1 else ""
        print(f"{q:38s} {o_s:7.2f} {n_s:7.2f} {ratio:10.2f}{flag}{noise}")
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(f"{q} ({new_q[q]:.2f}s)" for q in only_new))
    norm_old = sum(old_q[q] for q in shared) / old_cal
    norm_new = sum(new_q[q] for q in shared) / new_cal
    print(
        f"shared-entry normalized total: old {norm_old:.1f} "
        f"new {norm_new:.1f} (ratio {norm_new/norm_old:.2f})"
    )


if __name__ == "__main__":
    main()
