"""Compare two bench captures with host-drift normalization and
noise-bounded regression flagging (VERDICT r6 "Next round" #1).

Each entry's seconds are divided by its run's `calibration` value
(the fixed scan-agg bench.py times first — VERDICT r4 ask #4), so
cross-round comparisons measure PLAN changes, not host weather (this
host has shown 1.4-2× round-to-round drift; see ROUND4/ROUND5 bench
notes).

Regression rule: an entry is flagged when its normalized median
ratio (new/old) exceeds BOTH
  - 1.25 (the judge's materiality threshold), and
  - 1 + spread_old + spread_new (the entry's own measured noise
    bound; spread = (max-min)/median over that capture's N timed
    runs — an entry whose two captures each wobble ±20% can't
    support a 1.3× verdict).
Captures from rounds before the median protocol (r6 and earlier:
min-of-2, no `queries_detail`) carry no spread; comparisons against
them use a default 0.30 spread on the detail-less side — the ±30%
disagreement the two r6 captures demonstrated on 2-4s entries.
Statistic comparability: when exactly one capture has detail, the
detailed side uses its MIN (min vs min — comparing an old min
against a new median would bias every ratio upward).

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
Prints per-entry normalized ratios (new/old), worst first, then a
summary line. Entries present in only one capture are listed
separately. Sub-100ms entries are noise — marked, never flagged.
"""

from __future__ import annotations

import json
import re
import sys

LEGACY_SPREAD = 0.30  # measured r6 capture-to-capture disagreement


def load(path: str) -> tuple[dict[str, float], float, dict[str, dict]]:
    """Accept either bench.py's own JSON line or the driver's
    BENCH_r{N}.json wrapper, whose `tail` field holds a (possibly
    front-truncated) capture of that line — entries are
    regex-recovered, so a truncated head only loses the entries it
    physically cut off. Returns (queries, calibration, detail);
    detail is {} for pre-median captures."""
    with open(path) as f:
        text = f.read()
    queries: dict[str, float] = {}
    detail: dict[str, dict] = {}
    cal = None
    for candidate in (text, text.strip().splitlines()[-1]):
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            queries = d["queries"]
            detail = d.get("queries_detail") or {}
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
    return queries, float(cal), detail


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    old_q, old_cal, old_d = load(sys.argv[1])
    new_q, new_cal, new_d = load(sys.argv[2])
    # min-vs-min when exactly one side carries detail (see module doc)
    stat = "median"
    if bool(old_d) != bool(new_d):
        stat = "min"
        for q, d in (old_d or new_d).items():
            side = old_q if old_d else new_q
            if q in side:
                side[q] = d["min"]
    shared = sorted(q for q in set(old_q) & set(new_q)
                    if old_q[q] >= 0 and new_q[q] >= 0)
    rows = []
    flagged = 0
    for q in shared:
        o, n = old_q[q] / old_cal, new_q[q] / new_cal
        ratio = n / o if o > 0 else float("inf")
        s_old = old_d.get(q, {}).get("spread", LEGACY_SPREAD)
        s_new = new_d.get(q, {}).get("spread", LEGACY_SPREAD)
        noise = 1.0 + s_old + s_new
        is_flag = ratio > 1.25 and ratio > noise and max(old_q[q], new_q[q]) >= 0.1
        flagged += is_flag
        rows.append((ratio, q, old_q[q], new_q[q], noise, is_flag))
    rows.sort(reverse=True)
    print(f"statistic: {stat}; calibration: old={old_cal:.3f}s new={new_cal:.3f}s "
          f"(host speed ratio {new_cal/old_cal:.2f}x)")
    print(f"{'entry':38s} {'old_s':>7s} {'new_s':>7s} {'norm_ratio':>10s} {'noise_bound':>11s}")
    for ratio, q, o_s, n_s, noise, is_flag in rows:
        mark = " <-- REGRESSION" if is_flag else ""
        if max(o_s, n_s) < 0.1:
            mark = "  (sub-100ms: noise)"
        print(f"{q:38s} {o_s:7.2f} {n_s:7.2f} {ratio:10.2f} {noise:11.2f}{mark}")
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
        f"new {norm_new:.1f} (ratio {norm_new/norm_old:.2f}); "
        f"flagged regressions: {flagged}"
    )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
