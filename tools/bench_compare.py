"""Compare two bench captures with SELF-NORMALIZED regression
flagging (VERDICT r6 "Next round" #1, protocol hardened twice within
round 7 — see bench.py's module doc for the measured history).

Why not calibration-normalized: the fixed scan-agg probe cannot
normalize per-entry regressions on this host — its start-of-run
sample swings ±80% with host weather between back-to-back runs, and
an interleaved probe measures its own JIT/page-cache progression
(samples decayed 0.435 → 0.14 s across one run while entry times
held flat). Both variants flagged double-digit PHANTOM regressions
on entries whose raw times were stable.

What works instead: in any round, the bulk of the catalog is
untouched, so the MEDIAN of per-entry raw ratios (new/old) IS the
host drift between the two captures. (Stated assumption: if a round
deliberately changed MOST entries' plans, the median would absorb
part of the real change — compare against an older capture or a
subset of known-untouched entries in that case.) Each entry's drift-corrected
ratio = raw ratio / median ratio. An entry flags as a regression when
its corrected ratio exceeds BOTH
  - 1.25 (the judge's materiality threshold), and
  - 1 + spread_old + spread_new (its own measured noise bound;
    spread = (max-min)/median over that capture's N timed runs).
Captures from rounds before the median protocol (r6 and earlier:
min-of-2, no `queries_detail`) carry no spread; comparisons against
them use a default 0.30 spread on the detail-less side — the ±30%
disagreement the two r6 captures demonstrated on 2-4s entries.
Statistic comparability: when exactly one capture has detail, the
detailed side uses its MIN (min vs min — comparing an old min
against a new median would bias every ratio upward).

The run-level `calibration` fields are reported as a coarse
host-speed indicator only.

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
Prints per-entry drift-corrected ratios (new/old), worst first, then
a summary line. Entries present in only one capture are listed
separately. Sub-100ms entries are noise — marked, never flagged.
Exits nonzero when any entry flags.
"""

from __future__ import annotations

import json
import re
import statistics
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
    raw = {q: (new_q[q] / old_q[q] if old_q[q] > 0 else float("inf"))
           for q in shared}
    drift = statistics.median(raw.values()) if raw else 1.0
    rows = []
    flagged = 0
    for q in shared:
        ratio = raw[q] / drift
        s_old = old_d.get(q, {}).get("spread", LEGACY_SPREAD)
        s_new = new_d.get(q, {}).get("spread", LEGACY_SPREAD)
        noise = 1.0 + s_old + s_new
        is_flag = ratio > 1.25 and ratio > noise and max(old_q[q], new_q[q]) >= 0.1
        flagged += is_flag
        rows.append((ratio, q, old_q[q], new_q[q], noise, is_flag))
    rows.sort(reverse=True)
    print(f"statistic: {stat}; host drift (median raw ratio): {drift:.2f}x; "
          f"calibration (coarse): old={old_cal:.3f}s new={new_cal:.3f}s")
    print(f"{'entry':38s} {'old_s':>7s} {'new_s':>7s} {'corr_ratio':>10s} {'noise_bound':>11s}")
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
    tot_old = sum(old_q[q] for q in shared)
    tot_new = sum(new_q[q] for q in shared)
    print(
        f"shared-entry raw total: old {tot_old:.1f}s new {tot_new:.1f}s "
        f"(raw ratio {tot_new/tot_old:.2f}, drift-corrected "
        f"{tot_new/tot_old/drift:.2f}); flagged regressions: {flagged}"
    )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
