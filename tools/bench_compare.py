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

Flag adjudication (round 8, VERDICT r7 ask #1): captures carry a
normalized physical-plan fingerprint per entry (`plan_fp` in
queries_detail — bench.py / sif_spark/plans/audit.py). A timing flag
splits mechanically:
  - fingerprints DIFFER  → the plan really changed: REGRESSION
    (plan changed), exits nonzero, no re-measure can clear it.
  - fingerprints MATCH (or aren't comparable — legacy capture on one
    side) → the flag is host weather or a same-plan slowdown. The
    flagged entries are RE-MEASURED in ONE fresh session
    (tools/bench_single.py, N=5 each), INTERLEAVED with a reference
    bundle of ~6 known-stable entries; the bundle's median ratio vs
    the old capture is the session's freshness offset (a fresh JVM
    runs small entries 1.5-2x slower than mid-catalog — measured
    round 8, so raw standalone times must NOT be compared to capture
    times), and a flagged entry confirms only if its
    freshness-normalized ratio still exceeds both bounds.
    `--no-remeasure` skips the re-run (offline mode) and reports such
    flags as UNRESOLVED (exit nonzero, conservatively).
  - `--history PRIOR.json` (round 8, added after the q31 episode)
    closes the protocol's last blind spot: a two-capture compare has
    no way to tell "new got slower" from "old was the fast outlier".
    q31_moving_avg measured 0.295s (r6) → 0.232s (r7) → 0.347s (r8)
    on byte-identical code and plan; the r7→r8 compare plus re-measure
    both "confirmed" a regression that was really r7 regressing to the
    mean. With a prior-round capture supplied, a plan-identical flag
    that survives re-measure gets one more mechanical check: its
    drift-corrected ratio vs HISTORY (median-of-shared drift between
    the history and new captures, same noise-bound rule). If the new
    value is unremarkable vs history, the old capture was the outlier
    → cleared as REGRESSION-TO-THE-MEAN. A genuine multi-round
    slowdown still flags (it is slow vs history too). Plan-changed
    flags never consult history.
Plan changes WITHOUT a timing flag are listed informationally.

Usage: python tools/bench_compare.py BENCH_r07.json BENCH_r08.json \
           [--no-remeasure] [--history BENCH_r06.json] \
           [--sf-dir /root/testdata/sf0.1]
Prints per-entry drift-corrected ratios (new/old), worst first, then
a summary line. Entries present in only one capture are listed
separately. Sub-100ms entries are noise — marked, never flagged.
Exits nonzero when any entry flags after adjudication.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys

LEGACY_SPREAD = 0.30  # measured r6 capture-to-capture disagreement


def load(
    path: str,
) -> tuple[dict[str, float], float, dict[str, dict], dict[str, dict]]:
    """Accept either bench.py's own JSON line or the driver's
    BENCH_r{N}.json wrapper, whose `tail` field holds a (possibly
    front-truncated) capture of that line — entries are
    regex-recovered, so a truncated head only loses the entries it
    physically cut off. Returns (queries, calibration, detail);
    detail is {} for pre-median captures; control is {} for
    pre-round-13 captures (no basket — bench_compare falls back to
    the retro plan-fp-identical basket)."""
    with open(path) as f:
        text = f.read()
    queries: dict[str, float] = {}
    detail: dict[str, dict] = {}
    control: dict[str, dict] = {}
    cal = None
    for candidate in (text, text.strip().splitlines()[-1]):
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            queries = d["queries"]
            detail = d.get("queries_detail") or {}
            control = d.get("control") or {}
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
    return queries, float(cal), detail, control


def remeasure(entries: list[str], sf_dir: str, runs: int = 5) -> dict | None:
    """Fresh-process N-run re-measure of a batch of entries in ONE
    session (flagged entries interleaved with the reference bundle —
    see bench_single.py's module doc for why raw standalone times
    cannot be compared to in-catalog times directly); None on
    failure. Returns bench_single's parsed JSON."""
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_single.py"),
        *entries,
        "--runs",
        str(runs),
        "--sf-dir",
        sf_dir,
    ]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    except Exception as e:
        print(f"re-measure failed: {e}", file=sys.stderr)
        return None


def history_check(
    hist_path: str,
    new_q: dict[str, float],
    new_d: dict[str, dict],
    q: str,
) -> tuple[bool, str] | None:
    """Regression-to-the-mean check against a prior-round capture
    (module doc: the q31 blind spot). Returns (cleared, detail-str),
    or None when the entry isn't in history. Uses its own drift
    median and min-vs-min comparability rule — independent of the
    old-vs-new state main() may have mutated."""
    hist_q, _, hist_d, _ = load(hist_path)
    nq = dict(new_q)
    hq = dict(hist_q)
    if bool(hist_d) != bool(new_d):  # min-vs-min vs a legacy capture
        side, det = (hq, hist_d) if hist_d else (nq, new_d)
        for name, d in det.items():
            if name in side:
                side[name] = d["min"]
    if q not in hq or hq[q] <= 0:
        return None
    shared = [
        n for n in set(hq) & set(nq) if hq[n] > 0 and nq[n] >= 0
    ]
    if len(shared) < 5:
        return None
    drift = statistics.median(nq[n] / hq[n] for n in shared)
    ratio = (nq[q] / hq[q]) / drift
    s_hist = hist_d.get(q, {}).get("spread", LEGACY_SPREAD)
    s_new = new_d.get(q, {}).get("spread", LEGACY_SPREAD)
    noise = 1.0 + s_hist + s_new
    cleared = not (ratio > 1.25 and ratio > noise)
    detail = (
        f"vs history {hq[q]:.2f}s: corr {ratio:.2f}, bound {noise:.2f}, "
        f"hist-drift {drift:.2f}"
    )
    return cleared, detail


def basket_estimate(
    old_q, new_q, old_d, new_d, old_ctrl, new_ctrl, shared, raw
) -> tuple[float, float, str] | None:
    """The control-basket drift estimator (VERDICT r12 "Next round"
    #5): (estimate, spread_bound, mode).

    mode "live": both captures carry the in-run control basket
    (start/mid/end samples of the frozen entry list) — drift is the
    median of per-entry basket ratios (median-of-phases each side),
    and the bound is the robust spread of those ratios, which folds
    in BOTH captures' within-run weather by construction.

    mode "retro-fp": one/both captures predate the basket — the
    basket is reconstructed from the shared entries whose physical-
    plan fingerprints MATCH (code-untouched by definition of the
    fingerprint), which every capture since round 8 carries. This is
    what settles r11c→r12b's 0.96-vs-1.15 calibration ambiguity
    retroactively.

    The bound is (p75 - p25) / median of the ratio set (quartile
    spread — a max-min bound over 180 retro entries would be all
    outlier)."""
    ratios: list[float] = []
    mode = "live"
    if old_ctrl and new_ctrl:
        for e in set(old_ctrl) & set(new_ctrl):
            o = old_ctrl[e].get("median", -1)
            n = new_ctrl[e].get("median", -1)
            if o and n and o > 0 and n > 0:
                ratios.append(n / o)
    if len(ratios) < 4:
        mode = "retro-fp"
        ratios = [
            raw[q]
            for q in shared
            if old_d.get(q, {}).get("plan_fp")
            and old_d.get(q, {}).get("plan_fp")
            == new_d.get(q, {}).get("plan_fp")
            and old_q[q] > 0
            and min(old_q[q], new_q[q]) >= 0.1
        ]
    if len(ratios) < 4:
        return None
    est = statistics.median(ratios)
    if est <= 0:
        return None
    q1, _, q3 = statistics.quantiles(ratios, n=4)
    return est, (q3 - q1) / est, mode


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    no_remeasure = "--no-remeasure" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        i = sys.argv.index("--sf-dir")
        sf_dir = sys.argv[i + 1]
        argv = [a for a in argv if a != sf_dir]
    hist_path = None
    if "--history" in sys.argv:
        i = sys.argv.index("--history")
        hist_path = sys.argv[i + 1]
        argv = [a for a in argv if a != hist_path]
    if len(argv) != 2:
        print(__doc__)
        sys.exit(2)
    old_q, old_cal, old_d, old_ctrl = load(argv[0])
    new_q, new_cal, new_d, new_ctrl = load(argv[1])
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
    drift_raw = statistics.median(raw.values()) if raw else 1.0
    basket = basket_estimate(
        old_q, new_q, old_d, new_d, old_ctrl, new_ctrl, shared, raw
    )
    if basket is not None:
        drift_basket, basket_bound, basket_mode = basket
        hi, lo = max(drift_raw, drift_basket), min(drift_raw, drift_basket)
        basket_agree = lo > 0 and hi / lo <= 1.0 + max(basket_bound, 0.02)
        # the basket IS the drift instrument when present; raw-median
        # stays reported for the agreement check
        drift = drift_basket
    else:
        drift_basket = basket_bound = None
        basket_mode, basket_agree = "none", True
        drift = drift_raw
    rows = []
    plan_changes_quiet = []  # plan changed, timing fine — informational
    pending: list[tuple[str, str]] = []  # (entry, tag) awaiting re-measure
    spreads_old = {q: old_d.get(q, {}).get("spread", LEGACY_SPREAD) for q in shared}
    for q in shared:
        ratio = raw[q] / drift
        s_old = spreads_old[q]
        s_new = new_d.get(q, {}).get("spread", LEGACY_SPREAD)
        noise = 1.0 + s_old + s_new
        is_flag = ratio > 1.25 and ratio > noise and max(old_q[q], new_q[q]) >= 0.1
        fp_old = old_d.get(q, {}).get("plan_fp")
        fp_new = new_d.get(q, {}).get("plan_fp")
        verdict = ""
        if is_flag:
            if fp_old and fp_new and fp_old != fp_new:
                verdict = "PLAN CHANGED"
            else:
                # plans identical, or not comparable (legacy capture on
                # one side): the batch re-measure arm adjudicates the
                # TIMING mechanically (resolved below)
                tag = (
                    "plan identical"
                    if fp_old and fp_new
                    else "no fingerprint on one side"
                )
                if no_remeasure:
                    verdict = f"{tag}, UNRESOLVED (--no-remeasure)"
                else:
                    pending.append((q, tag))
                    verdict = f"{tag}, re-measure pending"
        elif fp_old and fp_new and fp_old != fp_new:
            plan_changes_quiet.append(q)
        rows.append([ratio, q, old_q[q], new_q[q], noise, is_flag, verdict])

    if pending:
        # Reference bundle: unflagged shared entries whose drift-
        # corrected ratio sits closest to 1.0, re-measured in the SAME
        # fresh session as the flagged entries — their ratio vs the old
        # capture IS the session's freshness+weather offset, cancelling
        # the fresh-JVM bias raw standalone times carry. The bias is
        # SIZE-DEPENDENT (measured round 8: a 0.28 s driver-IO-heavy
        # entry runs ~1.7x slower standalone while 1-3 s scan entries
        # run ~1.2x slower — a single global re-drift confirmed a
        # phantom flag on q119 whose code A/B-tested identical), so the
        # bundle spans size bands and each flagged entry normalizes by
        # refs within 3x of its own old time.
        flagged_names = {q for q, _ in pending}
        stable = sorted(
            (
                q
                for q in shared
                if q not in flagged_names
                and min(old_q[q], new_q[q]) >= 0.1
                and raw[q] / drift <= 1.15
            ),
            key=lambda q: abs(raw[q] / drift - 1.0),
        )
        refs: list[str] = []
        for lo, hi in ((0.0, 0.6), (0.6, 3.0), (3.0, float("inf"))):
            refs += [q for q in stable if lo <= old_q[q] < hi][:3]
        order: list[str] = []
        fl = [q for q, _ in pending]
        for i in range(max(len(refs), len(fl))):  # interleave ref/flagged
            if i < len(refs):
                order.append(refs[i])
            if i < len(fl):
                order.append(fl[i])
        rm = remeasure(order, sf_dir)
        ents = (rm or {}).get("entries", {})
        ref_ratio = {
            r: ents[r]["median"] / old_q[r] for r in refs if r in ents and old_q[r] > 0
        }
        global_drift = (
            statistics.median(ref_ratio.values()) if ref_ratio else drift
        )
        by_name = {r[1]: r for r in rows}
        for q, tag in pending:
            row = by_name[q]
            if q not in ents:
                row[6] = f"{tag}, re-measure FAILED"
                continue
            med = ents[q]["median"]
            banded = [
                v
                for r, v in ref_ratio.items()
                if old_q[q] / 3 <= old_q[r] <= old_q[q] * 3
            ]
            re_drift = statistics.median(banded) if banded else global_drift
            re_ratio_q = (med / old_q[q]) / re_drift if old_q[q] > 0 else float("inf")
            re_noise = 1.0 + spreads_old[q] + ents[q].get("spread", 0.0)
            if re_ratio_q > 1.25 and re_ratio_q > re_noise:
                hist = (
                    history_check(hist_path, new_q, new_d, q) if hist_path else None
                )
                if hist and hist[0]:
                    row[5] = False
                    row[6] = (
                        f"{tag}, re-measure confirms vs old but new matches "
                        f"history — old capture was the outlier: "
                        f"REGRESSION-TO-THE-MEAN ({hist[1]})"
                    )
                elif hist:
                    row[6] = (
                        f"{tag}, re-measure CONFIRMS and slow vs history too "
                        f"({med:.2f}s, re-drift {re_drift:.2f}, "
                        f"corr {re_ratio_q:.2f}; {hist[1]})"
                    )
                else:
                    row[6] = (
                        f"{tag}, re-measure CONFIRMS "
                        f"({med:.2f}s, re-drift {re_drift:.2f}, corr {re_ratio_q:.2f})"
                    )
            else:
                row[5] = False
                row[6] = (
                    f"{tag}, re-measure clears: weather "
                    f"({med:.2f}s, re-drift {re_drift:.2f}, corr {re_ratio_q:.2f})"
                )

    flagged = sum(r[5] for r in rows)
    rows.sort(reverse=True)
    print(f"statistic: {stat}; host drift (median raw ratio): {drift_raw:.2f}x; "
          f"calibration (coarse): old={old_cal:.3f}s new={new_cal:.3f}s")
    if drift_basket is not None:
        print(
            f"drift estimators: raw-median {drift_raw:.3f}x vs "
            f"control-basket[{basket_mode}] {drift_basket:.3f}x "
            f"(spread bound {basket_bound:.3f}) -> "
            f"{'AGREE' if basket_agree else 'DISAGREE'}; "
            f"per-entry correction uses the basket"
        )
        if not basket_agree:
            print(
                "  estimator DISAGREEMENT exceeds the basket's own "
                "noise bound — treat the shared-entry total ratio as "
                "unresolved and re-capture before adjudicating a "
                "uniform shift",
            )
    print(f"{'entry':38s} {'old_s':>7s} {'new_s':>7s} {'corr_ratio':>10s} {'noise_bound':>11s}")
    for ratio, q, o_s, n_s, noise, is_flag, verdict in rows:
        mark = f" <-- REGRESSION [{verdict}]" if is_flag else (
            f"  [{verdict}]" if verdict else "")
        if max(o_s, n_s) < 0.1:
            mark = "  (sub-100ms: noise)"
        print(f"{q:38s} {o_s:7.2f} {n_s:7.2f} {ratio:10.2f} {noise:11.2f}{mark}")
    if plan_changes_quiet:
        print("plan changed, timing unflagged (informational):",
              ", ".join(plan_changes_quiet))
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
