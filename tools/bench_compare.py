"""Round-over-round bench comparison against the measured noise band.

Answers the question the driver's 2x gate needs (r6 verdict item 2): did
this round's per-query timings REGRESS, or just bounce within same-session
variance? Inputs are two bench artifacts — either the committed
``BENCH_LOCAL.json`` full-results form (has ``queries`` + ``spread`` +
``noise_band``) or a driver ``BENCH_r{N}.json`` (whose ``parsed`` field
holds the compact stdout object). A query is flagged only when its
round-over-round ratio exceeds BOTH the global p95 same-session spread and
its own per-query spread (when recorded) by the slack factor — anything
inside that envelope is noise by the bench's own measurement.

Usage: python tools/bench_compare.py OLD.json NEW.json [slack] [--force]
       (slack default 1.10; exit 1 iff regressions are found)

Drift normalization (r11 verdict item 1): when both artifacts carry the
``host_canary`` stamp bench.py writes (pinned sha256 / list-sort /
Spark hash-agg workloads), per-query ratios are divided by the
geometric-mean canary ratio before the envelope test, and the header
reports raw AND normalized totals — a uniformly slower host era (the
r10 hand-off: every query ~1.25x) normalizes away instead of needing a
uniformity argument, while a genuine plan regression still exceeds the
normalized envelope.

Cross-load REFUSAL (r10, verdict item 8): when one artifact was swept on
a quiet host and the other past bench.py's LOAD_GATE, per-query ratios
measure the host, not the plans — the comparison is REFUSED (exit 3, no
regression verdict) instead of footnoted, because the r8/r9 incidents
showed the footnote gets ignored under time pressure. ``--force`` runs
it anyway, clearly labeled advisory-only.

A flag here is a TRIAGE list, not a verdict: the same-session spread
understates cross-position variance in a 117-query sweep (block-manager
pressure accumulates, so late-list queries inflate together — the r7
check found 6 flagged queries that all re-timed at-or-below their prior
values in isolation). Confirm any flag by re-timing the query alone
(4 runs, discard the first) before calling it a regression; a real one
also shows a changed row in PLANS.md's audit snapshot.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from bench import (  # single source of truth for "quiet host"
    LOAD_GATE,
    LOAD_GATE_5MIN,
)


def _start_load(art: dict) -> tuple[float, float | None] | None:
    """(1-min, 5-min) start load, matching the promotion gate's inputs."""
    la = (art.get("load_avg") or {}).get("start")
    if not la:
        return None
    return float(la[0]), (float(la[1]) if len(la) > 1 else None)


def _fmt_load(lo: tuple[float, float | None] | None) -> str:
    """'1-min/5-min' with explicit formatting (r10 ADVICE: the raw tuple
    interpolation printed '(1.87, 6.36)' / '(1.87, None)')."""
    if lo is None:
        return "unrecorded"
    return f"{lo[0]:.2f}/{lo[1]:.2f}" if lo[1] is not None else f"{lo[0]:.2f}/n/a"


def _canary_drift(old: dict, new: dict) -> tuple[float | None, str]:
    """Geometric-mean host-speed ratio new/old over the canary components
    both artifacts stamped (>1 = new host slower), or (None, why-not).
    The geomean weights the single-thread and all-core components
    equally — uniform era drift (the r10 case: CPU ~1.25x slower across
    the board) moves them together, which is exactly what the
    normalization is for; a LOPSIDED drift (one component >2x the
    others') is reported but not silently trusted by the caller."""
    co, cn = old.get("host_canary") or {}, new.get("host_canary") or {}
    keys = sorted(
        k
        for k in set(co) & set(cn)
        if isinstance(co[k], (int, float))
        and isinstance(cn[k], (int, float))
        and co[k] > 0
        and cn[k] > 0  # a zero on EITHER side would poison the geomean
    )
    if not keys:
        missing = [tag for tag, c in (("old", co), ("new", cn)) if not c]
        return None, (
            f"no host_canary in {'+'.join(missing)} artifact"
            if missing
            else "no shared canary components"
        )
    ratios = [cn[k] / co[k] for k in keys]
    prod = 1.0
    for r in ratios:
        prod *= r
    drift = prod ** (1.0 / len(ratios))
    detail = ", ".join(f"{k} {cn[k] / co[k]:.2f}x" for k in keys)
    return drift, detail


def _is_quiet(l1: float, l5: float | None) -> bool:
    """Same definition as bench.promotion_decision (r10: the 5-min load
    must be settled too — a just-finished heavy job leaves load1 low
    while the host is still slow)."""
    return l1 <= LOAD_GATE and (l5 is None or l5 <= LOAD_GATE_5MIN)


def load(path: str) -> dict:
    data = json.loads(Path(path).read_text())
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data:
        raise SystemExit(f"{path}: no per-query map (parsed=null driver record?)")
    return data


def main() -> int:
    force = "--force" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--force"]
    # guard on the POSITIONAL count after stripping flags (r10 review:
    # 'OLD.json --force' passed a raw-argv guard and crashed with
    # IndexError — an unhandled exit 1, which the documented contract
    # reserves for "regressions found")
    if len(args) < 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    slack = float(args[2]) if len(args) > 2 else 1.10

    # Cross-load refusal (see module docstring): quiet-vs-loaded sweeps
    # compare hosts, not plans. The refusal names both loads AND the
    # canary ratio (r10 verdict item 8) so the operator can see whether
    # the disparity is contention (re-sweep) or era drift (normalizable).
    drift, drift_detail = _canary_drift(old, new)
    lo, ln = _start_load(old), _start_load(new)
    if lo is not None and ln is not None:
        quiet_old, quiet_new = _is_quiet(*lo), _is_quiet(*ln)
        if quiet_old != quiet_new and not force:
            canary_note = (
                f"host canary drift {drift:.2f}x ({drift_detail})"
                if drift is not None
                else f"host canary unavailable: {drift_detail}"
            )
            print(
                f"REFUSED: cross-load comparison — old swept at start load "
                f"{_fmt_load(lo)}, new at {_fmt_load(ln)} (gates "
                f"{LOAD_GATE} 1-min / {LOAD_GATE_5MIN} 5-min); "
                f"{canary_note}. Per-query ratios would measure host "
                "contention, not plan changes. Re-sweep the loaded side on "
                "a quiet host, or pass --force for an advisory-only run."
            )
            return 3
        advisory_only = quiet_old != quiet_new
        if advisory_only:
            print(
                f"ADVISORY-ONLY (--force): cross-load comparison, old load "
                f"{_fmt_load(lo)} vs new {_fmt_load(ln)} — flags below are "
                "NOT regressions until re-timed on a quiet host."
            )
    else:
        advisory_only = False

    band = new.get("noise_band") or old.get("noise_band") or {}
    p95 = float(band.get("p95_spread", 1.5))
    spreads = {**old.get("spread", {}), **new.get("spread", {})}

    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        raise SystemExit("no common queries between the two artifacts")
    t_old = sum(old["queries"][q] for q in common)
    t_new = sum(new["queries"][q] for q in common)

    # Drift normalization (r11, verdict item 1): per-query ratios are
    # divided by the canary-measured host-speed ratio before the envelope
    # test, so a uniform era drift (r10: every query ~1.25x on a slower
    # host) stops masquerading as 120 regressions while a genuine plan
    # regression still pokes above the normalized envelope.
    norm = drift if drift is not None else 1.0
    regressions, improved = [], []
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        ratio = (b / max(a, 1e-9)) / norm
        envelope = max(p95, spreads.get(q, 1.0)) * slack
        if ratio > envelope:
            regressions.append((q, a, b, ratio, envelope))
        elif 1 / max(ratio, 1e-9) > envelope:
            improved.append((q, a, b, ratio))

    raw_ratio = t_new / max(t_old, 1e-9)
    print(
        f"{len(common)} common queries: total {t_old:.1f}s -> {t_new:.1f}s "
        f"({raw_ratio:.2f}x raw, {raw_ratio / norm:.2f}x drift-normalized); "
        f"noise envelope = max(p95_spread {p95:.2f}, per-query spread) "
        f"x {slack:.2f}"
    )
    if drift is not None:
        print(f"  host canary drift: {drift:.2f}x ({drift_detail})")
        comp = [float(s.rsplit(" ", 1)[1][:-1]) for s in drift_detail.split(", ")]
        if max(comp) > 1.5 * min(comp):
            print(
                "  WARNING: canary components disagree >1.5x — drift is "
                "not uniform; treat normalized ratios as approximate"
            )
    else:
        print(f"  host canary: not normalized ({drift_detail})")
    # Host-contention advisory (r8): external load inflates every small
    # query uniformly; a many-query flag list under high recorded load is
    # machine noise until isolated re-timing on a quiet host says otherwise.
    for tag, art in (("old", old), ("new", new)):
        la = art.get("load_avg")
        if la:
            print(f"  load_avg[{tag}]: start {la['start']} end {la['end']}")
    new_la = (new.get("load_avg") or {}).get("start", [0])
    if regressions and len(regressions) > 5 and new_la and new_la[0] > 2.0:
        print(
            f"  ADVISORY: {len(regressions)} flags under load_avg "
            f"{new_la[0]:.1f} — likely host contention, re-run when quiet"
        )
    tag = " norm" if drift is not None else ""
    for q, a, b, r, env in sorted(regressions, key=lambda x: -x[3]):
        print(
            f"  REGRESSED {q}: {a:.2f}s -> {b:.2f}s "
            f"({r:.2f}x{tag} > {env:.2f}x envelope)"
        )
    for q, a, b, r in sorted(improved, key=lambda x: x[3])[:10]:
        print(f"  improved  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x{tag})")
    if not regressions:
        print("  no per-query regression outside the measured noise band")
    if advisory_only:
        return 0  # forced cross-load run never issues a regression verdict
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
