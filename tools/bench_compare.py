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

Exit codes: 0 clean / advisory-clean, 1 regressions (quiet-vs-quiet
verdict), 2 usage, 3 refused (cross-load, nothing to self-certify with),
4 cross-load flags NOT cleared by the artifact's own isolated re-times —
confirm on a quiet host before calling them regressions.

Drift normalization — WHICH canary component divides the ratios (r12,
verdict item 1c + r11 ADVICE, which pull in opposite directions):

- CROSS-LOAD comparisons (one side quiet, the other past bench.py's
  LOAD_GATE): the SPARK-side canary (``spark_hashagg_s``) is the
  denominator. Contention hits the executor pool hardest; the python
  canaries describe the single-threaded driver process and understated
  the r11 incident 3.4x (py 0.98-1.05x while Spark throughput was 3.31x
  degraded).
- QUIET-vs-quiet comparisons: the PYTHON-only components are the
  denominator. They are host-pure — an engine/session-config regression
  cannot move them — whereas the spark canary runs through the engine
  under test, so normalizing by it lets an engine regression exonerate
  itself (the verified ADVICE attack: a uniform 1.8x engine slowdown
  with matching spark-canary drift exited 0). On a quiet host, era
  drift moves ALL components together; a spark-only drift is evidence
  about the engine and must stay IN the measured ratios.

Self-certification (r12, verdict item 1): bench.py now stamps
``segment_canaries`` (the pinned hashagg workload re-timed mid-sweep
every ~20 queries), ``isolated_retimes`` (the worst-vs-baseline queries
automatically re-timed after a GC settle at sweep end) and
``retime_canary`` (host speed at the moment of those re-times) into
every artifact. A flagged query whose isolated re-time lands back inside
the envelope — normalized by the retime-moment canary under the same
basis policy above — is reported as CONTENTION, not REGRESSED, and does
not affect the exit code. A cross-load sweep carrying these stamps is
evaluated in self-certified advisory mode instead of being refused.

A surviving flag here is a TRIAGE list, not a verdict: the same-session
spread understates cross-position variance in a 120-query sweep. Confirm
any flag by re-timing the query alone on a quiet host; a real regression
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

#: canary components that cannot be moved by an engine regression
PY_COMPONENTS = ("py_sha256_s", "py_sort_s")
SPARK_COMPONENT = "spark_hashagg_s"
#: components disagreeing beyond this are a non-uniform drift — the
#: basis choice (not a geomean smear) decides what it means
LOPSIDED = 1.5


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


def _canary_ratios(old: dict, new: dict) -> dict[str, float]:
    """Per-component host-speed ratios new/old (>1 = new host slower)
    over the canary components both artifacts stamped. Returned as a
    dict (r11 ADVICE: the lopsided-drift check used to re-parse the
    formatted detail string to recover these numbers)."""
    co, cn = old.get("host_canary") or {}, new.get("host_canary") or {}
    return {
        k: cn[k] / co[k]
        for k in sorted(set(co) & set(cn))
        if isinstance(co[k], (int, float))
        and isinstance(cn[k], (int, float))
        and co[k] > 0
        and cn[k] > 0  # a zero on EITHER side would poison every ratio
    }


def _geomean(vals: list[float]) -> float:
    prod = 1.0
    for v in vals:
        prod *= v
    return prod ** (1.0 / len(vals))


def _pick_norm(ratios: dict[str, float], cross_load: bool) -> tuple[float, str]:
    """(denominator, basis description) per the module-docstring policy:
    spark component under cross-load, py-only geomean quiet-vs-quiet,
    full geomean when the preferred components are missing."""
    py = [ratios[k] for k in PY_COMPONENTS if k in ratios]
    spark = ratios.get(SPARK_COMPONENT)
    if cross_load and spark is not None:
        return spark, "spark-side (executor contention signal)"
    if not cross_load and py:
        return _geomean(py), "py-only (host-pure, engine-independent)"
    if ratios:
        return _geomean(list(ratios.values())), "geomean (preferred components missing)"
    return 1.0, "none"


def _retime_drift(old: dict, new: dict, fallback: float) -> float:
    """Host-speed ratio AT THE MOMENT of the isolated re-times: the
    retime-canary stamp vs the old artifact's spark canary. Falls back to
    the sweep-level norm when either stamp is absent."""
    rc = (new.get("retime_canary") or {}).get(SPARK_COMPONENT)
    base = (old.get("host_canary") or {}).get(SPARK_COMPONENT)
    if isinstance(rc, (int, float)) and isinstance(base, (int, float)) and base > 0:
        return rc / base
    return fallback


def _iso_retime(entry) -> float | None:
    """A retime entry's isolated seconds, tolerant of both artifact
    shapes: the full file's {'sweep_s', 'isolated_s', 'baseline_s'} dict
    and the compact stdout's [sweep_s, isolated_s, baseline_s] triple
    (shrunk to fit the driver's bounded stdout-tail capture)."""
    if isinstance(entry, dict):
        v = entry.get("isolated_s")
    elif isinstance(entry, (list, tuple)) and len(entry) >= 2:
        v = entry[1]
    else:
        v = None
    return v if isinstance(v, (int, float)) else None


def _segment_series(art: dict) -> list[float]:
    """The mid-sweep canary series, tolerant of both artifact shapes:
    the full file's list of {'after': n, 'spark_hashagg_s': t} dicts and
    the compact stdout's {'every': k, 'spark_hashagg_s': [t, ...]}."""
    seg = art.get("segment_canaries")
    if isinstance(seg, list):
        return [
            s["spark_hashagg_s"]
            for s in seg
            if isinstance(s, dict) and isinstance(s.get("spark_hashagg_s"), (int, float))
        ]
    if isinstance(seg, dict) and isinstance(seg.get("spark_hashagg_s"), list):
        return [t for t in seg["spark_hashagg_s"] if isinstance(t, (int, float))]
    return []


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

    ratios = _canary_ratios(old, new)
    detail = ", ".join(f"{k} {r:.2f}x" for k, r in ratios.items())
    retimes = new.get("isolated_retimes")
    retimes = retimes if isinstance(retimes, dict) else {}

    # Cross-load handling (r10 verdict item 8, amended r12 item 1): a
    # quiet-vs-loaded comparison measures the host, not the plans. When
    # the loaded artifact carries its own isolated re-times the sweep is
    # SELF-CERTIFYING and the comparison proceeds in advisory mode with
    # retime clearing; a bare loaded artifact is still REFUSED (exit 3,
    # no verdict) unless --force.
    lo, ln = _start_load(old), _start_load(new)
    cross_load = False
    if lo is not None and ln is not None:
        cross_load = _is_quiet(*lo) != _is_quiet(*ln)
    if cross_load and not retimes and not force:
        canary_note = (
            f"host canary drift {_geomean(list(ratios.values())):.2f}x ({detail})"
            if ratios
            else "host canary unavailable"
        )
        print(
            f"REFUSED: cross-load comparison — old swept at start load "
            f"{_fmt_load(lo)}, new at {_fmt_load(ln)} (gates "
            f"{LOAD_GATE} 1-min / {LOAD_GATE_5MIN} 5-min); "
            f"{canary_note}. Per-query ratios would measure host "
            "contention, not plan changes, and the artifact carries no "
            "isolated_retimes to self-certify with. Re-sweep the loaded "
            "side on a quiet host, or pass --force for an advisory-only "
            "run."
        )
        return 3
    advisory_only = cross_load
    if cross_load:
        mode = "self-certified stamps" if retimes else "--force"
        print(
            f"ADVISORY-ONLY ({mode}): cross-load comparison, old load "
            f"{_fmt_load(lo)} vs new {_fmt_load(ln)} — surviving flags "
            "below are NOT regressions until re-timed on a quiet host."
        )

    band = new.get("noise_band") or old.get("noise_band") or {}
    p95 = float(band.get("p95_spread", 1.5))
    spreads = {**old.get("spread", {}), **new.get("spread", {})}

    common = sorted(set(old["queries"]) & set(new["queries"]))
    if not common:
        raise SystemExit("no common queries between the two artifacts")
    t_old = sum(old["queries"][q] for q in common)
    t_new = sum(new["queries"][q] for q in common)

    norm, basis = _pick_norm(ratios, cross_load)
    iso_norm = _retime_drift(old, new, norm)
    if not cross_load:
        # r12 ADVICE (medium): the retime canary is the SPARK component —
        # the engine-contaminated basis the quiet-vs-quiet policy above
        # explicitly excludes. bench.py stamps isolated_retimes on every
        # sweep, so a uniform engine regression that also slows the
        # hashagg canary would inflate the retime drift and let its own
        # isolated re-times self-clear. Quiet-vs-quiet, an isolated
        # re-time must clear under the py-basis sweep norm as well: take
        # the MIN of the two denominators (the conservative one flags).
        iso_norm = min(iso_norm, norm)
    regressions, cleared, improved = [], [], []
    for q in common:
        a, b = old["queries"][q], new["queries"][q]
        ratio = (b / max(a, 1e-9)) / norm
        envelope = max(p95, spreads.get(q, 1.0)) * slack
        if ratio > envelope:
            iso = _iso_retime(retimes.get(q))
            if isinstance(iso, (int, float)):
                r_iso = (iso / max(a, 1e-9)) / iso_norm
                if r_iso <= envelope:
                    cleared.append((q, a, b, ratio, iso, r_iso))
                    continue
                regressions.append((q, a, b, ratio, envelope, iso))
            else:
                regressions.append((q, a, b, ratio, envelope, None))
        elif 1 / max(ratio, 1e-9) > envelope:
            improved.append((q, a, b, ratio))

    raw_ratio = t_new / max(t_old, 1e-9)
    print(
        f"{len(common)} common queries: total {t_old:.1f}s -> {t_new:.1f}s "
        f"({raw_ratio:.2f}x raw, {raw_ratio / norm:.2f}x drift-normalized); "
        f"noise envelope = max(p95_spread {p95:.2f}, per-query spread) "
        f"x {slack:.2f}"
    )
    if ratios:
        print(f"  host canary drift: {norm:.2f}x (basis: {basis}; {detail})")
        if max(ratios.values()) > LOPSIDED * min(ratios.values()):
            sp = ratios.get(SPARK_COMPONENT)
            note = (
                "contention hit executors harder than the driver process"
                if cross_load
                else (
                    "spark-side drift on a quiet host is NOT normalized "
                    "away — it may be the engine itself"
                    if sp is not None and sp > norm
                    else "treat normalized ratios as approximate"
                )
            )
            print(
                f"  NOTE: canary components disagree >{LOPSIDED}x — {note}"
            )
    else:
        print("  host canary: not normalized (no shared components)")
    segs = _segment_series(new)
    base_spark = (old.get("host_canary") or {}).get(SPARK_COMPONENT)
    if segs and isinstance(base_spark, (int, float)) and base_spark > 0:
        print(
            f"  mid-sweep canary vs old baseline: "
            f"{min(segs) / base_spark:.2f}x .. {max(segs) / base_spark:.2f}x "
            f"across {len(segs)} segments"
        )
    # Host-contention advisory (r8): external load inflates every small
    # query uniformly; a many-query flag list under high recorded load is
    # machine noise until isolated re-timing on a quiet host says otherwise.
    for tag, art in (("old", old), ("new", new)):
        la = art.get("load_avg")
        if la:
            print(f"  load_avg[{tag}]: start {la['start']} end {la['end']}")
    tag = " norm" if ratios else ""
    for q, a, b, r, iso, r_iso in sorted(cleared, key=lambda x: -x[3]):
        print(
            f"  CONTENTION {q}: sweep {a:.2f}s -> {b:.2f}s ({r:.2f}x{tag}) "
            f"cleared by isolated re-time {iso:.2f}s "
            f"({r_iso:.2f}x vs old, retime-canary-normalized)"
        )
    for q, a, b, r, env, iso in sorted(regressions, key=lambda x: -x[3]):
        label = "UNCLEARED" if advisory_only else "REGRESSED"
        iso_note = (
            f"; isolated re-time {iso:.2f}s did NOT clear it"
            if isinstance(iso, (int, float))
            else ""
        )
        print(
            f"  {label} {q}: {a:.2f}s -> {b:.2f}s "
            f"({r:.2f}x{tag} > {env:.2f}x envelope){iso_note}"
        )
    for q, a, b, r in sorted(improved, key=lambda x: x[3])[:10]:
        print(f"  improved  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x{tag})")
    if not regressions:
        print("  no per-query regression outside the measured noise band")
    if advisory_only:
        # a cross-load run never issues a REGRESSION verdict, but flags
        # its own isolated re-times could not clear are not a clean exit
        # either: they need a quiet-host confirmation (exit 4)
        return 4 if regressions else 0
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
