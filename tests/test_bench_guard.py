"""Bench-artifact promotion gate (r9 verdict item 2).

Round 8 lost its committed comparison baseline twice: an ad-hoc sf0.01
verify run silently overwrote the sf0.1 closing artifact (misdiagnosed
downstream as a regression), then the driver's loaded-host closing run
clobbered the quiet-start artifact in the working tree. The gate routes
every sweep to an SF-stamped file and only promotes canonical-SF
quiet-host sweeps (or an explicit operator override) to
BENCH_LOCAL.json. Pure-python — no Spark session."""

from __future__ import annotations

from bench import (
    CANONICAL_SF,
    LOAD_GATE,
    LOAD_GATE_5MIN,
    host_canary,
    promotion_decision,
)

#: a plausible canary stamp — promotion requires its presence (r11)
CANARY = {"py_sha256_s": 0.2, "py_sort_s": 0.15, "spark_hashagg_s": 0.5}


def test_settling_host_refused_on_5min_load():
    """r10 incident: a sweep started 3 minutes after a heavy oracle sweep
    finished saw 1-min load 1.87 (under the gate) but 5-min load 6.36,
    promoted itself, and came out a uniform 1.4x slow across 120
    queries. Quiet means quiet for a while — the 5-min load must be
    settled too."""
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=LOAD_GATE - 0.2, load5=LOAD_GATE_5MIN + 3.0
    )
    assert not promote
    assert "5-min" in reason and "PROMOTE" in reason


def test_settled_5min_load_promotes():
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=0.3, load5=1.1, canary=CANARY
    )
    assert promote, reason


def test_non_canonical_sf_refused():
    promote, reason = promotion_decision(0.01, load1=0.1)
    assert not promote
    assert "non-canonical" in reason


def test_loaded_host_refused():
    promote, reason = promotion_decision(CANONICAL_SF, load1=LOAD_GATE + 1.5)
    assert not promote
    assert "load" in reason and "PROMOTE" in reason


def test_quiet_canonical_promotes():
    promote, reason = promotion_decision(CANONICAL_SF, load1=0.3, canary=CANARY)
    assert promote, reason


def test_missing_canary_refused():
    """r11 (verdict item 1): a quiet canonical sweep WITHOUT a host_canary
    stamp must not become the baseline — future rounds could not
    drift-normalize against it (the exact hole the r10 72.3->92.7s
    hand-off fell into)."""
    promote, reason = promotion_decision(CANONICAL_SF, load1=0.3, load5=0.5)
    assert not promote
    assert "canary" in reason and "PROMOTE" in reason
    # empty dict is as unusable as None
    promote, _ = promotion_decision(CANONICAL_SF, load1=0.3, canary={})
    assert not promote


def test_slow_canary_refused_despite_quiet_guest_load():
    """r13, caught live: hypervisor contention is invisible in guest
    load averages — a sweep started at guest load 0.84/0.58 while the
    pinned spark canary ran 1.5-2x its committed-baseline stamp, and
    promoted a uniformly inflated artifact. A quiet-load sweep whose own
    canary is slower than CANARY_PROMOTE_GATE x the baseline's must be
    refused (forced promotion still overrides)."""
    from bench import CANARY_PROMOTE_GATE

    base = {"spark_hashagg_s": 0.2}
    slow = dict(CANARY, spark_hashagg_s=0.2 * CANARY_PROMOTE_GATE * 1.2)
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=0.3, load5=0.5, canary=slow, baseline_canary=base
    )
    assert not promote
    assert "canary" in reason and "PROMOTE" in reason
    # at-or-under the gate: promotes
    ok = dict(CANARY, spark_hashagg_s=0.2 * CANARY_PROMOTE_GATE * 0.95)
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=0.3, load5=0.5, canary=ok, baseline_canary=base
    )
    assert promote, reason
    # no baseline canary to compare against (fresh repo): no gate
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=0.3, load5=0.5, canary=slow, baseline_canary=None
    )
    assert promote, reason
    # forced promotion overrides (deliberate engine-change re-baseline)
    promote, _ = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        force=True,
        canary=slow,
        baseline_canary=base,
    )
    assert promote


def test_midsweep_contention_refused_despite_quiet_start():
    """r13, the attempt-1 hole: a sweep that STARTS with a fast canary
    can still promote a contention-polluted artifact if the host goes
    hot mid-sweep. The segment canary series is judged against the same
    baseline stamp as the start canary."""
    from bench import CANARY_PROMOTE_GATE

    base = {"spark_hashagg_s": 0.2}
    fast = dict(CANARY, spark_hashagg_s=0.2)
    hot_segs = [0.21, 0.2 * CANARY_PROMOTE_GATE * 1.5, 0.22]
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=fast,
        baseline_canary=base,
        segment_canaries=hot_segs,
    )
    assert not promote
    assert "mid-sweep" in reason and "PROMOTE" in reason
    # a sweep whose segments stay inside the gate promotes
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=fast,
        baseline_canary=base,
        segment_canaries=[0.21, 0.24, 0.2 * CANARY_PROMOTE_GATE * 0.95],
    )
    assert promote, reason


def test_midsweep_gate_judges_segments_like_for_like():
    """r13 optimization round: mid-sweep stamps are single runs taken
    between queries of a LIVE sweep and run 1.4-2.9x the idle min-of-3
    start canary even on a quiet host (the committed r12 baseline's own
    segments read 0.24-0.50 against its 0.176 start stamp). When the
    baseline carries its own segment series, new segments must be judged
    against ITS median — otherwise every honest quiet sweep is refused
    forever. The start-canary basis remains the fallback for baselines
    that predate segment stamping (previous test)."""
    from bench import CANARY_PROMOTE_GATE

    base = {"spark_hashagg_s": 0.176}
    fast = dict(CANARY, spark_hashagg_s=0.19)
    base_segs = [0.40, 0.39, 0.37, 0.50, 0.46, 0.29, 0.24]  # the real r12 series
    # a quiet sweep whose segments look like the baseline's own promotes
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=fast,
        baseline_canary=base,
        segment_canaries=[0.35, 0.28, 0.32, 0.33, 0.31, 0.29, 0.21],
        baseline_segments=base_segs,
    )
    assert promote, reason
    # genuinely hot mid-sweep stamps (over gate x the baseline's own
    # segment median) still refuse
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=fast,
        baseline_canary=base,
        segment_canaries=[0.35, 0.39 * CANARY_PROMOTE_GATE * 1.3, 0.31],
        baseline_segments=base_segs,
    )
    assert not promote
    assert "mid-sweep" in reason and "own mid-sweep median" in reason


def test_host_canary_shape():
    """The canary's python components run anywhere (no Spark session) and
    stamp positive seconds under stable key names — the names are the
    cross-era contract bench_compare joins on."""
    c = host_canary(runs=1)
    assert set(c) == {"py_sha256_s", "py_sort_s"}
    assert all(v > 0 for v in c.values())


def test_explicit_override_beats_load_gate():
    promote, reason = promotion_decision(
        CANONICAL_SF, load1=LOAD_GATE + 5.0, force=True
    )
    assert promote
    assert "PROMOTE" in reason


def test_override_cannot_cross_sf():
    """Even a forced promotion must not let a non-canonical SF poison
    the baseline — the SF check is absolute."""
    promote, _ = promotion_decision(0.01, load1=0.0, force=True)
    assert not promote


def _compare(tmp_path, old, new, *extra):
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    a, b = tmp_path / "old.json", tmp_path / "new.json"
    a.write_text(json.dumps(old))
    b.write_text(json.dumps(new))
    return subprocess.run(
        [sys.executable, str(repo / "tools" / "bench_compare.py"),
         str(a), str(b), *extra],
        capture_output=True, text=True,
    )


def test_bench_compare_refuses_cross_load(tmp_path):
    """r10 (verdict item 8): a quiet-vs-loaded comparison must be
    REFUSED (exit 3) — per-query ratios under cross-load measure host
    contention, not plans; the r8/r9 footnote form got ignored."""
    quiet = {
        "queries": {"a": 1.0},
        "load_avg": {"start": [0.3, 0, 0], "end": [0.3, 0, 0]},
    }
    loaded = {
        "queries": {"a": 2.5},
        "load_avg": {"start": [LOAD_GATE + 2.0, 0, 0], "end": [4.0, 0, 0]},
    }
    r = _compare(tmp_path, quiet, loaded)
    assert r.returncode == 3, r.stdout
    assert "REFUSED" in r.stdout
    assert "REGRESSED" not in r.stdout, "refusal must precede any verdict"


def test_bench_compare_force_is_advisory_only(tmp_path):
    """--force runs the cross-load comparison and never issues a
    REGRESSION verdict; out-of-envelope queries nothing cleared print as
    UNCLEARED and exit 4 (r11 ADVICE: the old exit-0-with-warning form
    let a loaded sweep read clean under time pressure)."""
    quiet = {
        "queries": {"a": 1.0},
        "load_avg": {"start": [0.3, 0, 0], "end": [0.3, 0, 0]},
        "noise_band": {"p95_spread": 1.2},
    }
    loaded = {
        "queries": {"a": 2.5},
        "load_avg": {"start": [LOAD_GATE + 2.0, 0, 0], "end": [4.0, 0, 0]},
    }
    r = _compare(tmp_path, quiet, loaded, "--force")
    assert r.returncode == 4, r.stdout
    assert "ADVISORY-ONLY" in r.stdout
    assert "UNCLEARED a" in r.stdout
    assert "REGRESSED" not in r.stdout, "cross-load must never say REGRESSED"


def test_bench_compare_refusal_names_loads_and_canary(tmp_path):
    """r10 verdict item 8 + ADVICE: the refusal must print explicitly
    formatted 1-min/5-min loads (not raw tuples) and the canary ratio."""
    quiet = {
        "queries": {"a": 1.0},
        "load_avg": {"start": [0.3, 0.5, 0], "end": [0.3, 0, 0]},
        "host_canary": {"py_sha256_s": 0.2, "py_sort_s": 0.2},
    }
    loaded = {
        "queries": {"a": 2.5},
        "load_avg": {"start": [LOAD_GATE + 2.0, 6.4, 0], "end": [4.0, 0, 0]},
        "host_canary": {"py_sha256_s": 0.25, "py_sort_s": 0.25},
    }
    r = _compare(tmp_path, quiet, loaded)
    assert r.returncode == 3, r.stdout
    assert "0.30/0.50" in r.stdout and "4.00/6.40" in r.stdout, r.stdout
    assert "(" not in r.stdout.split("gates")[0].split("load")[1], (
        "raw tuple leaked into the load formatting: " + r.stdout
    )
    assert "canary drift 1.25x" in r.stdout, r.stdout


def test_bench_compare_normalizes_uniform_drift(tmp_path):
    """r11 (verdict item 1): a uniformly 1.25x-slower host era with a
    matching canary ratio is NOT a regression — normalization replaces
    the r10 uniformity argument."""
    old = {
        "queries": {"a": 1.0, "b": 2.0, "c": 0.5},
        "load_avg": {"start": [0.3, 0.5, 0], "end": [0.3, 0, 0]},
        "noise_band": {"p95_spread": 1.15},
        "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16, "spark_hashagg_s": 0.4},
    }
    new = {
        "queries": {"a": 1.25, "b": 2.5, "c": 0.625},
        "load_avg": {"start": [0.4, 0.4, 0], "end": [0.4, 0, 0]},
        "host_canary": {"py_sha256_s": 0.25, "py_sort_s": 0.20, "spark_hashagg_s": 0.5},
    }
    r = _compare(tmp_path, old, new)
    assert r.returncode == 0, r.stdout
    assert "drift: 1.25x" in r.stdout, r.stdout
    assert "1.00x drift-normalized" in r.stdout, r.stdout
    assert "no per-query regression" in r.stdout


def test_bench_compare_real_regression_survives_normalization(tmp_path):
    """A genuine 3x plan regression on a 1.25x-slower host must STILL be
    flagged after normalization — the canary must not become a blanket
    excuse."""
    old = {
        "queries": {"a": 1.0, "b": 2.0},
        "load_avg": {"start": [0.3, 0.5, 0], "end": [0.3, 0, 0]},
        "noise_band": {"p95_spread": 1.15},
        "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16},
    }
    new = {
        "queries": {"a": 3.0, "b": 2.5},
        "load_avg": {"start": [0.4, 0.4, 0], "end": [0.4, 0, 0]},
        "host_canary": {"py_sha256_s": 0.25, "py_sort_s": 0.20},
    }
    r = _compare(tmp_path, old, new)
    assert r.returncode == 1, r.stdout
    assert "REGRESSED a" in r.stdout
    assert "REGRESSED b" not in r.stdout, "the drift-only query must not flag"


def test_bench_compare_same_load_still_gates(tmp_path):
    """Quiet-vs-quiet with a real out-of-envelope delta keeps the
    regression exit code — the refusal must not weaken the gate."""
    old = {
        "queries": {"a": 1.0},
        "load_avg": {"start": [0.3, 0, 0], "end": [0.3, 0, 0]},
        "noise_band": {"p95_spread": 1.2},
    }
    new = {
        "queries": {"a": 3.0},
        "load_avg": {"start": [0.4, 0, 0], "end": [0.4, 0, 0]},
    }
    r = _compare(tmp_path, old, new)
    assert r.returncode == 1, r.stdout
    assert "REGRESSED a" in r.stdout


# --- r12 self-certification: segment canaries + automatic isolated ---
# --- re-times make a loaded-host sweep diagnosable from its own stamps ---

#: the r11 incident shape: a quiet committed baseline...
_R11_BASELINE = {
    "queries": {"a": 1.0, "b": 2.0, "c": 0.5},
    "load_avg": {"start": [0.3, 0.5, 0], "end": [0.3, 0, 0]},
    "noise_band": {"p95_spread": 1.15},
    "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16, "spark_hashagg_s": 0.25},
}


def test_loaded_sweep_self_certifies_zero_false_flags(tmp_path):
    """r12 verdict item 1 (Done criterion): injected contention must
    yield ZERO false flags. The simulated sweep reproduces r11's SHAPE —
    NON-uniform inflation (3x to 10x per query) on a loaded host whose
    spark canary reads 3.3x while py canaries barely move. Spark-side
    normalization absorbs the uniform part; the queries contention hit
    HARDER than the canary (a at 10x) survive normalization and must be
    cleared by the artifact's own isolated re-times. The comparison
    proceeds without --force (self-certified), reports the mid-sweep
    canary series, and exits 0 with no REGRESSED/UNCLEARED line."""
    loaded = {
        "queries": {"a": 10.0, "b": 6.3, "c": 1.6},
        "load_avg": {"start": [7.3, 10.2, 0], "end": [5.0, 8.0, 0]},
        "host_canary": {"py_sha256_s": 0.21, "py_sort_s": 0.16, "spark_hashagg_s": 0.83},
        "segment_canaries": [
            {"after": 1, "spark_hashagg_s": 0.80},
            {"after": 2, "spark_hashagg_s": 0.85},
        ],
        # host quieted by retime time: retime canary back at baseline
        "retime_canary": {"spark_hashagg_s": 0.26},
        "isolated_retimes": {
            "a": {"sweep_s": 10.0, "isolated_s": 1.02, "baseline_s": 1.0},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, loaded)
    assert r.returncode == 0, r.stdout
    assert "REFUSED" not in r.stdout
    assert "REGRESSED" not in r.stdout and "UNCLEARED" not in r.stdout
    assert "CONTENTION a" in r.stdout, r.stdout
    assert "self-certified stamps" in r.stdout
    # the segment series is reported against the old baseline's canary
    assert "mid-sweep canary" in r.stdout


def test_loaded_sweep_still_loaded_retimes_clear_via_retime_canary(tmp_path):
    """If the host is STILL loaded during the re-times, the isolated
    numbers are inflated too — but the retime-moment canary stamp is
    equally inflated, so retime-canary normalization still clears the
    query whose sweep inflation exceeded the sweep-level canary."""
    loaded = {
        "queries": {"a": 10.0, "b": 6.3, "c": 1.6},
        "load_avg": {"start": [7.3, 10.2, 0], "end": [6.0, 9.0, 0]},
        "host_canary": {"py_sha256_s": 0.21, "py_sort_s": 0.16, "spark_hashagg_s": 0.83},
        "retime_canary": {"spark_hashagg_s": 0.78},
        "isolated_retimes": {
            "a": {"sweep_s": 10.0, "isolated_s": 3.0, "baseline_s": 1.0},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, loaded)
    assert r.returncode == 0, r.stdout
    assert "CONTENTION a" in r.stdout, r.stdout


def test_loaded_sweep_real_regression_stays_uncleared_exit_4(tmp_path):
    """A query whose isolated re-time does NOT come back to baseline on
    a loaded sweep is not silently passed: UNCLEARED label, exit 4 —
    needs a quiet-host confirmation, distinct from both clean (0) and a
    quiet-host regression verdict (1)."""
    loaded = {
        "queries": {"a": 16.0, "b": 6.3, "c": 1.6},
        "load_avg": {"start": [7.3, 10.2, 0], "end": [5.0, 8.0, 0]},
        "host_canary": {"py_sha256_s": 0.21, "py_sort_s": 0.16, "spark_hashagg_s": 0.83},
        "retime_canary": {"spark_hashagg_s": 0.26},
        "isolated_retimes": {
            "a": {"sweep_s": 16.0, "isolated_s": 4.8, "baseline_s": 1.0},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, loaded)
    assert r.returncode == 4, r.stdout
    assert "UNCLEARED a" in r.stdout
    assert "did NOT clear" in r.stdout
    assert "REGRESSED" not in r.stdout


def test_quiet_engine_regression_not_masked_by_spark_canary(tmp_path):
    """r11 ADVICE (medium, the verified attack): a uniform 1.8x ENGINE
    slowdown also slows the spark canary 1.8x (it runs through the
    session under test) while the py canaries stay flat. Quiet-vs-quiet
    normalization must use the py-only components, so the regression
    stays in the ratios and exits 1 — the old geomean form exited 0."""
    new = {
        "queries": {"a": 1.8, "b": 3.6, "c": 0.9},
        "load_avg": {"start": [0.4, 0.4, 0], "end": [0.4, 0, 0]},
        "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16, "spark_hashagg_s": 0.45},
    }
    r = _compare(tmp_path, _R11_BASELINE, new)
    assert r.returncode == 1, r.stdout
    assert r.stdout.count("REGRESSED") == 3, r.stdout
    assert "py-only" in r.stdout
    assert "may be the engine itself" in r.stdout


def test_quiet_engine_regression_with_retimes_not_self_cleared(tmp_path):
    """r12 ADVICE (medium): bench.py stamps isolated_retimes on EVERY
    sweep, so the r11 attack re-armed through the clearing path — a
    uniform 1.8x engine slowdown also slows the retime-moment hashagg
    canary 1.8x, and normalizing the isolated re-times by that
    engine-contaminated drift let the regression exonerate itself
    (exit 0) whenever <= RETIME_N queries were flagged. Quiet-vs-quiet,
    the isolated re-time must also clear under the py-basis norm:
    iso_norm = min(retime drift, py norm)."""
    new = {
        "queries": {"a": 1.8, "b": 3.6, "c": 0.9},
        "load_avg": {"start": [0.4, 0.4, 0], "end": [0.4, 0, 0]},
        "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16, "spark_hashagg_s": 0.45},
        # retime-moment canary carries the same engine-inflated reading,
        # and the isolated re-times confirm the slowdown is real (the
        # queries are just as slow alone as in the sweep)
        "retime_canary": {"spark_hashagg_s": 0.45},
        "isolated_retimes": {
            "a": {"sweep_s": 1.8, "isolated_s": 1.8, "baseline_s": 1.0},
            "b": {"sweep_s": 3.6, "isolated_s": 3.6, "baseline_s": 2.0},
            "c": {"sweep_s": 0.9, "isolated_s": 0.9, "baseline_s": 0.5},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, new)
    assert r.returncode == 1, r.stdout
    assert r.stdout.count("REGRESSED") == 3, r.stdout
    assert "CONTENTION" not in r.stdout, r.stdout


def test_quiet_flag_cleared_by_isolated_retime(tmp_path):
    """Quiet-vs-quiet, one query inflated by in-sweep state (the r7
    block-manager-pressure mechanism) whose own isolated re-time lands
    at baseline: cleared as CONTENTION, exit 0 — the artifact now does
    automatically what the module docstring told the operator to do by
    hand."""
    new = {
        "queries": {"a": 3.0, "b": 2.05, "c": 0.51},
        "load_avg": {"start": [0.4, 0.4, 0], "end": [0.4, 0, 0]},
        "host_canary": {"py_sha256_s": 0.20, "py_sort_s": 0.16, "spark_hashagg_s": 0.25},
        "retime_canary": {"spark_hashagg_s": 0.25},
        "isolated_retimes": {
            "a": {"sweep_s": 3.0, "isolated_s": 1.01, "baseline_s": 1.0},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, new)
    assert r.returncode == 0, r.stdout
    assert "CONTENTION a" in r.stdout
    assert "REGRESSED" not in r.stdout


def test_compact_segment_series_shape_parses(tmp_path):
    """bench.py's compact stdout line carries segment canaries as
    {'every': k, 'spark_hashagg_s': [floats]}; the comparison must read
    that shape too (the full file uses a list of dicts)."""
    loaded = {
        "queries": {"a": 3.1, "b": 6.3, "c": 1.6},
        "load_avg": {"start": [7.3, 10.2, 0], "end": [5.0, 8.0, 0]},
        "host_canary": {"py_sha256_s": 0.21, "py_sort_s": 0.16, "spark_hashagg_s": 0.83},
        "segment_canaries": {"every": 20, "spark_hashagg_s": [0.80, 0.85]},
        "retime_canary": {"spark_hashagg_s": 0.26},
        "isolated_retimes": {
            "a": {"sweep_s": 3.1, "isolated_s": 1.02, "baseline_s": 1.0},
            "b": {"sweep_s": 6.3, "isolated_s": 2.05, "baseline_s": 2.0},
            "c": {"sweep_s": 1.6, "isolated_s": 0.51, "baseline_s": 0.5},
        },
    }
    r = _compare(tmp_path, _R11_BASELINE, loaded)
    assert r.returncode == 0, r.stdout
    assert "mid-sweep canary" in r.stdout
    assert "3.20x" in r.stdout or "3.40x" in r.stdout, r.stdout


def test_select_retimes_prefers_worst_vs_baseline():
    from bench import select_retimes

    timings = {"a": 2.0, "b": 9.0, "c": 0.9}
    baseline = {"a": 1.0, "b": 8.0, "c": 0.2}  # ratios: 2.0, 1.125, 4.5
    assert select_retimes(timings, baseline, n=2) == ["c", "a"]


def test_select_retimes_falls_back_to_slowest_without_baseline():
    from bench import select_retimes

    timings = {"a": 2.0, "b": 9.0, "c": 0.9}
    assert select_retimes(timings, None, n=2) == ["b", "a"]
    # baseline with zero overlap also falls back
    assert select_retimes(timings, {"z": 1.0}, n=1) == ["b"]


def test_compact_retime_triples_parse_and_clear(tmp_path):
    """The compact stdout line carries retimes as [sweep, isolated,
    baseline] triples (shrunk for the driver's 2000-char stdout-tail
    capture); the comparison must clear flags from that shape too."""
    loaded = {
        "queries": {"a": 10.0, "b": 6.3, "c": 1.6},
        "load_avg": {"start": [7.3, 10.2, 0], "end": [5.0, 8.0, 0]},
        "host_canary": {"py_sha256_s": 0.21, "py_sort_s": 0.16, "spark_hashagg_s": 0.83},
        "retime_canary": {"spark_hashagg_s": 0.26},
        "isolated_retimes": {"a": [10.0, 1.02, 1.0]},
    }
    r = _compare(tmp_path, _R11_BASELINE, loaded)
    assert r.returncode == 0, r.stdout
    assert "CONTENTION a" in r.stdout


def test_scoped_names_rejects_unknown_and_keeps_registry_order():
    """r12 ADVICE: SPARK_GRAFT_BENCH_ONLY with a typo'd name must raise,
    not silently drop to an empty 'successful' smoke run; valid names
    resolve against the FULL registry (not just HEADLINE), in registry
    order."""
    import pytest as _pytest

    from bench import scoped_names

    reg = ["q1", "q2", "q3_not_headline"]
    assert scoped_names("q3_not_headline,q1", reg) == ["q1", "q3_not_headline"]
    with _pytest.raises(SystemExit) as ei:
        scoped_names("q1,q_typo", reg)
    assert "q_typo" in str(ei.value)


def test_emit_compact_fits_driver_tail_budget():
    """The driver records a 2000-char stdout tail; an over-long compact
    line truncates from the FRONT and parses as null (the r4 lost-round
    incident). A worst-case realistic compact dict must fit the budget
    after trimming, and the isolated re-times must SURVIVE the trim —
    they are the self-certification stamp."""
    import json as _json

    from bench import COMPACT_LINE_BUDGET, RETIME_N, emit_compact

    long_names = [f"incremental_components_merge_{i:02d}" for i in range(RETIME_N)]
    compact = {
        "metric": "headline_queries_total",
        "value": 236.574,
        "unit": "sec",
        "queries": {n: 11.862 for n in long_names[:5]},
        "n_queries": 121,
        "timed_runs": 2,
        "noise_band": {"median_spread": 1.079, "p95_spread": 1.329, "max_spread": 1.563},
        "sf": 0.1,
        "pipeline_total": 31.799,
        "host_canary": {"py_sha256_s": 0.1783, "py_sort_s": 0.3949, "spark_hashagg_s": 0.1911},
        "segment_canaries": {"every": 20, "spark_hashagg_s": [0.4069] * 6},
        "retime_canary": {"spark_hashagg_s": 0.2457},
        "isolated_retimes": {n: [11.862, 1.234, 1.222] for n in long_names},
        "load_avg": {"start": [7.3, 10.22, 3.61], "end": [4.75, 4.66, 4.35]},
        "full_results": "/root/repo/BENCH_LOCAL_sf0.1.json",
        "promoted_to_baseline": False,
        "promotion_reason": "host 1-min load 7.30 > gate 2.0: loaded-host "
        "sweep kept in the SF-stamped file only; promote deliberately "
        "with SPARK_GRAFT_BENCH_PROMOTE=1",
        "errors": {},
    }
    line = emit_compact(compact)
    assert len(line) <= COMPACT_LINE_BUDGET, len(line)
    parsed = _json.loads(line)
    assert isinstance(parsed["isolated_retimes"], dict), (
        "retimes must survive the trim"
    )
    assert len(parsed["isolated_retimes"]) == RETIME_N


def test_midsweep_basis_capped_against_ratchet():
    """r13 ADVICE: the segment-median basis is self-referential — over
    successive promotions it could ratchet up by the gate factor each
    time. The basis is capped at 3x the baseline's idle START canary
    (just above the measured 1.4-2.9x honest sweep-state inflation), so
    a baseline whose own segments drifted absurdly high cannot bless an
    equally-degraded new sweep."""
    from bench import CANONICAL_SF, promotion_decision

    CANARY = {"py_sha256_s": 0.18, "py_sort_s": 0.39, "spark_hashagg_s": 0.19}
    base = {"spark_hashagg_s": 0.176}
    # pathological baseline: its own segments sit at ~8x its start canary
    base_segs = [1.4, 1.5, 1.3, 1.45, 1.5]
    # new sweep's segments match that degraded level — the UNCAPPED
    # median basis would bless them; the cap (3 x 0.176 = 0.528) refuses
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=CANARY,
        baseline_canary=base,
        segment_canaries=[1.35, 1.4, 1.3],
        baseline_segments=base_segs,
    )
    assert not promote
    assert "capped" in reason or "3x" in reason
    # segments inside 3x the idle start stamp still promote under the
    # capped basis (the honest quiet-sweep inflation band)
    promote, reason = promotion_decision(
        CANONICAL_SF,
        load1=0.3,
        load5=0.5,
        canary=CANARY,
        baseline_canary=base,
        segment_canaries=[0.40, 0.45, 0.35],
        baseline_segments=base_segs,
    )
    assert promote, reason


def test_emit_compact_keeps_largest_fitting_query_prefix():
    """r14 (VERDICT item 2): the compact line now carries ALL per-query
    timings when they fit and otherwise the largest slowest-first prefix
    that does — never fewer than the r13-era top-5 — so the driver's
    round-over-round comparator sees dozens of common names, not 2."""
    import json as _json

    from bench import COMPACT_LINE_BUDGET, emit_compact

    queries = {f"query_name_padded_out_{i:03d}": 122.0 - i for i in range(122)}
    compact = {
        "metric": "headline_queries_total",
        "value": 90.0,
        "unit": "sec",
        "queries": dict(queries),
        "exec": {"master": "local[32]", "default_parallelism": 32, "cpus_env": "32"},
        "n_queries": 122,
        "sf": 0.1,
        "isolated_retimes": {f"query_name_padded_out_{i:03d}": [1.0, 1.0, 1.0] for i in range(8)},
        "full_results": "/root/repo/BENCH_LOCAL_sf0.1.json",
    }
    line = emit_compact(compact)
    assert len(line) <= COMPACT_LINE_BUDGET
    parsed = _json.loads(line)
    kept = parsed["queries"]
    assert isinstance(kept, dict) and len(kept) >= 5
    # slowest-first prefix: the 5 slowest must all be present
    for i in range(5):
        assert f"query_name_padded_out_{i:03d}" in kept
    # and it kept as many as the budget allows (more than the old top-5)
    assert len(kept) > 20, len(kept)
    # retimes survive
    assert isinstance(parsed["isolated_retimes"], dict)
    # a small map is passed through whole
    compact2 = {"metric": "m", "queries": {"a": 1.0, "b": 2.0}}
    assert _json.loads(emit_compact(compact2))["queries"] == {"a": 1.0, "b": 2.0}
