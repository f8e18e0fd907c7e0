"""Bench-artifact promotion gate (r9 verdict item 2).

Round 8 lost its committed comparison baseline twice: an ad-hoc sf0.01
verify run silently overwrote the sf0.1 closing artifact (misdiagnosed
downstream as a regression), then the driver's loaded-host closing run
clobbered the quiet-start artifact in the working tree. The gate routes
every sweep to an SF-stamped file and only promotes canonical-SF
quiet-host sweeps (or an explicit operator override) to
BENCH_LOCAL.json. Pure-python — no Spark session."""

from __future__ import annotations

from bench import CANONICAL_SF, LOAD_GATE, promotion_decision


def test_non_canonical_sf_refused():
    promote, reason = promotion_decision(0.01, load1=0.1)
    assert not promote
    assert "non-canonical" in reason


def test_loaded_host_refused():
    promote, reason = promotion_decision(CANONICAL_SF, load1=LOAD_GATE + 1.5)
    assert not promote
    assert "load" in reason and "PROMOTE" in reason


def test_quiet_canonical_promotes():
    promote, reason = promotion_decision(CANONICAL_SF, load1=0.3)
    assert promote, reason


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
