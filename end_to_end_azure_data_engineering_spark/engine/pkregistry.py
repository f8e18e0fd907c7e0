"""Declared-primary-key registry for scan-level uniqueness proofs.

r10 verdict item 2: the rank router's zero-job proof walker
(``operators/ranks.py::_unique_on``) could only prove "one row per key"
from an Aggregate shape, so dimension-side queries paid a
``groupBy(key).agg(first(...))`` rewrite — one dim-sized exchange whose
only purpose was to make the dim's PK contract a *plan* property. This
registry moves that contract to metadata: the table loader declares the
PK of each table it hands out, keyed by the exact data path it read, and
the proof walker trusts a scan of a declared path directly — no extra
exchange at any scale.

Trust model (deliberately narrow):

- Only paths loaded through the engine's own loaders are ever declared —
  there is no name-pattern matching, so a user-supplied
  ``other/customer.parquet`` is never silently trusted.
- The declaration is validated once per fixture, not per query:
  ``tests/test_ranks.py::test_declared_pks_hold_on_fixture`` asserts
  COUNT(*) == COUNT(DISTINCT pk) for every declared table at test SF.
  (On a production deployment the equivalent check belongs in the
  ingestion audit — the reference's DQ rule catalog is the precedent.)
- A declaration is fingerprinted to the path's (mtime_ns, size) at
  declare time (r11 ADVICE): a path REWRITTEN after declaration drops
  its stale entry on the next lookup instead of vouching for data it
  never described. Parquet writers replace files (write + rename), so
  both a single-file overwrite and a directory rewrite move the stat;
  the one shape the fingerprint cannot see is an in-place byte edit of
  an existing file inside a directory scan with preserved mtime — not a
  writer that exists in practice. ``undeclare``/``clear`` hooks cover
  callers that mutate paths through some other channel.
- A wrong declaration can route an oversized frame to the single-task
  rank tier — the same blast radius as a duplicated dim key silently
  duplicating fact rows in ANY join, which is why dim PKs are a contract
  worth declaring rather than re-proving with an exchange per query.
"""

from __future__ import annotations

import os

_PK_BY_PATH: dict[str, tuple[tuple[str, ...], tuple[int, int] | None]] = {}


def _norm(path: str) -> str:
    """Normalize loader paths and Hadoop URI forms to one key space
    (``file:/x``, ``file:///x`` and ``/x`` are the same local file)."""
    p = str(path)
    if p.startswith("file://"):
        p = p[len("file://"):]
    elif p.startswith("file:"):
        p = p[len("file:"):]
    while p.startswith("//"):
        p = p[1:]
    return p.rstrip("/")


def _fingerprint(norm_path: str) -> tuple[int, int] | None:
    """(mtime_ns, size) of the path itself, or None when it cannot be
    stat'ed (non-local URI, remote FS): such declarations stay
    process-lifetime, the pre-r12 behavior."""
    try:
        st = os.stat(norm_path)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def declare_pk(path: str, cols: tuple[str, ...]) -> None:
    """Record that the table at ``path`` is unique on ``cols`` (a real
    PRIMARY KEY: every declared column combination occurs at most once).
    The declaration is pinned to the path's current stat fingerprint —
    a later rewrite of the path invalidates it (see module docstring)."""
    key = _norm(path)
    _PK_BY_PATH[key] = (tuple(cols), _fingerprint(key))


def undeclare_pk(path: str) -> None:
    """Drop a declaration explicitly (callers that rewrite a path
    through a channel the stat fingerprint cannot observe)."""
    _PK_BY_PATH.pop(_norm(path), None)


def clear() -> None:
    """Drop every declaration (test isolation hook)."""
    _PK_BY_PATH.clear()


def pk_for(path: str) -> tuple[str, ...] | None:
    """The declared PK of ``path``, or None if never declared or if the
    path was rewritten since declaration (stale entries are dropped)."""
    key = _norm(path)
    entry = _PK_BY_PATH.get(key)
    if entry is None:
        return None
    cols, fp = entry
    if fp is not None and _fingerprint(key) != fp:
        del _PK_BY_PATH[key]  # path rewritten: the declaration is stale
        return None
    return cols
