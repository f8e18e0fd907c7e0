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
- A wrong declaration can route an oversized frame to the single-task
  rank tier — the same blast radius as a duplicated dim key silently
  duplicating fact rows in ANY join, which is why dim PKs are a contract
  worth declaring rather than re-proving with an exchange per query.
"""

from __future__ import annotations

_PK_BY_PATH: dict[str, tuple[str, ...]] = {}


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


def declare_pk(path: str, cols: tuple[str, ...]) -> None:
    """Record that the table at ``path`` is unique on ``cols`` (a real
    PRIMARY KEY: every declared column combination occurs at most once)."""
    _PK_BY_PATH[_norm(path)] = tuple(cols)


def pk_for(path: str) -> tuple[str, ...] | None:
    """The declared PK of ``path``, or None if never declared."""
    return _PK_BY_PATH.get(_norm(path))
