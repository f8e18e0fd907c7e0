"""Injectable clock.

The reference stamps audit columns with ``current_timestamp()`` inside its
MERGE statements (reference: 4_silver/silver_transactions.py:146,197-198),
which makes results non-reproducible. Every engine operator that writes an
audit timestamp takes a ``Clock`` so tests can freeze time and hash-compare
table state.
"""

from __future__ import annotations

import datetime as _dt
from abc import ABC, abstractmethod


class Clock(ABC):
    @abstractmethod
    def now(self) -> _dt.datetime:
        ...


class SystemClock(Clock):
    def now(self) -> _dt.datetime:
        return _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)


class FixedClock(Clock):
    def __init__(self, at: _dt.datetime):
        self._at = at

    def now(self) -> _dt.datetime:
        return self._at

    def advance(self, **kwargs) -> None:
        self._at = self._at + _dt.timedelta(**kwargs)
