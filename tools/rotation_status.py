"""Rotation status: which queries hold a green driver CORRECTNESS row.

Reads CORRECTNESS_r*.json (the external driver's per-round records) plus
the current registration order and prints, per query: the last round it
was green, the last round it was checked at all, and whether it sits
inside the driver's 50-query window for next round. Use to sanity-check
the self-rotating registration before a round ends:

    python tools/rotation_status.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WINDOW = 50


def main() -> int:
    green: dict[str, int] = {}
    checked: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            checked[name] = max(rnd, checked.get(name, 0))
            ok = (
                isinstance(rec, dict)
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is True
                and not rec.get("err")
            )
            if ok:
                green[name] = max(rnd, green.get(name, 0))

    from end_to_end_azure_data_engineering_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    names = list(QUERIES)
    n_window = 0
    never_green, stale = [], []
    for i, name in enumerate(names):
        in_window = i < WINDOW
        n_window += in_window
        g, c = green.get(name), checked.get(name)
        status = (
            f"green r{g}" if g is not None and (c is None or g >= c)
            else f"REGRESSED r{c} (last green r{g})" if g is not None
            else f"failed r{c}" if c is not None
            else "never checked"
        )
        if g is None or (c is not None and c > g):
            (never_green if g is None else stale).append(name)
        print(f"{'>' if in_window else ' '} {i:3d} {name:32s} {status}")

    print(
        f"\n{len(names)} queries; window={WINDOW}; "
        f"no-green-row: {len(never_green)}; regressed: {len(stale)}"
    )
    outside = [n for n in never_green + stale if names.index(n) >= WINDOW]
    if outside:
        print(f"WARNING: needs-verification queries OUTSIDE the window: {outside}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
