#!/usr/bin/env python
"""Regenerate ``_DRIVER_PRIORITY`` stalest-first (VERDICT r8 ask #2).

The driver's correctness harness checks ~50 registry queries per round
in ``_DRIVER_PRIORITY`` order.  To keep every query's latest green row
within the 4-round freshness window enforced by ``tools/freshness.py``,
the priority tuple must be regenerated each round so the STALEST
queries (oldest latest-green driver row) enumerate first, alphabetical
within a staleness block.

Usage:
    python tools/rotate_priority.py            # rewrite operators/__init__.py
    python tools/rotate_priority.py --check    # exit 1 if the committed
                                               # tuple is not stalest-first

The ordering is derived purely from committed CORRECTNESS_r*.json files
via the same green-row definition freshness.py uses, so the two tools
can never disagree about what "stale" means.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INIT_PATH = os.path.join(
    REPO, "construction_data_lake_et_data_warehouse_tp3_spark", "operators", "__init__.py"
)


def stalest_first() -> list[str]:
    from tools.freshness import _green, load_rounds
    from construction_data_lake_et_data_warehouse_tp3_spark.operators import all_queries

    registry = list(all_queries())
    rounds = load_rounds(REPO)
    latest: dict[str, int] = {}
    for n in sorted(rounds):
        for name, row in rounds[n].items():
            if _green(row):
                latest[name] = n
    # Never-checked queries are stalest of all (age = -infinity proxy 0).
    return sorted(registry, key=lambda q: (latest.get(q, 0), q))


def _marker() -> str:
    """One-line generated-on marker (ADVICE r9): derived from the committed
    CORRECTNESS files, not wall-clock, so regeneration is reproducible."""
    from tools.freshness import load_rounds

    rounds = sorted(load_rounds(REPO))
    span = f"r{rounds[0]:02d}..r{rounds[-1]:02d}" if rounds else "none"
    return f"# [generated] tools/rotate_priority.py from CORRECTNESS {span}"


def render(order: list[str]) -> str:
    body = "\n".join(f'    "{name}",' for name in order)
    return f"{_marker()}\n_DRIVER_PRIORITY = (\n{body}\n)"


def main() -> int:
    order = stalest_first()
    with open(INIT_PATH) as fh:
        src = fh.read()
    pattern = re.compile(
        r"(?:# \[generated\][^\n]*\n)?_DRIVER_PRIORITY = \(\n(?:    \"[^\"]+\",\n)+\)"
    )
    m = pattern.search(src)
    if not m:
        print("could not locate _DRIVER_PRIORITY tuple", file=sys.stderr)
        return 2
    new_block = render(order)
    if "--check" in sys.argv:
        if m.group(0) == new_block:
            print('{"ok": true, "note": "priority tuple is stalest-first"}')
            return 0
        print('{"ok": false, "note": "priority tuple is NOT stalest-first; run tools/rotate_priority.py"}')
        return 1
    if m.group(0) == new_block:
        print("already stalest-first; no change")
        return 0
    with open(INIT_PATH, "w") as fh:
        fh.write(src[: m.start()] + new_block + src[m.end() :])
    print(f"rewrote _DRIVER_PRIORITY with {len(order)} entries; head: {order[:5]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
