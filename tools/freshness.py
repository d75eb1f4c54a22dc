#!/usr/bin/env python
"""Registry-freshness and rotation-governance audit (VERDICT r7 asks
#1 and #5).

The driver's correctness harness checks ~50 registry queries per round
in `_DRIVER_PRIORITY` order, so with N queries the freshness ceiling is
N / 50 rounds. This tool parses every committed CORRECTNESS_r*.json and
FAILS (exit 1) when the rotation contract is broken:

1. STALE ROW — a registry query's latest green driver row is more than
   MAX_AGE_ROUNDS older than the newest committed CORRECTNESS file.
   (The rotation comment in operators/__init__.py promises every row is
   refreshed within 4 rounds; a violation means the priority order
   stopped tracking staleness or the registry outgrew the budget.)
2. ORPHAN — a registry query has NO committed green row at all AND does
   not sit inside the head-of-line window (the first `budget` priority
   slots), i.e. it will not be checked next round either.
3. OVER CAPACITY — the registry exceeds MAX_AGE_ROUNDS x the observed
   per-round check budget. Growth policy (encoded here, documented at
   the rotation comment): the registry is CAPPED at rotation capacity —
   a new query must replace a retired one, not stretch staleness.

A green row is a driver row with err == null and hash_match == true, or
the rows-only err == "no_oracle" form the driver records for the two
approximate operators (each is hash-locked by an exact `_check` twin).

Prints a one-line JSON report either way; run by tests/test_freshness.py
so the suite is the enforcement point.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the rotation promise: no query's latest green row may be older than
#: this many rounds behind the newest committed CORRECTNESS file.
MAX_AGE_ROUNDS = 4


def _green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return True  # rows-only by design; exact twin carries the hash
    return row.get("err") is None and bool(row.get("hash_match"))


def load_rounds(repo: str = REPO) -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        with open(path) as fh:
            rounds[int(m.group(1))] = json.load(fh)
    return rounds


def audit(repo: str = REPO) -> dict:
    from construction_data_lake_et_data_warehouse_tp3_spark.operators import (
        BY_DESIGN_ROWS_ONLY,
        all_oracle,
        all_queries,
    )

    registry = list(all_queries())
    failures: list[str] = []
    # by-design marker audit (VERDICT r9 ask #7): the marker set must be
    # EXACTLY the queries lacking an oracle (a marker on an oracled query
    # hides a regression; an unmarked no-oracle query reads as an error
    # to scripted CORRECTNESS consumers), and each exact twin must hold
    # an oracle slot so the hash lock it promises actually exists.
    oracled = set(all_oracle())
    rows_only = {q for q in registry if q not in oracled}
    if rows_only != set(BY_DESIGN_ROWS_ONLY):
        failures.append(
            "BY_DESIGN drift: marker set "
            f"{sorted(BY_DESIGN_ROWS_ONLY)} != actual no-oracle set "
            f"{sorted(rows_only)}"
        )
    for q, twin in sorted(BY_DESIGN_ROWS_ONLY.items()):
        if twin not in oracled:
            failures.append(
                f"BY_DESIGN twin missing: {q}'s exact twin {twin} has no "
                "oracle slot — the hash lock it points at does not exist"
            )
    rounds = load_rounds(repo)
    if not rounds:
        return {"ok": not failures, "note": "no CORRECTNESS files yet", "failures": failures}
    max_round = max(rounds)
    # observed per-round check budget: the driver has recorded a stable
    # row count per round; take the min of the last 3 files so one
    # short capture can't inflate the assumed capacity.
    recent = sorted(rounds)[-3:]
    budget = min(len(rounds[n]) for n in recent)
    capacity = MAX_AGE_ROUNDS * budget

    latest: dict[str, int] = {}
    for n in sorted(rounds):
        for q, row in rounds[n].items():
            if _green(row):
                latest[q] = n

    stale = {
        q: latest[q]
        for q in registry
        if q in latest and max_round - latest[q] > MAX_AGE_ROUNDS
    }
    for q, n in sorted(stale.items()):
        failures.append(
            f"STALE: {q} last green r{n}, {max_round - n} rounds behind r{max_round}"
        )
    head = set(registry[:budget])
    for q in registry:
        if q not in latest and q not in head:
            failures.append(
                f"ORPHAN: {q} has no committed green row and is not in the "
                f"first {budget} priority slots — it will not be checked next round"
            )
    if len(registry) > capacity:
        failures.append(
            f"OVER CAPACITY: {len(registry)} registry queries > "
            f"{capacity} (= {MAX_AGE_ROUNDS} rounds x {budget} checks/round) — "
            "retire a query before adding one"
        )

    ages: dict[int, int] = {}
    for q in registry:
        if q in latest:
            ages[max_round - latest[q]] = ages.get(max_round - latest[q], 0) + 1
    return {
        "ok": not failures,
        "max_round": max_round,
        "budget_per_round": budget,
        "capacity": capacity,
        "registry_size": len(registry),
        "age_histogram": {str(k): ages[k] for k in sorted(ages)},
        "never_checked": sorted(q for q in registry if q not in latest),
        "failures": failures,
    }


def main() -> int:
    report = audit()
    print(json.dumps(report, separators=(",", ":")))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
