"""Decade-tier slope regression gate (VERDICT r7 ask #8): the 10x-tier
sweep of the ten heaviest pipelines caught a real quadratic in r7
(semdedup's fixed-K quantizer); committing its output as SCALE_r{N}.json
every round turns that one-off catch into a standing alarm. This test
diffs the newest two committed artifacts and fails on:

- a slope that grew >1.75x round over round (tier noise on an idle host
  is well under that; a jump this size is a plan-shape regression), or
- any slope >12 (beyond ppjoin's measured closed-vocab worst case of
  8.8x — a brand-new quadratic stage).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GROWTH_LIMIT = 1.75
ABSOLUTE_LIMIT = 12.0

#: per-query absolute allowances for DOCUMENTED data-shape worst cases:
#: ppjoin is inherently quadratic on the tier's closed vocabulary
#: (prefix-df saturation, measured 8.8-11.4x across rounds; SCALING.md
#: r7) and ships with the saturation router as its deployment posture —
#: the absolute gate exists to catch NEW quadratics, not to re-flag the
#: known one every round.
ALLOWANCES = {"ppjoin_jaccard_pairs": 15.0}


def _artifacts() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(REPO, "SCALE_r*.json")):
        m = re.search(r"SCALE_r(\d+)\.json$", path)
        with open(path) as fh:
            out[int(m.group(1))] = json.load(fh)
    return out


def test_scale_artifact_exists_and_is_sane():
    arts = _artifacts()
    assert arts, "no SCALE_r*.json committed — run tools/scale_tier.py --out"
    newest = arts[max(arts)]
    assert len(newest) >= 5
    flagged = [
        f"{q}: slope {row['slope']}x exceeds the "
        f"{ALLOWANCES.get(q, ABSOLUTE_LIMIT)}x absolute bound"
        for q, row in newest.items()
        if row["slope"] > ALLOWANCES.get(q, ABSOLUTE_LIMIT)
    ]
    assert not flagged, "\n".join(flagged)


#: queries that must carry a SECOND measured decade (VERDICT r8 ask #1):
#: the 100x tier (tier100x_sec, slope2 = tier100x/tier10x). A slope2
#: below 10 means wall grew SLOWER than data across the second decade —
#: per-row unit cost fell, the flattening evidence one decade can't
#: give. (Raw slope2 <= slope1 is the wrong gate here: decade-1 walls
#: of 3-17 s are fixed-overhead-depressed, so decade-1 slopes read
#: artificially low; unit cost is the honest monotone. r9 measured
#: semdedup 1.7 -> 0.49 -> 0.20 ms/vector, kcore 3.1 -> 1.06 -> 0.91
#: us/edge, jaccard-router 0.66 -> 0.33 -> 0.28 ms/doc.)
TWO_DECADE = ("semdedup_pairs", "jaccard_dup_pairs", "kcore_products")
SECOND_DECADE_LIMIT = 10.0


def test_second_decade_is_subdecade_linear():
    arts = _artifacts()
    newest = arts[max(arts)]
    missing = [q for q in TWO_DECADE if "slope2" not in newest.get(q, {})]
    if max(arts) < 9:
        return  # two-decade sweeps start at r9
    assert not missing, (
        f"{missing} lack a second measured decade — run tools/scale_tier.py "
        "with its default --tier100-queries"
    )
    flagged = [
        f"{q}: slope2 {newest[q]['slope2']}x — wall grew FASTER than data "
        "across the second decade (unit cost rose; compounding quadratic)"
        for q in TWO_DECADE
        if newest[q]["slope2"] > SECOND_DECADE_LIMIT
    ]
    assert not flagged, "\n".join(flagged)


def test_slopes_do_not_regress_round_over_round():
    arts = _artifacts()
    if len(arts) < 2:
        return  # first artifact round: nothing to diff yet
    rounds = sorted(arts)
    prev, cur = arts[rounds[-2]], arts[rounds[-1]]
    flagged = []
    for q in prev.keys() & cur.keys():
        before, after = prev[q]["slope"], cur[q]["slope"]
        # floor the baseline at 1.0: a sub-1 slope (tier FASTER than the
        # base scale) is physically impossible for these pipelines and
        # means the baseline capture was favorably noisy — comparing
        # against it raw would false-alarm the next honest measurement
        if after / max(before, 1.0) > GROWTH_LIMIT:
            flagged.append(
                f"{q}: decade slope grew {before}x -> {after}x "
                f"(>{GROWTH_LIMIT}x) — plan-shape regression"
            )
    assert not flagged, "\n".join(flagged)
