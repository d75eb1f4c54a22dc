#!/usr/bin/env python
"""Per-peel-round cost breakdown for kcore_products (VERDICT r7 ask #4).

The r7 decade sweep measured a 4.05x wall slope at 10x edges and
attributed it, unverified, to a floor->bandwidth transition. This tool
verifies the attribution by timing EACH peel round separately — edge
materialization (the co-purchase build), then per round the semi-prune +
degree aggregation + alive filter with surviving node/edge counts — at
sf0.1 and at the 10x tier. If rounds' cost doesn't shrink with the
shrinking subgraph, the peel itself is the problem; if the build
dominates, the slope is the build's.

Run AFTER tools/scale_tier.py has generated the tier (or pass
--tier-dir). Prints one JSON line per (scale, phase).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"


def breakdown(spark, sf_dir: str, k: int, rounds: int) -> list[dict]:
    from pyspark.sql import functions as F

    from construction_data_lake_et_data_warehouse_tp3_spark.operators.graph import (
        _canonical_edges,
    )

    # mirrors the r9 CANONICAL peel in operators/graph.py kcore_products:
    # the checkpoint holds the src<dst half, induced degree aggregates
    # both endpoint columns
    def induced_degree(e):
        return (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        )

    def prune(e, alive_nodes):
        return e.join(
            alive_nodes.select(F.col("node").alias("src")), "src", "left_semi"
        ).join(alive_nodes.select(F.col("node").alias("dst")), "dst", "left_semi")

    out = []
    t0 = time.monotonic()
    canon = _canonical_edges(spark, sf_dir).localCheckpoint(eager=True)
    n_edges = canon.count()
    out.append(
        {
            "sf_dir": sf_dir,
            "phase": "build",
            "sec": round(time.monotonic() - t0, 3),
            "edges": n_edges,
        }
    )
    alive = induced_degree(canon).select("node")
    for rnd in range(1, rounds + 1):
        t0 = time.monotonic()
        alive = (
            induced_degree(prune(canon, alive))
            .where(F.col("degree") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        n_alive = alive.count()
        out.append(
            {
                "sf_dir": sf_dir,
                "phase": f"round{rnd}",
                "sec": round(time.monotonic() - t0, 3),
                "alive_nodes": n_alive,
            }
        )
    t0 = time.monotonic()
    n_core = induced_degree(prune(canon, alive)).count()
    out.append(
        {
            "sf_dir": sf_dir,
            "phase": "final_degrees",
            "sec": round(time.monotonic() - t0, 3),
            "core_nodes": n_core,
        }
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier-dir", default="/tmp/tp3_scale_sf1")
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--rounds", type=int, default=None)
    args = ap.parse_args()

    from construction_data_lake_et_data_warehouse_tp3_spark.operators.graph import (
        K_CORE,
        N_PEEL,
    )
    from construction_data_lake_et_data_warehouse_tp3_spark.session import get_spark

    k = args.k if args.k is not None else K_CORE
    rounds = args.rounds if args.rounds is not None else N_PEEL
    spark = get_spark("kcore-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = [SF01]
    if os.path.isdir(args.tier_dir):
        dirs.append(args.tier_dir)
    for d in dirs:
        breakdown(spark, d, k, rounds)  # warmup: JIT + codegen
        for row in breakdown(spark, d, k, rounds):
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
