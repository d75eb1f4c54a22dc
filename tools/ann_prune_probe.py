#!/usr/bin/env python
"""Measure the persisted-index probe pruning at a PRODUCTION-SHAPED
quantizer (VERDICT r10 ask #5).

The r10 pruning table was honest but toy: K=8 cells at sf0.1, where a
5-query batch already covers 6/8 cells — the regime the cid-partitioned
layout exists for (K in the hundreds-to-thousands, probes touching
nprobe/K of the files) was extrapolated, not measured. This tool builds
the persisted IVF index over the 100x embedding tier (200k vectors)
with k = ceil(sqrt(N)) ≈ 448 cells — the two-level assign_adaptive
training path, constant expected cell size — and measures, for
realistic probe batch sizes, the PLANNING-TIME file skip the static
`cid IN (probed)` predicate grants:

    skip = 1 - |union of probed cells' file sets| / |all posting files|

File counts are taken from the committed posting version's directory
layout (one cid=... dir per cell — the same accounting
tests/test_ann_index.py locks at K=8) and ASSERTED, not estimated: the
tool exits non-zero if any batch <= --assert-batch-max reads below
--assert-skip (default 90%).

Prints one JSON line per batch size. Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python tools/ann_prune_probe.py \
        [--tier-dir /tmp/tp3_scale_sf10] [--batches 1,5,32] [--out file]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier-dir", default="/tmp/tp3_scale_sf10")
    ap.add_argument("--batches", default="1,5,32")
    ap.add_argument("--nprobe", type=int, default=None, help="default: NPROBE")
    ap.add_argument("--assert-skip", type=float, default=0.90)
    ap.add_argument(
        "--assert-batch-max",
        type=int,
        default=16,
        help="batches up to this many queries must meet --assert-skip",
    )
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.scale_tier import ensure_tier100

    ensure_tier100(args.tier_dir)

    from pyspark.sql import functions as F

    from construction_data_lake_et_data_warehouse_tp3_spark.lake.ann import AnnIndex
    from construction_data_lake_et_data_warehouse_tp3_spark.operators.clustering import (
        NPROBE,
        _NORM,
        prep_vectors,
        probe_cells,
    )
    from construction_data_lake_et_data_warehouse_tp3_spark.session import get_spark
    from construction_data_lake_et_data_warehouse_tp3_spark.sources.registry import (
        load_table,
    )

    nprobe = args.nprobe if args.nprobe is not None else NPROBE
    spark = get_spark("ann-prune-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, args.tier_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    k = int(math.isqrt(n - 1)) + 1  # ceil(sqrt(N)): constant expected cell size
    root = os.path.join(tempfile.gettempdir(), f"tp3_ann_prune_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    results = []
    try:
        t0 = time.monotonic()
        meta = AnnIndex.build(spark, root, emb, k=k)
        build_sec = round(time.monotonic() - t0, 3)
        idx = AnnIndex(spark, root)
        pdir = os.path.join(
            idx.catalog.feed_data_path(idx._cfg("postings")),
            f"version=v{meta['posting_version']}",
        )
        all_files = glob.glob(os.path.join(pdir, "**", "*.parquet"), recursive=True)
        all_cells = {os.path.relpath(f, pdir).split(os.sep)[0] for f in all_files}
        print(
            json.dumps(
                {
                    "tier": args.tier_dir,
                    "vectors": n,
                    "k_cells_requested": k,
                    "k_cells_nonempty": len(all_cells),
                    "posting_files": len(all_files),
                    "nprobe": nprobe,
                    "build_sec": build_sec,
                }
            ),
            flush=True,
        )
        cents = idx.centroids()
        failures = []
        for batch in [int(b) for b in args.batches.split(",") if b]:
            q = emb.where(F.col("vec_id") < batch).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            # the probed-cell union — exactly what AnnIndex.topk's static
            # IN-filter admits (same probe_cells kernel, same qn>0 rule)
            qp = prep_vectors(
                q.select(F.col("query_id").alias("vec_id"), "embedding")
            ).select(
                F.col("vec_id").alias("query_id"),
                F.col("vd").alias("qv"),
                F.expr(_NORM.format(a="vd")).alias("qn"),
            )
            probed = {
                f"cid={r.cid}"
                for r in probe_cells(cents, qp.where(F.col("qn") > 0), nprobe)
                .select("cid")
                .distinct()
                .collect()
            }
            probed_files = [
                f
                for f in all_files
                if os.path.relpath(f, pdir).split(os.sep)[0] in probed
            ]
            skip = 1 - len(probed_files) / len(all_files)
            # probe wall, warm + min-of-N (the committed methodology)
            walls = []
            for i in range(args.passes + 1):
                t0 = time.monotonic()
                idx.topk(q).write.format("noop").mode("overwrite").save()
                if i:
                    walls.append(time.monotonic() - t0)
            row = {
                "batch_queries": batch,
                "probed_cells": len(probed),
                "cells_total": len(all_cells),
                "files_opened": len(probed_files),
                "files_total": len(all_files),
                "file_skip_ratio": round(skip, 4),
                "probe_wall_min_sec": round(min(walls), 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            if batch <= args.assert_batch_max and skip < args.assert_skip:
                failures.append(
                    f"batch={batch}: skip {skip:.3f} < {args.assert_skip}"
                )
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(results, fh, indent=1)
                fh.write("\n")
        if failures:
            print("ASSERTION FAILED: " + "; ".join(failures), file=sys.stderr)
            return 1
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
