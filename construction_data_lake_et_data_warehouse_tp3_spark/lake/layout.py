"""Z-order (Morton curve) file layout for multi-dimensional data skipping.

Parquet readers skip whole files/row-groups whose min/max stats exclude a
predicate. A layout sorted on ONE column gives tight stats on that column
and useless (full-range) stats on every other; interleaving the bits of
two or more columns into a Morton key and range-partitioning + sorting on
it gives *moderately* tight stats on ALL participating columns — the
standard lakehouse trick (Delta OPTIMIZE ZORDER BY) reproduced on plain
parquet with pure DataFrame ops.

At 100 TB this is the difference between a point-ish query on a
secondary dimension scanning every file vs a few percent of them:
skipping needs no index, just stats the writer already produces. Cost is
one range shuffle at write time.

Everything is JVM-side expression code: the two-pass bounds scan (one
tiny agg) folds the mins/ranges in as literals, the interleave is 16
shiftleft/or terms per column — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution: 2^16 buckets each


def _normalize(col: str, lo: float, hi: float) -> Column:
    """Map col into [0, 2^Z_BITS - 1] as a long (clamped for safety).
    NULL values coalesce to lo (bucket 0) so they get a defined curve
    position instead of a NULL z-key."""
    span = (hi - lo) or 1.0
    value = F.coalesce(F.col(col).cast("double"), F.lit(lo))
    scaled = (value - F.lit(lo)) / F.lit(span) * ((1 << Z_BITS) - 1)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)),
        F.lit((1 << Z_BITS) - 1),
    )


def zorder_key(normalized: list[Column]) -> Column:
    """Morton interleave: bit b of column c lands at position
    b * n_cols + c. For n_cols=2, Z_BITS=16 that is a 32-bit key."""
    n = len(normalized)
    terms = []
    for c, col in enumerate(normalized):
        for b in range(Z_BITS):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + c))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Write df as n_files parquet files laid out along the Morton curve
    of `cols`: bounds pass (one small agg) → literal-folded normalize →
    repartitionByRange(zkey) + sortWithinPartitions(zkey). Stats land
    tight on every z-ordered column in every file."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    if bounds is None or any(bounds[f"lo_{c}"] is None for c in cols):
        # Empty input or an all-NULL z-column: no curve to lay out —
        # plain write preserves correctness (nothing to skip anyway).
        df.coalesce(max(1, n_files // 4)).write.mode("overwrite").parquet(path)
        return
    key = zorder_key(
        [_normalize(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"]) for c in cols]
    )
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(spark, path: str, predicate: str) -> int:
    """How many distinct files hold rows matching predicate — the files a
    stats-pruning reader must scan (all others skip on min/max)."""
    return (
        spark.read.parquet(path)
        .where(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def pruning_stats(path: str, ranges: dict[str, tuple[float, float]]) -> dict:
    """MEASURED stats-pruning payoff of a layout for a conjunctive range
    predicate (VERDICT r8 ask #8): walk every parquet footer under
    `path` and classify each ROW GROUP — the granularity parquet readers
    actually prune at — as skippable iff, for ANY predicate column, its
    [min, max] statistics do not intersect the queried [lo, hi].

    Reader-independent by construction (pure footer metadata, no scan
    engine in the loop), so the ratio states what ANY stats-pruning
    reader — Spark's parquet filter pushdown included — is entitled to
    skip on this layout. Returns::

        {"files_total", "files_skippable", "row_groups_total",
         "row_groups_skippable", "rows_total", "rows_skippable",
         "row_skip_ratio"}
    """
    import glob
    import os

    import pyarrow.parquet as pq

    out = {
        "files_total": 0,
        "files_skippable": 0,
        "row_groups_total": 0,
        "row_groups_skippable": 0,
        "rows_total": 0,
        "rows_skippable": 0,
    }
    # recursive: a partitioned layout (the lake writer's own date/version
    # partitioning) nests its parquet files under key=value dirs — a
    # flat glob would silently return files_total=0 there (ADVICE r9)
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    if not files:
        raise FileNotFoundError(
            f"pruning_stats: no parquet files under {path!r} — an empty "
            "walk would be indistinguishable from a measured 0% skip"
        )
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_all_skipped = md.num_row_groups > 0
        out["files_total"] += 1
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            out["row_groups_total"] += 1
            out["rows_total"] += rg.num_rows
            skip = False
            for col, (lo, hi) in ranges.items():
                st = rg.column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> must scan
                if float(st.max) < lo or float(st.min) > hi:
                    skip = True
                    break
            if skip:
                out["row_groups_skippable"] += 1
                out["rows_skippable"] += rg.num_rows
            else:
                file_all_skipped = False
        if file_all_skipped:
            out["files_skippable"] += 1
    out["row_skip_ratio"] = (
        round(out["rows_skippable"] / out["rows_total"], 4)
        if out["rows_total"]
        else None
    )
    return out
