"""Scalar function library (SURVEY §2.8 rows 44-58).

Every function returns a Column built from JVM-side built-ins — no Python
UDFs — so expressions stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str, scale: int = 2) -> Column:
    """Round a money expression to 2dp (reference keeps binary doubles
    rounded to 2dp, /root/reference/kafka_producer.py:33 — SURVEY §7 risk 2
    says keep DOUBLE, don't 'improve' to DECIMAL in oracle-checked paths)."""
    return F.round(F.col(col) if isinstance(col, str) else col, scale)


# --- portable money aggregation -------------------------------------------
#
# SUM/AVG over doubles is order-dependent: Spark's partial aggregation and
# DuckDB's sequential scan produce last-ulp-different sums, and money data
# (2-3 real decimals) lands *exactly* on .xx5 rounding boundaries, so a
# plain round(sum(x), 2) flips cents between engines. Routing the partial
# sums through DECIMAL(18,4) makes the aggregation exact and
# order-independent; both engines then round the same decimal and cast to
# the same double. (Cast double→decimal ties can't occur: .00005 midpoints
# aren't representable in binary.)


# SUM/AVG of doubles is order-dependent, double→decimal casts and
# double rounding diverge between engines at decimal midpoints (Spark
# rounds the shortest decimal repr, DuckDB rounds in floating point), and
# DuckDB decimal division returns DOUBLE. So every rounded money aggregate
# is computed in 64-bit integer fixed point — identical in both engines by
# construction:
#   s = Σ round(x·10^in_scale)                    (exact BIGINT; round of
#       identical doubles matches — both round ties away from zero)
#   units = sign(s) · ((2|s| + D) div (2D)), D = n·10^(in_scale-scale)
#       (half-away-from-zero for either sign: the div operand is
#       non-negative, where Spark's truncating % and DuckDB's flooring //
#       agree — negative sums routed through raw div would diverge)
#   result = units / 10^scale                     (same double both sides)
# Valid while intermediate integers stay < 2^53 (≈ Σ|x| < 4.5e11 at 4dp
# ingestion) — far beyond any per-group money sum in this workload; raise
# in_scale handling if a deployment needs more headroom.

_IN_SCALE = {2: 10_000, 4: 1_000_000}


# NaN inputs are quarantined to NULL BEFORE the fixed-point cast: under
# ANSI, CAST(round(NaN * 100) AS BIGINT) aborts the whole job (and
# DuckDB's cast raises the same way), so one NaN measurement in a 100 TB
# corpus would fail every money aggregate that touches its partition.
# NaN -> NULL makes it an ignorable non-measurement on BOTH engines,
# the same contract as a NULL value. (Infinities are representable
# doubles and still abort the cast; they have never been observed in a
# money column and are left to the ingest-side DQ gate.)


def _nan_safe(c: Column) -> Column:
    return F.nanvl(c, F.lit(None).cast("double"))


def nan_safe_sql(expr: str) -> str:
    return f"(CASE WHEN isnan({expr}) THEN NULL ELSE {expr} END)"


def money_sum(col: Column | str, scale: int = 2) -> Column:
    c = _nan_safe(F.col(col) if isinstance(col, str) else col)
    mult = _IN_SCALE[scale if scale in _IN_SCALE else 2]
    outm = 10**scale
    dpu = mult // outm
    s = F.sum(F.round(c * mult).cast("bigint"))
    units = (F.abs(s) * 2 + dpu).cast("bigint")
    denom = F.lit(2 * dpu).cast("bigint")
    sign = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    q = ((units - units % denom) / denom).cast("bigint")
    return (sign * q).cast("double") / outm


def money_sum_sql(expr: str, scale: int = 2) -> str:
    mult = _IN_SCALE[scale if scale in _IN_SCALE else 2]
    outm = 10**scale
    dpu = mult // outm
    s = f"sum(CAST(round({nan_safe_sql(expr)} * {mult}) AS BIGINT))"
    return (
        f"CAST(CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END AS BIGINT)"
        f" * ((2 * abs({s}) + {dpu}) // (2 * {dpu})) AS DOUBLE) / {outm}"
    )


def money_avg(col: Column | str, scale: int = 2) -> Column:
    c = _nan_safe(F.col(col) if isinstance(col, str) else col)
    mult = _IN_SCALE[scale if scale in _IN_SCALE else 2]
    outm = 10**scale
    dpu = mult // outm
    s = F.sum(F.round(c * mult).cast("bigint"))
    n = F.count(F.lit(1))
    units = (F.abs(s) * 2 + n * dpu).cast("bigint")
    denom = (n * (2 * dpu)).cast("bigint")
    sign = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    q = ((units - units % denom) / denom).cast("bigint")
    return (sign * q).cast("double") / outm


def money_avg_sql(expr: str, scale: int = 2) -> str:
    mult = _IN_SCALE[scale if scale in _IN_SCALE else 2]
    outm = 10**scale
    dpu = mult // outm
    s = f"sum(CAST(round({nan_safe_sql(expr)} * {mult}) AS BIGINT))"
    return (
        f"CAST(CAST(CASE WHEN {s} < 0 THEN -1 ELSE 1 END AS BIGINT)"
        f" * ((2 * abs({s}) + count(*) * {dpu}) // (2 * count(*) * {dpu}))"
        f" AS DOUBLE) / {outm}"
    )


def ratio_avg(col: Column | str, scale: int = 4) -> Column:
    """Portable AVG for small ratios/rates (4dp output, 6dp fixed point)."""
    return money_avg(col, scale=scale)


def ratio_avg_sql(expr: str, scale: int = 4) -> str:
    return money_avg_sql(expr, scale=scale)


def money_round(col: Column | str, scale: int = 2) -> Column:
    """Portable double→2dp rounding (for MIN/MAX passthrough values):
    integer fixed point, same double on both engines."""
    c = _nan_safe(F.col(col) if isinstance(col, str) else col)
    m = 10**scale
    return F.round(c * m).cast("bigint").cast("double") / m


def money_round_sql(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"CAST(CAST(round({nan_safe_sql(expr)} * {m}) AS BIGINT) AS DOUBLE) / {m}"


def anonymize_user(user_id: Column | str) -> Column:
    """Pseudonymous user hash (`hash_user` on the anonymized stream,
    /root/reference/kafka_producer.py:48, data_lake_config.py:63-70).
    sha2-256 of the stringified id: deterministic, irreversible, and
    identical to DuckDB's sha256() for oracle checks."""
    col = F.col(user_id) if isinstance(user_id, str) else user_id
    return F.sha2(col.cast("string"), 256)


def amount_bucket(
    amount: Column | str,
    bounds: tuple[float, float, float] = (10.0, 50.0, 100.0),
    labels: tuple[str, str, str, str] = ("0-10", "10-50", "50-100", ">100"),
) -> Column:
    """CASE bucketing of an amount into histogram labels
    (`amount_bucket` ∈ {0-10,10-50,50-100,>100},
    /root/reference/kafka_producer.py:49 — SURVEY §2.4 #31)."""
    col = F.col(amount) if isinstance(amount, str) else amount
    lo, mid, hi = bounds
    return (
        F.when(col < lo, labels[0])
        .when(col < mid, labels[1])
        .when(col < hi, labels[2])
        .otherwise(labels[3])
    )


def exchange_rate_for_priority(priority: Column | str) -> Column:
    """Deterministic currency-rate lookup keyed on order priority — the
    testdata stand-in for the reference's per-row `exchange_rate`
    (/root/reference/sync_to_mysql.py:63-67, default 1.0 at :279)."""
    col = F.col(priority) if isinstance(priority, str) else priority
    return (
        F.when(col == "1-URGENT", F.lit(1.1))
        .when(col == "2-HIGH", F.lit(1.05))
        .when(col == "3-MEDIUM", F.lit(1.0))
        .when(col == "4-NOT SPECIFIED", F.lit(0.95))
        .otherwise(F.lit(0.9))
    )


def exchange_rate_sql(col: str = "o_orderpriority") -> str:
    """SQL fragment mirroring exchange_rate_for_priority for the DuckDB
    oracle. Explicit DOUBLE casts: DuckDB parses 1.1 as DECIMAL while Spark
    lit(1.1) is DOUBLE — the cast keeps both sides' arithmetic binary."""
    return (
        f"CAST(CASE {col} WHEN '1-URGENT' THEN 1.1 WHEN '2-HIGH' THEN 1.05 "
        f"WHEN '3-MEDIUM' THEN 1.0 WHEN '4-NOT SPECIFIED' THEN 0.95 "
        f"ELSE 0.9 END AS DOUBLE)"
    )


def derive_email(name: Column | str) -> Column:
    """Synthesize the `user_email` attribute the reference carries on dim_users
    (/root/reference/sync_to_mysql.py:42-46) from the customer name."""
    col = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lower(F.replace(col, F.lit("#"), F.lit("_"))), F.lit("@example.com"))
