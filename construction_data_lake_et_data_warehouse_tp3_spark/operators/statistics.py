"""Robust-statistics and longitudinal warehouse shapes (r5):

- winsorized per-group stats (percentile-disc clamp bounds, the robust
  twin of the plain AVG aggregates in aggregates.py),
- Benford first-digit audit (data-quality screen on monetary columns,
  complementing dq_audit_orders' rule checks with a distributional one),
- month-over-month revenue growth (LAG-based period-over-period deltas),
- SCD2 state history (type-2 slowly-changing-dimension build with
  change compaction — the warehouse-dimension counterpart of the MERGE
  upserts in warehouse/star.py, reference sync_to_mysql.py:61's
  overwrite-sync made history-preserving),
- inter-purchase gap histogram (repeat-purchase cadence),
- Pareto revenue-concentration deciles (80/20 readout),
- new-vs-returning daily revenue split (acquisition vs retention),
- ISO weekday seasonality profile (engine-pinned dow numbering),
- and the r5e-r5i layer: CUSUM change-point detection (scaled-integer
  S_t so the argmax is exact), per-month OLS trend + seasonal-naive
  forecast backtest (exact moment sums, closed-form doubles),
  leave-one-out target encoding, exact per-group percentiles
  (percentile_disc via cume_dist), a two-proportion A/B z-test over an
  md5 user split, and the same-customer duplicate-payment screen.

All integer fixed-point (cents / basis points) so every output hashes
identically against the DuckDB oracle; all single-shuffle plans that
survive a 100× scale-up (window partitions are group keys, never
global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

#: winsorization clamp quantiles (percentile_disc semantics: the
#: smallest value whose cume_dist reaches the quantile — exact and
#: tie-stable, unlike interpolating percentile_cont).
WINSOR_LO = 0.05
WINSOR_HI = 0.95

#: Benford expected first-digit shares in basis points:
#: round(log10(1 + 1/d) * 10000) for d = 1..9.  Literal on both engines
#: so no float log10 can diverge; the nine values sum to exactly 10000.
BENFORD_BP = (3010, 1761, 1249, 969, 792, 669, 580, 512, 458)


def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorized revenue stats: order values clamped to the
    group's [p05, p95] before averaging, so a handful of whale orders
    can't swing the mean.

    Plan: ONE shuffle on the group key.  cume_dist runs per row inside
    the (priority) window; the clamp bounds are unbounded window-MINs
    over the SAME partitioning (no second Exchange — Catalyst reuses the
    sort), and the final groupBy aggregates on the already-partitioned
    key.  At 100 TB the window partition is a priority bucket, never a
    global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    # a NULL order total is not a measurement: Spark ranks NULL keys
    # FIRST and DuckDB LAST, so an unfiltered NULL cents group shifts
    # every prefix rank on one engine only (the kmv NULL-key class,
    # found by the dirty-input parity sweep) - excluded on BOTH engines
    orders = orders.where(F.col("o_totalprice").isNotNull())
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    wcd = Window.partitionBy("o_orderpriority").orderBy("cents")
    wall = Window.partitionBy("o_orderpriority")
    lo = F.min(F.when(F.col("cd") >= WINSOR_LO, F.col("cents"))).over(wall)
    hi = F.min(F.when(F.col("cd") >= WINSOR_HI, F.col("cents"))).over(wall)
    clamped = (
        orders.select("o_orderpriority", cents.alias("cents"))
        .withColumn("cd", F.cume_dist().over(wcd))
        .withColumn("p05_cents", lo)
        .withColumn("p95_cents", hi)
        .withColumn(
            "wcents",
            F.least(F.greatest(F.col("cents"), F.col("p05_cents")), F.col("p95_cents")),
        )
    )
    return clamped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.min("p05_cents").alias("p05_cents"),
        F.min("p95_cents").alias("p95_cents"),
        F.sum("wcents").alias("winsorized_sum_cents"),
        F.expr("sum(wcents) DIV count(*)").alias("winsorized_avg_cents"),
    )


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals: observed vs expected first
    significant digit distribution, deviation in basis points.

    The first digit is taken from the decimal string of the BIGINT cents
    value (exact on both engines; prices ≥ 0.01 so cents ≥ 1 and the
    cents leading digit IS the price's first significant digit).  One
    9-group aggregation; the grand total rides a 9-row window, and the
    expected shares are a broadcast literal array — nothing global."""
    orders = load_table(spark, sf_dir, "orders")
    # cents < 1 (zero/negative totals) have no first significant digit;
    # filtering BEFORE element_at also keeps digit 0 from indexing the
    # expected array out of range (the short-input class of bug the
    # shingle generators guard against)
    digits = orders.where(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) >= 1")
    ).select(
        F.substring(
            F.expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("n_orders"))
    bp = ", ".join(str(b) for b in BENFORD_BP)
    return (
        counts.withColumn(
            # the OVER () total runs on the 9 post-agg rows, not the corpus
            "observed_bp", F.expr("(n_orders * 10000) DIV sum(n_orders) OVER ()")
        )
        .withColumn("expected_bp", F.expr(f"element_at(array({bp}), digit)"))
        .withColumn("deviation_bp", F.col("observed_bp") - F.col("expected_bp"))
        .select("digit", "n_orders", "observed_bp", "expected_bp", "deviation_bp")
    )


def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in basis points (LAG over the
    monthly rollup; the first month's growth is NULL).

    The window runs over ~80 post-aggregation month rows — a global
    ORDER BY on the *rollup*, not the fact table, so it stays O(months)
    no matter the corpus size.  Growth uses integer DIV (truncation
    toward zero on both engines) — no float division to drift."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias("revenue_cents"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_cents", F.lag("revenue_cents").over(w))
        .withColumn(
            # NULLIF: a zero-revenue month must yield NULL growth, not a
            # DuckDB division error / engine-divergent null
            "growth_bp",
            F.expr(
                "((revenue_cents - prev_cents) * 10000) DIV nullif(prev_cents, 0)"
            ),
        )
        .select("month", "revenue_cents", "prev_cents", "growth_bp")
    )


def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build over the event stream:
    each user's `event_type` is treated as a dimension attribute, and
    the history is compacted to one row per *state change* with
    [valid_from, valid_to) validity and an is_current flag — the
    history-preserving counterpart of the reference's overwrite sync
    (sync_to_mysql.py:61) and the MERGE upserts in warehouse/star.py.

    Plan: one shuffle on user_id; the change-detect LAG and the
    post-filter LEAD/ROW_NUMBER windows share the same (user_id)
    partitioning and (ts, event_id) sort, so Catalyst plans a single
    Exchange.  Tie-break on event_id makes duplicate-timestamp order
    deterministic (same discipline as session_window_stats)."""
    events = load_table(spark, sf_dir, "events")
    # an event with a NULL user or timestamp cannot join a per-user
    # ordered history: Spark orders NULL keys FIRST and DuckDB LAST, so
    # such rows produce different change rows per engine (dirty-input
    # parity sweep) - excluded identically on BOTH engines
    events = events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "ts", "event_id", F.col("event_type").alias("state"))
        .withColumn("prev_state", F.lag("state").over(w))
        .where(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")))
    )
    return (
        changes.withColumn("version", F.row_number().over(w).cast("bigint"))
        .withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "version",
            "state",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def order_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase-interval distribution: days between consecutive
    orders of the same customer, histogrammed — the repeat-purchase
    cadence behind churn models and replenishment forecasts.

    Plan: one shuffle on o_custkey for the LAG (orderdate, orderkey
    tie-break for same-day orders), then a tiny histogram aggregation
    over |distinct gaps| groups. No floats anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey")
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")
            ).alias("gap_days")
        )
    )
    return gaps.groupBy("gap_days").agg(F.count("*").alias("n_gaps"))


def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/80-20) curve: customers ranked into
    revenue deciles, each decile's share of total revenue in basis
    points — the "top 10% of customers drive X% of revenue" readout.

    The ntile window runs over the per-customer AGGREGATED frame (same
    contract as rfm_segments; at 10^9 customers swap for approx-quantile
    revenue cutoffs so no single-partition sort exists). Shares are
    integer cents → basis points via DIV; the grand total rides a 10-row
    window."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    deciled = per_cust.withColumn("decile", F.ntile(10).over(w))
    return (
        deciled.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
        )
        .withColumn(
            "share_bp",
            F.expr("(revenue_cents * 10000) DIV sum(revenue_cents) OVER ()"),
        )
    )


def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue split by NEW vs RETURNING customers (an order is
    "new" iff it lands on its customer's first order date) — the
    acquisition-vs-retention readout on every revenue dashboard.

    Plan: one o_custkey shuffle for the first-date window (min over the
    unbounded partition — no sort needed), then one day-grain
    aggregation. Cents stay integer end to end."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    flagged = (
        orders.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("day"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .withColumn("first_day", F.min("day").over(w))
        .withColumn("is_new", F.col("day") == F.col("first_day"))
    )
    return flagged.groupBy("day").agg(
        F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(0)).alias(
            "new_cents"
        ),
        F.sum(F.when(~F.col("is_new"), F.col("cents")).otherwise(0)).alias(
            "returning_cents"
        ),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new_orders"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("n_returning_orders"),
    )


def weekday_revenue_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: order count and revenue share per
    ISO weekday (1 = Monday … 7 = Sunday) in basis points.

    Spark's weekday() is 0-Monday-based and DuckDB's isodow is
    1-Monday-based — the +1 here pins both to the ISO convention
    explicitly (weekday-numbering drift across engines is a classic
    silent-corruption bug). One 7-group aggregation; shares ride a 7-row
    window."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(
        (F.weekday(F.col("o_orderdate").cast("date")) + 1).alias("dow_iso")
    ).agg(
        F.count("*").alias("n_orders"),
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias(
            "revenue_cents"
        ),
    )
    return g.withColumn(
        "share_bp", F.expr("(revenue_cents * 10000) DIV sum(revenue_cents) OVER ()")
    )


#: skyline phase-1 pruning buckets (any partitioning works — dominance
#: within a subset implies global dominance — so a plain modulus is fine
#: and deterministic).
SKYLINE_BUCKETS = 32


def pareto_front_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-front query: the MAX-revenue / MIN-order-count
    frontier ("whales who need few orders to get there") — q dominates
    p iff q.revenue ≥ p.revenue, q.n_orders ≤ p.n_orders, strictly
    better on at least one. The classic multi-criteria OLAP operator
    (Börzsönyi et al., "The Skyline Operator", ICDE 2001) the
    relational surface lacks as a primitive; the measures are chosen
    anti-correlated so the frontier is non-degenerate (a max/max
    skyline over correlated measures collapses to the single top
    whale).

    Two-phase shape that survives 10^9 customers: phase 1 prunes inside
    SKYLINE_BUCKETS salt partitions (dominance within ANY subset implies
    global dominance, so local losers can be dropped before anything
    global happens; random-partition skyline survivors are tiny in
    expectation). Phase 2 repeats the same two windows globally over the
    SURVIVORS ONLY — the single-partition sort touches the pruned
    remnant, never the corpus. Dominance tests are pure window minima:
    min(n) over strictly-higher revenue (RANGE 1 cent .. ∞) catches
    cross-revenue dominance, min(n) per equal-revenue group catches
    in-group dominance; duplicate (rev, n) points tie both tests and
    correctly co-survive. All integers; no float anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias(
            "revenue_cents"
        ),
        F.count("*").alias("n_orders"),
    )

    def survivors(df: DataFrame, *bucket_cols: str) -> DataFrame:
        w_hi = (
            Window.partitionBy(*bucket_cols)
            .orderBy("revenue_cents")
            .rangeBetween(1, Window.unboundedFollowing)
            if bucket_cols
            else Window.orderBy("revenue_cents").rangeBetween(
                1, Window.unboundedFollowing
            )
        )
        w_same = Window.partitionBy(*bucket_cols, "revenue_cents")
        dominated = (
            F.coalesce(
                F.min("n_orders").over(w_hi) <= F.col("n_orders"), F.lit(False)
            )
        ) | (F.min("n_orders").over(w_same) < F.col("n_orders"))
        return df.withColumn("__dom", dominated).where(~F.col("__dom")).drop("__dom")

    phase1 = survivors(
        pc.withColumn(
            "bucket", F.pmod(F.col("o_custkey"), F.lit(SKYLINE_BUCKETS))
        ),
        "bucket",
    ).drop("bucket")
    return survivors(phase1)


def purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per customer, the longest run of CONSECUTIVE
    purchase days (distinct order dates one day apart), plus active-day
    and streak counts — the streak feature behind habit/engagement
    scoring.

    ONE customer-key shuffle total: collect_set gathers each customer's
    distinct days (map-side-combinable), sort_array pins the order, and
    a sequential aggregate() fold walks the sorted run — per-customer
    state is bounded by that customer's active days (≤ corpus span in
    days, a few thousand), never by order count. The chained
    window/groupBy island form costs 3-4 shuffles for the same answer;
    the ORACLE keeps the textbook island algorithm (day_number −
    row_number is constant within a run) so the fold is cross-checked
    against an independent derivation every round."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "sort_array(collect_set(CAST(o_orderdate AS DATE)))"
        ).alias("days")
    )
    fold = (
        "aggregate(days,"
        " named_struct('prev', CAST(NULL AS DATE), 'run', CAST(0 AS BIGINT),"
        "              'best', CAST(0 AS BIGINT), 'streaks', CAST(0 AS BIGINT)),"
        " (a, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(a.prev IS NOT NULL AND datediff(x, a.prev) = 1,"
        "             a.run + 1, CAST(1 AS BIGINT)),"
        "   'best', GREATEST(a.best,"
        "             IF(a.prev IS NOT NULL AND datediff(x, a.prev) = 1,"
        "                a.run + 1, CAST(1 AS BIGINT))),"
        "   'streaks', a.streaks + IF(a.prev IS NULL OR datediff(x, a.prev) > 1,"
        "                             CAST(1 AS BIGINT), CAST(0 AS BIGINT))),"
        " a -> named_struct('best', a.best, 'streaks', a.streaks))"
    )
    return per_cust.select(
        "o_custkey",
        F.expr("CAST(size(days) AS BIGINT)").alias("n_active_days"),
        F.expr(f"{fold}.streaks").alias("n_streaks"),
        F.expr(f"{fold}.best").alias("longest_streak_days"),
    )


def quantity_discount_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag Pearson correlation of line quantity vs discount,
    computed from EXACT integer moment sums (quantity is integral;
    discount → basis points), so the only float math is the final
    closed-form — identical IEEE expression tree on both engines, hence
    hash-exact without any rounding call.

    The moment sums are one map-side-combinable aggregation (3 groups);
    nothing is collected. BIGINT headroom: n·Σxy peaks ≈ 2×10^18 at
    sf1 — beyond that promote the moment sums to DECIMAL(38,0) (Spark)
    / HUGEINT (DuckDB); the closed-form is unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(l_quantity AS BIGINT)").alias("x"),
        F.expr("CAST(round(l_discount * 10000) AS BIGINT)").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("x").alias("sum_qty"),
        F.sum("y").alias("sum_disc_bp"),
        F.sum(F.expr("x * y")).alias("sum_xy"),
        F.sum(F.expr("x * x")).alias("sum_x2"),
        F.sum(F.expr("y * y")).alias("sum_y2"),
    )
    return m.withColumn(
        "corr_qty_discount",
        F.expr(
            "CAST(n_rows * sum_xy - sum_qty * sum_disc_bp AS DOUBLE)"
            " / (sqrt(CAST(n_rows * sum_x2 - sum_qty * sum_qty AS DOUBLE))"
            "    * sqrt(CAST(n_rows * sum_y2 - sum_disc_bp * sum_disc_bp"
            "            AS DOUBLE)))"
        ),
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily revenue series: the
    cumulative sum of deviations from the global mean peaks (in absolute
    value) at the most likely level-shift point (Page 1954's offline
    form).  S_t = Σ_{i≤t}(x_i − x̄) is kept EXACT by scaling with n:
    n·S_t = n·prefix_t − t·total — pure BIGINT, no mean division ever
    happens, so the argmax and every emitted value hash-match.

    Plan: one shuffle to the daily rollup, then every window
    (row_number, prefix sum, grand totals, the argmax pick) runs over
    the ~90-row aggregated frame — a single-partition window over
    O(days) rows no matter the corpus size, the resample_daily_revenue
    contract.  BIGINT headroom: n·prefix ≤ days²·daily_cents ≈ 10^17 at
    sf1000; beyond that promote to DECIMAL(38,0)/HUGEINT."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias(
            "revenue_cents"
        )
    )
    w_ord = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    flagged = (
        daily.withColumn("t", F.row_number().over(Window.orderBy("day")))
        .withColumn("prefix", F.sum("revenue_cents").over(w_ord))
        .withColumn("n_days", F.count("*").over(w_all))
        .withColumn("total", F.sum("revenue_cents").over(w_all))
        .withColumn("cusum_scaled", F.expr("n_days * prefix - t * total"))
        .withColumn("max_abs", F.max(F.abs(F.col("cusum_scaled"))).over(w_all))
        .withColumn(
            "cp_day",
            F.min(
                F.expr("CASE WHEN abs(cusum_scaled) = max_abs THEN day END")
            ).over(w_all),
        )
    )
    return flagged.select(
        "day",
        "revenue_cents",
        "cusum_scaled",
        F.expr("day = cp_day").alias("is_changepoint"),
    )


def revenue_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month OLS trend of daily revenue vs day-of-month: slope and
    intercept from EXACT integer moment sums (the
    quantity_discount_corr discipline) — the closed forms are the only
    float math, written as identical IEEE expression trees on both
    engines, so the doubles hash bit-for-bit with no rounding call.

    Plan: one shuffle to the (month, day) rollup, then ONE map-side-
    combinable moment aggregation per month (5 BIGINT sums over ≤31
    rows/group).  A 1-day month has zero x-variance — slope NULL via
    nullif, not an engine-divergent division error."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.expr("CAST(day(o_orderdate) AS BIGINT)").alias("x"),
    ).agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias("y")
    )
    m = daily.groupBy("month").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    return (
        m.withColumn(
            "slope_cents_per_day",
            F.expr(
                "CAST(n_days * sxy - sx * sy AS DOUBLE)"
                " / CAST(nullif(n_days * sxx - sx * sx, 0) AS DOUBLE)"
            ),
        )
        .withColumn(
            "intercept_cents",
            F.expr(
                "(CAST(sy AS DOUBLE) - slope_cents_per_day * CAST(sx AS DOUBLE))"
                " / CAST(n_days AS DOUBLE)"
            ),
        )
        .select("month", "n_days", "slope_cents_per_day", "intercept_cents")
    )


def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value — the ML feature-engineering primitive that replaces a
    categorical with the mean target of its OTHER members, so a row
    never leaks its own label into its feature:
    enc_i = (Σ_group cents − cents_i) DIV (n_group − 1).

    All integer (cents, truncating DIV); a singleton group has no other
    members — enc NULL via nullif, not a division error.

    Plan: ONE exchange on the category key; the group sum and count are
    unbounded window aggregates over that partition (no ORDER BY, so no
    sort — just the hash exchange), and the encoding is a map-side
    expression on each row.  At 100 TB a skewed category is the
    classic salting case (functions/skew.py); cardinality here is 5."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    rows = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        rows.withColumn("grp_cents", F.sum("cents").over(w))
        .withColumn("n_group", F.count("*").over(w))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "cents",
            F.expr(
                "(grp_cents - cents) DIV nullif(n_group - 1, 0)"
            ).alias("loo_enc_cents"),
        )
    )


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue as
    the SAME WEEKDAY LAST WEEK's revenue (lag 7 over the daily rollup)
    and score the absolute error — the baseline every fancier forecast
    must beat, plus per-day residuals for the error budget.

    All integer cents; mae_cents is the truncating-DIV mean over the
    scored days, carried on every row via a window over the O(days)
    frame.  Days 1-7 have no prior week — pred NULL, excluded from MAE.
    One shuffle to the daily rollup; everything after is O(days)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias(
            "revenue_cents"
        )
    )
    w = Window.orderBy("day")
    w_all = Window.partitionBy()
    return (
        daily.withColumn("pred_cents", F.lag("revenue_cents", 7).over(w))
        .withColumn("abs_err_cents", F.expr("abs(revenue_cents - pred_cents)"))
        .withColumn("sum_err", F.sum("abs_err_cents").over(w_all))
        .withColumn("n_scored", F.count("abs_err_cents").over(w_all))
        .select(
            "day",
            "revenue_cents",
            "pred_cents",
            "abs_err_cents",
            F.expr("sum_err DIV n_scored").alias("mae_cents"),
        )
    )


def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic md5 user split: users
    land in arm A/B by hash coin, "converted" means ≥1 purchase event,
    and the pooled-variance z-score decides whether the arms differ —
    the experimentation primitive (here an A/A test by construction, so
    the expected z is near 0; at deploy time the arm column comes from
    the assignment service and everything downstream is unchanged).

    Shape: one user_id aggregation to per-user flags, one 2-group
    rollup, then the closed form on a single row.  Every input to the
    float math is an exact BIGINT count and the expression tree is
    written once for both engines, so even the z-score hashes."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.expr(
            "max(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END)"
        ).alias("converted")
    )
    arms = per_user.select(
        F.expr(
            "pmod(CAST(conv(substr(md5('ab:' || CAST(user_id AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT), 2)"
        ).alias("arm"),
        "converted",
    )
    g = arms.groupBy().agg(
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_a"),
        F.expr("CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_b"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)"
        ).alias("conv_a"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)"
        ).alias("conv_b"),
    )
    return g.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr("(conv_a * 10000) DIV nullif(n_a, 0)").alias("rate_a_bp"),
        F.expr("(conv_b * 10000) DIV nullif(n_b, 0)").alias("rate_b_bp"),
        F.expr(
            "(conv_a * 10000) DIV nullif(n_a, 0)"
            " - (conv_b * 10000) DIV nullif(n_b, 0)"
        ).alias("lift_bp"),
        F.expr(
            "(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
            " - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
            " / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
            " * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
            " * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0)"
        ).alias("z_score"),
    )


#: the z closed form shared verbatim by both engines: doubled-rank
#: arithmetic keeps every input to the float math an exact BIGINT
#: (u2 = 2U so no halves exist), tie correction per the standard
#: normal approximation.
_MW_Z = (
    "CAST(ra2 - n_a * (n_a + 1) - n_a * (n - n_a) AS DOUBLE)"
    " / nullif(2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n - n_a AS DOUBLE)"
    " / 12.0 * (CAST(n + 1 AS DOUBLE)"
    " - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))),"
    " 0.0)"
)


def ab_test_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test on order values across a deterministic md5
    customer split — the NONPARAMETRIC complement of ab_test_zscore:
    revenue distributions are heavy-tailed, so the rank test is what an
    experimentation platform actually runs on order-value metrics (a
    mean test is whale-dominated). A/A by construction, so E[z] ≈ 0.

    Exactness: ranks never materialize per row — doubled average tie
    ranks fold from the value-level frame (r2 = 2·prefix − t + 1 for a
    tie group of size t ending at cumulative count prefix), so U, the
    tie term Σ(t³−t), and every z input are exact BIGINTs; z is one
    closed form evaluated identically by both engines.

    Plan: one cents-level aggregation (the only corpus-sized shuffle),
    a prefix window over the DISTINCT-VALUE frame (bounded by the value
    domain, the revenue_gini discipline — never a per-row global sort),
    one final row. Headroom: ra2 ≤ 2n² — promote to DECIMAL(38,0) past
    n ≈ 2·10⁹ rows."""
    orders = load_table(spark, sf_dir, "orders")
    # a NULL order total is not a measurement: Spark ranks NULL keys
    # FIRST and DuckDB LAST, so an unfiltered NULL cents group shifts
    # every prefix rank on one engine only (the kmv NULL-key class,
    # found by the dirty-input parity sweep) - excluded on BOTH engines
    orders = orders.where(F.col("o_totalprice").isNotNull())
    vals = orders.select(
        F.expr(
            "pmod(CAST(conv(substr(md5('mw:' || CAST(o_custkey AS STRING)), 1, 6),"
            " 16, 10) AS BIGINT), 2)"
        ).alias("arm"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    by_val = vals.groupBy("cents").agg(
        F.count("*").alias("t"),
        F.expr("CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "ta"
        ),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = by_val.withColumn("prefix", F.sum("t").over(w)).withColumn(
        "r2", F.expr("2 * prefix - t + 1")
    )
    g = ranked.agg(
        F.expr("CAST(sum(t) AS BIGINT)").alias("n"),
        F.expr("CAST(sum(ta) AS BIGINT)").alias("n_a"),
        F.expr("CAST(sum(ta * r2) AS BIGINT)").alias("ra2"),
        F.expr("CAST(sum(t * t * t - t) AS BIGINT)").alias("tie3"),
    )
    return g.select(
        "n_a",
        F.expr("n - n_a").alias("n_b"),
        F.expr("ra2 - n_a * (n_a + 1)").alias("u2_a"),
        "tie3",
        F.expr(_MW_Z).alias("z_score"),
    )


#: the five TPC-H order priorities — FIXED group set, so the per-group
#: rank sums pivot into one row and the H closed form is written in one
#: fixed textual order (scalar IEEE ops, no multi-row float SUM whose
#: accumulation order could differ between engines).
_KW_GROUPS = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _kw_h() -> str:
    """Tie-corrected Kruskal-Wallis H over the pivoted doubled-rank
    sums: H = 3/(n(n+1)) · Σ r2g²/ng − 3(n+1), corrected by
    1 − Σ(t³−t)/(n³−n). (r2 = doubled ranks, so the usual 12 becomes 3.)"""
    # unoccupied groups contribute 0 (and must not divide by zero)
    ratio = " + ".join(
        f"CASE WHEN n_{i} = 0 THEN 0.0 ELSE"
        f" CAST(r2_{i} AS DOUBLE) * CAST(r2_{i} AS DOUBLE)"
        f" / CAST(n_{i} AS DOUBLE) END"
        for i in range(len(_KW_GROUPS))
    )
    h = (
        f"(3.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * ({ratio})"
        f" - 3.0 * CAST(n + 1 AS DOUBLE))"
    )
    # nullif: a single all-tied value makes the tie correction 0 (every
    # rank equal — H undefined), surface NULL, not a division error
    return (
        f"round({h} / nullif(1.0 - CAST(tie3 AS DOUBLE)"
        f" / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        f" - CAST(n AS DOUBLE)), 0.0), 6)"
    )


def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test: do order values differ ACROSS the five
    order priorities? — the k-group extension of ab_test_mannwhitney and
    the nonparametric ANOVA a heavy-tailed revenue metric needs.

    Same doubled-tie-average-rank discipline: every rank sum and the
    Σ(t³−t) tie term fold as exact BIGINTs from the distinct-cents frame
    (r2g ≤ 2n² — BIGINT-safe past 10⁹ rows); the per-group sums pivot
    into ONE row over the FIXED priority set so the H closed form is
    scalar float math in one textual order — hash-identical across
    engines, never a multi-row float SUM.

    Plan: one (cents, priority) aggregation, the prefix window on the
    distinct-cents frame (value-domain-bounded), one final row."""
    orders = load_table(spark, sf_dir, "orders")
    # a NULL order total is not a measurement: Spark ranks NULL keys
    # FIRST and DuckDB LAST, so an unfiltered NULL cents group shifts
    # every prefix rank on one engine only (the kmv NULL-key class,
    # found by the dirty-input parity sweep) - excluded on BOTH engines
    orders = orders.where(F.col("o_totalprice").isNotNull())
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    by_vg = vals.groupBy("cents", "grp").agg(F.count("*").alias("tg"))
    by_v = by_vg.groupBy("cents").agg(
        F.expr("CAST(sum(tg) AS BIGINT)").alias("t")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ranked = by_v.withColumn("prefix", F.sum("t").over(w)).withColumn(
        "r2", F.expr("2 * prefix - t + 1")
    )
    joined = by_vg.join(ranked.select("cents", "r2", "t"), "cents")
    pivots = []
    for i, g in enumerate(_KW_GROUPS):
        pivots.append(
            F.expr(
                f"CAST(sum(CASE WHEN grp = '{g}' THEN tg * r2 ELSE 0 END)"
                f" AS BIGINT)"
            ).alias(f"r2_{i}")
        )
        pivots.append(
            F.expr(
                f"CAST(sum(CASE WHEN grp = '{g}' THEN tg ELSE 0 END) AS BIGINT)"
            ).alias(f"n_{i}")
        )
    one = joined.agg(
        F.expr("CAST(sum(tg) AS BIGINT)").alias("n"),
        *pivots,
    )
    tie = ranked.agg(
        F.expr("CAST(sum(t * t * t - t) AS BIGINT)").alias("tie3")
    )
    return one.crossJoin(F.broadcast(tie)).select(
        "n",
        *[F.col(f"n_{i}").alias(f"n_{i}") for i in range(len(_KW_GROUPS))],
        "tie3",
        F.expr(_kw_h()).alias("h_corrected"),
    )


#: ACF lags computed (the weekly-seasonality diagnostic window).
ACF_MAX_LAG = 7


def revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at lags 1..ACF_MAX_LAG — the
    time-series diagnostic run before any forecasting model (lag-7 spike
    = weekly seasonality, confirming what seasonal_decomposition fits;
    slow decay = trend, what cusum_changepoint hunts).

    Exactness: the standard estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄)/Σ(x−x̄)²
    expands to integer moments — multiplying through by n² gives
    num_k = n²·Σx_t x_{t+k} − n·S·(head_k + tail_k) + (n−k)·S² and
    den = n²·ΣX² − n·S² — every term an exact DECIMAL(38,0) /HUGEINT
    product of BIGINT daily sums (≈3·10²⁶ at sf0.1, 38-digit-safe),
    so the single final division is the only float op and hashes.

    Plan: one orders aggregation to the O(days) daily frame; all 7 leads
    ride ONE window sort; moments are one aggregation row. Corpus scan
    once, everything after is day-count-sized."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr("CAST(o_orderdate AS DATE)").alias("day")
    ).agg(F.expr("CAST(round(sum(o_totalprice) * 100) AS BIGINT)").alias("x"))
    w = Window.orderBy("day")
    with_leads = daily.select(
        "x",
        *[
            F.lead("x", k).over(w).alias(f"x{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    d = "CAST({e} AS DECIMAL(38,0))"
    aggs = [
        F.expr("CAST(count(*) AS BIGINT)").alias("n"),
        F.expr(f"sum({d.format(e='x')})").alias("s"),
        F.expr(f"sum({d.format(e='x')} * x)").alias("ss"),
    ]
    for k in range(1, ACF_MAX_LAG + 1):
        aggs += [
            F.expr(
                f"sum(CASE WHEN x{k} IS NOT NULL THEN {d.format(e='x')} * x{k}"
                f" ELSE CAST(0 AS DECIMAL(38,0)) END)"
            ).alias(f"xx{k}"),
            F.expr(
                f"sum(CASE WHEN x{k} IS NOT NULL THEN {d.format(e='x')}"
                f" ELSE CAST(0 AS DECIMAL(38,0)) END)"
            ).alias(f"h{k}"),
            F.expr(
                f"sum(CASE WHEN x{k} IS NOT NULL THEN {d.format(e=f'x{k}')}"
                f" ELSE CAST(0 AS DECIMAL(38,0)) END)"
            ).alias(f"t{k}"),
        ]
    m = with_leads.agg(*aggs)
    # zero-variance guard: n <= 1 day or a constant series makes the
    # denominator exactly 0 (ACF undefined) -> NULL, not DIVIDE_BY_ZERO
    # under ANSI mode; same CASE in the oracle so the hash still locks.
    den = (
        "CAST(n AS DECIMAL(38,0)) * n * ss"
        " - CAST(n AS DECIMAL(38,0)) * s * s"
    )
    lag_rows = ", ".join(
        f"struct({k} AS lag, CASE WHEN {den} = 0 THEN CAST(NULL AS DOUBLE)"
        f" ELSE CAST(round("
        f"CAST(CAST(n AS DECIMAL(38,0)) * n * xx{k}"
        f" - CAST(n AS DECIMAL(38,0)) * s * (h{k} + t{k})"
        f" + CAST(n - {k} AS DECIMAL(38,0)) * s * s AS DOUBLE)"
        f" / CAST({den} AS DOUBLE)"
        f", 6) AS DOUBLE) END AS acf)"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return m.select(
        "n", F.explode(F.expr(f"array({lag_rows})")).alias("p")
    ).select(F.col("n").alias("n_days"), "p.lag", "p.acf")


def suspect_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: order pairs from the SAME customer
    within one day of each other whose amounts differ by at most 5% —
    the double-charge / replayed-webhook audit.  The tolerance is the
    INTEGER inequality 20·|Δcents| ≤ min(cents) (no float ratio to
    drift), so the pair set is engine-exact.

    One shuffle on the customer key; pair fan-out is bounded by each
    customer's own order count (never a corpus cross join), and the
    day/amount predicates apply inside the join.  A skewed mega-customer
    is the salting case (functions/skew.py)."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("day"),
    )
    a = keyed.select(
        "o_custkey",
        F.col("cents").alias("cents_a"),
        F.col("o_orderkey").alias("order_a"),
        F.col("day").alias("day_a"),
    )
    b = keyed.select(
        "o_custkey",
        F.col("cents").alias("cents_b"),
        F.col("o_orderkey").alias("order_b"),
        F.col("day").alias("day_b"),
    )
    return (
        a.join(b, "o_custkey")
        .where(F.col("order_a") < F.col("order_b"))
        .withColumn("gap_days", F.expr("abs(datediff(day_b, day_a))"))
        .where(F.col("gap_days") <= 1)
        .where(F.expr("abs(cents_a - cents_b) * 20 <= least(cents_a, cents_b)"))
        .select("o_custkey", "order_a", "order_b", "cents_a", "cents_b", "gap_days")
    )


def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per event type via
    percentile_disc semantics (smallest value whose cume_dist reaches
    the quantile — tie-stable, no interpolation to drift): the latency-
    profile shape of observability dashboards, on the winsorized-stats
    window plan (ONE exchange: cume_dist and the conditional unbounded
    MINs share the group partitioning)."""
    events = load_table(spark, sf_dir, "events")
    w_cd = Window.partitionBy("event_type").orderBy("cents")
    w_all = Window.partitionBy("event_type")
    cents = events.select(
        "event_type",
        F.expr("CAST(round(nanvl(value, CAST(NULL AS DOUBLE)) * 100) AS BIGINT)").alias("cents"),  # NaN -> NULL: non-measurement
    ).where(  # NULL cents must not enter the rank window (NULL-order split)
        F.col("cents").isNotNull()
    ).withColumn("cd", F.cume_dist().over(w_cd))
    picked = (
        cents.withColumn(
            "p50", F.min(F.when(F.col("cd") >= 0.5, F.col("cents"))).over(w_all)
        )
        .withColumn(
            "p90", F.min(F.when(F.col("cd") >= 0.9, F.col("cents"))).over(w_all)
        )
        .withColumn(
            "p99", F.min(F.when(F.col("cd") >= 0.99, F.col("cents"))).over(w_all)
        )
    )
    return picked.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("p50").alias("p50_cents"),
        F.min("p90").alias("p90_cents"),
        F.min("p99").alias("p99_cents"),
    )


def seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily revenue (STL-lite):
    trend = centered 7-day moving mean, seasonal = per-weekday mean of
    the detrended series, residual = the rest — the
    forecasting-diagnostics readout above seasonal_naive_backtest.

    Exactness: every component is integer cents via truncating DIV
    (verified: DuckDB BIGINT `//` truncates toward zero like Spark DIV,
    including on the NEGATIVE detrended values).  Edge days with an
    incomplete 7-day window get NULL trend (no fabricated average), and
    their rows drop out of the seasonal means by null-skipping sums.

    Plan: one shuffle to the daily rollup; the centered window, the
    weekday partition, and the residual arithmetic all ride the O(days)
    frame — corpus-size independent after the first aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias(
            "revenue_cents"
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    dec = (
        daily.withColumn("w_n", F.count("*").over(w7))
        .withColumn("w_sum", F.sum("revenue_cents").over(w7))
        .withColumn(
            "trend_cents",
            F.expr("CASE WHEN w_n = 7 THEN w_sum DIV 7 END"),
        )
        .withColumn("detrended", F.expr("revenue_cents - trend_cents"))
        .withColumn("dow_iso", F.expr("CAST(weekday(day) AS INT) + 1"))
    )
    w_dow = Window.partitionBy("dow_iso")
    return (
        dec.withColumn("sum_det", F.sum("detrended").over(w_dow))
        .withColumn("n_det", F.count("detrended").over(w_dow))
        .withColumn(
            "seasonal_cents", F.expr("sum_det DIV nullif(n_det, 0)")
        )
        .select(
            "day",
            "dow_iso",
            "revenue_cents",
            "trend_cents",
            "seasonal_cents",
            F.expr("revenue_cents - trend_cents - seasonal_cents").alias(
                "residual_cents"
            ),
        )
    )


def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the canonical scalar
    the pareto_revenue_share deciles approximate: with per-customer
    totals x_(1) ≤ … ≤ x_(n), G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx).
    Numerator and denominator are exact BIGINTs (rank from a
    deterministic (cents, custkey) order so ties can't wobble the sum);
    the single final division makes even the coefficient hash.

    Plan: one shuffle to the per-customer frame, then the rank window
    sorts THAT aggregated frame (O(customers), not O(orders)); at 10^9
    customers swap for the binned Lorenz-curve estimate
    (pareto_revenue_share's shape) — the formula's Σi·x headroom runs
    out near n·x ≈ 10^18 anyway."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))").alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    w_all = Window.partitionBy()
    ranked = (
        per_cust.withColumn("i", F.row_number().over(w))
        .withColumn("n", F.count("*").over(w_all))
        .withColumn("total", F.sum("cents").over(w_all))
        .withColumn("iw", F.expr("CAST(i AS BIGINT) * cents"))
    )
    return (
        ranked.groupBy("n", "total")
        .agg(F.sum("iw").alias("sum_iw"))
        .select(
            F.col("n").alias("n_customers"),
            F.col("total").alias("total_cents"),
            F.expr(
                "CAST(2 * sum_iw - (n + 1) * total AS DOUBLE)"
                " / CAST(n * total AS DOUBLE)"
            ).alias("gini"),
        )
    )


def daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of event value PER DAY (percentile_disc semantics)
    — the daily latency-percentile panel of observability dashboards,
    on the value_percentiles_by_type plan with the day as the window
    partition: one exchange, cume_dist + conditional unbounded MINs
    sharing it, groups of O(events-per-day)."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr("CAST(round(nanvl(value, CAST(NULL AS DOUBLE)) * 100) AS BIGINT)").alias("cents"),  # NaN -> NULL: non-measurement
    ).where(  # NULL cents must not enter the rank window (NULL-order split)
        F.col("cents").isNotNull()
    )
    w_cd = Window.partitionBy("day").orderBy("cents")
    w_all = Window.partitionBy("day")
    picked = (
        base.withColumn("cd", F.cume_dist().over(w_cd))
        .withColumn(
            "p50", F.min(F.when(F.col("cd") >= 0.5, F.col("cents"))).over(w_all)
        )
        .withColumn(
            "p90", F.min(F.when(F.col("cd") >= 0.9, F.col("cents"))).over(w_all)
        )
    )
    return picked.groupBy("day").agg(
        F.count("*").alias("n_events"),
        F.min("p50").alias("p50_cents"),
        F.min("p90").alias("p90_cents"),
    )


def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-density heatmap over (ISO weekday × hour) — the 7×24
    activity grid of usage dashboards, with each cell's share in basis
    points.  One 168-group aggregation; the share window rides the
    aggregated grid; weekday numbering pinned to DuckDB isodow
    (weekday()+1, the weekday_revenue_profile discipline)."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        F.expr("CAST(weekday(CAST(ts AS DATE)) AS INT) + 1").alias("dow_iso"),
        F.expr("CAST(hour(ts) AS INT)").alias("hour"),
    ).agg(F.count("*").alias("n_events"))
    return g.select(
        "dow_iso",
        "hour",
        "n_events",
        F.expr("(n_events * 10000) DIV sum(n_events) OVER ()").alias("share_bp"),
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value by acquisition cohort: customers grouped
    by FIRST-order month, revenue accumulated per month offset, divided
    by the cohort's size — the LTV curves that sit beside
    retention_cohorts' activity matrix (retention says who comes back;
    this says what they're worth).

    All integer: months as y·12+m indices (no interval arithmetic to
    diverge), cumulative cents as a window over the (cohorts × offsets)
    aggregated frame, LTV via truncating DIV.  Plan: one customer-key
    window for the cohort tag (the unbounded MIN rides the same
    exchange a groupBy would need), one (cohort, offset) aggregation,
    then O(cohorts·offsets) windows."""
    orders = load_table(spark, sf_dir, "orders")
    mi = "(year(o_orderdate) * 12 + month(o_orderdate))"
    w_cust = Window.partitionBy("o_custkey")
    tagged = orders.select(
        "o_custkey",
        F.expr(mi).alias("m_idx"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ).withColumn("cohort_idx", F.min("m_idx").over(w_cust))
    g = tagged.groupBy("cohort_idx", F.expr("m_idx - cohort_idx").alias("month_offset")).agg(
        F.expr("CAST(sum(cents) AS BIGINT)").alias("revenue_cents"),
        F.countDistinct("o_custkey").alias("n_active"),
    )
    # a cohort's size IS its offset-0 active count (every member's first
    # order lands at offset 0 by definition), so it rides a WINDOW over
    # the aggregated frame — a self-join on a filtered copy re-expanded
    # the whole corpus subtree (measured 2 scans / 5 exchanges → 1 / 3;
    # runtime ReuseExchange did NOT fire on the countDistinct expand)
    w_cohort = Window.partitionBy("cohort_idx")
    w_cum = Window.partitionBy("cohort_idx").orderBy("month_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        g.withColumn(
            "cohort_size",
            F.max(
                F.expr("CASE WHEN month_offset = 0 THEN n_active END")
            ).over(w_cohort),
        )
        .withColumn("cum_cents", F.sum("revenue_cents").over(w_cum))
        .select(
            "cohort_idx",
            "month_offset",
            "cohort_size",
            "n_active",
            "revenue_cents",
            "cum_cents",
            F.expr("cum_cents DIV cohort_size").alias("ltv_cents"),
        )
    )


QUERIES = {
    "weekday_revenue_profile": weekday_revenue_profile,
    "target_encoding_loo": target_encoding_loo,
    "cohort_ltv": cohort_ltv,
    "revenue_gini": revenue_gini,
    "daily_value_percentiles": daily_value_percentiles,
    "weekday_hour_heatmap": weekday_hour_heatmap,
    "seasonal_naive_backtest": seasonal_naive_backtest,
    "seasonal_decomposition": seasonal_decomposition,
    "ab_test_zscore": ab_test_zscore,
    "ab_test_mannwhitney": ab_test_mannwhitney,
    "kruskal_wallis_priority": kruskal_wallis_priority,
    "revenue_acf": revenue_acf,
    "suspect_duplicate_orders": suspect_duplicate_orders,
    "value_percentiles_by_type": value_percentiles_by_type,
    "new_vs_returning_revenue": new_vs_returning_revenue,
    "order_gap_histogram": order_gap_histogram,
    "pareto_revenue_share": pareto_revenue_share,
    "winsorized_order_stats": winsorized_order_stats,
    "benford_first_digit": benford_first_digit,
    "mom_revenue_growth": mom_revenue_growth,
    "scd2_user_state_history": scd2_user_state_history,
    "purchase_streaks": purchase_streaks,
    "quantity_discount_corr": quantity_discount_corr,
    "pareto_front_customers": pareto_front_customers,
    "cusum_changepoint": cusum_changepoint,
    "revenue_trend_slope": revenue_trend_slope,
}

_BENFORD_LIST = "[" + ", ".join(str(b) for b in BENFORD_BP) + "]"

ORACLE = {
    "weekday_revenue_profile": """
        WITH g AS (
            SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS dow_iso,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        )
        SELECT dow_iso, n_orders, revenue_cents,
               CAST((revenue_cents * 10000) // sum(revenue_cents) OVER ()
                    AS BIGINT) AS share_bp
        FROM g
    """,
    "new_vs_returning_revenue": """
        WITH f AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   CAST(o_orderdate AS DATE)
                       = min(CAST(o_orderdate AS DATE))
                         OVER (PARTITION BY o_custkey) AS is_new
            FROM orders
        )
        SELECT day,
               CAST(sum(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
                   AS new_cents,
               CAST(sum(CASE WHEN NOT is_new THEN cents ELSE 0 END) AS BIGINT)
                   AS returning_cents,
               CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new_orders,
               CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_returning_orders
        FROM f
        GROUP BY day
    """,
    "order_gap_histogram": """
        WITH seq AS (
            SELECT o_custkey, o_orderdate,
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey)
                       AS prev_date
            FROM orders
        )
        SELECT CAST(date_diff('day', CAST(prev_date AS DATE),
                              CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
               count(*) AS n_gaps
        FROM seq WHERE prev_date IS NOT NULL
        GROUP BY 1
    """,
    "pareto_revenue_share": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM orders GROUP BY 1
        ),
        d AS (
            SELECT cents,
                   CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC)
                        AS INT) AS decile
            FROM per_cust
        ),
        g AS (
            SELECT decile, count(*) AS n_customers,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents
            FROM d GROUP BY 1
        )
        SELECT decile, n_customers, revenue_cents,
               CAST((revenue_cents * 10000) // sum(revenue_cents) OVER ()
                    AS BIGINT) AS share_bp
        FROM g
    """,
    "winsorized_order_stats": f"""
        WITH c AS (
            SELECT o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice IS NOT NULL
        ),
        cd AS (
            SELECT o_orderpriority, cents,
                   cume_dist() OVER (PARTITION BY o_orderpriority
                                     ORDER BY cents) AS cd
            FROM c
        ),
        b AS (
            SELECT o_orderpriority, cents,
                   min(CASE WHEN cd >= {WINSOR_LO} THEN cents END)
                       OVER (PARTITION BY o_orderpriority) AS p05_cents,
                   min(CASE WHEN cd >= {WINSOR_HI} THEN cents END)
                       OVER (PARTITION BY o_orderpriority) AS p95_cents
            FROM cd
        )
        SELECT o_orderpriority,
               count(*) AS n_orders,
               min(p05_cents) AS p05_cents,
               min(p95_cents) AS p95_cents,
               CAST(sum(least(greatest(cents, p05_cents), p95_cents)) AS BIGINT)
                   AS winsorized_sum_cents,
               CAST(sum(least(greatest(cents, p05_cents), p95_cents))
                    // count(*) AS BIGINT) AS winsorized_avg_cents
        FROM b
        GROUP BY o_orderpriority
    """,
    "benford_first_digit": f"""
        WITH d AS (
            SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM orders
            WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1
        ),
        g AS (SELECT digit, count(*) AS n_orders FROM d GROUP BY digit)
        SELECT digit,
               n_orders,
               CAST((n_orders * 10000) // sum(n_orders) OVER () AS BIGINT)
                   AS observed_bp,
               CAST(list_extract({_BENFORD_LIST}, digit) AS INTEGER)
                   AS expected_bp,
               CAST((n_orders * 10000) // sum(n_orders) OVER ()
                    - list_extract({_BENFORD_LIST}, digit) AS BIGINT)
                   AS deviation_bp
        FROM g
    """,
    "mom_revenue_growth": """
        WITH m AS (
            SELECT date_trunc('month', o_orderdate)::DATE AS month,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders
            GROUP BY 1
        )
        SELECT month,
               revenue_cents,
               lag(revenue_cents) OVER (ORDER BY month) AS prev_cents,
               CAST(((revenue_cents - lag(revenue_cents) OVER (ORDER BY month))
                     * 10000) // nullif(lag(revenue_cents) OVER (ORDER BY month), 0)
                    AS BIGINT) AS growth_bp
        FROM m
    """,
    "scd2_user_state_history": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type AS state,
                   lag(event_type) OVER w AS prev_state
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, ts, event_id, state
            FROM flagged
            WHERE prev_state IS NULL OR prev_state <> state
        )
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS version,
               state,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "purchase_streaks": """
        WITH days AS (
            SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
            FROM orders
        ),
        islands AS (
            SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01', day)
                       - row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY day) AS island
            FROM days
        ),
        runs AS (
            SELECT o_custkey, island, count(*) AS run_days
            FROM islands GROUP BY o_custkey, island
        )
        SELECT o_custkey,
               CAST(sum(run_days) AS BIGINT) AS n_active_days,
               count(*) AS n_streaks,
               CAST(max(run_days) AS BIGINT) AS longest_streak_days
        FROM runs
        GROUP BY o_custkey
    """,
    "quantity_discount_corr": """
        WITH m AS (
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   CAST(sum(x) AS BIGINT) AS sum_qty,
                   CAST(sum(y) AS BIGINT) AS sum_disc_bp,
                   CAST(sum(x * y) AS BIGINT) AS sum_xy,
                   CAST(sum(x * x) AS BIGINT) AS sum_x2,
                   CAST(sum(y * y) AS BIGINT) AS sum_y2
            FROM (
                SELECT l_returnflag,
                       CAST(l_quantity AS BIGINT) AS x,
                       CAST(round(l_discount * 10000) AS BIGINT) AS y
                FROM lineitem
            )
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n_rows, sum_qty, sum_disc_bp, sum_xy, sum_x2,
               sum_y2,
               CAST(n_rows * sum_xy - sum_qty * sum_disc_bp AS DOUBLE)
                   / (sqrt(CAST(n_rows * sum_x2 - sum_qty * sum_qty AS DOUBLE))
                      * sqrt(CAST(n_rows * sum_y2 - sum_disc_bp * sum_disc_bp
                                  AS DOUBLE)))
                   AS corr_qty_discount
        FROM m
    """,
    # literal NOT-EXISTS dominance definition on purpose: the two-phase
    # window pruning is cross-checked against the textbook semantics.
    "pareto_front_customers": """
        WITH pc AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, revenue_cents, n_orders
        FROM pc p
        WHERE NOT EXISTS (
            SELECT 1 FROM pc q
            WHERE q.revenue_cents >= p.revenue_cents
              AND q.n_orders <= p.n_orders
              AND (q.revenue_cents > p.revenue_cents
                   OR q.n_orders < p.n_orders)
        )
    """,
    "revenue_acf": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS x
            FROM orders GROUP BY 1
        ),
        led AS (
            SELECT x,
                   lead(x, 1) OVER (ORDER BY day) AS x1,
                   lead(x, 2) OVER (ORDER BY day) AS x2,
                   lead(x, 3) OVER (ORDER BY day) AS x3,
                   lead(x, 4) OVER (ORDER BY day) AS x4,
                   lead(x, 5) OVER (ORDER BY day) AS x5,
                   lead(x, 6) OVER (ORDER BY day) AS x6,
                   lead(x, 7) OVER (ORDER BY day) AS x7
            FROM daily
        ),
        m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   sum(x::HUGEINT) AS s,
                   sum(x::HUGEINT * x) AS ss,
                   sum(CASE WHEN x1 IS NOT NULL THEN x::HUGEINT * x1 ELSE 0::HUGEINT END) AS xx1,
                   sum(CASE WHEN x1 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h1,
                   sum(CASE WHEN x1 IS NOT NULL THEN x1::HUGEINT ELSE 0::HUGEINT END) AS t1,
                   sum(CASE WHEN x2 IS NOT NULL THEN x::HUGEINT * x2 ELSE 0::HUGEINT END) AS xx2,
                   sum(CASE WHEN x2 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h2,
                   sum(CASE WHEN x2 IS NOT NULL THEN x2::HUGEINT ELSE 0::HUGEINT END) AS t2,
                   sum(CASE WHEN x3 IS NOT NULL THEN x::HUGEINT * x3 ELSE 0::HUGEINT END) AS xx3,
                   sum(CASE WHEN x3 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h3,
                   sum(CASE WHEN x3 IS NOT NULL THEN x3::HUGEINT ELSE 0::HUGEINT END) AS t3,
                   sum(CASE WHEN x4 IS NOT NULL THEN x::HUGEINT * x4 ELSE 0::HUGEINT END) AS xx4,
                   sum(CASE WHEN x4 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h4,
                   sum(CASE WHEN x4 IS NOT NULL THEN x4::HUGEINT ELSE 0::HUGEINT END) AS t4,
                   sum(CASE WHEN x5 IS NOT NULL THEN x::HUGEINT * x5 ELSE 0::HUGEINT END) AS xx5,
                   sum(CASE WHEN x5 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h5,
                   sum(CASE WHEN x5 IS NOT NULL THEN x5::HUGEINT ELSE 0::HUGEINT END) AS t5,
                   sum(CASE WHEN x6 IS NOT NULL THEN x::HUGEINT * x6 ELSE 0::HUGEINT END) AS xx6,
                   sum(CASE WHEN x6 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h6,
                   sum(CASE WHEN x6 IS NOT NULL THEN x6::HUGEINT ELSE 0::HUGEINT END) AS t6,
                   sum(CASE WHEN x7 IS NOT NULL THEN x::HUGEINT * x7 ELSE 0::HUGEINT END) AS xx7,
                   sum(CASE WHEN x7 IS NOT NULL THEN x::HUGEINT ELSE 0::HUGEINT END) AS h7,
                   sum(CASE WHEN x7 IS NOT NULL THEN x7::HUGEINT ELSE 0::HUGEINT END) AS t7
            FROM led
        )
        SELECT n AS n_days, 1 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx1 - n::HUGEINT * s * (h1 + t1)
                + (n - 1)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 2 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx2 - n::HUGEINT * s * (h2 + t2)
                + (n - 2)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 3 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx3 - n::HUGEINT * s * (h3 + t3)
                + (n - 3)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 4 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx4 - n::HUGEINT * s * (h4 + t4)
                + (n - 4)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 5 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx5 - n::HUGEINT * s * (h5 + t5)
                + (n - 5)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 6 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx6 - n::HUGEINT * s * (h6 + t6)
                + (n - 6)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m UNION ALL SELECT n AS n_days, 7 AS lag,
           CASE WHEN n::HUGEINT * n * ss - n::HUGEINT * s * s = 0 THEN NULL
                ELSE CAST(round(CAST(n::HUGEINT * n * xx7 - n::HUGEINT * s * (h7 + t7)
                + (n - 7)::HUGEINT * s * s AS DOUBLE)
           / CAST(n::HUGEINT * n * ss - n::HUGEINT * s * s AS DOUBLE), 6) AS DOUBLE) END AS acf
    FROM m
    """,
    "kruskal_wallis_priority": f"""
        WITH vals AS (
            SELECT o_orderpriority AS grp,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice IS NOT NULL
        ),
        by_vg AS (
            SELECT cents, grp, count(*) AS tg FROM vals GROUP BY 1, 2
        ),
        by_v AS (
            SELECT cents, CAST(sum(tg) AS BIGINT) AS t FROM by_vg GROUP BY 1
        ),
        ranked AS (
            SELECT cents, t,
                   2 * sum(t) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - t + 1 AS r2
            FROM by_v
        ),
        joined AS (
            SELECT v.cents, v.grp, v.tg, r.r2
            FROM by_vg v JOIN ranked r ON v.cents = r.cents
        ),
        one AS (
            SELECT CAST(sum(tg) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN grp = '1-URGENT' THEN tg * r2 ELSE 0 END) AS BIGINT) AS r2_0,
                   CAST(sum(CASE WHEN grp = '1-URGENT' THEN tg ELSE 0 END) AS BIGINT) AS n_0,
                   CAST(sum(CASE WHEN grp = '2-HIGH' THEN tg * r2 ELSE 0 END) AS BIGINT) AS r2_1,
                   CAST(sum(CASE WHEN grp = '2-HIGH' THEN tg ELSE 0 END) AS BIGINT) AS n_1,
                   CAST(sum(CASE WHEN grp = '3-MEDIUM' THEN tg * r2 ELSE 0 END) AS BIGINT) AS r2_2,
                   CAST(sum(CASE WHEN grp = '3-MEDIUM' THEN tg ELSE 0 END) AS BIGINT) AS n_2,
                   CAST(sum(CASE WHEN grp = '4-NOT SPECIFIED' THEN tg * r2 ELSE 0 END) AS BIGINT) AS r2_3,
                   CAST(sum(CASE WHEN grp = '4-NOT SPECIFIED' THEN tg ELSE 0 END) AS BIGINT) AS n_3,
                   CAST(sum(CASE WHEN grp = '5-LOW' THEN tg * r2 ELSE 0 END) AS BIGINT) AS r2_4,
                   CAST(sum(CASE WHEN grp = '5-LOW' THEN tg ELSE 0 END) AS BIGINT) AS n_4
            FROM joined
        ),
        tie AS (
            SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM ranked
        )
        SELECT n, n_0, n_1, n_2, n_3, n_4, tie3,
               {_kw_h()} AS h_corrected
        FROM one CROSS JOIN tie
    """,
    "ab_test_mannwhitney": f"""
        WITH vals AS (
            SELECT ('0x' || substr(md5('mw:' || CAST(o_custkey AS VARCHAR)),
                        1, 6))::BIGINT % 2 AS arm,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice IS NOT NULL
        ),
        by_val AS (
            SELECT cents, count(*) AS t,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ta
            FROM vals GROUP BY 1
        ),
        ranked AS (
            SELECT *,
                   sum(t) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prefix,
                   2 * sum(t) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - t + 1 AS r2
            FROM by_val
        ),
        g AS (
            SELECT CAST(sum(t) AS BIGINT) AS n,
                   CAST(sum(ta) AS BIGINT) AS n_a,
                   CAST(sum(ta * r2) AS BIGINT) AS ra2,
                   CAST(sum(t * t * t - t) AS BIGINT) AS tie3
            FROM ranked
        )
        SELECT n_a, n - n_a AS n_b,
               ra2 - n_a * (n_a + 1) AS u2_a, tie3,
               {_MW_Z} AS z_score
        FROM g
    """,
    "ab_test_zscore": """
        WITH per_user AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' AND value >= 100
                       THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY 1
        ),
        arms AS (
            SELECT ('0x' || substr(md5('ab:' || CAST(user_id AS VARCHAR)),
                        1, 6))::BIGINT % 2 AS arm,
                   converted
            FROM per_user
        ),
        g AS (
            SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
                       AS conv_a,
                   CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
                       AS conv_b
            FROM arms
        )
        SELECT n_a, n_b, conv_a, conv_b,
               CAST((conv_a * 10000) // nullif(n_a, 0) AS BIGINT) AS rate_a_bp,
               CAST((conv_b * 10000) // nullif(n_b, 0) AS BIGINT) AS rate_b_bp,
               CAST((conv_a * 10000) // nullif(n_a, 0)
                    - (conv_b * 10000) // nullif(n_b, 0) AS BIGINT) AS lift_bp,
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                 * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0)
                   AS z_score
        FROM g
    """,
    "suspect_duplicate_orders": """
        WITH keyed AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   o_orderkey,
                   CAST(o_orderdate AS DATE) AS day
            FROM orders
        )
        SELECT a.o_custkey,
               a.o_orderkey AS order_a, b.o_orderkey AS order_b,
               a.cents AS cents_a, b.cents AS cents_b,
               CAST(abs(date_diff('day', a.day, b.day)) AS INT) AS gap_days
        FROM keyed a
        JOIN keyed b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
        WHERE abs(date_diff('day', a.day, b.day)) <= 1
          AND abs(a.cents - b.cents) * 20 <= least(a.cents, b.cents)
    """,
    "value_percentiles_by_type": """
        WITH c AS (
            SELECT event_type,
                   CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100) AS BIGINT) AS cents
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
        ),
        cd AS (
            SELECT event_type, cents,
                   cume_dist() OVER (PARTITION BY event_type ORDER BY cents)
                       AS cd
            FROM c
        ),
        p AS (
            SELECT event_type, cents,
                   min(CASE WHEN cd >= 0.5 THEN cents END)
                       OVER (PARTITION BY event_type) AS p50,
                   min(CASE WHEN cd >= 0.9 THEN cents END)
                       OVER (PARTITION BY event_type) AS p90,
                   min(CASE WHEN cd >= 0.99 THEN cents END)
                       OVER (PARTITION BY event_type) AS p99
            FROM cd
        )
        SELECT event_type, count(*) AS n_events,
               min(p50) AS p50_cents, min(p90) AS p90_cents,
               min(p99) AS p99_cents
        FROM p GROUP BY 1
    """,
    "cohort_ltv": """
        WITH tagged AS (
            SELECT o_custkey,
                   year(o_orderdate) * 12 + month(o_orderdate) AS m_idx,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   min(year(o_orderdate) * 12 + month(o_orderdate))
                       OVER (PARTITION BY o_custkey) AS cohort_idx
            FROM orders
        ),
        g AS (
            SELECT cohort_idx, m_idx - cohort_idx AS month_offset,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents,
                   count(DISTINCT o_custkey) AS n_active
            FROM tagged GROUP BY 1, 2
        ),
        c AS (
            SELECT g.*,
                   max(CASE WHEN month_offset = 0 THEN n_active END)
                       OVER (PARTITION BY cohort_idx) AS cohort_size,
                   CAST(sum(revenue_cents) OVER (PARTITION BY cohort_idx
                        ORDER BY month_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_cents
            FROM g
        )
        SELECT cohort_idx, month_offset, cohort_size, n_active, revenue_cents,
               cum_cents, cum_cents // cohort_size AS ltv_cents
        FROM c
    """,
    "revenue_gini": """
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM orders GROUP BY 1
        ),
        r AS (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, o_custkey) AS i,
                   count(*) OVER () AS n,
                   CAST(sum(cents) OVER () AS BIGINT) AS total
            FROM per_cust
        ),
        g AS (
            SELECT n, total,
                   CAST(sum(CAST(i AS BIGINT) * cents) AS BIGINT) AS sum_iw
            FROM r GROUP BY 1, 2
        )
        SELECT n AS n_customers, total AS total_cents,
               CAST(2 * sum_iw - (n + 1) * total AS DOUBLE)
                   / CAST(n * total AS DOUBLE) AS gini
        FROM g
    """,
    "daily_value_percentiles": """
        WITH base AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100) AS BIGINT) AS cents
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value)
        ),
        cd AS (
            SELECT day, cents,
                   cume_dist() OVER (PARTITION BY day ORDER BY cents) AS cd
            FROM base
        ),
        p AS (
            SELECT day, cents,
                   min(CASE WHEN cd >= 0.5 THEN cents END)
                       OVER (PARTITION BY day) AS p50,
                   min(CASE WHEN cd >= 0.9 THEN cents END)
                       OVER (PARTITION BY day) AS p90
            FROM cd
        )
        SELECT day, count(*) AS n_events,
               min(p50) AS p50_cents, min(p90) AS p90_cents
        FROM p GROUP BY 1
    """,
    "weekday_hour_heatmap": """
        WITH g AS (
            SELECT CAST(isodow(CAST(ts AS DATE)) AS INT) AS dow_iso,
                   CAST(hour(ts) AS INT) AS hour,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT dow_iso, hour, n_events,
               CAST((n_events * 10000) // sum(n_events) OVER () AS BIGINT)
                   AS share_bp
        FROM g
    """,
    "seasonal_decomposition": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        ),
        t AS (
            SELECT day, revenue_cents,
                   count(*) OVER w7 AS w_n,
                   sum(revenue_cents) OVER w7 AS w_sum
            FROM daily
            WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        d AS (
            SELECT day, revenue_cents,
                   CASE WHEN w_n = 7
                        THEN CAST(w_sum AS BIGINT) // 7 END AS trend_cents,
                   CAST(isodow(day) AS INT) AS dow_iso
            FROM t
        ),
        de AS (
            SELECT *, revenue_cents - trend_cents AS detrended FROM d
        ),
        s AS (
            SELECT *,
                   CAST(sum(detrended) OVER (PARTITION BY dow_iso) AS BIGINT)
                       AS sum_det,
                   count(detrended) OVER (PARTITION BY dow_iso) AS n_det
            FROM de
        )
        SELECT day, dow_iso, revenue_cents, trend_cents,
               CAST(sum_det // nullif(n_det, 0) AS BIGINT) AS seasonal_cents,
               CAST(revenue_cents - trend_cents
                    - sum_det // nullif(n_det, 0) AS BIGINT) AS residual_cents
        FROM s
    """,
    "seasonal_naive_backtest": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        ),
        p AS (
            SELECT day, revenue_cents,
                   lag(revenue_cents, 7) OVER (ORDER BY day) AS pred_cents
            FROM daily
        ),
        e AS (
            SELECT *, abs(revenue_cents - pred_cents) AS abs_err_cents FROM p
        )
        SELECT day, revenue_cents, pred_cents, abs_err_cents,
               CAST(CAST(sum(abs_err_cents) OVER () AS BIGINT)
                    // count(abs_err_cents) OVER () AS BIGINT) AS mae_cents
        FROM e
    """,
    "target_encoding_loo": """
        WITH rows_ AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        g AS (
            SELECT *,
                   sum(cents) OVER (PARTITION BY o_orderpriority) AS grp_cents,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n_group
            FROM rows_
        )
        SELECT o_orderkey, o_orderpriority, cents,
               CAST((grp_cents - cents) // nullif(n_group - 1, 0) AS BIGINT)
                   AS loo_enc_cents
        FROM g
    """,
    "cusum_changepoint": """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        ),
        s AS (
            SELECT day, revenue_cents,
                   row_number() OVER (ORDER BY day) AS t,
                   sum(revenue_cents) OVER (ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS prefix,
                   count(*) OVER () AS n_days,
                   sum(revenue_cents) OVER () AS total
            FROM daily
        ),
        c AS (
            SELECT day, revenue_cents,
                   CAST(n_days * prefix - t * total AS BIGINT) AS cusum_scaled
            FROM s
        ),
        m1 AS (
            SELECT *, max(abs(cusum_scaled)) OVER () AS max_abs FROM c
        ),
        m2 AS (
            SELECT *,
                   min(CASE WHEN abs(cusum_scaled) = max_abs THEN day END)
                       OVER () AS cp_day
            FROM m1
        )
        SELECT day, revenue_cents, cusum_scaled,
               day = cp_day AS is_changepoint
        FROM m2
    """,
    "revenue_trend_slope": """
        WITH daily AS (
            SELECT date_trunc('month', o_orderdate)::DATE AS month,
                   CAST(date_part('day', o_orderdate) AS BIGINT) AS x,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS y
            FROM orders GROUP BY 1, 2
        ),
        m AS (
            SELECT month,
                   count(*) AS n_days,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM daily GROUP BY 1
        ),
        sl AS (
            SELECT *,
                   CAST(n_days * sxy - sx * sy AS DOUBLE)
                       / CAST(nullif(n_days * sxx - sx * sx, 0) AS DOUBLE)
                       AS slope_cents_per_day
            FROM m
        )
        SELECT month, n_days, slope_cents_per_day,
               (CAST(sy AS DOUBLE) - slope_cents_per_day * CAST(sx AS DOUBLE))
                   / CAST(n_days AS DOUBLE) AS intercept_cents
        FROM sl
    """,
}
