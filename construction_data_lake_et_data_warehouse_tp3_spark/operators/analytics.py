"""Remaining relational surface plus the behavioral/statistical layer:
scalar subqueries, conditional aggregation, CUBE grouping sets,
string-function projection, hopping windows, hypertable rollup — and the
product-analytics shapes a warehouse team runs on top (r5): windowed
conversion funnel, weekly retention cohorts, RFM segmentation,
market-basket lift, chi-square contingency.

These round out the SQL shapes a warehouse user expects beyond the
reference's literal operator list (all Catalyst built-ins; no custom
execution)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import money_round, money_round_sql, money_sum, money_sum_sql
from ..sources.registry import load_table


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above 1.5× the global average value
    (decorrelated by Catalyst into a broadcast of the 1-row aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_row = orders.agg((F.avg("o_totalprice") * 1.5).alias("threshold"))
    return (
        orders.crossJoin(F.broadcast(avg_row))
        .where(F.col("o_totalprice") > F.col("threshold"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def order_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style): per priority, counts and
    revenue split by order status via sum(CASE WHEN …)."""
    orders = load_table(spark, sf_dir, "orders")

    def n(status: str):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    def rev(status: str):
        return money_sum(
            F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(0.0)
        )

    return orders.groupBy("o_orderpriority").agg(
        n("O").alias("n_open"),
        n("F").alias("n_fulfilled"),
        n("P").alias("n_pending"),
        rev("O").alias("rev_open"),
        rev("F").alias("rev_fulfilled"),
    )


def unpivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot→unpivot roundtrip: revenue pivoted wide by order status,
    then melted back to long form (DataFrame.unpivot / melt — the
    relational surface's missing inverse of pivot). The oracle computes
    the long form directly with GROUP BY — pivot∘unpivot must equal it
    exactly (null cells from absent combinations are dropped)."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["O", "F", "P"],
            variableColumnName="o_orderstatus",
            valueColumnName="revenue",
        )
        .where(F.col("revenue").isNotNull())
    )


def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 1-hour windows every 30
    minutes over the event stream's batch view — each event lands in
    exactly 2 overlapping windows (F.window generator, map-side fan-out
    of 2× before one partial-aggregated shuffle). The oracle derives the
    same two hop starts arithmetically per event."""
    events = load_table(spark, sf_dir, "events")
    # a NULL-timestamp event lands in no window: DuckDB's arithmetic hop
    # derivation emits a NULL-window group where Spark's window() drops
    # the row (dirty-input parity sweep) - excluded on BOTH engines
    events = events.where(F.col("ts").isNotNull())
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice").alias("revenue"),
    )


def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface in one projection: case folding, trim/pad, substring
    arithmetic, replace, concatenation, length — all portable built-ins."""
    customer = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return customer.select(
        "c_custkey",
        F.upper(name).alias("upper_name"),
        F.lower(name).alias("lower_name"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.replace(name, F.lit("#"), F.lit("-")).alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat(F.lit("cust:"), name).alias("tagged"),
        F.reverse(name).alias("reversed"),
    )


def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup (SURVEY brief names
    'hypertable rollup' with as-of/range joins): events aggregated at
    hour grain, then ROLLUP collapses the hierarchy to (day, hour),
    (day), and grand-total rows in ONE pass — the batch equivalent of a
    TimescaleDB continuous aggregate with hourly + daily materializations.

    Scale shape: one shuffle on the grouping sets; partial aggregation
    runs map-side per set, and at 100 TB the day partition columns prune
    the scan to the refresh window."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    hour = F.hour("ts").alias("hour")
    rolled = (
        events.select(day, hour, "value")
        .rollup("day", "hour")
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
            F.grouping_id().alias("grain"),  # 0=hourly 1=daily 3=total
        )
    )
    # collapsed grouping levels surface as sentinels, not NULLs: mixed
    # NULL/value columns don't total-order for the cross-engine compare
    return rolled.select(
        F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
        F.coalesce("hour", F.lit(-1)).alias("hour"),
        "n_events",
        "total_value",
        "grain",
    )


def status_priority_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency analysis of order status × priority — the
    statistical-testing shape (observed vs expected under independence,
    per-cell χ² contribution). One corpus aggregation to the ~15 observed
    cells; marginals and the total derive from THAT frame (no re-scan)
    and broadcast back onto it.

    Exactness: counts are integers; expected = row·(col/N) keeps every
    op in the same order on both engines (and avoids the row·col int64
    overflow a 10^12-row corpus would hit); outputs carry NO rounding
    call, so the doubles are bit-identical.

    Marginals are WINDOW sums over the aggregated cell frame, not
    separate aggregations: deriving row/col/total as new aggregates of
    `obs` makes Spark re-expand the shared subtree into FOUR corpus
    scans (plan-locked at one); the windows run over ~|statuses×
    priorities| rows, where even the unpartitioned total is trivially
    single-partition-safe."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_obs")
    )
    j = (
        obs.withColumn(
            "row_total", F.sum("n_obs").over(Window.partitionBy("o_orderstatus"))
        )
        .withColumn(
            "col_total", F.sum("n_obs").over(Window.partitionBy("o_orderpriority"))
        )
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
    )
    expected = F.col("row_total") * (
        F.col("col_total").cast("double") / F.col("n_total")
    )
    chi = (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected
    return j.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_obs",
        expected.alias("expected"),
        chi.alias("chi2_cell"),
    )


def status_priority_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of order status × priority — the information-
    theoretic twin of status_priority_chisq (χ² asks "is there ANY
    dependence"; MI measures HOW MANY nats of one variable the other
    carries, the feature-selection score).

    Exactness discipline: per-cell pointwise MI rounds to integer
    micro-nats (ln once per cell, the lm_surprisal rule), the cell
    contribution n_ij·pmi is BIGINT, and the corpus total is an
    ORDER-FREE integer window sum — no float accumulation across cells
    to drift.  mi_nats = total/(N·10⁶) is the single final division.
    Same one-aggregation + tiny-window plan as the χ² query; the ln
    argument is written double-first ((n/N)·(N/r)·(N/c) regrouped as
    n·N/r/c) so 10^12-row marginal products can't overflow."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_obs")
    )
    j = (
        obs.withColumn(
            "row_total", F.sum("n_obs").over(Window.partitionBy("o_orderstatus"))
        )
        .withColumn(
            "col_total", F.sum("n_obs").over(Window.partitionBy("o_orderpriority"))
        )
        .withColumn("n_total", F.sum("n_obs").over(Window.partitionBy()))
        .withColumn(
            "pmi_micro",
            F.expr(
                "CAST(round(ln(CAST(n_obs AS DOUBLE) * n_total"
                " / row_total / col_total) * 1000000) AS BIGINT)"
            ),
        )
        .withColumn("contrib_micro", F.expr("n_obs * pmi_micro"))
        .withColumn(
            "total_contrib_micro",
            F.sum("contrib_micro").over(Window.partitionBy()),
        )
    )
    return j.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_obs",
        "pmi_micro",
        "contrib_micro",
        F.expr(
            "CAST(total_contrib_micro AS DOUBLE)"
            " / (CAST(n_total AS DOUBLE) * 1000000.0)"
        ).alias("mi_nats"),
    )


#: funnel stage sequence over the events table's event_type domain, and
#: the conversion window: each stage must land within FUNNEL_WINDOW_DAYS
#: of the previous one (an unwindowed funnel is degenerate on a dense
#: event stream — every long-lived user eventually does everything).
FUNNEL_STAGES = ("signup", "view", "purchase")
FUNNEL_WINDOW_DAYS = 3

#: per-user funnel fold over the time-sorted event array: stage k's
#: timestamp is the FIRST event of its type STRICTLY after stage k-1's
#: and within the window (ties excluded on both engines). One pass, no
#: per-stage re-scan.
_FUNNEL_FOLD = (
    "aggregate(evs,"
    " named_struct('t1', CAST(NULL AS TIMESTAMP), 't2', CAST(NULL AS TIMESTAMP),"
    "              't3', CAST(NULL AS TIMESTAMP)),"
    " (a, e) -> named_struct("
    f"   't1', IF(a.t1 IS NULL AND e.et = '{FUNNEL_STAGES[0]}', e.ts, a.t1),"
    f"   't2', IF(a.t2 IS NULL AND a.t1 IS NOT NULL AND e.ts > a.t1"
    f"            AND e.ts <= a.t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY"
    f"            AND e.et = '{FUNNEL_STAGES[1]}', e.ts, a.t2),"
    f"   't3', IF(a.t3 IS NULL AND a.t2 IS NOT NULL AND e.ts > a.t2"
    f"            AND e.ts <= a.t2 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY"
    f"            AND e.et = '{FUNNEL_STAGES[2]}', e.ts, a.t3)))"
)


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → view → purchase): how many
    users reach each stage IN ORDER, with the conversion rate vs stage 1.
    A user advances only on an event strictly after their previous
    stage's timestamp — the behavioral-analytics shape (Amplitude-style)
    the relational surface was missing.

    Plan: ONE shuffle (groupBy user collects the time-sorted event
    array), then the three stage timestamps come from a single sequential
    fold over that array — the naive form is one self-join per stage,
    each re-scanning events (the oracle keeps that form, so the fold is
    cross-checked every round). Conversion division is int/int → double,
    identical on both engines; no rounding call."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("event_type").isin(*FUNNEL_STAGES))
        .groupBy("user_id")
        .agg(
            F.expr(
                "sort_array(collect_list(struct(ts AS ts, event_type AS et)))"
            ).alias("evs")
        )
        .select(F.expr(_FUNNEL_FOLD).alias("f"))
    )
    counts = per_user.agg(
        F.count(F.col("f.t1")).alias("n1"),
        F.count(F.col("f.t2")).alias("n2"),
        F.count(F.col("f.t3")).alias("n3"),
    )
    stages = ", ".join(
        f"struct('{name}' AS stage, {i + 1} AS stage_idx, n{i + 1} AS n_users)"
        for i, name in enumerate(FUNNEL_STAGES)
    )
    return (
        counts.select(F.expr(f"explode(array({stages}))").alias("s"), "n1")
        .select(
            F.col("s.stage").alias("stage"),
            F.col("s.stage_idx").alias("stage_idx"),
            F.col("s.n_users").alias("n_users"),
            (F.col("s.n_users") / F.col("n1")).alias("conversion"),
        )
    )


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution rollup: every event's monetized value
    credited to the PRIORITY CLASS of the user's most recent order at or
    before the event date (events with no prior order fall to '(none)'),
    aggregated per class — the as-of join *with a measure rollup on
    top*, vs asof_latest_order's per-row output. (Direction matters on
    this corpus: orders span 1995-2001, events 2024, so every event has
    a full order history behind it.)

    Scale shape: reuses asof_latest_order's union+window form
    (temporal.py) — orders and events tagged and unioned, ONE shuffle on
    user_id, a sorted last(ignorenulls) carry — so per-key state is O(1)
    and the row count stays |events|+|orders| throughout; the naive form
    (user-equi-join then top-1) goes quadratic on hot users. Ordering
    (d, is_event, o_orderkey): orders sort before events on the same
    date (order_date <= event_date includes equality) and ascending
    o_orderkey makes the carried struct end at the max orderkey of the
    latest qualifying date — the oracle's ORDER BY d DESC, o_orderkey
    DESC LIMIT 1 in reverse. Event values sum as exact BIGINT cents."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.expr("CAST(round(nanvl(value, CAST(NULL AS DOUBLE)) * 100) AS BIGINT)").alias("value_cents"),  # NaN -> NULL: non-measurement
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.lit(0).alias("is_event"),
        "o_orderkey",
        "o_orderpriority",
        F.lit(None).cast("bigint").alias("value_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = orders.unionByName(events).withColumn(
        "last_order",
        F.last(
            F.when(F.col("is_event") == 0, F.struct("d", "o_orderkey", "o_orderpriority")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        carried.where(F.col("is_event") == 1)
        .groupBy(
            F.coalesce(F.col("last_order.o_orderpriority"), F.lit("(none)")).alias(
                "channel"
            )
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the funnel's longitudinal
    companion: users grouped by their FIRST-activity week, tracked by
    how many are active k weeks later, with the retention rate vs the
    cohort's size. The standard product-analytics heatmap input. (The
    events corpus spans one month, so a monthly grain would be a single
    degenerate cell — hence weeks.)

    Plan: dedupe to (user, week) first — ONE shuffle that also shrinks
    the frame to |users|×|weeks| — then the cohort week is a window min
    per user over that small frame and the matrix is one more
    aggregation; cohort sizes come from the offset-0 rows of the SAME
    frame (broadcast back), so events is scanned once. Rates are
    int/int → double with no rounding call."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    user_weeks = (
        events.select(
            "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
        )
        .distinct()
    )
    cohort = F.min("w").over(Window.partitionBy("user_id"))
    matrix = (
        user_weeks.withColumn("cohort_week", cohort)
        .withColumn(
            "week_offset",
            F.expr("CAST(datediff(w, cohort_week) DIV 7 AS INT)"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    # cohort size = the offset-0 row's count, fetched as a WINDOW over
    # the matrix frame — a separate filtered aggregate would re-expand
    # the whole events subtree into a second corpus scan (plan-locked)
    size_w = Window.partitionBy("cohort_week")
    cohort_size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(size_w)
    return matrix.select(
        "cohort_week",
        "week_offset",
        "n_active",
        (F.col("n_active") / cohort_size).alias("retention"),
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order, vs
    the corpus max date), frequency (order count), monetary (revenue) —
    each quartile-scored 1-4 with ntile. The classic CRM segmentation
    shape on the relational side.

    Determinism: ntile ordering carries the customer key as tiebreak, so
    bucket boundaries are identical on both engines. The three global
    ntile windows run over the ~|customers| aggregated rows in one
    partition — fine at warehouse cardinalities; at 10^9 customers swap
    ntile for approx-quantile cutoffs (the aggregation below is
    unchanged). Monetary uses fixed-point money_sum; recency is an
    integer date diff; no rounding anywhere else."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("frequency"),
        money_sum("o_totalprice").alias("monetary"),
    )
    # corpus max date as a window over the aggregated per-customer frame
    # (a separate agg + crossJoin re-expands the orders subtree into a
    # second corpus scan); the global window is no worse than the ntile
    # windows below, which are already global by the quartile contract
    maxd = F.max("last_order").over(Window.partitionBy())
    base = per_cust.select(
        "customer_id",
        F.datediff(maxd, F.col("last_order")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("customer_id"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("customer_id"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("customer_id"))
    return base.select(
        "customer_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
    )


#: basket-lift minimum pair support and result depth.
LIFT_MIN_SUPPORT = 2
LIFT_TOP_K = 50


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: for part pairs co-occurring in ≥
    LIFT_MIN_SUPPORT orders, lift = P(a,b) / (P(a)·P(b)) — computed as
    double(n_ab)·N / n_a / n_b (that exact op order on both engines:
    double-first avoids the n_ab·N int64 overflow a 10^12-order corpus
    would hit). Top-LIFT_TOP_K by lift with pair tiebreak.

    Plan: distinct (order, part) once; pair counts via the same
    self-join-on-order shape as the co-purchase graph (bounded by
    items-per-order); item counts and the order total derive from the
    SAME distinct frame; the support filter caps the rerank input."""
    from .graph import order_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # `op` feeds four consumers (both join sides, item counts, the order
    # total); the static plan re-expands it, but every copy ends in the
    # IDENTICAL distinct exchange, which Spark's exchange reuse dedupes
    # at runtime (same situation as ppjoin's ordered index — measured
    # faster than materializing)
    op, pairs = order_item_pairs(li)
    pair_n = (
        pairs.groupBy(
            F.col("src").alias("part_a"), F.col("dst").alias("part_b")
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= LIFT_MIN_SUPPORT)
    )
    item_n = op.groupBy(F.col("l_partkey")).agg(F.count("*").alias("n_item"))
    total = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    na = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double") * F.col("n_orders") / F.col("n_a") / F.col("n_b")
    )
    return (
        pair_n.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(total))
        .select("part_a", "part_b", "n_ab", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(LIFT_TOP_K)
    )


#: neighbors kept per item and the co-occurrence support floor.
ITEM_SIM_TOP_K = 5
ITEM_SIM_MIN_COOC = 3


def item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for each part, its top-k most
    similar parts by binary cosine over order baskets —
    sim(a,b) = n_ab / √(n_a·n_b) — the "customers also bought"
    recommender primitive (basket_lift's normalized cousin: lift finds
    ASSOCIATIONS, cosine ranks NEIGHBORS per item).

    Plan: the same distinct (order, part) self-join as basket_lift
    bounds pair expansion by items-per-order; the support floor caps
    the candidate frame BEFORE the per-item rank; both directions of
    each pair feed a window partitioned by the item (never global).
    The only float is the final closed form, identical on both
    engines, so the neighbor ranking hashes."""
    from .graph import order_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    op, pairs = order_item_pairs(li)
    pair_n = (
        pairs.groupBy(F.col("src").alias("part_a"), F.col("dst").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= ITEM_SIM_MIN_COOC)
    )
    item_n = op.groupBy(F.col("l_partkey")).agg(F.count("*").alias("n_item"))
    na = item_n.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    scored = (
        pair_n.join(na, "part_a")
        .join(nb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr(
                "CAST(n_ab AS DOUBLE) / sqrt(CAST(n_a * n_b AS DOUBLE))"
            ).alias("cosine"),
        )
    )
    both = scored.select(
        F.col("part_a").alias("item"), F.col("part_b").alias("neighbor"),
        "n_ab", "cosine",
    ).unionByName(
        scored.select(
            F.col("part_b").alias("item"), F.col("part_a").alias("neighbor"),
            "n_ab", "cosine",
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ITEM_SIM_TOP_K)
        .select("item", "neighbor", "n_ab", "cosine", "rank")
    )


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day ("stickiness", the DAU/MAU
    cousin sized to this corpus's one-month span) — the engagement ratio
    behind every growth dashboard.

    Trailing DISTINCT users can't ride a RANGE window (no windowed count
    distinct), and a day-spine range self-join fans out |user-days|×
    |days| — instead each (user, day) activity CONTRIBUTES itself to
    days d..d+6 map-side (a 7× explode) and WAU is a plain distinct
    count per contribution day. One dedupe shuffle + two distinct
    aggregations; the expansion factor is the window length, constant.
    Days beyond the last activity day are clipped so every output day is
    a real activity day; stickiness is int/int → double, no rounding."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    dau = user_days.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.expr("sequence(d, date_add(d, 6), interval 1 day)")
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")  # inner: only real activity days emit
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau") / F.col("wau")).alias("stickiness"),
        )
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the clickstream: for
    each (from_state → to_state) pair of consecutive events per user,
    the transition count and row-conditional probability in basis
    points — the navigation-flow summary behind "what do users do after
    X" dashboards (funnel's unordered cousin).

    Plan: one (user_id) shuffle for the LAG, one (from, to) aggregation,
    then the per-from row total rides a window over the ~|states|²
    aggregated frame (≤ 25 rows) — never a second corpus pass.  Integer
    DIV for the probability (truncation matches DuckDB `//`).  The
    (ts, event_id) tie-break keeps duplicate-timestamp transitions
    deterministic (same discipline as session_window_stats)."""
    events = load_table(spark, sf_dir, "events")
    # an event with a NULL user or timestamp cannot be sessionized /
    # sequenced: Spark orders NULL keys FIRST and DuckDB LAST, so such
    # rows silently produce different sessions per engine (dirty-input
    # parity sweep) - excluded identically on BOTH engines
    events = events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = F.expr(
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    )
    pairs = (
        events.select(w.alias("from_state"), F.col("event_type").alias("to_state"))
        .where(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n_transitions")
    )
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.expr(
            "(n_transitions * 10000) DIV sum(n_transitions)"
            " OVER (PARTITION BY from_state)"
        ).alias("probability_bp"),
    )


def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion-delay distribution: for every user,
    the gap between their FIRST signup and the first purchase AT OR
    AFTER it, bucketed by whole days — the activation-latency histogram
    a growth team reads next to event_funnel's reach counts.

    Plan: ONE user-keyed shuffle collects each user's (bounded) purchase
    timestamps and the min signup; the "first purchase ≥ signup" pick is
    a pure array filter on that row — no events self-join (the naive
    form joins events against events on user and re-shuffles the corpus
    twice; the oracle keeps an independent min-FILTER derivation). Epoch
    seconds via Spark's truncating long cast ≙ DuckDB epoch_us // 1e6
    (the timestamps carry microseconds, so round-vs-floor matters).
    Per-user collected state is the user's purchase count — bounded in
    practice; a pathological hot user degrades one row, not the stage."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr(
                    "CASE WHEN event_type = 'signup'"
                    " THEN CAST(CAST(ts AS TIMESTAMP) AS LONG) END"
                )
            ).alias("s"),
            F.expr(
                "sort_array(collect_list(CASE WHEN event_type = 'purchase'"
                " THEN CAST(CAST(ts AS TIMESTAMP) AS LONG) END))"
            ).alias("ps"),
        )
        .where(F.col("s").isNotNull())
        # try_element_at: a signup-only user has an EMPTY purchase array
        # and plain element_at throws under ANSI mode
        .select("s", F.expr("try_element_at(filter(ps, x -> x >= s), 1)").alias("p"))
        .where(F.col("p").isNotNull())
    )
    delays = per_user.select(F.expr("(p - s) DIV 3600").alias("delay_hours"))
    return delays.groupBy(
        F.expr("delay_hours DIV 24").alias("delay_days")
    ).agg(
        F.count("*").alias("n_users"),
        F.min("delay_hours").alias("min_hours"),
        F.max("delay_hours").alias("max_hours"),
    )


#: top-N most frequent 3-step paths emitted by event_path_trigrams.
PATH_TOP_N = 20


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent 3-step navigation paths: every run of three
    consecutive events per user (ordered by ts with the event_id
    tie-break), counted corpus-wide — the sequence-mining readout one
    order up from event_transition_matrix's pair counts.

    Plan: one (user_id) shuffle where BOTH lags ride the SAME window
    sort (one Sort, one Exchange), one (e1,e2,e3) aggregation with
    map-side partial combine, and the top-N compiles to
    TakeOrderedAndProject — no global sort.  Distinct path count is
    bounded by |states|³ (125 here), so the second shuffle is tiny at
    any corpus size."""
    events = load_table(spark, sf_dir, "events")
    lag1 = "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    lag2 = "lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    tri = (
        events.select(
            F.expr(lag2).alias("e1"),
            F.expr(lag1).alias("e2"),
            F.col("event_type").alias("e3"),
        )
        .where(F.col("e1").isNotNull())
    )
    counts = tri.groupBy("e1", "e2", "e3").agg(F.count("*").alias("n_paths"))
    return (
        counts.select(
            F.expr("e1 || '>' || e2 || '>' || e3").alias("path"), "n_paths"
        )
        .orderBy(F.desc("n_paths"), "path")
        .limit(PATH_TOP_N)
    )


def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by day — the growth curve "total users
    ever seen as of day d", computed WITHOUT a cumulative-distinct scan:
    each user contributes exactly once, on their FIRST active day, and
    the running total is a cumulative sum of those first-day counts.

    Plan: one user_id aggregation (min day per user), one tiny daily
    aggregation, then the cumulative sum rides a window over the O(days)
    frame.  The naive form (count(DISTINCT) over an expanding window)
    rescans the corpus per day; this shape is one pass.  Days with no
    NEW users don't emit a row (join against a calendar spine — the
    resample_daily_revenue trick — to densify when charting)."""
    events = load_table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.expr("CAST(min(ts) AS DATE)").alias("first_day")
    )
    daily = first_day.groupBy("first_day").agg(
        F.count("*").alias("n_new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("first_day").alias("day"),
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    )


def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per nation: each
    supplier's basis-point share of its nation's lineitem revenue,
    squared and summed — the market-concentration scalar (10000 bp)² =
    monopoly, ~(10000/k)²·k for k equal suppliers. The procurement-risk
    twin of revenue_gini (customer side): a nation whose supply is
    HHI-concentrated is one supplier outage away from a stockout.

    Exactness: revenue in cents, shares as truncating-DIV basis points,
    HHI = Σ share_bp² — pure BIGINT end to end. Plan: one lineitem
    aggregation keyed by supplier (the only corpus-sized shuffle), the
    supplier dim broadcasts, nation totals ride a window over the
    aggregated ~|suppliers| frame."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_sup = (
        li.groupBy("l_suppkey")
        .agg(
            F.expr(
                "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)"
                " AS BIGINT)"
            ).alias("cents")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name")
    shared = per_sup.select(
        "n_name",
        F.expr("cents").alias("cents"),
        F.sum("cents").over(w).alias("nation_cents"),
    ).select(
        "n_name",
        F.expr("cents * 10000 DIV nation_cents").alias("share_bp"),
    )
    return shared.groupBy("n_name").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_suppliers"),
        F.expr("CAST(sum(share_bp * share_bp) AS BIGINT)").alias("hhi_bp2"),
        F.expr("CAST(max(share_bp) AS BIGINT)").alias("top_share_bp"),
    )


QUERIES = {
    "supplier_hhi": supplier_hhi,
    "above_avg_orders": above_avg_orders,
    "event_path_trigrams": event_path_trigrams,
    "cumulative_unique_users": cumulative_unique_users,
    "time_to_conversion": time_to_conversion,
    "event_transition_matrix": event_transition_matrix,
    "dau_wau_stickiness": dau_wau_stickiness,
    "status_priority_chisq": status_priority_chisq,
    "event_funnel": event_funnel,
    "last_touch_attribution": last_touch_attribution,
    "retention_cohorts": retention_cohorts,
    "rfm_segments": rfm_segments,
    "basket_lift": basket_lift,
    "item_similarity_topk": item_similarity_topk,
    "status_priority_mi": status_priority_mi,
    "order_status_matrix": order_status_matrix,
    "unpivot_status_revenue": unpivot_status_revenue,
    "hopping_window_events": hopping_window_events,
    "cube_revenue": cube_revenue,
    "time_bucket_rollup": time_bucket_rollup,
    "string_functions_showcase": string_functions_showcase,
}

ORACLE = {
    "supplier_hhi": """
        WITH per_sup AS (
            SELECT l_suppkey,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY 1
        ),
        located AS (
            SELECT n.n_name, p.cents,
                   sum(p.cents) OVER (PARTITION BY n.n_name) AS nation_cents
            FROM per_sup p
            JOIN supplier s ON s.s_suppkey = p.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        ),
        shared AS (
            SELECT n_name, cents * 10000 // nation_cents AS share_bp
            FROM located
        )
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi_bp2,
               CAST(max(share_bp) AS BIGINT) AS top_share_bp
        FROM shared GROUP BY 1
    """,

    "cumulative_unique_users": """
        WITH fd AS (
            SELECT user_id, CAST(min(ts) AS DATE) AS first_day
            FROM events GROUP BY 1
        ),
        d AS (
            SELECT first_day, count(*) AS n_new_users FROM fd GROUP BY 1
        )
        SELECT first_day AS day, n_new_users,
               CAST(sum(n_new_users) OVER (ORDER BY first_day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        FROM d
    """,
    "event_path_trigrams": f"""
        WITH tri AS (
            SELECT lag(event_type, 2) OVER w AS e1,
                   lag(event_type, 1) OVER w AS e2,
                   event_type AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        g AS (
            SELECT e1, e2, e3, count(*) AS n_paths
            FROM tri WHERE e1 IS NOT NULL
            GROUP BY 1, 2, 3
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path, n_paths
        FROM g
        ORDER BY n_paths DESC, path
        LIMIT {PATH_TOP_N}
    """,
    # independent derivation: min-FILTER aggregates instead of the Spark
    # side's collected-array pick.
    "time_to_conversion": """
        WITH per AS (
            SELECT user_id,
                   min(CAST(epoch_us(ts) // 1000000 AS BIGINT))
                       FILTER (WHERE event_type = 'signup') AS s,
                   list_sort(list(CAST(epoch_us(ts) // 1000000 AS BIGINT))
                       FILTER (WHERE event_type = 'purchase')) AS ps
            FROM events
            WHERE event_type IN ('signup', 'purchase')
            GROUP BY 1
        ),
        conv AS (
            SELECT s, list_filter(ps, x -> x >= s)[1] AS p
            FROM per WHERE s IS NOT NULL
        ),
        d AS (
            SELECT (p - s) // 3600 AS delay_hours FROM conv WHERE p IS NOT NULL
        )
        SELECT delay_hours // 24 AS delay_days,
               count(*) AS n_users,
               min(delay_hours) AS min_hours,
               max(delay_hours) AS max_hours
        FROM d GROUP BY 1
    """,
    # naive per-order correlated top-1 on purpose: the union+window carry
    # is cross-checked against the literal "latest event ≤ order date"
    # definition every round.
    "last_touch_attribution": """
        WITH attributed AS (
            SELECT e.event_id,
                   CAST(round(CASE WHEN isnan(e.value) THEN NULL ELSE e.value END * 100) AS BIGINT) AS value_cents,
                   coalesce(
                       (SELECT o.o_orderpriority FROM orders o
                        WHERE o.o_custkey = e.user_id
                          AND CAST(o.o_orderdate AS DATE) <= CAST(e.ts AS DATE)
                        ORDER BY CAST(o.o_orderdate AS DATE) DESC,
                                 o.o_orderkey DESC
                        LIMIT 1),
                       '(none)') AS channel
            FROM events e
        )
        SELECT channel, count(*) AS n_events,
               CAST(sum(value_cents) AS BIGINT) AS value_cents
        FROM attributed
        GROUP BY channel
    """,
    "event_transition_matrix": """
        WITH seq AS (
            SELECT user_id, event_type AS to_state,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_state
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        counts AS (
            SELECT from_state, to_state, count(*) AS n_transitions
            FROM seq WHERE from_state IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_state, to_state, n_transitions,
               CAST((n_transitions * 10000)
                    // sum(n_transitions) OVER (PARTITION BY from_state)
                    AS BIGINT) AS probability_bp
        FROM counts
    """,
    # independent per-stage self-join form (the naive algorithm the fold
    # replaces): stage k = min event strictly after stage k-1
    "event_funnel": f"""
        WITH t1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
        ),
        t2 AS (
            SELECT e.user_id, min(ts) AS t2
            FROM events e JOIN t1 USING (user_id)
            WHERE event_type = '{FUNNEL_STAGES[1]}' AND ts > t1
              AND ts <= t1 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY GROUP BY 1
        ),
        t3 AS (
            SELECT e.user_id, min(ts) AS t3
            FROM events e JOIN t2 USING (user_id)
            WHERE event_type = '{FUNNEL_STAGES[2]}' AND ts > t2
              AND ts <= t2 + INTERVAL {FUNNEL_WINDOW_DAYS} DAY GROUP BY 1
        ),
        n AS (
            SELECT (SELECT count(*) FROM t1) AS n1,
                   (SELECT count(*) FROM t2) AS n2,
                   (SELECT count(*) FROM t3) AS n3
        )
        SELECT s.stage, s.stage_idx,
               CASE s.stage_idx WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END
                   AS n_users,
               CAST(CASE s.stage_idx WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END
                    AS DOUBLE) / n1 AS conversion
        FROM n, (VALUES ('{FUNNEL_STAGES[0]}', 1), ('{FUNNEL_STAGES[1]}', 2),
                        ('{FUNNEL_STAGES[2]}', 3)) AS s(stage, stage_idx)
    """,
    # WAU via the same contribution expansion (activity on d counts for
    # days d..d+6); inner join keeps only real activity days
    "dau_wau_stickiness": """
        WITH ud AS (
            SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d
            FROM events
        ),
        dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau
                FROM ud GROUP BY 1),
        contrib AS (
            SELECT user_id,
                   CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                        CAST(d + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM ud
        ),
        wau AS (SELECT day, count(DISTINCT user_id) AS wau
                FROM contrib GROUP BY 1)
        SELECT day, dau, wau,
               CAST(dau AS DOUBLE) / wau AS stickiness
        FROM dau JOIN wau USING (day)
    """,
    "rfm_segments": f"""
        WITH per_cust AS (
            SELECT o_custkey AS customer_id,
                   max(CAST(o_orderdate AS DATE)) AS last_order,
                   count(*) AS frequency,
                   {money_sum_sql('o_totalprice')} AS monetary
            FROM orders GROUP BY 1
        ),
        base AS (
            SELECT customer_id,
                   date_diff('day', last_order,
                             (SELECT max(last_order) FROM per_cust))
                       AS recency_days,
                   frequency, monetary
            FROM per_cust
        )
        SELECT customer_id, CAST(recency_days AS INT) AS recency_days,
               frequency, monetary,
               CAST(ntile(4) OVER (ORDER BY recency_days ASC, customer_id ASC)
                    AS INT) AS r_score,
               CAST(ntile(4) OVER (ORDER BY frequency DESC, customer_id ASC)
                    AS INT) AS f_score,
               CAST(ntile(4) OVER (ORDER BY monetary DESC, customer_id ASC)
                    AS INT) AS m_score
        FROM base
    """,
    "basket_lift": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pair_n AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_ab
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= {LIFT_MIN_SUPPORT}
        ),
        item_n AS (SELECT l_partkey, count(*) AS n_item FROM op GROUP BY 1),
        total AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op)
        SELECT part_a, part_b, n_ab,
               CAST(n_ab AS DOUBLE) * n_orders / na.n_item / nb.n_item AS lift
        FROM pair_n
        JOIN item_n na ON na.l_partkey = part_a
        JOIN item_n nb ON nb.l_partkey = part_b, total
        ORDER BY lift DESC, part_a ASC, part_b ASC
        LIMIT {LIFT_TOP_K}
    """,
    "status_priority_mi": """
        WITH obs AS (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_obs
            FROM orders GROUP BY 1, 2
        ),
        w AS (
            SELECT *,
                   sum(n_obs) OVER (PARTITION BY o_orderstatus) AS row_total,
                   sum(n_obs) OVER (PARTITION BY o_orderpriority) AS col_total,
                   sum(n_obs) OVER () AS n_total
            FROM obs
        ),
        p AS (
            SELECT *,
                   CAST(round(ln(CAST(n_obs AS DOUBLE) * n_total
                        / row_total / col_total) * 1000000) AS BIGINT)
                       AS pmi_micro
            FROM w
        ),
        c AS (SELECT *, n_obs * pmi_micro AS contrib_micro FROM p)
        SELECT o_orderstatus, o_orderpriority, n_obs, pmi_micro,
               CAST(contrib_micro AS BIGINT) AS contrib_micro,
               CAST(sum(contrib_micro) OVER () AS DOUBLE)
                   / (CAST(n_total AS DOUBLE) * 1000000.0) AS mi_nats
        FROM c
    """,
    "item_similarity_topk": f"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pair_n AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_ab
            FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                               AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= {ITEM_SIM_MIN_COOC}
        ),
        item_n AS (SELECT l_partkey, count(*) AS n_item FROM op GROUP BY 1),
        scored AS (
            SELECT part_a, part_b, n_ab,
                   CAST(n_ab AS DOUBLE)
                       / sqrt(CAST(na.n_item * nb.n_item AS DOUBLE)) AS cosine
            FROM pair_n
            JOIN item_n na ON na.l_partkey = part_a
            JOIN item_n nb ON nb.l_partkey = part_b
        ),
        dirs AS (
            SELECT part_a AS item, part_b AS neighbor, n_ab, cosine FROM scored
            UNION ALL
            SELECT part_b AS item, part_a AS neighbor, n_ab, cosine FROM scored
        )
        SELECT item, neighbor, n_ab, cosine, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY item
                          ORDER BY cosine DESC, neighbor ASC) AS rank
            FROM dirs
        ) WHERE rank <= {ITEM_SIM_TOP_K}
    """,
    "retention_cohorts": """
        WITH uw AS (
            SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS w
            FROM events
        ),
        c AS (
            SELECT user_id, w,
                   min(w) OVER (PARTITION BY user_id) AS cohort_week
            FROM uw
        ),
        matrix AS (
            SELECT cohort_week,
                   date_diff('day', cohort_week, w) // 7 AS week_offset,
                   count(*) AS n_active
            FROM c GROUP BY 1, 2
        ),
        sizes AS (
            SELECT cohort_week, n_active AS cohort_size
            FROM matrix WHERE week_offset = 0
        )
        SELECT cohort_week, CAST(week_offset AS INT) AS week_offset,
               n_active,
               CAST(n_active AS DOUBLE) / cohort_size AS retention
        FROM matrix JOIN sizes USING (cohort_week)
    """,
    # expected written as row·(col/N) in BOTH engines: same IEEE op
    # order, no int64 row·col overflow at scale, no rounding call
    "status_priority_chisq": """
        WITH obs AS (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_obs
            FROM orders GROUP BY 1, 2
        ),
        row_t AS (SELECT o_orderstatus, CAST(sum(n_obs) AS BIGINT) AS row_total
                  FROM obs GROUP BY 1),
        col_t AS (SELECT o_orderpriority, CAST(sum(n_obs) AS BIGINT) AS col_total
                  FROM obs GROUP BY 1),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM obs)
        SELECT o_orderstatus, o_orderpriority, n_obs,
               row_total * (CAST(col_total AS DOUBLE) / n_total) AS expected,
               ((n_obs - row_total * (CAST(col_total AS DOUBLE) / n_total))
                * (n_obs - row_total * (CAST(col_total AS DOUBLE) / n_total)))
               / (row_total * (CAST(col_total AS DOUBLE) / n_total)) AS chi2_cell
        FROM obs
        JOIN row_t USING (o_orderstatus)
        JOIN col_t USING (o_orderpriority), tot
    """,
    "above_avg_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
    "order_status_matrix": f"""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
               {money_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS rev_open,
               {money_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS rev_fulfilled
        FROM orders
        GROUP BY 1
    """,
    # the long form computed directly — pivot∘unpivot must reproduce it
    "unpivot_status_revenue": f"""
        SELECT o_orderpriority, o_orderstatus,
               {money_sum_sql('o_totalprice')} AS revenue
        FROM orders
        WHERE o_orderstatus IN ('O', 'F', 'P')
        GROUP BY 1, 2
    """,
    # every event belongs to exactly two 1h/30min hops: the one starting
    # at its 30-min truncation and the one 30 min earlier
    "hopping_window_events": f"""
        WITH hops AS (
            SELECT unnest([
                       make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                                           * 1000000 AS BIGINT)),
                       make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800)
                                           * 1000000 AS BIGINT))
                   ]) AS window_start,
                   value
            FROM events
            WHERE ts IS NOT NULL
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               count(*) AS n_events,
               {money_sum_sql('value')} AS total_value
        FROM hops
        GROUP BY 1
    """,
    "cube_revenue": f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {money_sum_sql('o_totalprice')} AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "time_bucket_rollup": f"""
        SELECT coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), 'ALL') AS day,
               CAST(coalesce(hour(ts), -1) AS INT) AS hour,
               count(*) AS n_events,
               {money_sum_sql('value')} AS total_value,
               CAST(GROUPING(hour(ts)) + 2 * GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS grain
        FROM events
        GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE), hour(ts))
    """,
    "string_functions_showcase": """
        SELECT c_custkey,
               upper(c_name) AS upper_name,
               lower(c_name) AS lower_name,
               length(c_name) AS name_len,
               substr(c_name, 1, 8) AS prefix8,
               replace(c_name, '#', '-') AS dashed,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
               'cust:' || c_name AS tagged,
               reverse(c_name) AS reversed
        FROM customer
    """,
}
