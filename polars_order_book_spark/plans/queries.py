"""Host-engine query surface (SURVEY.md §2.3): projection, filter, boolean
expressions, when/otherwise, isin, arithmetic+round+cast, group-by
aggregation, inner/anti joins, window ranking, sort/limit — each as a
(spark_fn, oracle_sql) pair over the driver's tables.

Cross-engine determinism rules used throughout:
* Money/measure sums: cast DOUBLE → DECIMAL first (exact summation, immune to
  Spark's nondeterministic partial-agg order), cast the final sum back to
  DOUBLE. Averages = decimal-sum ÷ count, both already exact doubles.
* Timestamps are exported as epoch seconds (BIGINT) — no format ambiguity.
* Every limit/top-k has a total deterministic ORDER BY.

Scale notes: all aggregations are partial-aggregated map-side by Catalyst;
the dimension sides of every join here (region/nation/customer at TPC-H
shape) are broadcast — verified via .explain in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_order_book_spark.sources.tables import load_table


def _dec(col, p=10, s=2):
    return col.cast(f"decimal({p},{s})")


# --- Q1: pricing summary (TPC-H Q1 shape) ---------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one_minus = _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    one_plus = _dec(F.lit(1.0) + F.col("l_tax"), 4, 2)
    ext = _dec(F.col("l_extendedprice"))
    qty = _dec(F.col("l_quantity"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ext).cast("double").alias("sum_base_price"),
            F.sum(ext * one_minus).cast("double").alias("sum_disc_price"),
            F.sum((ext * one_minus) * one_plus).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(ext).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
       CAST(sum((CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed managed tables (sources/sinks.py
    write_bucketed): orders and lineitem are both written bucketed 8-ways on
    the order key (sorted within buckets), so the fact-fact equi-join reads
    bucket i against bucket i with NO shuffle exchange and NO sort on either
    side — the layout investment that turns every subsequent key-join/agg
    against these tables into a map-side operation. At 100 TB this is THE
    difference between re-shuffling terabytes per query and paying the
    shuffle once at write time; tests/test_plans.py pins the exchange-free
    plan shape. Values hash the plain-join oracle exactly (decimal revenue
    chain, the q1 convention)."""
    from polars_order_book_spark.sources.sinks import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Overwrite-mode fixed names: idempotent per run, no table leak growth.
    write_bucketed(
        orders.select("o_orderkey", "o_orderstatus"),
        "bj_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"],
    )
    write_bucketed(
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        "bj_lineitem", ["l_orderkey"], 8, sort_by=["l_orderkey"],
    )
    o = spark.table("bj_orders")
    l = spark.table("bj_lineitem")
    ext = _dec(F.col("l_extendedprice"))
    one_minus = _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    # hint("merge"): at test SF the orders side is broadcast-sized and Spark
    # would pick BHJ, hiding the layout win; the 100 TB fact-fact shape is
    # the sort-merge join, which with both sides bucketed+sorted on the key
    # runs with NO exchange and NO sort (pinned by tests/test_plans.py).
    return (
        o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(ext * one_minus).cast("double").alias("revenue"),
        )
    )


SINK_BUCKETED_JOIN_SQL = """
SELECT o.o_orderstatus, count(*) AS n_items,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(10,2))
                * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
"""


# --- Q3: shipping-priority style join + top-k ------------------------------

def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


# --- Q6: forecast revenue change (pure scan-filter-agg, TPC-H Q6 shape) ----

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table predicate + aggregate: the canonical pushdown shape —
    every filter reaches the parquet scan, the agg is one map-side partial."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"), 4, 2))
            .cast("double")
            .alias("revenue_effect"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_effect,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


# --- Q5: region revenue rollup (join chain across all dims) ----------------

def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    dims = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- Supplier rollup (completes 10/10 table coverage) ----------------------

def supplier_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers per nation with balance stats — broadcast dim join + decimal
    aggregates (order-independent sums)."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(_dec(F.col("s_acctbal"))).cast("double").alias("total_acctbal"),
            F.max(F.col("s_acctbal")).alias("max_acctbal"),
        )
    )


SUPPLIER_NATION_SQL = """
SELECT n_name,
       count(*) AS n_suppliers,
       CAST(sum(CAST(s_acctbal AS DECIMAL(10,2))) AS DOUBLE) AS total_acctbal,
       max(s_acctbal) AS max_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --- Window ranking: top orders per customer -------------------------------

def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


TOPK_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
)
WHERE rk <= 3
"""


# --- Anti join: customers without orders -----------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no large order (predicate keeps it selective
    so the check is non-degenerate on the synthetic data)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


# --- Scalar-function surface: when/isin/round/cast over part ---------------

def part_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.when(F.col("p_size") >= 40, F.lit("XL"))
        .when(F.col("p_size") >= 20, F.lit("L"))
        .otherwise(F.lit("S"))
        .alias("size_class"),
        F.col("p_brand").isin("Brand#1", "Brand#3").alias("is_focus_brand"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_ticks"),
        F.upper(F.col("p_type")).alias("type_upper"),
    )


PART_CATEGORIZE_SQL = """
SELECT p_partkey,
       CASE WHEN p_size >= 40 THEN 'XL' WHEN p_size >= 20 THEN 'L' ELSE 'S' END AS size_class,
       p_brand IN ('Brand#1', 'Brand#3') AS is_focus_brand,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_ticks,
       upper(p_type) AS type_upper
FROM part
"""


# --- Events: hourly windowed aggregation -----------------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# --- Events: per-user running cumulative (ordered analytic window) ---------

def events_user_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(_dec(F.col("value"))).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_events"),
    )


EVENTS_RUNNING_SQL = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(10,2))) OVER w AS DOUBLE) AS running_value,
       count(*) OVER w AS running_events
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --- Events: gap-based sessionization ---------------------------------------

SESSION_GAP_SECONDS = 1800


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gap sessionization: a new session starts when a user's gap from
    the previous event exceeds 30 minutes; session id = cumulative count of
    session starts. One windowed lag + one running sum — both partitioned by
    user, so the shuffle scales with users, not time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond epochs: exact integers in both engines (second-level epoch
    # rounds in DuckDB but truncates in Spark — off-by-one at .5s fractions).
    epoch_us = F.unix_micros(F.col("ts"))
    gap = epoch_us - F.lag(epoch_us).over(w)
    is_start = F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "event_id", "ts",
        F.sum(is_start).over(wrun).alias("session_no"),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
        )
    )


EVENTS_SESSIONS_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, ts,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
    FROM flagged
)
SELECT user_id, session_no, count(*) AS n_events,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) AS end_us
FROM sess GROUP BY user_id, session_no
"""


def events_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session pairs across users via the bucketed interval-overlap
    join (operators/ranges.py interval_overlap_join): session intervals from
    the gap sessionizer, both sides exploded onto 1-hour time buckets, a hash
    equi-join on the bucket id + the exact overlap refine, and the
    canonical-bucket rule (keep the pair only in the bucket of the overlap's
    left edge) so each pair is emitted exactly once with NO distinct pass.

    A bare `a.lo < b.hi AND b.lo < a.hi` join is a CartesianProduct at
    corpus scale — the bucket id turns it into a shuffled hash join whose
    skew AQE can split. The 30-min gap rule bounds inter-event SPACING,
    not session length, so a steady-traffic key can form an arbitrarily
    long session spanning many 1-hour buckets; correctness is unaffected
    (interval_overlap_join's canonical-bucket rule dedups multi-bucket
    pairs) and the explode factor is (session length / bucket width) + 1 —
    ~2 on THIS corpus, whose sessions measure <= ~57 min. Size
    bucket_width to the corpus's typical session length when that changes.
    user_a < user_b orients
    pairs (same-user sessions can never overlap — the gap rule separates
    them by construction). Output: the pair keys + the exact overlap length
    in microseconds (half-open semantics: touching endpoints don't overlap).
    """
    from polars_order_book_spark.operators.ranges import interval_overlap_join

    sess = events_sessionize(spark, sf_dir).localCheckpoint(eager=False)
    a = sess.select(
        F.col("user_id").alias("user_a"), F.col("session_no").alias("session_a"),
        F.col("start_us").alias("a_lo"), F.col("end_us").alias("a_hi"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"), F.col("session_no").alias("session_b"),
        F.col("start_us").alias("b_lo"), F.col("end_us").alias("b_hi"),
    )
    pairs = interval_overlap_join(
        a, b, left_lo="a_lo", left_hi="a_hi", right_lo="b_lo", right_hi="b_hi",
        bucket_width=3600.0 * 1_000_000,
    )
    return pairs.where(F.col("user_a") < F.col("user_b")).select(
        "user_a", "session_a", "user_b", "session_b",
        (F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")).alias("overlap_us"),
    )


EVENTS_SESSION_OVERLAP_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no,
           ts
    FROM flagged
),
sess AS (
    SELECT user_id, session_no, epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
    FROM s GROUP BY user_id, session_no
)
SELECT a.user_id AS user_a, a.session_no AS session_a,
       b.user_id AS user_b, b.session_no AS session_b,
       least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
FROM sess a JOIN sess b
  ON a.lo < b.hi AND b.lo < a.hi AND a.user_id < b.user_id
"""


# --- Events: exact quantiles -------------------------------------------------

def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type. Spark's percentile()
    and DuckDB's quantile_cont() share the (n-1)·q linear-interpolation
    definition — verified bit-identical, no rounding needed. (Exact
    percentile sorts per group; at 100 TB swap in approx_percentile and drop
    the oracle to a tolerance check.)"""
    ev = load_table(spark, sf_dir, "events")
    qs = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))")
    return ev.groupBy("event_type").agg(
        qs[0].alias("p25"), qs[1].alias("p50"), qs[2].alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


EVENTS_QUANTILES_SQL = """
SELECT event_type, qs[1] AS p25, qs[2] AS p50, qs[3] AS p75, n
FROM (
    SELECT event_type, quantile_cont(value, [0.25, 0.5, 0.75]) AS qs, count(*) AS n
    FROM events GROUP BY event_type
)
"""


# --- Events: lead/lag neighbors ---------------------------------------------

def events_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next neighbor attributes (lag/lead) under a total
    deterministic order (ts, event_id). One window = one shuffle on user_id;
    both functions share the frame, so Catalyst evaluates them in a single
    window operator."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        prev_v.alias("prev_value"),
        (F.col("value") - prev_v).alias("value_delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


EVENTS_LEAD_LAG_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
       lag(value) OVER w AS prev_value,
       value - lag(value) OVER w AS value_delta,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- Events: approximate aggregates (tolerance-mode oracle) -----------------
#
# The driver compares exact value hashes, which a sketch cannot promise — so
# each approx query emits EXACT anchor values plus booleans asserting the
# sketch landed inside its guaranteed tolerance, and the oracle emits the same
# anchors with literal TRUEs. An out-of-tolerance sketch flips a boolean and
# fails the hash; sketch nondeterminism WITHIN tolerance (partition merge
# order) cannot. At 100 TB these are the operators a user reaches for first:
# one pass, mergeable state, no per-group sort.


def events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) per event type, checked
    against a ±3pp rank bracket of DISCRETE order statistics
    (percentile_disc): the sketch returns an actual data element whose rank
    errs by ≤ 1e-4·N (accuracy=10000), and any element with rank inside
    [q−3pp, q+3pp] lies between those two discrete values BY CONSTRUCTION —
    no group is too small for the bracket (an interpolated bracket false-fails
    tiny groups, where discrete elements sit outside interpolated values)."""
    return value_quantiles_approx_checked(load_table(spark, sf_dir, "events"))


def value_quantiles_approx_checked(ev: DataFrame) -> DataFrame:
    """Core of events_value_quantiles_approx over any (event_type, value)
    frame — separated so the tiny-group bracket property is unit-testable."""

    def disc(q: float):
        return F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)")

    approx = F.expr("approx_percentile(value, array(0.25D, 0.5D, 0.75D), 10000)")
    exact = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))")
    qs = (0.25, 0.5, 0.75)
    aggs = [approx.alias("__ap"), exact.alias("__ex"), F.count(F.lit(1)).alias("n")]
    for i, q in enumerate(qs):
        aggs += [disc(max(0.0, q - 0.03)).alias(f"__lo{i}"),
                 disc(min(1.0, q + 0.03)).alias(f"__hi{i}")]
    agg = ev.groupBy("event_type").agg(*aggs)
    cols = [F.col("event_type"), F.col("n")]
    for i, name in enumerate(("p25", "p50", "p75")):
        in_tol = (F.col("__ap")[i] >= F.col(f"__lo{i}")) & (
            F.col("__ap")[i] <= F.col(f"__hi{i}")
        )
        cols += [F.col("__ex")[i].alias(name), in_tol.alias(f"{name}_in_tol")]
    return agg.select(*cols)


EVENTS_QUANTILES_APPROX_SQL = """
SELECT event_type, n,
       qs[1] AS p25, TRUE AS p25_in_tol,
       qs[2] AS p50, TRUE AS p50_in_tol,
       qs[3] AS p75, TRUE AS p75_in_tol
FROM (
    SELECT event_type, quantile_cont(value, [0.25, 0.5, 0.75]) AS qs, count(*) AS n
    FROM events GROUP BY event_type
)
"""


def events_user_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.02) per event type, checked
    within 3·rsd of the exact distinct count (a ~3-sigma bound for HLL)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("__ap"),
        F.countDistinct("user_id").alias("n_users"),
    )
    in_tol = (
        F.abs(F.col("__ap") - F.col("n_users"))
        <= F.lit(3 * 0.02) * F.col("n_users")
    )
    return agg.select("event_type", "n_users", in_tol.alias("approx_in_tol"))


EVENTS_DISTINCT_APPROX_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS approx_in_tol
FROM events GROUP BY event_type
"""


# --- Events: rollup (grouping sets surface) ---------------------------------

def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (event_type, JSON-extracted prop bucket): per-combination,
    per-type, and grand-total aggregates in one pass (Catalyst expands
    grouping sets into a single shuffle with map-side partial agg). Also
    exercises the JSON scalar-function surface (get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k_bucket = (F.get_json_object(F.col("props"), "$.k").cast("long") % 10).alias("k_bucket")
    return (
        ev.select("event_type", k_bucket, "value")
        .rollup("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


EVENTS_ROLLUP_SQL = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10)
"""


# --- Events: hourly pivot ----------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × event-type contingency table via the pivot surface.
    The pivot value list is pinned (schema independent of data — also what
    keeps the single shuffle: with explicit values Catalyst plans ONE
    groupBy(hour) with per-type conditional aggregates, no extra distinct
    pass over event_type)."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.select(F.hour("ts").cast("long").alias("hour"), "event_type")
        .groupBy("hour")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "hour", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES]
    )


EVENTS_HOURLY_PIVOT_SQL = """
SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       count(*) FILTER (event_type = 'click') AS n_click,
       count(*) FILTER (event_type = 'error') AS n_error,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup') AS n_signup,
       count(*) FILTER (event_type = 'view') AS n_view
FROM events
GROUP BY 1
"""


# --- Orders: rolling 90-day revenue per customer -----------------------------

def orders_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: the customer's trailing-90-day revenue, via a RANGE window
    frame over an integer day index (range frames include all peers of the
    current order key, so same-day orders agree regardless of row order; the
    sum is decimal → order-independent and engine-exact). One shuffle+sort
    on (custkey, day) — the same exchange any per-customer time-series op
    pays."""
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ: truncate to a date and count days since
    # epoch — identical truncation semantics in DuckDB's CAST(ts AS DATE).
    day = F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01")))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.alias("day"))
        .rangeBetween(-89, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        day.cast("long").alias("day"),
        F.sum(_dec(F.col("o_totalprice"), 12)).over(w).cast("double").alias("rev_90d"),
    )


ORDERS_ROLLING_REVENUE_SQL = """
SELECT o_orderkey, o_custkey,
       date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           RANGE BETWEEN 89 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_90d
FROM orders
"""


# --- q10-style returned-items report ---------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns (TPC-H Q10 shape): the
    returnflag filter pushes into the lineitem scan, nation broadcasts,
    decimal revenue keeps the sum order-independent, and the final top-k is
    a single ORDER BY LIMIT (Spark plans TakeOrderedAndProject — no full
    sort materialization)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_returned_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- JSON scalar surface over the props column ------------------------------

def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the props JSON string with a typed
    from_json schema (JVM-side, codegen — no UDF) and aggregate the extracted
    field per event type. The schema-on-read pattern for event payloads at
    scale; a malformed document yields null, counted explicitly."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("long")).alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("k_nulls"),
        )
    )


EVENTS_PROPS_JSON_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       min(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
       max(CAST(json_extract(props, '$.k') AS INT)) AS k_max,
       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls
FROM events
GROUP BY event_type
"""

# --- q4-style priority check (EXISTS → left-semi join) ----------------------

def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts for orders having at least one high-quantity line
    (TPC-H Q4 shape, adapted to this schema: the EXISTS predicate is
    l_quantity > 45). Spark plans the EXISTS as a left-semi hash join — the
    probe side streams, no duplication of orders rows — and the orderdate
    range pushes into the parquet scan."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


# --- q7-style volume shipping between nation pairs --------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow between supplier-nation and customer-nation pairs per ship
    year (TPC-H Q7 shape). Both nation lookups broadcast (supplier and
    customer sides), so the only shuffles are the two fact-fact equi-joins and
    the final aggregate; the year comes from the pushed-down shipdate."""
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = ["NATION_1", "NATION_2"]
    sup_n = sup.join(
        F.broadcast(nation.where(F.col("n_name").isin(pair))),
        sup["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(nation.where(F.col("n_name").isin(pair))),
        cust["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        li.join(F.broadcast(sup_n), li["l_suppkey"] == sup_n["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_n), F.col("o_custkey") == cust_n["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE sn.n_name IN ('NATION_1', 'NATION_2')
    AND cn.n_name IN ('NATION_1', 'NATION_2')
    AND sn.n_name <> cn.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# --- q14-style promo revenue share ------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue from promotional parts in one ship month (TPC-H Q14
    shape): conditional aggregation (CASE inside sum) over a broadcast join
    with part — one shuffle total (the final 1-row agg), everything else
    map-side."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast("decimal(12,4)"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q14_SQL = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
                             ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
       AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --- q18-style large-volume orders (agg → HAVING → semi-join back) ----------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who placed orders whose total quantity exceeds a threshold
    (TPC-H Q18 shape). The inner groupBy-HAVING runs first and is tiny, so
    Spark broadcasts it for the keys-join back to orders; the top-k is
    TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 120)
    )
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("o_orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) > 120) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- q19-style disjunctive predicate revenue --------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three OR-ed brand/size/quantity predicate blocks (TPC-H
    Q19 shape). Catalyst factors the common join key and pushes the
    disjunction below the broadcast join; the whole filter+join stays in one
    codegen stage."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    block1 = (
        (F.col("p_brand") == "Brand#11")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 11))
    )
    block2 = (
        (F.col("p_brand") == "Brand#22")
        & (F.col("p_size").between(1, 20))
        & (F.col("l_quantity").between(10, 20))
    )
    block3 = (
        (F.col("p_brand") == "Brand#33")
        & (F.col("p_size").between(1, 30))
        & (F.col("l_quantity").between(20, 30))
    )
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return joined.where(block1 | block2 | block3).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Set operations: INTERSECT / EXCEPT over event cohorts -------------------

def events_cohort_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort set algebra with INTERSECT/EXCEPT (distinct semantics): users
    who purchased AND signed up, and users who purchased but never hit an
    error. Both set ops plan as hash joins over the pre-aggregated distinct
    key sets (tiny relative to the event stream), then one count each —
    shuffle work is bounded by distinct users, not events."""
    ev = load_table(spark, sf_dir, "events")

    def users(kind: str) -> DataFrame:
        return ev.where(F.col("event_type") == kind).select("user_id")

    both = users("purchase").intersect(users("signup"))
    # subtract() IS Spark's EXCEPT DISTINCT — one-to-one with the oracle's
    # EXCEPT (the previous distinct().exceptAll(distinct()) spelling was
    # only equivalent because both inputs were pre-distincted).
    clean = users("purchase").subtract(users("error"))
    return (
        both.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("purchase_and_signup").alias("cohort"), "n")
        .unionAll(
            clean.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("purchase_no_error").alias("cohort"), "n"
            )
        )
    )


EVENTS_COHORT_SETOPS_SQL = """
SELECT 'purchase_and_signup' AS cohort, count(*) AS n
FROM (SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'signup')
UNION ALL
SELECT 'purchase_no_error' AS cohort, count(*) AS n
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
"""


# --- q13-style customer order-count distribution ----------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer INCLUDING zero-order customers
    (TPC-H Q13 shape): left outer join + two stacked aggregations. The
    double agg is two shuffles on shrinking keys (custkey, then count) —
    the canonical histogram-of-groups plan."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col) skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- q15-style top supplier by period revenue -------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the maximum period revenue (TPC-H Q15 shape):
    per-supplier revenue aggregate, then a scalar-subquery max compared back
    — Spark plans the 1-row max as a broadcast nested-loop against the tiny
    aggregate (whitelisted shape: scalar normalizer), never against the fact
    table."""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("__mx"))
    return (
        per_supp.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --- q22-style dormant high-balance customers -------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no RECENT orders
    (TPC-H Q22 shape, recency-windowed: every customer has some order at
    these scale factors, so plain NOT EXISTS would be vacuous): scalar-
    subquery average (decimal-exact, order-independent) + anti join against
    the recent-order key set, rolled up per market segment. The orderdate
    filter pushes into the orders scan before the anti join's build side."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    return (
        cust.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(10,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
"""


# --- q2-style min-cost supplier per part (correlated min) --------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part within a region (TPC-H Q2 shape, reshaped:
    the testdata has no partsupp table, so lineitem serves as the
    part-supplier offer relation and unit price = l_extendedprice/l_quantity).
    The correlated min is a per-part aggregate joined back on equality —
    Spark plans both sides off ONE shuffle on l_partkey (exchange reuse);
    supplier/nation/region dims broadcast. Unit price is a single IEEE double
    division, bit-identical across engines, so the equality join is exact.
    Ref semantics analogue: reference's nth-best/min-level selection
    (book_side.rs nth-best contract) lifted to the relational surface."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    # per-part min as a window over the SAME aggregate output — one scan, one
    # agg; an agg-and-join-back formulation would recompute the offers subtree
    # (verified: no ReusedExchange in the physical plan)
    best_w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("best_price", F.min("unit_price").over(best_w))
        .where(F.col("unit_price") == F.col("best_price"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("unit_price").alias("min_unit_price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH sup AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), offers AS (
    SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem JOIN sup ON l_suppkey = s_suppkey
    GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_price AS min_unit_price
FROM offers
JOIN part ON l_partkey = p_partkey
JOIN sup ON l_suppkey = s_suppkey
WHERE p_size = 15 AND p_type = 'STANDARD'
  AND unit_price = (SELECT min(o2.unit_price) FROM offers o2 WHERE o2.l_partkey = offers.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- q8-style national market share ------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one supplier nation's revenue among all sales into a region's
    market, per order year (TPC-H Q8 shape). Two nation joins with distinct
    roles (customer geography vs supplier origin) — all dims broadcast; the
    only shuffle is the final tiny group-by-year. The share is a ratio of two
    decimal-exact sums, computed as a conditional aggregate in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_in_market = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = sup.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    volume = _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust_in_market), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume)
                      .otherwise(F.lit(0).cast("decimal(10,2)"))).cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share"),
            F.sum(volume).cast("double").alias("total_volume"),
        )
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
                     ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS mkt_share,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
"""


# --- q9-style product-line profit by nation and year -------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per ship year over one product line (TPC-H
    Q9 shape, reshaped: no partsupp, so cost = p_retailprice * l_quantity).
    amount = revenue - cost stays in exact decimal arithmetic end-to-end;
    part filter prunes at the scan, both dims broadcast, one group-by
    shuffle on (nation, year) — a key space of ~25 x 7."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = sup.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    amount = (
        _dec(F.col("l_extendedprice")) * _dec(F.lit(1.0) - F.col("l_discount"), 4, 2)
        - _dec(F.col("p_retailprice")) * _dec(F.col("l_quantity"))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
                - CAST(p_retailprice AS DECIMAL(10,2)) * CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(l_shipdate)
"""


# --- q11-style important-parts concentration ----------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose traded value through one nation's suppliers exceeds a
    fixed fraction of that nation's total (TPC-H Q11 shape; lineitem stands
    in for partsupp). The scalar threshold is a 1-row aggregate broadcast
    against the per-part aggregate (never the fact table) — both aggregates
    derive from the SAME shuffled child, so Catalyst reuses the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    sup_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")
                        .where(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = _dec(F.col("l_extendedprice"))
    per_part = (
        li.join(F.broadcast(sup_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).cast("double").alias("part_value"))
    )
    total = per_part.agg((F.sum(_dec(F.col("part_value"), 18, 2)).cast("double") * 0.001)
                         .alias("__threshold"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("__threshold"))
        .select("l_partkey", "part_value")
    )


Q11_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT CAST(sum(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE) * 0.001 FROM per_part)
"""


# --- q12-style late-shipment priority counts ----------------------------------

def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders shipped late, bucketed by line status with critical-vs-other
    priority counts (TPC-H Q12 shape; the testdata has no ship mode or
    commit/receipt dates, so 'late' = shipped >= 90 days after the order
    date). Timestamp arithmetic is exact integer micros in both engines.
    One join shuffle on orderkey; conditional counts in a single agg pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("critical_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("other_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS critical_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS other_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


# --- q16-style supplier variety per part attribute ----------------------------

def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers able to provide each (brand, type, size) combo,
    excluding a disqualified supplier set (TPC-H Q16 shape; negative account
    balance stands in for the complaints predicate, lineitem for partsupp).
    The anti join's build side is 6 rows — broadcast; count(DISTINCT) goes
    through Spark's two-phase expand+agg, partial-aggregated map-side."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_sup), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- q17-style small-quantity-order revenue -----------------------------------

def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20% of the
    part's mean quantity) were not taken, for one brand (TPC-H Q17 shape).
    The correlated per-part average is an aggregate joined back on partkey —
    the brand filter prunes BOTH sides to ~4% of parts before any shuffle.
    The mean uses a decimal-exact sum / count so the 0.2x threshold compares
    bit-identically across engines."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
        .alias("avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * (
        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(10,2))) AS DOUBLE) / count(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
"""


# --- q20-style part-concentration suppliers -----------------------------------

def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in one region shipping an outsized share (>30%) of any
    part's 1996 volume (TPC-H Q20 shape; lineitem quantity sums stand in for
    partsupp availability). Per-(supplier, part) and per-part totals derive
    from the same scan; the share test is an equi-join on partkey between
    the two aggregates. Output is the distinct supplier list — a semi join,
    so no duplicate-row blowup reaches the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sp_qty")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(_dec(F.col("l_quantity"))).cast("double").alias("part_qty")
    )
    concentrated = (
        per_sp.join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .where(F.col("sp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(concentrated, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


Q20_SQL = """
WITH per_sp AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sp_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey, l_suppkey
), per_part AS (
    SELECT l_partkey AS pp_key,
           CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS part_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
        SELECT l_suppkey FROM per_sp JOIN per_part ON l_partkey = pp_key
        WHERE sp_qty > 0.3 * part_qty
      )
"""


# --- q21-style sole-late-supplier count ----------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on finalized multi-supplier
    orders (TPC-H Q21 shape; 'late' = shipped >60 days after order date since
    the testdata has no commit/receipt dates). The EXISTS is a left-semi and
    the NOT EXISTS a left-anti self-join, both equi-keyed on orderkey with
    the supplier inequality as a residual — three shuffles on the same key,
    AQE-coalesced; supplier dim broadcast at the end."""
    orders_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")
    other = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    l1 = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- analytic rank functions: deciles / percent_rank / cume_dist -------------

def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value analytics with the three positional rank
    functions in one window pass: ntile (equi-depth decile), percent_rank,
    cume_dist. All three are pure functions of the within-partition ORDER —
    the (value, event_id) tie-break makes that order total, so every output
    is engine-deterministic. One shuffle on event_type; each partition ranks
    in one task (bounded by events-per-type; shard by hash for skewed keys,
    same answer as budget_pack's shards)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


EVENTS_DECILES_SQL = """
SELECT event_id, event_type, value,
       CAST(ntile(10) OVER w AS BIGINT) AS decile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


# --- GROUPING SETS with grouping flags ---------------------------------------

def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregate in ONE pass via GROUPING SETS
    ((type, hour), (type), ()) — the generalization of rollup/cube the
    host engine exposes (events_rollup covers the rollup special case).
    Spark plans a single Expand + hash aggregate: the scan is read once and
    each row contributes to every set, partial-aggregated map-side; grouping
    flags disambiguate the NULL-keyed super-aggregate rows."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.hour("ts").cast("int").alias("hour")
    return (
        ev.select("event_type", hour, "value")
        .groupingSets(
            [["event_type", "hour"], ["event_type"], []],
            "event_type",
            "hour",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hour").cast("int").alias("g_hour"),
        )
    )


EVENTS_GROUPING_SETS_SQL = """
SELECT event_type, CAST(hour(ts) AS INT) AS hour,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(hour(ts)) AS INT) AS g_hour
FROM events
GROUP BY GROUPING SETS ((event_type, hour(ts)), (event_type), ())
"""


# --- two-level HLL sketch rollup (mergeable aggregate state) -----------------

def events_user_distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via TWO-LEVEL sketch aggregation: daily
    DataSketches HLL sketches (hll_sketch_agg) merged with hll_union_agg and
    estimated — the mergeable-state pattern that makes 100 TB rollups cheap
    (pre-aggregate per partition/day once, re-merge for any coarser slice
    without touching raw data). The estimate is checked within 3x the lgK=12
    relative error (~1.6%) of the exact distinct count, same tolerance
    discipline as the HLL++ and quantile-sketch queries."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("__ap")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))
    in_tol = F.abs(F.col("__ap") - F.col("n_users")) <= F.lit(3 * 0.016) * F.col("n_users")
    return exact.join(F.broadcast(merged), on="event_type").select(
        "event_type", "n_users", in_tol.alias("merged_in_tol")
    )


EVENTS_SKETCH_ROLLUP_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS merged_in_tol
FROM events GROUP BY event_type
"""


# --- ordered funnel analysis -------------------------------------------------

def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup -> click -> purchase funnel: a user advances a stage
    only with an event AT OR AFTER their previous stage's first event (first
    matching occurrence per stage). Three shrinking per-user aggregates —
    each stage joins the (tiny) qualified-user set back to events broadcast,
    so the event table is scanned, never shuffled on user."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(s), "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .where(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(name, df):
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return (
        stage("1_signup", s)
        .unionByName(stage("2_click_after_signup", c))
        .unionByName(stage("3_purchase_after_click", p))
    )


EVENTS_FUNNEL_SQL = """
WITH s AS (
    SELECT user_id, min(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS c_ts
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND e.ts >= s.s_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS p_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
    GROUP BY e.user_id
)
SELECT '1_signup' AS stage, count(*) AS users FROM s
UNION ALL
SELECT '2_click_after_signup', count(*) FROM c
UNION ALL
SELECT '3_purchase_after_click', count(*) FROM p
"""


# --- retention cohort matrix -------------------------------------------------

def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week (cohort),
    counted per later activity week. Two shrinking aggregates — per-user
    first week (shuffle on user), then distinct (user, week) activity pairs
    joined back broadcast — and a final tiny (cohort, week) count. Both
    engines truncate weeks to Monday (ISO), so the keys agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.unix_micros(F.date_trunc("week", F.min("ts"))).alias("cohort_week_us")
    )
    activity = (
        ev.select(
            "user_id", F.unix_micros(F.date_trunc("week", F.col("ts"))).alias("week_us")
        )
        .distinct()
    )
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy("cohort_week_us", "week_us")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_RETENTION_SQL = """
WITH firsts AS (
    SELECT user_id, epoch_us(date_trunc('week', min(ts))) AS cohort_week_us
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, epoch_us(date_trunc('week', ts)) AS week_us FROM events
)
SELECT cohort_week_us, week_us, count(*) AS n_users
FROM activity JOIN firsts USING (user_id)
GROUP BY cohort_week_us, week_us
"""


# --- sentence segmentation (array HOF + posexplode surface) ------------------

def documents_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment documents into sentence rows with ordinal + trimmed text +
    length — the row-expansion step before per-sentence dedup/scoring. Pure
    JVM path: regexp_extract_all (sentence-shaped spans, no lookbehind — the
    pattern must behave identically under Java regex and DuckDB's RE2) +
    posexplode. Map-only: expansion happens where the row lives; the only
    shuffle is whatever the consumer adds."""
    docs = load_table(spark, sf_dir, "documents")
    sentences = F.expr(r"regexp_extract_all(text, '[^.!?]+[.!?]?', 0)")
    return (
        docs.select("doc_id", F.posexplode(sentences).alias("sentence_idx", "raw"))
        .select(
            "doc_id",
            "sentence_idx",
            F.trim(F.col("raw")).alias("sentence"),
            F.length(F.trim(F.col("raw"))).alias("n_chars"),
        )
        .where(F.length(F.col("sentence")) > 0)
    )


DOCUMENTS_SENTENCES_SQL = """
SELECT doc_id,
       CAST(idx - 1 AS INT) AS sentence_idx,
       trim(raw) AS sentence,
       CAST(length(trim(raw)) AS INT) AS n_chars
FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[^.!?]+[.!?]?')) AS raw,
           generate_subscripts(regexp_extract_all(text, '[^.!?]+[.!?]?'), 1) AS idx
    FROM documents
)
WHERE length(trim(raw)) > 0
"""


# --- VARIANT semi-structured extraction (Spark 4 type surface) ---------------

def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: parse_json ONCE
    into a binary variant, then typed variant_get extractions — the
    schema-on-read path for payloads too heterogeneous for a fixed
    from_json schema (events_props_json covers the fixed-schema path).
    Aggregated per extracted-k decile so the oracle compares values, not
    variant binaries."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    missing = F.expr("variant_get(parse_json(props), '$.absent', 'bigint')")
    return (
        ev.select(k.alias("k"), missing.alias("m"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
    )


EVENTS_PROPS_VARIANT_SQL = """
SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod,
       count(*) AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN props->>'$.absent' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY CAST(props->>'$.k' AS BIGINT) % 10
"""


# --- deterministic pseudonymization ------------------------------------------

def events_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-hash pseudonymization of user identifiers: sha2-256 over
    salt||id gives a stable opaque token (same user -> same token, so joins
    and aggregations still work downstream) while the raw id never leaves
    the pipeline — the privacy step next to redact_pii's content scrubbing.
    Map-only codegen; token space makes reversal infeasible without the
    salt. Output sampled deterministically (seq % filter) to keep the
    oracle row set small."""
    ev = load_table(spark, sf_dir, "events")
    token = F.sha2(F.concat(F.lit("pepper-2024:"), F.col("user_id").cast("string")), 256)
    return (
        ev.where(F.col("event_id") % 97 == 0)
        .select(
            "event_id",
            token.alias("user_token"),
            "event_type",
            "value",
        )
    )


EVENTS_PSEUDONYMIZE_SQL = """
SELECT event_id,
       sha256('pepper-2024:' || CAST(user_id AS VARCHAR)) AS user_token,
       event_type, value
FROM events
WHERE event_id % 97 = 0
"""


# --- array aggregation surface ------------------------------------------------

def events_user_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile via array aggregation: the user's distinct
    event types as a SORTED, comma-joined string (collect_set is
    partition-order nondeterministic; sort_array + array_join make the value
    canonical and hashable cross-engine), plus counts by profile. One
    per-user shuffle, then a tiny profile rollup."""
    ev = load_table(spark, sf_dir, "events")
    profile = F.array_join(
        F.sort_array(F.collect_set("event_type")), ","
    ).alias("type_profile")
    per_user = ev.groupBy("user_id").agg(profile)
    return per_user.groupBy("type_profile").agg(
        F.count(F.lit(1)).alias("n_users")
    )


EVENTS_USER_TYPE_PROFILE_SQL = """
SELECT type_profile, count(*) AS n_users
FROM (
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_profile
    FROM events GROUP BY user_id
)
GROUP BY type_profile
"""


# --- per-type OLS trend: regr via exact integer/decimal sums -----------------

def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over time (slope per
    second, intercept at 2024-01-01), computed from EXACT sums: x = epoch
    seconds offset to a fixed base (BIGINT), y = value as DECIMAL(10,2).
    Sx/Sy/Sxy/Sxx are order-independent decimal sums; the closed-form
    slope/intercept is one fused double expression over their casts —
    bit-identical on any IEEE engine (no libm). Same single-pass shape as
    the built-in regr_slope/regr_intercept, which float-accumulate and are
    NOT portable — that is why the sums are decimal here.

    Scale: one map-side-partial groupBy(event_type); output is types-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(1704067200)).cast("decimal(20,0)")
    y = _dec(F.col("value"))
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope_per_sec"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


EVENTS_OLS_TREND_SQL = """
WITH sums AS (
    SELECT event_type,
           count(*) AS n,
           sum(CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) - 1704067200
                    AS DECIMAL(20,0))) AS sx,
           sum(CAST(value AS DECIMAL(10,2))) AS sy,
           sum(CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) - 1704067200
                    AS DECIMAL(20,0))
               * CAST(value AS DECIMAL(10,2))) AS sxy,
           sum(CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) - 1704067200
                    AS DECIMAL(20,0))
               * CAST(CAST(epoch(date_trunc('second', ts)) AS BIGINT) - 1704067200
                     AS DECIMAL(20,0))) AS sxx
    FROM events GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_per_sec,
       (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept
FROM sums
"""


# --- Markov transition matrix of user event sequences ------------------------

def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts/probabilities over each user's
    event sequence ordered by (ts, event_id) — the behavioral-model /
    next-event-prediction feature table. One lag window per user (shuffle
    on user_id) + one tiny groupBy((prev,cur)); probability is the single
    final division of two exact BIGINTs. Each user's first event has no
    predecessor and is excluded (standard chain convention)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_tot).cast("double")
        ).alias("prob"),
    )


EVENTS_MARKOV_SQL = """
WITH pairs AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
           event_type AS next_type
    FROM events
), counts AS (
    SELECT prev_type, next_type, count(*) AS n_transitions
    FROM pairs WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
       / CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
FROM counts
"""


# --- rolling z-score anomaly detection ---------------------------------------

def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 3 sample standard deviations from the mean
    of the SAME USER's previous 20 observations (min 10 for a stable
    estimate) — the classic streaming-friendly outlier gate.

    The rolling mean/std come from exact DECIMAL sums over the trailing
    frame (sum, sum-of-squares: DECIMAL(10,2)² is exact DECIMAL(21,4));
    z is one fused double expression (sqrt is IEEE-correctly-rounded on
    both engines), so the filter boundary is engine-portable. One window
    pass per user (shuffle on user_id); output is anomalies-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    y = _dec(F.col("value"))
    s1 = F.sum(y).over(w)
    s2 = F.sum(y * y).over(w)
    cnt = F.count(y).over(w)
    stats = ev.select(
        "event_id",
        "user_id",
        "value",
        s1.alias("_s1"),
        s2.alias("_s2"),
        cnt.alias("_n"),
    ).where(F.col("_n") >= 10)
    n = F.col("_n").cast("double")
    s1d, s2d = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    mean = s1d / n
    var = (s2d - s1d * s1d / n) / (n - F.lit(1.0))
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        stats.where(var > 0)
        .select(
            "event_id",
            "user_id",
            "value",
            mean.alias("window_mean"),
            z.alias("zscore"),
        )
        .where(F.abs(F.col("zscore")) > 3.0)
    )


EVENTS_ANOMALY_SQL = """
WITH stats AS (
    SELECT event_id, user_id, value,
           sum(CAST(value AS DECIMAL(10,2))) OVER w AS s1,
           sum(CAST(value AS DECIMAL(10,2)) * CAST(value AS DECIMAL(10,2)))
               OVER w AS s2,
           count(CAST(value AS DECIMAL(10,2))) OVER w AS n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), scored AS (
    SELECT event_id, user_id, value,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS window_mean,
           (value - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS zscore
    FROM stats
    WHERE n >= 10
      AND (CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(n AS DOUBLE) - 1.0) > 0
)
SELECT event_id, user_id, value, window_mean, zscore
FROM scored WHERE abs(zscore) > 3.0
"""


# --- median/MAD robust outliers ----------------------------------------------

def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers per event type: |value − median| > 3·1.4826·MAD —
    the median/MAD gate survives the heavy tails that wreck mean/std
    (one 1e9 glitch print shifts a mean forever; it moves a median one
    rank). Two grouped exact medians (Spark percentile() ≡ DuckDB
    quantile_cont, verified bit-identical by events_value_quantiles) with
    the tiny per-type stats broadcast back — the fact table shuffles only
    for the two groupBys, both map-side partial on the low-cardinality
    type key. (At 100 TB swap approx_percentile in and drop the oracle to
    a tolerance check — the events_value_quantiles note applies.)"""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("_ad"),
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(_ad, 0.5D)").alias("mad"))
    rz = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > 0)
        .select("event_id", "event_type", "value", "med", "mad", rz.alias("robust_z"))
        .where(F.abs(F.col("robust_z")) > 3.0)
    )


EVENTS_ANOMALY_MAD_SQL = """
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
),
dev AS (
    SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
    FROM events e JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type)
SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
       (d.value - d.med) / (1.4826 * m.mad) AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND abs((d.value - d.med) / (1.4826 * m.mad)) > 3.0
"""


# --- per-document character entropy -------------------------------------------

def documents_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's character distribution — the
    classic gibberish/boilerplate signal (near-zero = one repeated char,
    high = uniform noise; prose sits in a narrow band). H = ln(n) −
    (Σ c·ln c)/n over per-char counts, so every ln argument is an exact
    integer and the one float expression quantizes to micros immediately.
    One explode + two keyed groupBys, all map-side partial; the char
    relation is ≤ alphabet-sized per doc."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("_ch")
    ).where(F.col("_ch") != "")
    counts = chars.groupBy("doc_id", "_ch").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("_c").alias("n_chars_counted"),
        F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double"))).alias("_clnc"),
    )
    h = F.log(F.col("n_chars_counted").cast("double")) - F.col("_clnc") / F.col(
        "n_chars_counted"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "n_chars_counted",
        F.floor(h * 1_000_000 + F.lit(0.5)).cast("long").alias("entropy_micro"),
    )


DOCS_CHAR_ENTROPY_SQL = """
WITH chars AS (
    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
    SELECT doc_id, ch, count(*) AS c FROM chars WHERE ch <> '' GROUP BY doc_id, ch
),
per_doc AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_counted,
           sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
    FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars_counted,
       CAST(FLOOR((ln(CAST(n_chars_counted AS DOUBLE))
                   - clnc / CAST(n_chars_counted AS DOUBLE)) * 1000000 + 0.5)
            AS BIGINT) AS entropy_micro
FROM per_doc
"""


# --- Spearman correlation of quality signals ----------------------------------

def documents_quality_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two quality signals (chars vs
    tokens) per language — the 'are my filters redundant?' diagnostic run
    before stacking curation rules. Fractional average ranks handle ties
    exactly (rank + (ties−1)/2, pure integers over one window pass per
    signal); the Pearson step runs on ranks via exact integer sums
    (Σr, Σr², Σr₁r₂ over BIGINTs — no streaming covariance), so the only
    float is the final ratio, quantized to micros. Two rank windows + one
    groupBy, all keyed by lang."""
    docs = load_table(spark, sf_dir, "documents")
    from polars_order_book_spark.operators.text import token_count

    base = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("_x"),
        token_count(F.col("text")).cast("long").alias("_y"),
    )
    ranked = base
    for col in ("_x", "_y"):
        w = Window.partitionBy("lang").orderBy(col)
        # average rank in HALF-units so it stays an exact integer:
        # 2*avg_rank = 2*rank + (ties-1)
        ranked = ranked.withColumn(
            f"{col}r2",
            (
                F.lit(2) * F.rank().over(w)
                + F.count(F.lit(1)).over(Window.partitionBy("lang", col))
                - F.lit(1)
            ).cast("long"),
        )
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_xr2").alias("_sx"),
        F.sum("_yr2").alias("_sy"),
        F.sum(F.col("_xr2") * F.col("_xr2")).alias("_sxx"),
        F.sum(F.col("_yr2") * F.col("_yr2")).alias("_syy"),
        F.sum(F.col("_xr2") * F.col("_yr2")).alias("_sxy"),
    )
    n = F.col("n_docs").cast("double")
    cov = F.col("_sxy").cast("double") - F.col("_sx").cast("double") * F.col("_sy").cast("double") / n
    vx = F.col("_sxx").cast("double") - F.col("_sx").cast("double") * F.col("_sx").cast("double") / n
    vy = F.col("_syy").cast("double") - F.col("_sy").cast("double") * F.col("_sy").cast("double") / n
    rho = cov / F.sqrt(vx * vy)
    return agg.where((vx > 0) & (vy > 0)).select(
        "lang",
        "n_docs",
        F.floor(rho * 1_000_000 + F.lit(0.5)).cast("long").alias("spearman_micro"),
    )


DOCS_QUALITY_CORR_SQL = r"""
WITH base AS (
    SELECT doc_id, lang, n_chars AS x,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS y
    FROM documents
),
ranked AS (
    SELECT lang,
           CAST(2 * rank() OVER (PARTITION BY lang ORDER BY x)
                + count(*) OVER (PARTITION BY lang, x) - 1 AS BIGINT) AS xr2,
           CAST(2 * rank() OVER (PARTITION BY lang ORDER BY y)
                + count(*) OVER (PARTITION BY lang, y) - 1 AS BIGINT) AS yr2
    FROM base
),
agg AS (
    SELECT lang, count(*) AS n_docs,
           CAST(sum(xr2) AS BIGINT) AS sx, CAST(sum(yr2) AS BIGINT) AS sy,
           CAST(sum(xr2*xr2) AS BIGINT) AS sxx, CAST(sum(yr2*yr2) AS BIGINT) AS syy,
           CAST(sum(xr2*yr2) AS BIGINT) AS sxy
    FROM ranked GROUP BY lang
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(FLOOR(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n_docs AS DOUBLE))
         / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n_docs AS DOUBLE))
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n_docs AS DOUBLE)))
         * 1000000 + 0.5) AS BIGINT) AS spearman_micro
FROM agg
WHERE (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n_docs AS DOUBLE)) > 0
  AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n_docs AS DOUBLE)) > 0
"""


# --- daily gap-fill + linear interpolation -----------------------------------

def events_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's mean daily value densified to EVERY day in their active
    range, holes linearly interpolated between nearest observed days —
    the regular-grid feature table a model consumes instead of the raw
    sparse stream. Daily mean = exact decimal sum / count; the grid and
    interpolation run in ``operators.timeseries.gap_fill_linear`` (one
    sequence+explode, one co-partitioned join, one window pass per
    direction)."""
    from polars_order_book_spark.operators.timeseries import gap_fill_linear

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        # floor(), not cast(long): the cast truncates TOWARD ZERO while
        # the oracle's // floors — a pre-1970 timestamp would shift the
        # day-grid key by one (r8; the lag_autocorrelation hazard)
        F.floor(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day"),
    ).agg(
        (F.sum(_dec(F.col("value"))).cast("double") / F.count(F.lit(1)))
        .alias("day_value")
    )
    out = gap_fill_linear(daily, by=["user_id"], idx_col="day", value_col="day_value")
    return out.select(
        "user_id", "day", "day_value", F.col("is_observed").cast("boolean")
    )


EVENTS_INTERPOLATE_SQL = """
WITH daily AS (
    SELECT user_id,
           CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
           CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS v
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT user_id, min(day) AS lo, max(day) AS hi FROM daily GROUP BY user_id
), grid AS (
    SELECT b.user_id, gs.day
    FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi)) AS day) gs
), dense AS (
    SELECT g.user_id, g.day, d.v
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
), filled AS (
    SELECT user_id, day, v,
           last_value(v IGNORE NULLS) OVER wp AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wp AS pi,
           first_value(v IGNORE NULLS) OVER wn AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wn AS ni
    FROM dense
    WINDOW wp AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, day,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN pv + (nv - pv) * (CAST(day - pi AS DOUBLE)
                                   / CAST(ni - pi AS DOUBLE))
            WHEN pv IS NOT NULL THEN pv
            ELSE nv END AS day_value,
       v IS NOT NULL AS is_observed
FROM filled
"""


# --- percentile winsorization -------------------------------------------------

def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type P5/P95 winsorization report — the outlier-clamping step of
    feature normalization, as clamp-and-aggregate (the clamped COLUMN is
    what a pipeline materializes; the per-type report is what the driver
    can hash). Exact interpolated percentiles (same engine-parity contract
    as events_value_quantiles) join back onto the facts; at bounded type
    cardinality AQE broadcasts the 5-row bounds relation, so the fact side
    never shuffles. Clamped sums are decimal-exact.

    At 100 TB: swap percentile() for approx_percentile() and accept an
    epsilon bound shift — the clamp join and aggregate shapes are unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    qs = F.expr("percentile(value, array(0.05D, 0.95D))")
    bounds = ev.groupBy("event_type").agg(
        qs[0].alias("_lo"), qs[1].alias("_hi")
    )
    clamped = ev.join(bounds, "event_type").select(
        "event_type",
        "value",
        "_lo",
        "_hi",
        F.least(F.greatest(F.col("value"), F.col("_lo")), F.col("_hi")).alias("_w"),
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") < F.col("_lo")).cast("long")).alias("n_clamped_low"),
        F.sum((F.col("value") > F.col("_hi")).cast("long")).alias("n_clamped_high"),
        F.min("_lo").alias("p05"),
        F.min("_hi").alias("p95"),
        F.sum(_dec(F.col("_w"), 18, 6)).cast("double").alias("sum_winsorized"),
    )


EVENTS_WINSORIZE_SQL = """
WITH bounds AS (
    SELECT event_type,
           quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
    FROM events GROUP BY event_type
), clamped AS (
    SELECT e.event_type, e.value, b.lo, b.hi,
           least(greatest(e.value, b.lo), b.hi) AS w
    FROM events e JOIN bounds b ON e.event_type = b.event_type
)
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
       min(lo) AS p05, min(hi) AS p95,
       CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS sum_winsorized
FROM clamped GROUP BY event_type
"""


# --- frequent behavioral sequence patterns -----------------------------------

def events_pattern_3grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent length-3 event-type sequences per user stream (sliding, not
    tumbling: every consecutive triple counts) with support = fraction of
    users exhibiting the pattern — the sequence-mining feature behind
    funnel discovery. Two lag columns from ONE window pass (same sort),
    distinct per (user, pattern) before support so a user looping a pattern
    counts once; counts exact, support one final division by the exact
    user total."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = ev.select(
        "user_id",
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).where(F.col("t1").isNotNull())
    pat = triples.select(
        "user_id", F.concat_ws(">", "t1", "t2", "t3").alias("pattern")
    )
    per_user = pat.distinct()
    # Lazy total via a 1-row broadcast (the whitelisted normalizer-BNLJ
    # pattern, same as orders_quality_report) — no eager job at
    # construction time.
    total = ev.agg(F.count_distinct("user_id").alias("__nu"))
    counts = pat.groupBy("pattern").agg(F.count(F.lit(1)).alias("n_occurrences"))
    users = per_user.groupBy("pattern").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        counts.join(users, "pattern")
        .crossJoin(F.broadcast(total))
        .select(
            "pattern",
            "n_occurrences",
            "n_users",
            (F.col("n_users").cast("double") / F.col("__nu").cast("double")).alias(
                "user_support"
            ),
        )
        .where(F.col("n_users") >= 2)
    )


EVENTS_PATTERN_3GRAMS_SQL = """
WITH triples AS (
    SELECT user_id,
           lag(event_type, 2) OVER w AS t1,
           lag(event_type, 1) OVER w AS t2,
           event_type AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pat AS (
    SELECT user_id, concat_ws('>', t1, t2, t3) AS pattern
    FROM triples WHERE t1 IS NOT NULL
), counts AS (
    SELECT pattern, count(*) AS n_occurrences FROM pat GROUP BY pattern
), users AS (
    SELECT pattern, count(*) AS n_users
    FROM (SELECT DISTINCT user_id, pattern FROM pat) GROUP BY pattern
), tot AS (SELECT count(DISTINCT user_id) AS nu FROM events)
SELECT c.pattern, c.n_occurrences, u.n_users,
       CAST(u.n_users AS DOUBLE) / CAST(tot.nu AS DOUBLE) AS user_support
FROM counts c JOIN users u ON c.pattern = u.pattern, tot
WHERE u.n_users >= 2
"""


# --- k-anonymity audit ---------------------------------------------------------

def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the release-candidate quasi-identifier tuple
    (event_type, day, item-decile): for every QI group, how many distinct
    users share it and whether the group clears k=5 — the check a privacy
    review runs BEFORE exporting interaction data (a QI group smaller than k
    re-identifies its members; Sweeney 2002). Generalization is explicit:
    ts -> day, item -> item % 10. One distinct + one groupBy, both map-side
    partial; output is QI-domain-sized, never event-sized."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.where(F.col("user_id").isNotNull()).select(
        "event_type",
        # string day, not DATE: the repo's cross-engine output convention
        # (pandas date objects vs datetime64 hash differently)
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        F.pmod(
            F.get_json_object(F.col("props"), "$.k").cast("long"), F.lit(10)
        ).alias("item_bucket"),
        "user_id",
    ).distinct()
    return (
        qi.groupBy("event_type", "day", "item_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("is_k_anonymous", F.col("group_size") >= 5)
    )


EVENTS_K_ANONYMITY_SQL = """
WITH qi AS (
    SELECT DISTINCT event_type,
           strftime(ts, '%Y-%m-%d') AS day,
           -- pmod twin of the Spark side (r8): % keeps the dividend's
           -- sign, which would split QI groups differently for negative k
           ((CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) + 10) % 10 AS item_bucket,
           user_id
    FROM events WHERE user_id IS NOT NULL
)
SELECT event_type, day, item_bucket,
       count(*) AS group_size,
       count(*) >= 5 AS is_k_anonymous
FROM qi GROUP BY event_type, day, item_bucket
"""


# --- per-lang percentile normalization ----------------------------------------

def documents_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile normalization of a quality signal (here
    n_chars): percent_rank + a decile bucket — the calibration step before
    mixing quality scores across languages (raw score scales are not
    comparable between langs; percentile ranks are). percent_rank is the
    exact rational (rank-1)/(n-1) with identical tie semantics in Spark and
    DuckDB, so the double is engine-identical. Scale: one window per lang
    partition — bounded by the largest language, the floor for any per-group
    ranking; never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    pct = F.percent_rank().over(w)
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        pct.alias("pct_rank"),
        F.least(F.floor(pct * 10).cast("long"), F.lit(9)).alias("decile"),
    )


DOCS_QUALITY_PERCENTILE_SQL = """
SELECT doc_id, lang, n_chars,
       percent_rank() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS pct_rank,
       least(CAST(floor(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) * 10) AS BIGINT), 9) AS decile
FROM documents
"""
