"""Relational operator catalog: scans, joins, aggregations, windows,
set ops, top-k, incremental/watermark semantics — the generalized Spark
surface for the reference's operator inventory (SURVEY §2), exercised
over the synthetic star schema.

Each query is a declarative DataFrame plan (Catalyst handles pushdown,
pruning, join selection); small dimensions are broadcast explicitly
where the reference's design implies it (the `users` control-dim
pattern, SURVEY §2.7 J1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.functions.scalars import (
    parse_ctime_utc,
    parse_long_date,
    parse_purchase_date,
    rating_from_alt,
)
from backend_etl_spark.operators.asof import asof_join
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table, register_views

# ---------------------------------------------------------------------------
# aggregation over a pruned scan (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                            AS sum_qty,
           round(sum(l_extendedprice), 2)                                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
           round(avg(l_quantity), 4)                                            AS avg_qty,
           round(avg(l_extendedprice), 4)                                       AS avg_price,
           round(avg(l_discount), 4)                                            AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan → hash aggregate. Filter and the 7-column projection
    both push into the parquet scan; partial aggregation is map-side."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# flagship: broadcast-dim join → agg → deterministic top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's 'per company, recent-mention volume'
    question over the star schema — pruned scans, broadcast customer dim
    (the `users` role), two joins, aggregate, deterministic top-10."""
    tune(spark)
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join with broadcast dims + local-supplier equality
    (c_nationkey = s_nationkey). Only lineitem ⋈ orders shuffles; every
    dimension side broadcasts."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "join_region_revenue",
    oracle="""
    SELECT r_name,
           count(*)                      AS n_orders,
           round(sum(o_totalprice), 2)   AS total_revenue
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-stamping join chain (J1): facts stamped with region via
    broadcast snowflake dims, then aggregated."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# semi / anti / outer joins (K-sink dedup + dispatch-guard parity, J2/P10)
# ---------------------------------------------------------------------------


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the engine's ON CONFLICT DO NOTHING building
    block (SURVEY §2.7 J2): keys in the batch that do NOT exist in the sink."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_semi_customers_with_f_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — existence predicate without multiplying rows."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "join_outer_customer_order_stats",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey)                            AS n_orders,
           coalesce(round(sum(o_totalprice), 2), 0.0)   AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_outer_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers, with NULL→0
    defaulting (the reference's F12 `or 0` idiom)."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation breadth: multi-key, distinct, rollup/cube/grouping sets
# ---------------------------------------------------------------------------


@register(
    "agg_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                      AS n_orders,
           round(sum(o_totalprice), 2)   AS sum_price,
           min(o_totalprice)             AS min_price,
           max(o_totalprice)             AS max_price
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key group-by with count/sum/avg — the basic multi-dimension
    aggregate (map-side partials, one shuffle)."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "agg_distinct_customers_per_status",
    oracle="""
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase distinct
    aggregate; the exact counterpart of approx_count_distinct."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


@register(
    "agg_rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with an explicit grouping-bit id so subtotal rows are
    unambiguous across engines."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag").cast("bigint") * 2
             + F.grouping("l_linestatus").cast("bigint")).alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@register(
    "agg_cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 2^2 grouping combinations in
    one pass (the OLAP cross-tab materialization)."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus").cast("bigint") * 2
             + F.grouping("o_orderpriority").cast("bigint")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*)                       AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — same SQL text runs on Spark SQL and the oracle."""
    tune(spark)
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_3rsd_fine,
           TRUE AS within_3rsd_coarse
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type, at two
    precision settings (rsd 0.01 dense-register and 0.05 coarse).

    The raw sketch estimate is engine-opaque (Spark's HLL++ and
    DuckDB's HLL produce different values), so the estimate itself
    cannot be value-hashed cross-engine; for 5 rounds this entry was
    the catalog's only rows-only check. Restructured to the house
    bounded-error attestation pattern (agg_approx_error_bounded,
    pack_bestfit_bins): the hashed output is the EXACT distinct count —
    SQL-expressible on both engines — plus per-group booleans asserting
    |approx − exact| / exact < 3·rsd for each precision. The sketch
    still runs only Spark-side; a broken sketch now surfaces as a hash
    mismatch instead of hiding behind a rows-only row.

    Two-level shape (r9): distinct (event_type, user_id) pairs first,
    then ONE count + both sketches over the pairs. Mixing
    count_distinct with the HLL aggregates in one agg made Spark carry
    an HLL buffer through the per-distinct-key partial state — measured
    3.1 s vs 0.95 s at sf0.1 for identical output (HLL is
    duplicate-insensitive, so sketching the distinct pairs produces the
    bit-identical register state); at 100 TB the pair aggregate is also
    the form with map-side combine on the wide shuffle."""
    tune(spark)
    # NULL keys dropped up front: count_distinct / COUNT(DISTINCT) /
    # the sketches all ignore NULL, but a bare count over pairs would
    # count a (group, NULL) row — filter first so the two-level form
    # keeps the exact semantics for any input (r9 review)
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
    )
    g = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("fine"),
        F.approx_count_distinct("user_id", 0.05).alias("coarse"),
    )
    exact = F.col("exact_users").cast("double")

    def within(est: str, rsd: float) -> Column:
        return (F.abs(F.col(est) - F.col("exact_users")) / exact) < 3 * rsd

    return g.select(
        "event_type",
        "exact_users",
        within("fine", 0.01).alias("within_3rsd_fine"),
        within("coarse", 0.05).alias("within_3rsd_coarse"),
    )


@register(
    "agg_approx_error_bounded",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS within_3rsd
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_error_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level attestation for the HLL++ sketch: per group, assert
    |approx − exact| / exact < 3·rsd (rsd=0.01 — HLL++'s published
    relative standard deviation; 3σ ⇒ the bound holds w.p. ~99.7%, and
    deterministically here since the sketch is seed-free). Only the
    Spark side runs the sketch; both engines emit the exact count and
    the boolean, so a broken sketch surfaces as a hash mismatch instead
    of hiding behind a rows-only check.

    Two-level shape (r9; see agg_approx_count_distinct): distinct
    (status, custkey) pairs first, then count + sketch over the pairs —
    identical output (HLL is duplicate-insensitive), measured 3.1 s →
    0.95 s at sf0.1, and no HLL buffer rides the per-distinct-key
    partial state."""
    tune(spark)
    rsd = 0.01
    # NULL-key filter + bare distinct: see agg_approx_count_distinct
    pairs = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_custkey")
        .where(F.col("o_custkey").isNotNull())
        .distinct()
    )
    g = pairs.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd).alias("approx"),
    )
    err = F.abs(F.col("approx") - F.col("exact_customers")) / F.col(
        "exact_customers"
    ).cast("double")
    return g.select(
        "o_orderstatus", "exact_customers", (err < 3 * rsd).alias("within_3rsd")
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the scalable 'top orders per
    tenant' pattern (no global sort; one shuffle on the partition key)."""
    tune(spark)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_revenue
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer with an explicit ROWS frame and a
    deterministic secondary sort key."""
    tune(spark)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    )


@register(
    "window_lag_value_delta",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                       CAST(value AS DECIMAL(18,6)) AS dv
                FROM events)
    SELECT event_id, user_id, ts, value,
           CAST(round(dv - lag(dv) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id), 2)
                AS DOUBLE) AS value_delta
    FROM ev
    """,
)
def window_lag_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() over the event stream — per-entity deltas (NULL on first).

    The delta is computed in EXACT decimal: events.value is 6-dp data,
    so DECIMAL(18,6) subtraction is exact and the 2-dp rounding of an
    exact .xx5000 midpoint is deterministic (away-from-zero) on both
    engines. round() on the raw DOUBLE delta diverged at sf1 — 4 of 1M
    rows landed within an ulp of a midpoint, where Spark (HALF_UP on
    the shortest decimal repr) and DuckDB (half-away on the binary)
    disagree."""
    tune(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(dv - F.lag(dv).over(w), 2).cast("double").alias("value_delta"),
    )


def sessionize_frame(ev: DataFrame) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum over
    (event_id, user_id, ts) — shared by the plain entry and the
    bucketed-layout entry, which must produce the identical relation
    from a shuffle-free plan."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(wrun).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )



@register(
    "window_sessionize_events",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum —
    the batch equivalent of a session window; integer-microsecond gap
    math so both engines agree exactly."""
    tune(spark)
    return sessionize_frame(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# set ops, top-k, union-dedup
# ---------------------------------------------------------------------------


@register(
    "setop_intersect_f_and_o_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_f_and_o_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics) of two filtered projections —
    customers appearing in both order-status classes."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "setop_except_no_f_orders",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_no_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT via subtract — distinct keys present overall but absent
    from the F class (set-difference anti pattern)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_custkey").subtract(
        orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    )


@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    tune(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "union_dedup_two_feeds",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
    UNION
    SELECT event_id, user_id, event_type FROM events WHERE value > 150.0
    """,
)
def union_dedup_two_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's two-query union (Reddit url:/bare search, SURVEY
    §2.8 U1): overlapping feeds unioned then deduplicated."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "event_type")
    b = ev.where(F.col("value") > 150.0).select("event_id", "user_id", "event_type")
    return a.unionByName(b).distinct()


# ---------------------------------------------------------------------------
# semi-structured + scalar-function parity (N6, F1-F13)
# ---------------------------------------------------------------------------


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*)                                                       AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)  AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON props (the reference's transient nested JSON,
    SURVEY §2.4 N6) parsed and aggregated."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "ts_parse_formats",
    oracle="""
    WITH base AS (SELECT event_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts2,
                         CAST(ts AS TIMESTAMP) AS ts
                  FROM events)
    SELECT event_id,
           strptime(substr(strftime(ts2, '%a %b %d %H:%M:%S %Y'), 5),
                    '%b %d %H:%M:%S %Y')                                  AS parsed_ctime,
           make_timestamp(epoch_us(ts2))                                  AS parsed_epoch_s,
           epoch_ms(epoch_ms(ts2))                                        AS parsed_epoch_ms,
           CAST(strptime(strftime(ts, '%d %B %Y'), '%d %B %Y') AS DATE)   AS parsed_long_date,
           CAST(strptime(regexp_replace('Date of purchase: ' || strftime(ts, '%d/%m/%Y'),
                                        '^Date of purchase: ', ''),
                         '%d/%m/%Y') AS DATE)                             AS parsed_purchase_date
    FROM base
    """,
)
def ts_parse_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's four timestamp encodings (F1-F5) round-tripped:
    format each event ts into the source encoding, then parse back with
    the engine's scalar layer. Each engine formats AND parses with its
    own functions — matching outputs prove parser parity."""
    tune(spark)
    from backend_etl_spark.operators.partitioning import spread

    # widen the narrow local scan: five format/parse round-trips per
    # row are pure compute and would otherwise run single-core on a
    # one-split file (no-op at real scale)
    ev = spread(
        load_table(spark, sf_dir, "events").select("event_id", "ts"), "event_id"
    )
    ts2 = F.date_trunc("second", F.col("ts"))
    ctime_str = F.date_format(ts2, "EEE MMM dd HH:mm:ss yyyy")
    purchase_str = F.concat(F.lit("Date of purchase: "), F.date_format("ts", "dd/MM/yyyy"))
    return ev.select(
        "event_id",
        parse_ctime_utc(ctime_str).alias("parsed_ctime"),
        F.timestamp_seconds(F.unix_timestamp(ts2)).alias("parsed_epoch_s"),
        F.timestamp_millis(F.unix_millis(ts2)).alias("parsed_epoch_ms"),
        parse_long_date(F.date_format("ts", "dd MMMM yyyy")).alias("parsed_long_date"),
        parse_purchase_date(purchase_str).alias("parsed_purchase_date"),
    )


@register(
    "scalar_function_showcase",
    oracle="""
    SELECT event_id,
           CAST(string_split('Rated ' || CAST(event_id % 5 + 1 AS VARCHAR)
                             || ' out of 5 stars', ' ')[2] AS INT)        AS rating,
           coalesce(nullif(event_type, 'error'), 'unknown')               AS kind,
           concat_ws('-', 'u', CAST(user_id AS VARCHAR))                  AS user_tag,
           trim('  ' || event_type || ' ')                                AS trimmed
    FROM events
    """,
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar surface parity: star-rating alt-text parse (F8), NULL
    defaulting via nullif/coalesce (F12/P2), concat_ws (F10), trim (F9)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    alt = F.concat(
        F.lit("Rated "), (F.col("event_id") % 5 + 1).cast("string"), F.lit(" out of 5 stars")
    )
    return ev.select(
        "event_id",
        rating_from_alt(alt).alias("rating"),
        F.coalesce(F.expr("nullif(event_type, 'error')"), F.lit("unknown")).alias("kind"),
        F.concat_ws("-", F.lit("u"), F.col("user_id").cast("string")).alias("user_tag"),
        F.trim(F.concat(F.lit("  "), F.col("event_type"), F.lit(" "))).alias("trimmed"),
    )


# ---------------------------------------------------------------------------
# as-of / range joins over the event stream
# ---------------------------------------------------------------------------


@register(
    "asof_purchase_last_click",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
                FROM events)
    SELECT p.event_id, p.user_id, p.ts,
           c.ts    AS asof_ts,
           c.value AS asof_value
    FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the most recent prior click by
    the same user. Implemented with the union+last(ignorenulls) trick
    (operators/asof.py) — one shuffle, no pair explosion."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], prefix="asof_",
    )
    return out.select("event_id", "user_id", "ts", "asof_ts", "asof_value")


@register(
    "range_join_clicks_before_purchase",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                FROM events)
    SELECT p.event_id, p.user_id, count(c.ts) AS n_clicks_5m
    FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >  p.ts - INTERVAL 5 MINUTE
     AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join (equality on user + time band) — hash join on
    the equi-key with the band as a post-filter, then aggregate."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy(
        F.col("event_id"), F.col("p_user").alias("user_id")
    ).agg(F.count("c_ts").alias("n_clicks_5m"))


# ---------------------------------------------------------------------------
# incremental / watermark semantics (SURVEY §2.10 W1-W3, §2.1 S11-S12)
# ---------------------------------------------------------------------------


@register(
    "incremental_watermark_scan",
    oracle="""
    WITH wm AS (
      SELECT user_id, max(CAST(ts AS TIMESTAMP)) AS watermark
      FROM events
      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-25 00:00:00'
      GROUP BY user_id
    )
    SELECT c_custkey AS tenant_id, watermark,
           CASE WHEN watermark IS NULL THEN 'catchup' ELSE 'general' END AS mode
    FROM customer LEFT JOIN wm ON c_custkey = user_id
    WHERE c_custkey < 200
      AND (watermark IS NULL OR watermark < TIMESTAMP '2024-01-24 00:00:00')
    """,
)
def incremental_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The control-plane scan pair (S11 stale + S12 never-fetched) as one
    query: tenants with NULL watermark → catchup, stale watermark →
    general. Broadcast watermark aggregate onto the tenant dim."""
    tune(spark)
    snapshot = F.lit("2024-01-25 00:00:00").cast("timestamp")
    stale_cutoff = F.lit("2024-01-24 00:00:00").cast("timestamp")
    wm = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts") < snapshot)
        .groupBy("user_id")
        .agg(F.max("ts").alias("watermark"))
    )
    tenants = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    return (
        tenants.join(F.broadcast(wm), tenants.c_custkey == wm.user_id, "left")
        .where(F.col("watermark").isNull() | (F.col("watermark") < stale_cutoff))
        .select(
            F.col("c_custkey").alias("tenant_id"),
            "watermark",
            F.when(F.col("watermark").isNull(), "catchup")
            .otherwise("general")
            .alias("mode"),
        )
    )


@register(
    "ingest_dedup_anti_join",
    oracle="""
    SELECT event_type, count(*) AS n_new
    FROM events b
    WHERE CAST(b.ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
      AND CAST(b.ts AS TIMESTAMP) <  TIMESTAMP '2024-01-20 00:00:00'
      AND NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_id = b.event_id AND e.event_id % 3 = 0)
    GROUP BY event_type
    """,
)
def ingest_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON CONFLICT DO NOTHING as a plan (J2/K*): a windowed batch
    anti-joined against already-ingested keys, then counted per type."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    batch = ev.where(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    )
    existing = ev.where(F.col("event_id") % 3 == 0).select("event_id")
    return (
        batch.join(existing, "event_id", "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )


# ---------------------------------------------------------------------------
# TPC-H-style breadth: q10 / q12-style / q14-style
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(c_acctbal, 2) AS acctbal,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    half-year window. Fact-side filters (returnflag + date) push into
    the scans; customer/nation broadcast; one shuffle for the agg."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_split",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation splitting line counts by
    order priority class within a shipdate year."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share in one month — broadcast
    part join + conditional ratio aggregate (single-row output)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "asof_forward_next_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, min(c.ts) AS next_click_ts
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id AND c.ts >= p.ts
     AND c.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def asof_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each purchase gets the next click
    within 1 hour (pandas merge_asof 'forward' semantics). Same
    union + running-carry plan as the backward variant — one shuffle,
    no pair materialization; the oracle is the naive O(pairs) form."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=[],
        direction="forward",
        tolerance_s=3600,
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("asof_ts").alias("next_click_ts")
    )


@register(
    "range_join_binned_global",
    oracle="""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
    SELECT p.event_id, CAST(count(c.ts) AS BIGINT) AS n_any_clicks_5m
    FROM (SELECT event_id, ts FROM ev WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT ts FROM ev WHERE event_type = 'click') c
      ON c.ts > p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
    GROUP BY p.event_id
    """,
)
def range_join_binned_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equality key (any click within 5 min before
    each purchase): time-bin bucketing replicates each click into 2
    buckets and turns the pure inequality join into a hash equi-join +
    band filter — bounded 2x fan-out instead of the cartesian fallback.
    The count collapses map-side via binned_interval_count (r9): pairs
    grow ~100× per decade with event density, so they never reach a
    shuffle — the generic left-join + re-aggregate path shuffled the
    pair stream three times and was the catalog's last super-linear
    solo slope (1.078 at r8). The oracle is the naive inequality form
    (DuckDB IEJoin handles it)."""
    tune(spark)
    from backend_etl_spark.operators.interval import binned_interval_count

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("p_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(F.col("ts").alias("c_ts"))
    counted = binned_interval_count(
        p, c, "p_ts", "c_ts", band_s=300,
        key_cols=["event_id"], out_col="n_any_clicks_5m",
    )
    return counted.select("event_id", "n_any_clicks_5m")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter-aggregate — every predicate (date
    band, discount band, quantity) pushes into the parquet scan and the
    whole query is one map-side partial + single-row reduce."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q4_priority_with_late_lines",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table comparison
    (any line shipped after the order date) → left-semi join on the
    order key with the correlation as a join-side filter."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "join_full_outer_nation_presence",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
    s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk)                    AS nationkey,
           CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (customer vs supplier
    presence per nation) — NULL-completing both directions, zero-filled.
    Pre-aggregating BEFORE the outer join keeps the join input at
    |nations|, not |customers|+|suppliers|."""
    tune(spark)
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, c.c_nk == s.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).cast("bigint").alias("n_suppliers"),
        )
    )


@register(
    "catalog_table_inventory",
    oracle="""
    SELECT 'region' AS table_name, count(*) AS n FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def catalog_table_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count inventory of every source table in one query — the
    cheap full-catalog smoke (each count is a parquet-metadata read,
    no data scan)."""
    tune(spark)
    from backend_etl_spark.sources.loader import TABLES

    out = None
    for t in TABLES:
        c = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("table_name"), "n")
        )
        out = c if out is None else out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# layout-at-rest: bucketed and partitioned writes (round-4 item 7)
# ---------------------------------------------------------------------------


@register(
    "bucketed_sessionize_events",
    # identical relation to the plain entry — layout must not change answers
    oracle=None,  # patched below to share window_sessionize_events' oracle
)
def bucketed_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-at-rest proof: events written BUCKETED on user_id (the
    pre-bucketing the funnel/retention docstrings assume at 100 TB),
    then re-read and sessionized — the window's partitionBy(user_id) and
    the final groupBy are both satisfied by the bucketed scan, so the
    whole plan runs with ZERO Exchange operators
    (tests/test_plan_quality.py asserts it) while hash-matching the
    plain shuffling entry exactly. At 100 TB this converts every
    per-user stage downstream of the nightly ingest write into a
    shuffle-free local sort."""
    from backend_etl_spark.sources.loader import staging_dir, write_bucketed

    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # per-process staging (loader.staging_dir): reused within a process
    # so runs don't leak a table copy each, but keyed by mkdtemp so two
    # concurrent sessions (pytest sf0.01 vs bench sf0.1) never clobber
    # each other's registered location
    write_bucketed(
        ev,
        "events_by_user",
        "user_id",
        n_buckets=8,
        sort=False,
        path=staging_dir("layout", "events_by_user"),
    )
    return sessionize_frame(spark.table("events_by_user"))


# share the oracle: the bucketed plan must reproduce the plain relation
from backend_etl_spark.catalog.registry import REGISTRY as _REG  # noqa: E402

_REG["bucketed_sessionize_events"].oracle = _REG["window_sessionize_events"].oracle


@register(
    "partitioned_ship_year_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE year(l_shipdate) = 1995
    GROUP BY l_returnflag
    """,
)
def partitioned_ship_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-at-rest proof #2: lineitem written hive-PARTITIONED on
    ship_year, re-read with a year predicate — the filter becomes a
    PartitionFilter (directory pruning: non-matching years are never
    opened, tests assert it reaches the scan), and the aggregate runs on
    the 1/7th slice. The partition column is derived at write time
    (year(l_shipdate)) — the standard time-partitioned fact layout."""
    from backend_etl_spark.sources.loader import staging_dir, write_partitioned

    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        F.year("l_shipdate").alias("ship_year"),
    )
    # per-process staging — see bucketed_sessionize_events
    write_partitioned(
        li,
        "lineitem_by_shipyear",
        "ship_year",
        path=staging_dir("layout", "lineitem_by_shipyear"),
    )
    return (
        spark.table("lineitem_by_shipyear")
        .where(F.col("ship_year") == 1995)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@register(
    "layout_zorder_key",
    oracle=None,  # patched below (needs the generated bit-twiddling SQL)
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-at-rest #3: the 32-bit Morton (z-order) key over
    (user_id, hour-of-epoch) — sorting the events fact by this ONE key
    clusters BOTH dimensions, so per-file min/max stats prune
    `user_id = ?` scans AND `ts BETWEEN` scans at once (what a
    lexicographic sort only gives its leading column). The key is pure
    bit arithmetic, attested bit-for-bit against the DuckDB twin;
    tests/test_plan_quality.py proves the skipping effect on real
    per-file column ranges. At 100 TB this is OPTIMIZE ZORDER for a
    plain parquet lake: repartitionByRange(zkey) + sortWithinPartitions
    at write time, no engine extension needed."""
    from backend_etl_spark.operators.zorder import morton_key

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    # 8-bit buckets per dimension: comparable bit-widths make the
    # interleave cluster BOTH dimensions (a 16-bit dim next to a 7-bit
    # dim would let the wide dim's high bits dominate the sort order).
    # The id dim is multiplicatively hashed (odd multiplier = bijection
    # mod 256) so it fills its lane at ANY tenant cardinality — ids are
    # point-predicate columns, so spreading them costs nothing; the time
    # dim keeps natural order for range predicates
    user_dim = (F.col("user_id") * 167 % 256).cast("bigint")
    hour_dim = (
        (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600).cast("bigint")
        % 256
    )
    return ev.select(
        "event_id",
        user_dim.alias("user_dim"),
        hour_dim.alias("hour_dim"),
        morton_key(user_dim, hour_dim).alias("zkey"),
    )


from backend_etl_spark.operators.zorder import morton_key_sql as _mz  # noqa: E402

_REG["layout_zorder_key"].oracle = f"""
    WITH d AS (
      SELECT event_id,
             CAST((user_id * 167) % 256 AS BIGINT) AS user_dim,
             CAST((CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                        AS BIGINT) // 3600) % 256 AS BIGINT) AS hour_dim
      FROM events)
    SELECT event_id, user_dim, hour_dim,
           {_mz("user_dim", "hour_dim")} AS zkey
    FROM d
"""


@register(
    "layout_compact_small_files",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(event_id) AS BIGINT) AS min_eid,
           CAST(max(event_id) AS BIGINT) AS max_eid,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout-at-rest #4: SMALL-FILE COMPACTION — the #1 operational
    chore of a streaming lake (each micro-batch writes a file per
    partition; a week later the table is millions of KB-sized files and
    every scan pays open/footer cost per file). The entry stages events
    as 64 deliberately tiny files (a micro-batch sink's worth), then
    compacts: repartitionByRange on the time column (so compacted files
    are time-clustered and per-file min/max stats prune ts-range scans)
    + sortWithinPartitions + maxRecordsPerFile as the size governor.
    The hourly rollup of the COMPACTED re-read must hash-match the
    oracle computed straight from the source — compaction is pure
    layout, zero answer drift (tests assert the file-count collapse and
    the per-file time-clustering directly).

    Scale shape: compaction is ONE range shuffle (range exchange
    samples the key, so output files are even-sized under skew) and a
    map-side local sort — no aggregation state; at 100 TB it runs
    per-partition-incrementally (compact yesterday's hive partition,
    never the whole table)."""
    from backend_etl_spark.sources.loader import staging_dir

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    frag, compact = (
        staging_dir("layout", "events_fragmented"),
        staging_dir("layout", "events_compacted"),
    )
    # the "week of micro-batches": 64 round-robin fragments
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    (
        spark.read.parquet(frag)
        .repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 1_000_000)
        .parquet(compact)
    )
    out = spark.read.parquet(compact)
    return out.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("event_id").cast("bigint").alias("min_eid"),
        F.max("event_id").cast("bigint").alias("max_eid"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "schema_evolution_mergeschema",
    oracle="""
    WITH v1 AS (SELECT event_id, user_id, event_type,
                       CAST(NULL AS VARCHAR) AS channel
                FROM events WHERE event_id % 2 = 0),
    v2 AS (SELECT event_id, user_id, event_type,
                  CASE WHEN event_id % 3 = 0 THEN 'web'
                       WHEN event_id % 3 = 1 THEN 'ios'
                       ELSE 'android' END AS channel
           FROM events WHERE event_id % 2 = 1),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT coalesce(channel, '<pre-migration>') AS channel,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM u
    GROUP BY 1, 2
    """,
)
def schema_evolution_mergeschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on a parquet lake: day-1 files were written
    before the ``channel`` column existed; day-2 files carry it. A
    ``mergeSchema`` read unions the footers into one superset schema —
    old files surface NULL for the new column, no rewrite of history
    (the additive-evolution contract every long-lived ingest table
    relies on; the reference's ALTER-less sqlite tables get this for
    free by never adding columns — a 100 TB lake cannot).

    The aggregation buckets pre-migration rows under an explicit
    '<pre-migration>' label so the oracle attests exactly which rows
    lack the column. Scale shape: footer merge is metadata-only
    (per-file schemas union on the driver, data never rewritten);
    the rollup is one bounded groupBy."""
    from backend_etl_spark.sources.loader import staging_dir

    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    root = staging_dir("layout", "events_evolving")
    base = ev.select("event_id", "user_id", "event_type")
    base.where(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
        f"{root}/day=1"
    )
    channel = (
        F.when(F.col("event_id") % 3 == 0, "web")
        .when(F.col("event_id") % 3 == 1, "ios")
        .otherwise("android")
    )
    base.where(F.col("event_id") % 2 == 1).withColumn(
        "channel", channel
    ).write.mode("overwrite").parquet(f"{root}/day=2")
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy(
        F.coalesce(F.col("channel"), F.lit("<pre-migration>")).alias("channel"),
        F.col("event_type"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "gdpr_forget_partition_sweep",
    oracle="""
    SELECT CAST(user_id % 16 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE user_id % 97 <> 0
    GROUP BY 1
    """,
)
def gdpr_forget_partition_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN sweep on a partitioned lake: tombstoned
    users (user_id % 97 = 0 plays the deletion-request list) are purged
    from an events table hive-partitioned on a user-hash bucket — and
    ONLY the partitions that actually contain a tombstoned user are
    rewritten (spark.sql.sources.partitionOverwriteMode=dynamic: the
    overwrite replaces exactly the partitions present in the written
    frame). Unaffected partition files are untouched on disk —
    tests/test_plan_quality.py asserts their file listing is byte-stable
    across the sweep while affected partitions change.

    The swept slice is localCheckpoint()ed before the write because it
    reads the same path it overwrites (the read-overwrite conflict every
    in-place sweep hits); at 100 TB the same job runs per-bucket with
    the deletion list broadcast — cost scales with AFFECTED partitions,
    never the table (16 buckets here; thousands in production means a
    0.1% deletion list touches ~0.1% of bytes).

    The returned relation re-reads the table post-sweep: it must equal
    the oracle's 'events minus tombstoned users' — deletions complete,
    collateral loss zero."""
    from backend_etl_spark.operators.partitioning import forget_partitioned
    from backend_etl_spark.sources.loader import staging_dir

    tune(spark)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", (F.col("user_id") % 16).cast("bigint")
    )
    root = staging_dir("layout", "events_gdpr")
    ev.write.mode("overwrite").partitionBy("bucket").parquet(root)

    tombstones = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 97 == 0)
        .select("user_id")
        .distinct()
    )
    forget_partitioned(spark, root, tombstones, "user_id", "bucket")

    return (
        spark.read.parquet(root)
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
