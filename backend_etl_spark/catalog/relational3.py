"""TPC-H query-shape completion (the partsupp-free subset): Q7, Q8,
Q13, Q15, Q17, Q19, Q21, Q22.

With these, every TPC-H query expressible over the driver's synthetic
star schema (no ``partsupp`` table, no comment/phone/ship-detail
columns) has a catalog entry: 1, 3, 4, 5, 6, 7, 8, 10, 12, 13, 14, 15,
17, 18, 19, 21, 22. Q2/Q9/Q11/Q16/Q20 need ``partsupp`` and are out of
the fixture's reach. Where a predicate references a missing column the
query keeps the ORIGINAL plan shape (the thing that matters at 100 TB:
join topology, correlation pattern, disjunctive pushdown) with an
adapted predicate, noted per entry.

All joins against region/nation/supplier/customer/part broadcast
(dimension tables); every date filter reaches the parquet scan
(PushedFilters) — verified by tests/test_plan_quality.py's catalog-wide
gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_etl_spark.catalog.registry import register
from backend_etl_spark.session import tune
from backend_etl_spark.sources.loader import load_table


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship
    year — the disjunctive nation-pair predicate over a 4-fact/dim join.
    Both nation joins broadcast; the date filter is scan-pushed; the only
    shuffle is the final 3-key aggregate."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's market share of a part type
    inside one region, by order year — the deepest join in the suite
    (7 tables, lineitem the only fact that moves; every dim broadcasts)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _rev()
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, including
    zero-order customers — outer join with a join-time filter on the
    right side (adapted: priority exclusion stands in for the missing
    o_comment NOT LIKE), then a double aggregation."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    return (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — an
    aggregate reused twice (revenue per supplier + its global max). The
    revenue aggregate shuffles once; the scalar max rides a broadcast
    1-row frame (no second scan of lineitem)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS a_partkey, 0.2 * avg(l_quantity) AS threshold
            FROM lineitem GROUP BY l_partkey) pa
        ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
      AND l_quantity < threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the correlated
    per-part AVG subquery, decorrelated into one per-part aggregate
    joined back to the fact (the plan every optimizer rewrites Q17
    into; written directly). Adapted: p_type stands in for the missing
    p_container. l_quantity is integral so the 0.2*avg threshold is
    bit-exact on both engines.

    The per-part threshold relation is keyed by l_partkey and GROWS
    with the corpus, so it carries a merge hint (the r6 derived-side
    rule: Spark's through-plan size estimate of it stays frozen-tiny
    and the static planner would auto-broadcast a table with one row
    per part — a driver kill at 100 TB). The merge join is free here:
    the aggregate's shuffle already partitions its output by the join
    key, so the SMJ reuses that partitioning and only the fact side
    shuffles once."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part.hint("merge"), F.col("a_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_pushdown",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 5 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 10 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate spanning both join sides — the
    classic disjunctive-pushdown test. Catalyst distributes the
    single-side conjuncts (l_quantity bounds → lineitem scan, brand/size
    → part scan) while keeping the cross-side residual on the join.
    Adapted: p_size bands stand in for the missing p_container sets."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(5, 30))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(10, 40))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


@register(
    "q21_waiting_orders",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late supplier on a
    multi-supplier finalized order — the EXISTS + NOT EXISTS double
    correlation, planned as a semi-join plus an anti-join on the same
    key. Adapted: 'late' = shipped >60 days after the order date (the
    fixture has no commit/receipt dates)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey")
    )
    other_line = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            other_line,
            (F.col("okey") == F.col("o2")) & (F.col("skey") != F.col("s2")),
            "semi",
        )
        .join(
            other_late,
            (F.col("okey") == F.col("o3")) & (F.col("skey") != F.col("s3")),
            "anti",
        )
        .join(F.broadcast(supp), F.col("skey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_acctbal, c_nationkey
      FROM customer WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)),
    threshold AS (
      SELECT avg(c_acctbal) AS ab FROM eligible WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM eligible, threshold
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: above-average-balance customers who never ordered, by
    country — scalar AVG subquery (broadcast 1-row frame) + NOT EXISTS
    (anti-join against orders). Adapted: c_nationkey bands stand in for
    the missing c_phone country codes."""
    tune(spark)
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    ).select("c_custkey", "c_acctbal", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    ab = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                FROM events),
    v AS (SELECT user_id, min(ts) AS t_view
          FROM ev WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT ev.user_id, min(ev.ts) AS t_click
          FROM ev JOIN v ON v.user_id = ev.user_id AND ev.ts > v.t_view
          WHERE ev.event_type = 'click' GROUP BY ev.user_id),
    p AS (SELECT ev.user_id, min(ev.ts) AS t_purchase
          FROM ev JOIN c ON c.user_id = ev.user_id AND ev.ts > c.t_click
          WHERE ev.event_type = 'purchase' GROUP BY ev.user_id)
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev) AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased_after_click,
           CASE WHEN (SELECT count(*) FROM v) > 0 THEN
             round((SELECT count(*) FROM p)
                   / CAST((SELECT count(*) FROM v) AS DOUBLE), 4)
           END AS view_to_purchase_rate
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage counts users
    whose first stage-N event strictly follows their first stage-(N−1)
    event — the product-analytics conversion query. Three per-user
    aggregates chained by inequality-guarded joins; every stage shuffles
    on user_id, so one hash partitioning serves the whole funnel (at
    100 TB: pre-bucket events by user_id and no stage reshuffles)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(etype: str, prev: DataFrame | None, prev_col: str | None):
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            # merge hint: prev is a per-USER aggregate — corpus-growing
            # with a frozen-tiny through-agg estimate (the r6 derived-
            # side class); the SMJ reuses the user_id partitioning the
            # docstring promises, so no extra exchange
            e = e.join(prev.hint("merge"), "user_id").where(
                F.col("ts") > F.col(prev_col)
            )
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{etype}"))

    v = first_after("view", None, None)
    c = first_after("click", v, "t_view")
    p = first_after("purchase", c, "t_click")
    counts = [
        ev.agg(F.count_distinct("user_id").cast("bigint").alias("n_users")),
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed")),
        c.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked_after_view")),
        p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchased_after_click")),
    ]
    out = counts[0]
    for df in counts[1:]:
        out = out.crossJoin(F.broadcast(df))
    # zero-guard both engines identically: Spark Divide yields NULL on
    # 0-denominator while DuckDB (ieee_floating_point_ops) yields inf —
    # an explicit CASE/when keeps the degenerate no-view case at parity
    return out.withColumn(
        "view_to_purchase_rate",
        F.when(
            F.col("n_viewed") > 0,
            F.round(
                F.col("n_purchased_after_click") / F.col("n_viewed").cast("double"),
                4,
            ),
        ),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
              FROM ev GROUP BY user_id),
    active AS (SELECT DISTINCT ev.user_id, f.cohort_week,
                      CAST(floor(date_diff('day', f.cohort_week,
                                           date_trunc('week', ev.ts)) / 7)
                           AS BIGINT) AS week_offset
               FROM ev JOIN first f ON f.user_id = ev.user_id)
    SELECT cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM active
    GROUP BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their first
    event; each later active week becomes a (cohort, week-offset) cell —
    the second canonical product-analytics query after the funnel. Both
    aggregates and the join key on user_id, so one hash partitioning
    carries the whole plan; the matrix itself is O(weeks²) — tiny."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = (
        # merge hint: first is per-USER (corpus-growing derived side);
        # the join key matches both aggs' partitioning, zero extra cost
        ev.join(first.hint("merge"), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                ) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_users")
    )


# ---------------------------------------------------------------------------
# round 4: dense-calendar gap fill + iterative PageRank
# ---------------------------------------------------------------------------


@register(
    "timeseries_gap_fill_hourly",
    oracle="""
    WITH ev AS (SELECT event_type,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                       value
                FROM events),
    hours AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                            TIMESTAMP '2024-01-30 23:00:00',
                                            INTERVAL 1 HOUR)) AS h),
    types AS (SELECT DISTINCT event_type FROM ev),
    agg AS (SELECT event_type, h, count(*) AS n, round(sum(value), 2) AS sv
            FROM ev GROUP BY 1, 2)
    SELECT t.event_type,
           hours.h                              AS hour,
           CAST(coalesce(a.n, 0) AS BIGINT)     AS n_events,
           coalesce(a.sv, 0.0)                  AS sum_value
    FROM types t
      CROSS JOIN hours
      LEFT JOIN agg a ON a.event_type = t.event_type AND a.h = hours.h
    """,
)
def timeseries_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-calendar gap fill: every (event_type × hour) cell of the
    reporting window exists in the output, zero-filled where no events
    landed (2,732 of 3,600 cells here) — the series-densification every
    dashboard/forecasting feed needs, done engine-side. The hour spine
    is GENERATED (sequence + explode, no table scan), the series dim is
    tiny and broadcast, and the left join is the only shuffle-bearing
    stage (on the pre-aggregated cells relation, not raw events)."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "value",
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv")
    )
    grid = F.broadcast(types).crossJoin(F.broadcast(hours))
    return (
        grid.join(
            agg,
            (grid["event_type"] == agg["event_type"]) & (agg["h"] == grid["hour"]),
            "left",
        )
        .select(
            grid["event_type"],
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
        )
    )


_PR_N_ITERS = 3
_PR_DAMP = 0.85
_PR_MOD = 50


def _pagerank_oracle(iters: int = _PR_N_ITERS) -> str:
    sql = f"""
    WITH ed AS (
      SELECT DISTINCT user_id % {_PR_MOD} AS src, event_id % {_PR_MOD} AS dst
      FROM events WHERE user_id % {_PR_MOD} <> event_id % {_PR_MOD}),
    nodes AS (SELECT DISTINCT n FROM
              (SELECT src AS n FROM ed UNION SELECT dst FROM ed)),
    nn AS (SELECT count(*) AS c FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
    r0 AS (SELECT n AS node, round(1.0 / (SELECT c FROM nn), 6) AS r
           FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
    r{i} AS (
      SELECT nodes.n AS node,
             round(0.15 / (SELECT c FROM nn)
                   + {_PR_DAMP} * coalesce(sum(p.r / deg.d), 0), 6) AS r
      FROM nodes
        LEFT JOIN ed ON ed.dst = nodes.n
        LEFT JOIN r{i - 1} p ON p.node = ed.src
        LEFT JOIN deg ON deg.src = ed.src
      GROUP BY nodes.n)"""
    sql += f"""
    SELECT r{iters}.node                       AS node_id,
           r{iters}.r                          AS pagerank,
           CAST(coalesce(deg.d, 0) AS BIGINT)  AS out_degree
    FROM r{iters} LEFT JOIN deg ON deg.src = r{iters}.node"""
    return sql


@register("graph_pagerank_users", oracle=_pagerank_oracle())
def graph_pagerank_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled power iterations, d=0.85) over a
    deterministic interaction graph derived from events — the link-graph
    quality score web-corpus curation uses (Common Crawl-style harmonic/
    PageRank centrality feeding document quality weights). Dangling-node
    mass is dropped (ranks need not sum to 1) — the standard simplified
    formulation, identical in both engines.

    Scale shape: the rank vector stays DISTRIBUTED (node-keyed table;
    never collected); each iteration is edges ⋈ ranks on src (one
    shuffle onto dst for the contribution sum), exactly the
    label-propagation discipline of dedup_cluster_components, with
    6-dp per-iteration rounding making the trajectory
    engine-reproducible (kmeans contract). The iteration count is the
    convergence knob; 3 here keeps the oracle's unrolled CTEs honest."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events")
    ed = (
        ev.select(
            (F.col("user_id") % _PR_MOD).alias("src"),
            (F.col("event_id") % _PR_MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # iterations re-read edges, not events
    )
    nodes = (
        ed.select(F.col("src").alias("n"))
        .union(ed.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = nodes.select(
        F.col("n").alias("node"), F.round(F.lit(1.0) / n_nodes, 6).alias("r")
    )
    for _ in range(_PR_N_ITERS):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("d")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = nodes.join(contrib, nodes["n"] == contrib["dst"], "left").select(
            F.col("n").alias("node"),
            F.round(
                F.lit(0.15) / n_nodes
                + _PR_DAMP * F.coalesce(F.col("in_sum"), F.lit(0.0)),
                6,
            ).alias("r"),
        )
    return ranks.join(deg, ranks["node"] == deg["src"], "left").select(
        F.col("node").alias("node_id"),
        F.col("r").alias("pagerank"),
        F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("out_degree"),
    )


_EWMA_DECAY = 0.7  # weight on an observation 1 hour older
_EWMA_WIN = 24  # strictly-preceding hours in the baseline


@register(
    "timeseries_ewma_anomaly",
    oracle=f"""
    WITH ev AS (SELECT event_type,
                       date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
                FROM events),
    hours AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                            TIMESTAMP '2024-01-30 23:00:00',
                                            INTERVAL 1 HOUR)) AS h),
    types AS (SELECT DISTINCT event_type FROM ev),
    agg AS (SELECT event_type, h, count(*) AS n FROM ev GROUP BY 1, 2),
    dense AS (SELECT t.event_type, hours.h AS hour,
                     CAST(coalesce(a.n, 0) AS BIGINT) AS n
              FROM types t CROSS JOIN hours
              LEFT JOIN agg a ON a.event_type = t.event_type
                             AND a.h = hours.h),
    contrib AS (
      SELECT d.event_type, d.hour + to_hours(k.k) AS hour,
             CAST(round(d.n * pow({_EWMA_DECAY}, k.k - 1), 6)
                  AS DECIMAL(18, 6)) AS term
      FROM dense d, range(1, {_EWMA_WIN} + 1) k(k)),
    base AS (
      SELECT event_type, hour,
             sum(term) AS s, count(*) AS cnt
      FROM contrib GROUP BY 1, 2),
    j AS (
      SELECT d.event_type, d.hour, d.n,
             CASE WHEN b.cnt > 0 THEN
               round(CAST(b.s AS DOUBLE) * (1.0 - {_EWMA_DECAY})
                     / (1.0 - pow({_EWMA_DECAY}, b.cnt)), 4)
             END AS ewma
      FROM dense d
      LEFT JOIN base b ON b.event_type = d.event_type AND b.hour = d.hour)
    SELECT event_type, hour, n AS n_events, ewma,
           coalesce(n > greatest(2.0 * ewma, 4.0), false) AS spike
    FROM j
    """,
)
def timeseries_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA spike detection over the dense hourly series: each
    (event_type, hour) cell is scored against an exponentially-weighted
    baseline of its 24 STRICTLY-PRECEDING hours (decay 0.7/h,
    normalized over the weights actually present, so the series head
    isn't biased toward 0), and flagged when the count exceeds
    max(2x baseline, 4) — the ops-monitoring primitive behind ingest
    anomaly alerts.

    Shape: the trailing weighted window is NOT a collect_list lambda or
    a range join — each dense cell EXPLODES its 24 future (hour+k)
    contribution keys with weight decay^(k-1) (map-only), and one
    equi-join groupBy folds contributions per target cell. Weighted
    terms are rounded to 6 dp and summed as exact DECIMAL, so the
    baseline is independent of float summation order (the established
    engine-portability idiom); the geometric normalizer uses the closed
    form (1-d^cnt)/(1-d) off the integer contribution count. All keys
    carry event_type — every shuffle is keyed, nothing global."""
    tune(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    grid = F.broadcast(types).crossJoin(F.broadcast(hours))
    dense = grid.join(
        agg,
        (grid["event_type"] == agg["event_type"]) & (agg["h"] == grid["hour"]),
        "left",
    ).select(
        grid["event_type"],
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
    )
    d = float(_EWMA_DECAY)
    contrib = dense.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("hour") + F.expr(f"INTERVAL {k} HOURS")).alias(
                            "hour"
                        ),
                        F.round(F.col("n") * F.lit(d ** (k - 1)), 6)
                        .cast("decimal(18,6)")
                        .alias("term"),
                    )
                    for k in range(1, _EWMA_WIN + 1)
                ]
            )
        ).alias("c"),
    ).select("event_type", "c.hour", "c.term")
    base = contrib.groupBy("event_type", "hour").agg(
        F.sum("term").alias("s"), F.count(F.lit(1)).alias("cnt")
    )
    ewma = F.when(
        F.col("cnt") > 0,
        F.round(
            F.col("s").cast("double")
            * (1.0 - d)
            / (1.0 - F.pow(F.lit(d), F.col("cnt"))),
            4,
        ),
    )
    return (
        dense.join(base, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.col("n").alias("n_events"),
            ewma.alias("ewma"),
            F.coalesce(
                F.col("n")
                > F.greatest(2.0 * ewma, F.lit(4.0)),
                F.lit(False),
            ).alias("spike"),
        )
    )
