"""TPC-H core aggregation + the join family (inner/left/full/cross/semi/anti/theta, as-of both directions).

Split from the single-module query catalog (registration order is
preserved by scratchdb_spark/queries.py's import sequence — the
driver's correctness-window rotation tie-breaks on registry order).
Shared infrastructure (QuerySpec/register/_sql/_fixture_oracle and
the DuckDB token/shingle oracle macros) lives in catalog/core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..operators.asof import asof_join  # noqa: F401
from ..tables import epoch_us, register_testdata, table  # noqa: F401
from .core import (  # noqa: F401
    _DUCK_SHINGLES,
    _DUCK_TOKENS,
    _fixture_oracle,
    _sql,
    register,
)

# ---------------------------------------------------------------------------
# Aggregation core
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                           AS sum_qty,
           round(sum(l_extendedprice), 2)                      AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                               AS sum_charge,
           round(avg(l_quantity), 6)                           AS avg_qty,
           round(avg(l_extendedprice), 6)                      AS avg_price,
           round(avg(l_discount), 6)                           AS avg_disc,
           count(*)                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 style pricing summary: filter + hash agg (partial/final).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money sums round to the 2-decimal grid their true values
            # lie on (never a half-boundary); cross-engine raw double
            # sums differ in the last ulp, so unrounded outputs would
            # fail an exact hash-compare
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )



# ---------------------------------------------------------------------------
# Joins (SURVEY §2.2: inner/left/full/cross/semi/anti, theta, as-of)
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: 3-way join + agg + deterministic top-k.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    ords = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY r_name, n_name
    """,
    doc="TPC-H Q5: 6-way star join; dims broadcast.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = F.broadcast(table(spark, sf_dir, "supplier"))
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "join_left_outer_spend",
    """
    SELECT c_nationkey,
           count(DISTINCT c_custkey)            AS n_customers,
           count(o_orderkey)                    AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    """,
    doc="Left outer join preserving customers without orders.",
)
def join_left_outer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders")
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_semi_customers_with_orders",
    """
    SELECT c_mktsegment, count(*) AS n
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
    doc="Left-semi join (IN subquery).",
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders")
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders")
    return (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_full_outer_nation_profile",
    """
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk) AS nationkey, n_customers, n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="Full outer join of two aggregates.",
)
def join_full_outer_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_theta_nation_pairs",
    """
    SELECT n1.n_regionkey AS regionkey, count(*) AS n_pairs
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey
     AND n1.n_nationkey < n2.n_nationkey
    GROUP BY n1.n_regionkey
    """,
    doc="Theta join (equi + inequality condition).",
)
def join_theta_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .groupBy(F.col("n1.n_regionkey").alias("regionkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_cross_region_segment",
    """
    SELECT r_name, seg
    FROM region
    CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    """,
    doc="Cross join (small x small).",
)
def join_cross_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = table(spark, sf_dir, "region").select("r_name")
    seg = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return reg.crossJoin(seg)


@register(
    "asof_last_click_before_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             (event_type = 'purchase') AS is_left
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, value, is_left,
             last_value(CASE WHEN NOT is_left THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_left, event_id
                     ROWS UNBOUNDED PRECEDING) AS asof_value
      FROM tagged
    )
    SELECT event_id, user_id,
           round(value, 4)      AS purchase_value,
           round(asof_value, 4) AS asof_value
    FROM w WHERE is_left
    """,
    doc="As-of join: per purchase, most recent click value at-or-before "
        "(operators/asof.py union+window plan — one shuffle, skew-safe).",
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("asof_value", 4).alias("asof_value"),
    )


@register(
    "asof_next_click_after_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             (event_type = 'purchase') AS is_left
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, value, is_left,
             last_value(CASE WHEN NOT is_left THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts DESC, is_left ASC, event_id DESC
                     ROWS UNBOUNDED PRECEDING) AS asof_value
      FROM tagged
    )
    SELECT event_id, user_id,
           round(value, 4)      AS purchase_value,
           round(asof_value, 4) AS asof_value
    FROM w WHERE is_left
    """,
    doc="FORWARD as-of join: per purchase, the earliest click value "
        "at-or-after it (operators/asof.py direction='forward' — same "
        "union+window plan scanned in reverse time order; smallest "
        "event_id wins equal-time click ties). Completes the as-of "
        "surface's direction symmetry (reference delegates ASOF to its "
        "SQL backends; pandas/DuckDB both expose the forward variant).",
)
def asof_next_click_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        tiebreak="event_id",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("asof_value", 4).alias("asof_value"),
    )


@register(
    "q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name, extract(year FROM l_shipdate)
    """,
    doc="TPC-H Q7 style: bilateral trade volume, year extraction in "
        "grouping, self-joined dimension.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
          AND n1.n_nationkey <> n2.n_nationkey
        GROUP BY n1.n_name, n2.n_name, extract(year FROM l_shipdate)
        """,
    )


@register(
    "q2_min_cost_supplier",
    """
    SELECT s.s_suppkey, s.s_name, p.p_partkey,
           CAST(floor(l.l_extendedprice / l.l_quantity * 10000) AS BIGINT)
             AS unit_cost_e4
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_partkey < 200
      AND l.l_extendedprice / l.l_quantity = (
        SELECT min(l2.l_extendedprice / l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="TPC-H Q2 style: correlated scalar-min subquery.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s.s_suppkey, s.s_name, p.p_partkey,
               CAST(floor(l.l_extendedprice / l.l_quantity * 10000) AS BIGINT)
                 AS unit_cost_e4
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE p.p_partkey < 200
          AND l.l_extendedprice / l.l_quantity = (
            SELECT min(l2.l_extendedprice / l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        """,
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 style: NOT IN list + IN list + distinct agg.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (~F.col("p_brand").isin("Brand#1", "Brand#2"))
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    doc="TPC-H Q19 style: OR-of-ANDs predicate (planner must keep the "
        "join equi-key while pushing the disjunction).",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(table(spark, sf_dir, "part"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )




@register(
    "asof_tolerance_click_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             (event_type = 'purchase') AS is_left
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT user_id, ts, event_id, value, is_left,
             last_value(CASE WHEN NOT is_left THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_left, event_id
                     ROWS UNBOUNDED PRECEDING) AS asof_value,
             last_value(CASE WHEN NOT is_left THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_left, event_id
                     ROWS UNBOUNDED PRECEDING) AS asof_ts
      FROM tagged
    )
    SELECT event_id, user_id,
           round(value, 4) AS purchase_value,
           round(CASE WHEN asof_ts >= ts - INTERVAL 1 HOUR
                      THEN asof_value END, 4) AS asof_value,
           CAST(count(CASE WHEN asof_ts >= ts - INTERVAL 1 HOUR
                           THEN 1 END)
                OVER () AS BIGINT) AS n_within
    FROM w WHERE is_left
    """,
    doc="As-of join with TOLERANCE (pandas merge_asof parity, new "
        "r8): per purchase, the most recent click at-or-before — but "
        "only if it happened within the last hour; staler matches "
        "yield NULL (attribution windows, sensor staleness bounds). "
        "Same one-shuffle union+window plan as the unbounded as-of "
        "(operators/asof.py tolerance=): the matched right TIME rides "
        "the existing window and the bound is a per-row predicate — "
        "no range join, no extra shuffle. n_within pins that the "
        "tolerance actually bites (some matches are stale) without "
        "hand-picking row ids.",
)
def asof_tolerance_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        tiebreak="event_id",
        tolerance="1 HOUR",
    )
    # n_within is a 1-row global count broadcast onto the rows — NOT
    # a partitionless window (count OVER () funnels the whole joined
    # frame through one task; the r11 audit removed the class)
    picked = joined.select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("purchase_value"),
        F.round("asof_value", 4).alias("asof_value"),
    )
    stats = picked.agg(
        F.count("asof_value").cast("long").alias("n_within")
    )
    return picked.crossJoin(F.broadcast(stats))
