"""Aggregation breadth (distinct/having/rollup/cube/grouping sets/stats), window functions, sort/limit/set ops, subqueries and CTEs.

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
# Aggregation (distinct, having, rollup/cube/grouping sets, stats)
# ---------------------------------------------------------------------------

@register(
    "agg_distinct_having",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    HAVING count(*) > 100
    """,
    doc="Distinct aggregates + HAVING.",
)
def agg_distinct_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 100)
    )


@register(
    "agg_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals.",
)
def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions.",
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS via the SQL pass-through surface.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
    )


@register(
    "agg_stats_moments",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS sd_qty,
           round(var_samp(l_quantity), 4)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (stddev/var/corr/covar).",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


@register(
    "agg_conditional_sums",
    """
    SELECT c_nationkey,
           count(*) AS n_cust,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
           round(sum(CASE WHEN c_acctbal > 0 THEN c_acctbal ELSE 0 END), 2) AS pos_bal
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Conditional aggregation (CASE inside SUM).",
)
def agg_conditional_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        ).alias("n_building"),
        F.round(
            F.sum(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal")).otherwise(0)),
            2,
        ).alias("pos_bal"),
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "window_topk_orders_per_priority",
    """
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total, rn
    FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window.",
)
def window_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


@register(
    "window_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders WHERE o_custkey < 100
    """,
    doc="Running total (ROWS frame).",
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
    )


@register(
    "window_lag_lead_events",
    """
    SELECT event_id, user_id,
           round(value - lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events WHERE event_type = 'click'
    """,
    doc="lag/lead analytics.",
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_range_frame_price",
    """
    SELECT o_orderkey,
           count(*) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders WHERE o_custkey < 200
    """,
    doc="RANGE frame with a value offset.",
)
def window_range_frame_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double-valued RANGE offsets aren't expressible via the
    # rowsBetween/rangeBetween Python API -> window expression
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .selectExpr(
            "o_orderkey",
            """count(*) OVER (
                 PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_similar""",
        )
    )


@register(
    "window_ntile_balance",
    """
    SELECT c_custkey,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    """,
    doc="ntile quartiles per segment.",
)
def window_ntile_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey", F.ntile(4).over(w).alias("quartile"))
    )


@register(
    "window_first_last_value",
    """
    SELECT DISTINCT user_id,
           round(first_value(value) OVER w, 4) AS first_val,
           round(last_value(value)  OVER w, 4) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value with full-partition frame.",
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.round(F.first("value").over(w), 4).alias("first_val"),
            F.round(F.last("value").over(w), 4).alias("last_val"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------

@register(
    "topk_expensive_parts",
    """
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
    FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20
    """,
    doc="Global top-k (TakeOrderedAndProject physical plan).",
)
def topk_expensive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
        .limit(20)
    )


@register(
    "setop_union_all_nationkeys",
    """
    SELECT nk, count(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) u GROUP BY nk
    """,
    doc="UNION ALL.",
)
def setop_union_all_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_intersect_nationkeys",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (distinct).",
)
def setop_intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "setop_except_nationkeys",
    """
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT (distinct).",
)
def setop_except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    # subtract == EXCEPT (set semantics); exceptAll would keep keys
    # that appear on both sides with different multiplicities
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Subqueries / CTEs (via the SQL pass-through surface)
# ---------------------------------------------------------------------------

@register(
    "subq_scalar_above_avg_price",
    """
    SELECT p_partkey, round(p_retailprice, 2) AS price
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
    doc="Scalar subquery.",
)
def subq_scalar_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey, round(p_retailprice, 2) AS price
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        """,
    )


@register(
    "subq_in_big_spenders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    doc="IN subquery (decorrelates to semi join).",
)
def subq_in_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
    )


@register(
    "subq_exists_correlated",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
    """,
    doc="Correlated EXISTS.",
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        """,
    )


@register(
    "cte_top_supplier_revenue",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-07-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 style: CTE + scalar subquery over it.",
)
def cte_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate <  TIMESTAMP '1998-07-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
    )





@register(
    "window_interval_range_value",
    """
    SELECT user_id, event_id,
           CAST(round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) * 100) AS BIGINT) AS trailing_1h_value_e2,
           count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS trailing_1h_events
    FROM events WHERE user_id < 20
    """,
    doc="Time-interval RANGE frame (trailing 1-hour per-user window): "
        "the event-time sliding aggregate expressed as a WINDOW, not "
        "a self-join — one per-user sort, state bounded by the frame. "
        "Both engines order by integer epoch-microseconds with a "
        "3.6e9-us RANGE offset, so frame membership is exact integer "
        "arithmetic (no timestamp-type frame-bound divergence), and "
        "the sum is emitted as an exact scaled integer.",
)
def window_interval_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import epoch_us

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    us = epoch_us(ev, "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w) * 100)
        .cast("long")
        .alias("trailing_1h_value_e2"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )
