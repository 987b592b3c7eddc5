"""Scalar function families (string/date/math/array/map/struct/JSON/conditional) and exact-vs-approximate aggregates.

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
# Scalar function families
# ---------------------------------------------------------------------------

@register(
    "fn_string_part_names",
    """
    SELECT p_partkey,
           upper(p_name)                       AS name_upper,
           substring(p_name, 1, 4)             AS name_prefix,
           length(p_name)                      AS name_len,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_name, ' ', '_')           AS name_snake,
           split_part(p_name, ' ', 1)          AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    WHERE p_name LIKE '%bolt%'
    """,
    doc="String function family + LIKE pushdown.",
)
def fn_string_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "fn_datetime_monthly_orders",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="date_trunc monthly rollup.",
)
def fn_datetime_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "fn_datetime_parts",
    """
    SELECT o_orderkey,
           CAST(extract(year  FROM o_orderdate) AS INTEGER) AS yr,
           CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
           CAST(extract(day   FROM o_orderdate) AS INTEGER) AS dom,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders WHERE o_orderkey < 500
    """,
    doc="extract() fields + interval arithmetic.",
)
def fn_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
    )


@register(
    "fn_math_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)            AS abs_d,
           CAST(floor(l_quantity) AS BIGINT)           AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k,
           round(sqrt(l_quantity), 4)                  AS qty_sqrt,
           round(ln(l_extendedprice), 4)               AS price_ln,
           round(power(1 + l_tax, 2), 4)               AS tax_sq,
           l_orderkey % 7                              AS key_mod
    FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="Math function family.",
)
def fn_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_d"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 4).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_conditional_buckets",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg2,
           count(*) AS n,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY 1, 2
    """,
    doc="CASE WHEN / coalesce / nullif.",
)
def fn_conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bucket")
    )
    seg2 = F.coalesce(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
    ).alias("seg2")
    return cust.groupBy(bucket, seg2).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
    )


@register(
    "fn_json_extract_events",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="JSON scalar extraction over the events.props JSON column.",
)
def fn_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "fn_array_vector_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 3) AS vec_sum,
           round(sqrt(list_aggregate(
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 3)
             AS vec_norm
    FROM embeddings WHERE vec_id < 100
    """,
    doc="Array lambda functions (aggregate/transform) over embeddings.",
)
def fn_array_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(
        as_double, F.lit(0.0), lambda acc, x: acc + x
    )
    vec_sq = F.aggregate(
        as_double, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(as_double, 1), 4).alias("first_elem"),
        F.round(vec_sum, 3).alias("vec_sum"),
        F.round(F.sqrt(vec_sq), 3).alias("vec_norm"),
    )


@register(
    "fn_explode_vectors",
    """
    SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
           round(CAST(embedding[i] AS DOUBLE), 4) AS val
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    WHERE vec_id < 5
    """,
    doc="posexplode / unnest-with-index parity.",
)
def fn_explode_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


@register(
    "pivot_segment_counts",
    """
    SELECT c_nationkey,
           CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS AUTOMOBILE,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS BUILDING,
           CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS FURNITURE,
           CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS HOUSEHOLD,
           CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS MACHINERY
    FROM customer GROUP BY c_nationkey
    """,
    doc="Pivot (groupBy().pivot()) — oracle is the conditional-sum "
        "expansion it compiles to.",
)
def pivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    out = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", segs)  # explicit values: no extra pass
        .count()
    )
    # pivot yields NULL for empty cells; the CASE expansion yields 0
    return out.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in segs],
    )


@register(
    "window_percent_rank",
    """
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="percent_rank / cume_dist ranking windows.",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@register(
    "udf_resample_daily",
    """
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_events,
           CAST(round(sum(value) * 100) AS BIGINT) AS value_sum_e2
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
    doc="applyInPandas grouped-map resampling; oracle is the SQL "
        "equivalent, verifying the Arrow round-trip exactly.",
)
def udf_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.resample import resample_daily

    return resample_daily(table(spark, sf_dir, "events"))


@register(
    "skew_salted_user_counts",
    """
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY user_id
    """,
    doc="Two-phase salted aggregation (skew technique); oracle is the "
        "plain groupBy it must equal.",
)
def skew_salted_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg_counts

    return salted_agg_counts(
        table(spark, sf_dir, "events"), "user_id", "value"
    )


# ---------------------------------------------------------------------------
# Exact vs approximate aggregates
# ---------------------------------------------------------------------------

@register(
    "count_distinct_exact_median",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(quantile_cont(value, 0.5), 4) AS median_value
    FROM events
    GROUP BY event_type
    """,
    doc="Exact distinct count + exact interpolated median.",
)
def count_distinct_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.percentile("value", 0.5), 4).alias("median_value"),
    )


@register(
    "approx_distinct_quantiles",
    _fixture_oracle(
        "approx_distinct_quantiles",
        ["event_type", "approx_users", "approx_median"],
    ),
    doc="approx_count_distinct (HLL++) + percentile_approx. Sketches "
        "differ across engines, so the oracle is a determinism-checked "
        "golden snapshot of the Spark output (both aggregates are "
        "merge-order-independent at this scale: HLL++ union is "
        "commutative; percentile_approx buffers < accuracy samples so "
        "it is exact here). Exact twin: count_distinct_exact_median.",
)
def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.round(F.percentile_approx("value", 0.5), 4).alias("approx_median"),
    )


