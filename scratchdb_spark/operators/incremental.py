"""Incremental time rollups (continuous aggregates): each ingest batch
appends tiny per-(bucket, dims) PARTIAL aggregate rows to a managed
rollup table; reads merge the partials. The hypertable/continuous-
aggregate pattern: at 100 TB the rollup query touches KBs-MBs of
partials instead of rescanning raw events, and a late batch is just
another partial row — no rewrite, no read-modify-write.

Only mergeable aggregates belong here (count, sum, min, max — and
sketches, see the approx_hll_sketch_union query for that variant);
avg is derived at read time as a merged sum over a merged count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import Warehouse


def append_rollup_partials(
    warehouse: Warehouse,
    database: str,
    table: str,
    batch: DataFrame,
    ts_col: str = "ts",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Aggregate one batch into per-(day, dims) partial rows and append
    them. Partials are append-only: re-deliveries of DISTINCT batches
    merge correctly by construction; the batch boundary is the caller's
    at-least-once unit (pair with the checkpointed ingest stream)."""
    part = (
        batch.groupBy(
            F.date_trunc("DAY", ts_col).alias("bucket_day"), *dims
        )
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum(value_col).alias("p_sum"),
            F.min(value_col).alias("p_min"),
            F.max(value_col).alias("p_max"),
        )
    )
    warehouse.append_aligned(database, table, part)


def read_rollup(
    warehouse: Warehouse,
    database: str,
    table: str,
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Merge the stored partials into the final per-(day, dims)
    aggregate: counts and sums add, min/max fold, avg derives."""
    p = warehouse.read(database, table)
    merged = p.groupBy("bucket_day", *dims).agg(
        F.sum("p_n").alias("n"),
        F.round(F.sum("p_sum"), 2).alias("total_value"),
        F.round(F.min("p_min"), 4).alias("min_value"),
        F.round(F.max("p_max"), 4).alias("max_value"),
    )
    # avg derives in INTEGER arithmetic: the 2dp total is exact cents
    # (cross-engine-stable — it is itself hash-compared); scaling to
    # 1e-4 units and flooring the integer quotient avoids float
    # rounding entirely. A round(double/number, k) here is a trap: a
    # quotient can land exactly on the half grid (e.g. 307.03/8 =
    # 38.37875) and Spark (HALF_UP on the shortest decimal repr) and
    # DuckDB (raw-double banker-ish) disagree — observed 1-2 rows per
    # 150 in the driver-sim gate before this form.
    return merged.withColumn(
        "avg_value_e4",
        F.expr(
            "CAST(round(total_value * 100) AS BIGINT) * 100 div n"
        ),
    )


def append_distinct_partials(
    warehouse: Warehouse,
    database: str,
    table: str,
    batch: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    dims: tuple[str, ...] = ("event_type",),
) -> None:
    """Incremental DISTINCT-count rollup: per-(day, dims) HLL sketch
    partials (binary, mergeable). Plain count-distinct partials do NOT
    merge (distinct users on Mon + distinct on Tue != distinct over
    both days); HLL union DOES — the sketch variant of the
    continuous-aggregate pattern, for the one aggregate family the
    additive rollup can't serve."""
    part = (
        batch.groupBy(
            F.date_trunc("DAY", ts_col).alias("bucket_day"), *dims
        )
        .agg(F.hll_sketch_agg(key_col).alias("p_sketch"))
    )
    warehouse.append_aligned(database, table, part)


def read_distinct_rollup(
    warehouse: Warehouse,
    database: str,
    table: str,
    dims: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Merge sketch partials: per-(day, dims) approx distinct count,
    plus the sketches remain mergeable upward (day -> week -> total)
    without touching raw data again."""
    p = warehouse.read(database, table)
    return (
        p.groupBy("bucket_day", *dims)
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("p_sketch")
            ).alias("approx_distinct")
        )
    )


def maintain_sum_mv(
    mv: DataFrame,
    changes: DataFrame,
    keys: list[str],
    value_col: str,
    sum_col: str = "value_sum",
    n_col: str = "n_rows",
) -> DataFrame:
    """Apply a CDC feed (snapshots.read_changes output: rows tagged
    ``_change_type`` in ('insert', 'delete')) to a keyed
    (sum, count) MATERIALIZED VIEW without touching the base table —
    the algebraic delta rule for distributive aggregates: inserts
    add, deletes subtract, keys whose count reaches zero drop out.

    This is what a downstream aggregate does at 100 TB when its base
    table takes appends AND copy-on-write deletes/merges: cost is
    one grouped aggregation over the CHANGE ROWS (churn-sized) plus a
    join against the MV (key-cardinality-sized) — the base table is
    never rescanned. A merge_upsert's update flows through as its
    delete/insert pair, so updated values net correctly. Only
    distributive/algebraic aggregates maintain this way; holistic
    ones (exact percentiles) need the histogram-partial path
    (rollup_histogram_quantiles).

    ``mv`` schema: keys + [sum_col, n_col]; returns the same shape.
    """
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(sign * F.col(value_col)).alias("__d_sum"),
        F.sum(sign).alias("__d_n"),
    )
    merged = (
        mv.join(delta, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col(sum_col), F.lit(0))
                + F.coalesce(F.col("__d_sum"), F.lit(0))
            ).alias(sum_col),
            (
                F.coalesce(F.col(n_col), F.lit(0))
                + F.coalesce(F.col("__d_n"), F.lit(0))
            ).cast("long").alias(n_col),
        )
        .filter(F.col(n_col) > 0)
    )
    return merged


def sum_mv_of(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """The full-recompute definition the incremental path must match:
    per-key (sum, count) over the current table state."""
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("value_sum"),
        F.count(F.lit(1)).alias("n_rows"),
    )
