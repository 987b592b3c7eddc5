"""Data-quality monitoring / profiling operators.

The ops side of a warehouse the reference leaves to external tooling:
detect anomalous days in a metric stream, and profile key skew before
it breaks a shuffle. Both follow the repo-wide determinism discipline
— aggregate EXACT integer sufficient statistics first (order- and
partition-invariant), then derive floating-point scores as pure
functions of those integers, so results are identical across engines,
partitionings, and AQE decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_zscore_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Days whose per-group daily value total deviates >= z_threshold
    standard deviations from that group's own mean daily total.

    Sufficient statistics per group: n_days, sum(total_e2),
    sum(total_e2^2) — all BIGINT (value carries 2 decimals, so the
    x100 scaling is exact; daily totals ~1e6 e2-units squared x 366
    days stays far under int64). mean/var/z then derive as pure
    double functions of those integers:

        var = (sumsq - sum^2 / n) / n        (population)
        z   = (x - mean) / sqrt(var)

    Plan shape: daily agg (1 shuffle on (group, day)) -> per-group
    stats agg (1 shuffle on group, partial combine) -> broadcast the
    tiny per-group stats back onto daily rows (groups are
    low-cardinality; at high-cardinality group keys this becomes a
    plain equi-join, same plan class). No window, no sort — the z
    computation is embarrassingly parallel after two keyed aggs.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (
        events.groupBy(
            F.col(group_col).alias("grp"), day.alias("day")
        )
        .agg(
            F.round(F.sum(value_col) * 100)
            .cast("long")
            .alias("total_e2")
        )
    )
    stats = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("total_e2").alias("s1"),
        F.sum(F.col("total_e2") * F.col("total_e2")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n_days")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days")) / F.col(
        "n_days"
    )
    z = (F.col("total_e2") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "grp")
        .withColumn("z", F.round(z, 4))
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select(
            F.col("grp").alias(group_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "total_e2",
            "n_days",
            "z",
        )
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """One-row distribution profile of per-key group sizes — the
    pre-flight check before shuffling on a key (a max/p50 ratio in the
    hundreds says: salt this key or enable AQE skew-join first).

    percentile_disc over the size distribution picks ACTUAL occurring
    sizes (exact, engine-portable — no interpolation arithmetic to
    disagree on); skew_ratio_e2 derives from exact integers.

    Plan shape: per-key count (1 shuffle, map-side combine) -> global
    single-group agg over one row per key (partial agg, tiny). At
    100 TB the second agg's input is |keys| rows of two longs —
    negligible next to the count itself.
    """
    sizes = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("sz").alias("n_rows"),
        F.min("sz").alias("min_sz"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY sz)")
        .cast("long")
        .alias("p50_sz"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY sz)")
        .cast("long")
        .alias("p90_sz"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY sz)")
        .cast("long")
        .alias("p99_sz"),
        F.max("sz").alias("max_sz"),
    ).withColumn(
        # floor() in BOTH engines: Spark's double->long cast truncates
        # while DuckDB's rounds, so a bare cast would diverge
        "skew_ratio_e2",
        F.floor(F.lit(100) * F.col("max_sz") / F.col("p50_sz"))
        .cast("long"),
    )
