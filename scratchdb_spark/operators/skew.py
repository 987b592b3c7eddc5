"""Skew-mitigation utilities.

AQE's skew-join splitting handles joins; for aggregations over heavily
skewed keys the classic fix is two-phase salted aggregation: shuffle 1
distributes each hot key over ``salt_buckets`` partitions (partial
aggs), shuffle 2 merges the per-salt partials. Net effect: no single
reducer owns a hot key's whole row set.

For algebraic aggregates Spark's own partial aggregation already gives
this benefit; the salted form matters for holistic aggregates
(collect_list/percentile) or when partial agg is defeated (e.g. high
cardinality of distinct values per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """count + sum(value) per key via two-phase salted aggregation.
    Output equals a plain groupBy (the oracle checks exactly that)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__s"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("__n").alias("n"),
        F.round(F.sum("__s"), 2).alias("total"),
    )
