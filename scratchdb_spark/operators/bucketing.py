"""Bucketed (pre-shuffled) tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. If the tables are WRITTEN bucketed on the join key
(``bucketBy(n, key)`` + ``sortBy(key)``), Spark's scan reports a
hash-partitioned output layout, and a subsequent equi-join on that key
plans as a SortMergeJoin with NO Exchange on either side — the shuffle
was paid once at write time and is amortized over every future join,
which is exactly how a warehouse lays out its biggest fact tables.
(A per-bucket Sort remains unless
``spark.sql.legacy.bucketedTableScan.outputOrdering=true``: Spark 3+
ignores write-time sortBy at read by default.)

The reference delegates physical layout to its backends (ClickHouse
MergeTree ORDER BY keys, destinations/clickhouse/destination.go); this
is the Spark-native equivalent of that design decision.

Bucketed tables must live in the session catalog (saveAsTable) —
path-based parquet has nowhere to record the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted on ``key``.

    n_buckets governs join parallelism for every future co-located
    join: pick ~(total_size / 128MB) at the target scale; both sides
    of a join must use the SAME bucket count to avoid a re-shuffle.

    The pre-write repartition on the key yields exactly ONE file per
    bucket: ``sortBy`` only orders within a file, and Spark elides the
    join-time Sort only for single-file buckets. It also prevents the
    small-files explosion (writer-partitions x buckets files).
    """
    (
        df.repartition(n_buckets, key)
        .write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_date_partitioned(
    df: DataFrame,
    table_name: str,
    ts_col: str,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hive-partitioned by the DAY of ``ts_col``.

    Date-range predicates on ``part_date`` then prune at the directory
    level (``PartitionFilters`` in the scan, untouched partitions never
    listed) — the Spark analogue of the reference backends' time-keyed
    MergeTree parts. Use for append-mostly event/fact tables where
    queries carry time bounds.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn("part_date", F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy("part_date")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    The physical plan for this join contains no Exchange: verify with
    ``df.explain()`` (asserted in tests/test_plans.py). The merge hint
    pins SortMergeJoin — this helper exists for big-big joins, where a
    broadcast (which ignores and disables the bucketed layout) would
    be the wrong plan at scale even when the test-harness side fits
    under the broadcast threshold.
    """
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key, how
    )
