"""SparkSession construction.

One shared session is the engine's single "connection"; the reference's
per-destination connection pool (pkg/destinations/destinations.go:85-126)
maps to per-destination databases/warehouse prefixes inside this session.

Config posture is scale-first: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow on (fast pandas/Pandas-UDF
interchange), shuffle partitions sized for the local test harness but
overridable via env for cluster deployments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Runtime adaptivity: coalesce small shuffle partitions, split skewed
    # ones, convert SMJ->broadcast when a side turns out small. These are
    # the knobs that make the same plan survive a 100x scale-up.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched transfer for pandas UDFs / toPandas (10-100x over
    # row-at-a-time pickling).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 10 MB is Spark's default broadcast threshold; dims like region/
    # nation/supplier stay broadcastable far beyond sf0.1, so raise it.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Local-mode shuffle sizing; a real cluster overrides via
    # SPARK_GRAFT_SHUFFLE_PARTITIONS (rule of thumb: 2-3x total cores,
    # or input_bytes / 128MB at 100TB scale -> AQE coalesces down).
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # Keep scan partitions aligned with file row-groups.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # The snapshot layer always reads EXPLICIT file lists (manifest-
    # planned scans, per-batch stats jobs). Above 32 paths Spark
    # lists them with a distributed job whose default parallelism is
    # 10,000 tasks — ~2 paths per task of pure scheduling overhead on
    # an 80k-file batch (measured: 23 s of a 48 s commit was this
    # listing job; 7 s at 128). 128 tasks x ~600 paths each keeps the
    # job bounded on local AND cluster (per-path FileStatus calls are
    # the work; more tasks than executors buys nothing).
    "spark.sql.sources.parallelPartitionDiscovery.parallelism": "128",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.ui.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns (events.ts in the test data)
    # surface as epoch-nanos longs; tables.table() converts them.
    # Set once at build time — a read path mutating session conf would
    # race on a shared engine.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "scratchdb-spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Master defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a cluster, set SPARK_GRAFT_MASTER or submit with --master.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
