"""Source / sink helpers (SURVEY §2.2 scans & sinks rows).

The reference's source surface is NDJSON ingest plus whatever its
backends read (DuckDB boots the json/aws/httpfs extensions —
destinations/duckdb/duckdb.go:71-89 — giving `read_ndjson_auto` and
S3 paths). The Spark equivalents are the DataFrameReader formats; this
module pins the engine's conventions (permissive JSON, header CSV,
explicit-schema fast path) and the result-export sinks.

Object stores: pass s3a:// / gs:// paths — the hadoop connectors pick
credentials up from the standard env/instance-profile chain; no code
here needs to change between local disk and a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """NDJSON scan (≡ DuckDB read_ndjson_auto). With an explicit schema
    the scan is single-pass; without one Spark runs an inference pass —
    fine interactively, avoid in pipelines (and note the ingest path
    never uses Spark inference: the type-vote lattice differs)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_result(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Export a query result (the file-sink counterpart of the HTTP
    JSON/CSV streams). ``single_file`` coalesces to one partition —
    only for small results; large exports keep their parallelism."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
