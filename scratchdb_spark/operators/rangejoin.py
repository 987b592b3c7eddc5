"""Bucketed time-range join.

A naive interval join (``a.ts BETWEEN b.ts - w AND b.ts``) has no equi
key, so Spark plans BroadcastNestedLoopJoin — O(|A|·|B|) and a driver
OOM risk at 100 TB. The scalable form quantizes time into buckets of
the window width: an in-window pair can only span adjacent buckets, so
emitting each left row into (bucket, bucket+1) and equi-joining on the
bucket id gives Catalyst a shuffle key. Cost is 2·|A| rows shuffled
instead of a cross product; the exact range predicate filters inside
each bucket pair.

This is the standard interval-join decomposition (Flink's interval
join and Databricks' range-join hint do the same internally); OSS
Spark has no built-in, so it ships here as a reusable operator.
Reference parity note: ScratchDB promises arbitrary SQL joins via
pass-through (SURVEY §2.2, destinations/clickhouse/query.go:9-11);
this operator is the at-scale strategy for the non-equi time-window
class of those queries.

All time arithmetic is integer microseconds (``unix_micros``), never
float seconds: window membership at the boundary is then exact and
engine-independent, so results hash-match an integer-micros SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tables import epoch_us


def range_join_seconds(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``0 <= r_ts - l_ts < window_seconds``
    (half-open window looking back from each right row).

    Both inputs are equi-joined on a quantized time bucket (plus any
    caller-supplied equi condition in ``extra_cond``), then filtered by
    the exact range predicate. Left rows are duplicated into their own
    and the succeeding bucket so every in-window pair shares a key.
    Column names must be disjoint (rename before a self-join).
    """
    w_us = int(window_seconds) * 1_000_000
    # epoch micros materialized as columns once (NTZ-safe; tables.epoch_us)
    lx = left.withColumn("__lus", epoch_us(left, left_ts))
    rx = right.withColumn("__rus", epoch_us(right, right_ts))

    lx = lx.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col("__lus") / w_us),
                F.floor(F.col("__lus") / w_us) + 1,
            )
        ),
    )
    rx = rx.withColumn("__bucket", F.floor(F.col("__rus") / w_us))

    cond = lx["__bucket"] == rx["__bucket"]
    if extra_cond is not None:
        cond = cond & extra_cond
    joined = lx.join(rx, cond)

    diff = F.col("__rus") - F.col("__lus")
    return joined.filter((diff >= 0) & (diff < F.lit(w_us))).drop(
        "__bucket", "__lus", "__rus"
    )
