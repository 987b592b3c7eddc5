"""Grouped-map (applyInPandas) example operator: per-user time-bucket
resampling of the events stream.

This exists to exercise the SURVEY §2.2 UDF/grouped-map surface with an
oracle-checkable result — the same resample is SQL-expressible
(date_trunc + count/sum), so the DuckDB oracle verifies the Arrow
round-trip exactly. Real uses of this shape are resamplings SQL can't
express (forward-fill, interpolation, per-group model scoring).

Output discipline: the value aggregate is emitted as
``round(sum(value) * 100)`` cast to int64. ``events.value`` carries two
decimals, so the scaled sum's true value is an integer — rounding can
never sit on a half-boundary, unlike emitting a rounded *mean*, where
n-value means land exactly on the half-grid and pandas (half-to-even)
and SQL engines (half-away-from-zero) disagree.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_e2", T.LongType()),
    ]
)


def resample_daily(events: DataFrame) -> DataFrame:
    """Per user: daily event counts + exact scaled value sums via
    applyInPandas (one Arrow batch per user group)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = (
            pdf.set_index("ts")
            .groupby(pd.Grouper(freq="D"))["value"]
            .agg(["count", "sum"])
            .reset_index()
        )
        out = out[out["count"] > 0]
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[0],
                "day": out["ts"],
                "n_events": out["count"].astype("int64"),
                "value_sum_e2": (out["sum"] * 100).round().astype("int64"),
            }
        )

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        kernel, schema=_SCHEMA
    )
