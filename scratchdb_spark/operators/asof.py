"""As-of (time-travel) join.

Spark SQL has no ASOF JOIN (SURVEY.md §2.2 joins row). The scalable
pattern is union + window rather than a theta-join (which would plan as
a broadcast-nested-loop or cartesian at 100 TB):

  1. tag both sides, union on aligned columns            (no shuffle)
  2. one window per key ordered by (time, tag, tiebreak)  (ONE shuffle
     on the join key — same cost as the shuffle any join would pay)
  3. last(right_value, ignoreNulls) over rows-unbounded-preceding
     carries the most recent right-side row forward
  4. keep left rows

This is exactly a sort-merge as-of with linear scan per key; skew on
the key column is handled by AQE skew-split since it's a plain window
shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the most recent
    right row with right_time <= left_time (direction='backward') and
    the same ``on`` keys. Right rows at exactly left_time win (<=),
    matching pandas/DuckDB ASOF semantics.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")

    on = list(on)
    value_cols = list(value_cols)

    lt = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("__row"),
        *([F.col(tiebreak).alias("__tb")] if tiebreak else [F.lit(0).alias("__tb")]),
    )
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(lt.schema["__row"].dataType).alias("__row"),
        F.lit(0).alias("__tb"),
    )

    # right rows sort before left rows at equal time -> '<=' semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__is_left"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__is_left",
        "__row",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__row.*"),
        *[F.col(f"__r_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return out
