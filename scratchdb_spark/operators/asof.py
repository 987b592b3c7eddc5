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
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the nearest right
    row with the same ``on`` keys: the most recent right row with
    right_time <= left_time for direction='backward', or the earliest
    right row with right_time >= left_time for direction='forward'.
    Right rows at exactly left_time match in both directions (<= / >=),
    matching pandas/DuckDB ASOF semantics.

    Forward is the same union+window plan scanned in reverse time
    order: right rows still sort before left rows at equal time (so
    '>=' includes equality), and the tiebreak flips so that among
    right rows at the same time the SMALLEST tiebreak wins (mirror of
    backward's largest-wins last-scanned semantics).

    ``tolerance`` (pandas merge_asof parity — e.g. "1 HOUR") bounds
    how stale a match may be: a carried right row farther than the
    tolerance from the left row's time yields NULLs instead. Plan
    cost is unchanged — the matched right TIME rides the same window
    as the values and the bound is a post-window per-row predicate
    (no extra shuffle, no range join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )

    on = list(on)
    value_cols = list(value_cols)

    # the tiebreak orders EACH side it exists on: among right rows at
    # the same time it picks which one's value is carried (largest wins
    # backward, smallest forward — matching a union'd SQL window
    # ORDER BY t, is_left, tiebreak); sides lacking the column get a
    # constant (their internal order doesn't affect carried values)
    def _tb(df: DataFrame):
        if tiebreak and tiebreak in df.columns:
            return F.col(tiebreak).alias("__tb")
        return F.lit(0).alias("__tb")

    # the right row rides as ONE struct (time + values together):
    # last(ignorenulls) then always carries time and values from the
    # SAME right row — per-column carries would let a NULL value in
    # the nearest row fall back to an older row's value while the
    # tolerance gate judged the newer row's time (pandas merge_asof
    # matches the nearest row regardless of value nullness)
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias("__r_time"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        ).alias("__rs"),
        F.lit(None).alias("__row"),  # retyped below once lt exists
        _tb(right),
    )
    lt = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rt.schema["__rs"].dataType).alias("__rs"),
        F.struct(*left.columns).alias("__row"),
        _tb(left),
    )
    rt = rt.withColumn(
        "__row", F.lit(None).cast(lt.schema["__row"].dataType)
    )

    # right rows sort before left rows at equal time -> '<='/'>='
    # semantics; forward scans time descending so last(ignoreNulls)
    # carries the EARLIEST right row at-or-after each left row
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__is_left").asc(), F.col("__tb").desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "__is_left",
        "__row",
        "__t",
        F.last("__rs", ignorenulls=True).over(w).alias("__rs"),
    )
    if tolerance is None:
        within = F.lit(True)
    else:
        tol = F.expr(f"INTERVAL {tolerance}")
        within = (
            F.col("__rs.__r_time") >= F.col("__t") - tol
            if direction == "backward"
            else F.col("__rs.__r_time") <= F.col("__t") + tol
        )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__row.*"),
        *[
            F.when(within, F.col(f"__rs.__r_{c}"))
            .alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return out
