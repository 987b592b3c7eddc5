"""Bounded-window running sums over a numeric order column.

A running sum expressed as ``sum(v) OVER (ORDER BY x)`` plans as ONE
SinglePartition window — every row of the frame flows through a single
sort task. For frames whose size is data-dependent (e.g. the distinct
values of a continuous metric: latency micros, token counts) that task
is data-sized at 100 TB — the pattern class this repo has eliminated
three times (epoch_shuffle r9, balance_classes r10, the interval sweep
r10). This module is the reusable form of the fix those sites inlined:
the two-pass prefix-bucket construction.

Construction (identical to operators/split.py:149 / resample.py:213,
generalized to an arbitrary numeric order column):

- The bucket is an ORDER-PRESERVING range function of the order column
  itself — ``floor((x - min) / width)`` with width chosen so at most
  ``n_buckets`` buckets exist. Global (x) order == (bucket, x) order BY
  CONSTRUCTION: no repartitionByRange sampling, no sampled boundaries.
- Pass 1 nets each bucket's sum (ONE map-side-combined aggregate; the
  collect is bounded by ``n_buckets``, 256 default) and folds the
  exclusive offsets on the driver — which also yields the GRAND TOTAL
  for free (callers needing ``sum(v) OVER ()`` can drop that second
  partitionless window too).
- Pass 2 ranks inside each bucket (a PARTITIONED window — concurrent
  bounded sorts) and adds the bucket's offset via a literal map while
  it stays plan-sized, a broadcast-joined frame above 1024 buckets
  (the epoch_shuffle thresholds).

Output is bit-identical to the partitionless-window form because the
bucket function is monotone in x and the per-bucket sums are exact.
Balance caveat (documented, not hidden): range buckets equalize VALUE
RANGE, not row count — a metric whose distinct values concentrate in
under 1/n_buckets of its range degrades toward fewer effective
buckets. That is already a strict improvement over the one-task
status quo, and ``n_buckets`` is the knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    n_buckets: int = 256,
    tiebreak_cols: tuple = (),
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = the INCLUSIVE running sum of ``value_col`` in
    ascending ``order_col`` order, computed with partitioned windows
    only (see module docstring). Returns ``(frame, grand_total)`` —
    the total comes from pass 1's driver fold, so callers replace BOTH
    the cumulative window and the ``sum() OVER ()`` total window.

    Requirements: the (order_col, *tiebreak_cols) tuple is DISTINCT
    per row — a running sum over tied order keys has no defined
    per-row value. Ties in ``order_col`` alone are fine WITH
    tiebreaks: equal order values land in the same range bucket by
    construction, so global (order, tiebreaks) order equals (bucket,
    order, tiebreaks) order and the per-bucket window resolves them.
    Descending order: pass a pre-negated numeric column. ``value_col``
    must be integral (the driver fold and the offset literals are
    exact Python ints; weights/counts in this repo are BIGINTs by
    contract). Exclusive form: subtract the row's own value
    (``out_col - value_col``).
    """
    mm = df.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
    ).collect()[0]
    mn, mx = mm["mn"], mm["mx"]
    if mn is None:
        # empty input (or all-NULL order): column exists, no rows
        return (
            df.withColumn(out_col, F.lit(None).cast("long")),
            0,
        )
    # order-preserving range bucket; width sized so <= n_buckets
    # buckets exist. Integral order columns use an integral width
    # (no FP boundary inside the bucket function); fractional ones
    # use a double width with a last-bucket clamp.
    span = float(mx) - float(mn)
    if span <= 0:
        bkt = F.lit(0).cast("long")
    elif isinstance(mn, int) and isinstance(mx, int):
        width = -((mx - mn + 1) // -n_buckets)  # ceil div
        bkt = F.floor(
            (F.col(order_col).cast("long") - F.lit(int(mn)))
            / F.lit(int(width))
        ).cast("long")
    else:
        width = span / n_buckets
        bkt = F.least(
            F.floor(
                (F.col(order_col).cast("double") - F.lit(float(mn)))
                / F.lit(width)
            ),
            F.lit(n_buckets - 1),
        ).cast("long")
    keyed = df.withColumn("__psb", bkt)
    nets = {
        r["__psb"]: r["net"]
        for r in keyed.groupBy("__psb")
        .agg(F.sum(F.col(value_col).cast("long")).alias("net"))
        .collect()
    }
    offsets: dict[int, int] = {}
    cum = 0
    for b in sorted(nets):
        offsets[b] = cum
        cum += nets[b]
    w = (
        Window.partitionBy("__psb")
        .orderBy(order_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = F.sum(F.col(value_col).cast("long")).over(w)
    if len(offsets) <= 1024:
        off_map = F.create_map(
            *[
                F.lit(x)
                for b, o in sorted(offsets.items())
                for x in (b, o)
            ]
        )
        out = keyed.withColumn(
            out_col,
            (
                F.coalesce(
                    F.element_at(off_map, F.col("__psb")), F.lit(0)
                )
                + in_bucket
            ).cast("long"),
        )
    else:
        off_df = keyed.sparkSession.createDataFrame(
            sorted(offsets.items()), "__psb long, __off long"
        )
        out = (
            keyed.join(F.broadcast(off_df), "__psb")
            .withColumn(
                out_col, (F.col("__off") + in_bucket).cast("long")
            )
            .drop("__off")
        )
    return out.drop("__psb"), cum
