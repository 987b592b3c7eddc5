"""Grouped-map (applyInPandas) example operator: per-user time-bucket
resampling of the events stream.

This exists to exercise the SURVEY §2.2 UDF/grouped-map surface with an
oracle-checkable result — the same resample is SQL-expressible
(date_trunc + count/sum), so the DuckDB oracle verifies the Arrow
round-trip exactly. Real uses of this shape are resamplings SQL can't
express (forward-fill, interpolation, per-group model scoring).

Scale shape: the grouped-map runs on HASH BUCKETS of the key, not raw
user_ids. A per-user grouping means one Python call per user —
millions of tiny Arrow batches whose per-call overhead dwarfs the work
(measured 7s for 100k rows / 1.5k users; bucketed: <1s). Each bucket
kernel does the user×day aggregation vectorized in pandas, so Python
is invoked ~num_buckets times regardless of user cardinality, and
bucket skew is bounded by the hash.

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
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_e2", T.LongType()),
    ]
)


def resample_daily(events: DataFrame, num_buckets: int = 64) -> DataFrame:
    """Per user: daily event counts + exact scaled value sums via
    applyInPandas over hash buckets of user_id (vectorized kernel,
    ~num_buckets Python calls total)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        g = (
            pdf.assign(day=pdf["ts"].dt.floor("D"))
            .groupby(["user_id", "day"], sort=False)["value"]
            .agg(["count", "sum"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "day": g["day"],
                "n_events": g["count"].astype("int64"),
                "value_sum_e2": (g["sum"] * 100).round().astype("int64"),
            }
        )

    return (
        events.select(
            "user_id", "ts", "value",
            F.pmod(F.hash("user_id"), F.lit(num_buckets)).alias("__bkt"),
        )
        .groupBy("__bkt")
        .applyInPandas(kernel, schema=_SCHEMA)
    )


def gapfill_daily_forward(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar gap-fill + forward fill (timeseries locf): densify each
    key's daily series over its own [min_day, max_day] span with a
    generated date spine, then carry the last observed value across
    missing days.

    The canonical hypertable `time_bucket_gapfill + locf` shape
    (TimescaleDB's public API surface — reimplemented here as a spine
    join; no reference code involved), and the feature-engineering
    primitive for training on regularly-gridded series.

    Plan shape (all keyed shuffles, no Python):
      daily agg (1 shuffle) -> per-key span agg (1 shuffle, reuses the
      daily partitioning) -> sequence()+explode spine (narrow — the
      spine generates ~days_per_key rows per key, distributed, never
      on the driver) -> left join actuals on (key, day) -> forward
      fill via last(ignorenulls) over (key ORDER BY day ROWS UNBOUNDED
      PRECEDING) — one window, partition-local.

    At 100 TB: spine size = keys x own-span days, generated where the
    key lives; the fill window never crosses keys, so parallelism is
    per-key. The value is carried as an exact scaled integer (x100) —
    forward-filled doubles would otherwise hash-differ across engines.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (
        events.groupBy(F.col(key_col).alias("k"), day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col) * 100)
            .cast("long")
            .alias("value_e2"),
        )
    )
    span = daily.groupBy("k").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = span.select(
        "k",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    j = spine.join(daily, ["k", "day"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("k").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("value_e2", ignorenulls=True).over(w).alias(
            "filled_value_e2"
        ),
        F.col("value_e2").isNull().alias("is_gap"),
    )


def gapfill_daily_linear(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar gap-fill with LINEAR interpolation — the
    `time_bucket_gapfill + interpolate` twin of
    :func:`gapfill_daily_forward`'s locf (TimescaleDB's public API
    shape, reimplemented as a spine join; no reference code).

    Same plan skeleton as the forward fill (daily agg -> per-key span
    -> distributed sequence() spine -> left join -> per-key windows);
    the fill needs TWO windows instead of one — last known
    (value, day) looking back, first known looking forward — and the
    interpolated value is
    prev + round((next - prev) * gap_pos / gap_len)
    over EXACT scaled-integer endpoints: the only float op is one
    division of exact integers, bit-identical in any engine, so the
    oracle hash-compares. Spine spans each key's own [min, max] known
    days, so every gap is interior and both endpoints exist.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    daily = (
        events.groupBy(F.col(key_col).alias("k"), day.alias("day"))
        .agg(
            F.round(F.sum(value_col) * 100)
            .cast("long")
            .alias("value_e2"),
        )
    )
    span = daily.groupBy("k").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = span.select(
        "k",
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    j = spine.join(daily, ["k", "day"], "left")
    back = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("value_e2").isNotNull(), F.col("day"))
    prev_v = F.last("value_e2", ignorenulls=True).over(back)
    prev_d = F.last(known_day, ignorenulls=True).over(back)
    next_v = F.first("value_e2", ignorenulls=True).over(fwd)
    next_d = F.first(known_day, ignorenulls=True).over(fwd)
    gap_pos = F.datediff(F.col("day"), prev_d).cast("long")
    gap_len = F.datediff(next_d, prev_d).cast("long")
    interp = F.when(F.col("value_e2").isNotNull(), F.col("value_e2")).otherwise(
        (
            prev_v
            + F.round((next_v - prev_v) * gap_pos / gap_len).cast("long")
        )
    )
    return j.select(
        F.col("k").alias(key_col),
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        interp.alias("interp_value_e2"),
        F.col("value_e2").isNull().alias("is_gap"),
    )


def max_concurrent_intervals(
    intervals: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Peak number of simultaneously-active intervals and the first
    instant it is reached — ClickHouse's maxIntersections /
    maxIntersectionsPosition pair (public docs), the "peak concurrent
    sessions" question. One row out: (peak_concurrency, peak_at_us).

    Endpoint semantics: intervals are CLOSED ([start, end] — a
    zero-length interval still counts as active at its instant, and
    two intervals touching at a point overlap), so at equal time the
    +1 endpoints apply before the -1s: sweep order is (t ASC, d DESC).
    ClickHouse's own pair is half-open; closed is the deliberate
    choice here because gap-sessionized single-event sessions have
    start == end and would otherwise never register. The peak and its
    first instant are permutation-invariant within equal (t, d) runs
    (+1 runs peak at their last row, so the attained prefix-value SET
    at a given t is fixed), hence deterministic and engine-portable.

    Scale shape: a naive running sum over all endpoints is ONE
    partitionless window — the pattern class split.epoch_shuffle:136
    exists to kill. Same two-pass prefix-bucket construction, with the
    bucket = the endpoint's time DIV ``bucket_us`` (time buckets are
    ordered by construction, so (bucket, t, d DESC) order == global
    sweep order). Pass 1 nets each bucket's sum(d) (one map-side-
    combined agg; collect is bounded by the corpus' time span — ~365
    rows/year at the day default; widen bucket_us if the collect ever
    matters). Pass 2 runs the sweep inside each bucket (PARTITIONED
    window) and adds the prefix offset of all earlier buckets — a
    literal map below 1024 buckets, a broadcast-joined frame above
    (same thresholds as epoch_shuffle). The final argmax is one
    min(struct(-run, t)) aggregate: exact BIGINTs, no second pass.

    Empty input yields one row of NULLs (no interval was ever active).
    """
    starts = intervals.select(
        F.col(start_col).cast("long").alias("t"),
        F.lit(1).cast("long").alias("d"),
    )
    ends = intervals.select(
        F.col(end_col).cast("long").alias("t"),
        F.lit(-1).cast("long").alias("d"),
    )
    pts = starts.unionAll(ends).withColumn(
        "__bkt", F.floor(F.col("t") / F.lit(int(bucket_us))).cast("long")
    )
    nets = {
        r["__bkt"]: r["net"]
        for r in pts.groupBy("__bkt").agg(F.sum("d").alias("net")).collect()
    }
    offsets: dict[int, int] = {}
    cum = 0
    for b in sorted(nets):
        offsets[b] = cum
        cum += nets[b]
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("t").asc(), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = F.sum("d").over(w)
    if len(offsets) <= 1024:
        off_map = F.create_map(
            *[
                F.lit(x)
                for b, o in sorted(offsets.items())
                for x in (b, o)
            ]
        )
        runs = pts.withColumn(
            "run",
            (F.coalesce(F.element_at(off_map, F.col("__bkt")), F.lit(0))
             + in_bucket).cast("long"),
        )
    else:
        off_df = pts.sparkSession.createDataFrame(
            sorted(offsets.items()), "__bkt long, __off long"
        )
        runs = (
            pts.join(F.broadcast(off_df), "__bkt")
            .withColumn("run", (F.col("__off") + in_bucket).cast("long"))
            .drop("__off")
        )
    m = runs.agg(
        F.min(
            F.struct(
                (-F.col("run")).alias("nr"), F.col("t").alias("t")
            )
        ).alias("m")
    )
    return m.select(
        (-F.col("m.nr")).cast("long").alias("peak_concurrency"),
        F.col("m.t").cast("long").alias("peak_at_us"),
    )


def interval_length_sum(
    intervals: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Total length of the UNION of intervals — ClickHouse's
    intervalLengthSum (public docs): "how long was at least one
    session active", overlaps counted once. One row out:
    (covered_us, sum_lengths_us, n_intervals) — covered vs the raw
    sum exposes the overlap factor directly.

    Union length is convention-free where maxIntersections is not:
    closed vs half-open endpoints differ only on measure-zero
    junctions, so zero-length intervals contribute 0 either way and
    the result is the Lebesgue measure of the union under both.

    Sweep construction (same two-pass prefix-bucket shape as
    max_concurrent_intervals, one extra per-bucket scalar): a segment
    [t_i, t_next) is covered iff the running active count after row i
    is > 0. The within-tie permutation never matters — only the LAST
    row of an equal-(t, d) run contributes a nonzero segment, and its
    prefix value is the whole group's sum, which is
    permutation-invariant. `t_next` for a bucket's last row is the
    next non-empty bucket's first endpoint, which pass 1 already
    collects (min(t) per bucket, bounded like the offsets); the
    final row overall coalesces to its own t (its run is 0 anyway:
    every +1 has a matching -1, so nets sum to zero).
    """
    starts = intervals.select(
        F.col(start_col).cast("long").alias("t"),
        F.lit(1).cast("long").alias("d"),
    )
    ends = intervals.select(
        F.col(end_col).cast("long").alias("t"),
        F.lit(-1).cast("long").alias("d"),
    )
    pts = starts.unionAll(ends).withColumn(
        "__bkt", F.floor(F.col("t") / F.lit(int(bucket_us))).cast("long")
    )
    stats = {
        r["__bkt"]: (r["net"], r["first_t"])
        for r in pts.groupBy("__bkt")
        .agg(F.sum("d").alias("net"), F.min("t").alias("first_t"))
        .collect()
    }
    order = sorted(stats)
    offsets: dict[int, int] = {}
    next_first: dict[int, int] = {}
    cum = 0
    for i, b in enumerate(order):
        offsets[b] = cum
        cum += stats[b][0]
        if i + 1 < len(order):
            next_first[b] = stats[order[i + 1]][1]
    w = Window.partitionBy("__bkt").orderBy(
        F.col("t").asc(), F.col("d").desc()
    )
    run_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if len(offsets) <= 1024:
        off_map = F.create_map(
            *[F.lit(x) for b, o in sorted(offsets.items()) for x in (b, o)]
        )
        nxt_map = (
            F.create_map(
                *[
                    F.lit(x)
                    for b, nf in sorted(next_first.items())
                    for x in (b, nf)
                ]
            )
            if next_first
            else F.create_map()
        )
        enriched = pts.withColumn(
            "run",
            (F.coalesce(F.element_at(off_map, F.col("__bkt")), F.lit(0))
             + F.sum("d").over(run_w)).cast("long"),
        ).withColumn(
            "nt",
            F.coalesce(
                F.lead("t").over(w),
                F.element_at(nxt_map, F.col("__bkt")),
                F.col("t"),
            ),
        )
    else:
        rows = [
            (b, offsets[b], next_first.get(b)) for b in order
        ]
        off_df = pts.sparkSession.createDataFrame(
            rows, "__bkt long, __off long, __nf long"
        )
        enriched = (
            pts.join(F.broadcast(off_df), "__bkt")
            .withColumn(
                "run",
                (F.col("__off") + F.sum("d").over(run_w)).cast("long"),
            )
            .withColumn(
                "nt",
                F.coalesce(
                    F.lead("t").over(w), F.col("__nf"), F.col("t")
                ),
            )
            .drop("__off", "__nf")
        )
    # one aggregate answers all three: the raw length sum is an
    # endpoint identity (sum over ends minus sum over starts =
    # sum(-d * t)) and the interval count is the +1 endpoint count,
    # so no second scan and no 1x1 cross join of separate aggs
    return enriched.agg(
        F.sum(
            F.when(F.col("run") > 0, F.col("nt") - F.col("t")).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("covered_us"),
        F.sum(-F.col("d") * F.col("t")).cast("long").alias(
            "sum_lengths_us"
        ),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast("long").alias(
            "n_intervals"
        ),
    )


_LTTB_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("pt_idx", T.LongType()),
        T.StructField("us", T.LongType()),
        T.StructField("value_e2", T.LongType()),
    ]
)


def lttb_downsample(
    events: DataFrame,
    n_out: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series —
    ClickHouse's largestTriangleThreeBuckets aggregate (public docs;
    algorithm from Steinarsson's public thesis): reduce each key's
    (time, value) series to ``n_out`` visually-representative points.
    First/last points always kept; each middle bucket contributes the
    point forming the LARGEST triangle with the previously selected
    point and the NEXT bucket's centroid.

    Exactness/determinism contract (what makes a golden-fixture
    oracle sound): points are integer microseconds (x, offset to the
    series start) and integer cents (y); the triangle comparison uses
    the 2*m-scaled cross product |(m*xa - Sx)*(yc - ya) -
    (xa - xc)*(Sy - m*ya)| — centroid division never happens, every
    quantity is an exact Python int (arbitrary precision, no int64
    overflow on epoch-scale products), and area ties select the
    EARLIEST candidate. The kernel is a pure function of the series
    in (ts, event_id) order, so output is independent of
    partitioning, engine version, and run.

    Scale shape: the LTTB recurrence is sequential WITHIN a series
    (each selection feeds the next triangle) — inherently per-key —
    so the kernel runs under applyInPandas over HASH BUCKETS of the
    key (~num_buckets Python calls, not one per key; the
    resample_daily pattern), and per-task cost is bounded by the
    bucket's share of events. Series length per key is the natural
    bound (user activity), never corpus size.
    """
    from ..tables import epoch_us

    if n_out < 3:
        raise ValueError(
            f"lttb needs n_out >= 3 (first + last + one bucket), got "
            f"{n_out}"
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        pdf = pdf.sort_values(["user_id", "us", "eid"], kind="mergesort")
        for uid, g in pdf.groupby("user_id", sort=False):
            xs0 = g["us"].tolist()
            ys = g["value_e2"].tolist()
            n = len(xs0)
            base = xs0[0]
            xs = [int(x) - int(base) for x in xs0]
            if n <= n_out:
                sel = list(range(n))
            else:
                sel = [0]
                # n-2 middle points into n_out-2 equal ranges
                bounds = [
                    1 + ((n - 2) * i) // (n_out - 2)
                    for i in range(n_out - 1)
                ]
                a = 0  # previously selected index
                for b in range(n_out - 2):
                    lo, hi = bounds[b], bounds[b + 1]
                    nlo, nhi = (
                        (bounds[b + 1], bounds[b + 2])
                        if b + 2 <= n_out - 2
                        else (bounds[b + 1], n - 1)
                    )
                    if b == n_out - 3:
                        nlo, nhi = hi, n  # last bucket's "next" = tail
                    m = max(nhi - nlo, 1)
                    sx = sum(xs[nlo:nhi]) if nhi > nlo else xs[n - 1]
                    sy = sum(ys[nlo:nhi]) if nhi > nlo else ys[n - 1]
                    if nhi <= nlo:
                        m = 1
                    xa, ya = xs[a], ys[a]
                    best, best_area = lo, -1
                    for c in range(lo, hi):
                        area = abs(
                            (m * xa - sx) * (ys[c] - ya)
                            - (xa - xs[c]) * (sy - m * ya)
                        )
                        if area > best_area:
                            best, best_area = c, area
                    sel.append(best)
                    a = best
                sel.append(n - 1)
            for i, idx in enumerate(sel):
                out_rows.append((int(uid), i, int(xs0[idx]), int(ys[idx])))
        return pd.DataFrame(
            out_rows, columns=["user_id", "pt_idx", "us", "value_e2"]
        )

    ev = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        epoch_us(events, ts_col).alias("us"),
        F.round(F.col(value_col) * 100).cast("long").alias("value_e2"),
        F.col(id_col).cast("long").alias("eid"),
        F.pmod(F.hash(key_col), F.lit(num_buckets)).alias("__bkt"),
    )
    return ev.groupBy("__bkt").applyInPandas(kernel, schema=_LTTB_SCHEMA)
