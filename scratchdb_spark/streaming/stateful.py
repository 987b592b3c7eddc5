"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no event-time or stateful streaming at all — its
"streaming" is ingestion micro-batching (pkg/datasink/filesystem,
pkg/workers/workers.go; see SURVEY §2.2 streaming row). These
operators are part of the training-data-pipeline extension surface:
arbitrary per-key state machines over an unbounded stream, the thing
watermarked windows can't express.

Scale shape: state is partitioned by the grouping key and lives in the
executor state store (RocksDB-backed on a real cluster via
``spark.sql.streaming.stateStore.providerClass``); each micro-batch
shuffles only that batch's rows to their key partitions, and the
kernel sees Arrow batches, not rows. State size is O(distinct keys),
not O(events) — constant per key here.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, value sum) maintained across
    micro-batches; emits one updated row per user per batch in which
    that user appears (update output mode).

    This is the streaming twin of ``SELECT user_id, count(*), sum(value)
    ... GROUP BY user_id`` — but incremental: arbitrary late data just
    folds in, and downstream sees a changelog instead of a recomputed
    table.
    """

    def fn(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, value_sum double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def inactivity_sessions(events: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Custom session assembly with processing-time timeout: a user's
    events accumulate in state; when no new events arrive for
    ``gap_ms``, the closed session (count, value sum, first/last event
    time) is emitted and state cleared.

    ``session_window`` covers the common case declaratively; this
    variant exists for session logic SQL can't express (emit-on-close
    only, custom close conditions, per-session model features).
    """

    def fn(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, s, t0, t1 = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [s],
                    "start_us": [t0],
                    "end_us": [t1],
                }
            )
            return
        n, s, t0, t1 = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            us = (pdf["ts"].astype("int64") // 1000).astype("int64")
            n += len(pdf)
            s += float(pdf["value"].sum())
            lo, hi = int(us.min()), int(us.max())
            t0 = lo if t0 is None else min(t0, lo)
            t1 = hi if t1 is None else max(t1, hi)
        state.update((n, s, t0, t1))
        state.setTimeoutDuration(gap_ms)
        return

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, n_events long, value_sum double, "
            "start_us long, end_us long"
        ),
        stateStructType="n long, s double, t0 long, t1 long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_funnel_levels(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds,
    window_micros: int,
    modes=(),
) -> DataFrame:
    """STREAMING windowFunnel: the per-user funnel fold
    (operators/funnel.py — ClickHouse's documented single-pass
    algorithm, all strict modes) maintained incrementally across
    micro-batches. Each batch folds its rows (sorted within the
    batch) into the persisted accumulator and emits the user's
    current level — the changelog a live conversion dashboard reads,
    without ever rescanning the event history.

    State is the fold accumulator itself: 2n timestamps + 3 flags + a
    fold counter per user (O(distinct users), independent of event
    count — the batch operator's per-user sorted ARRAY never
    materializes here). Delivery contract: in-order per user ACROSS
    batches (within a batch any order — the fold sorts it); late
    cross-batch events would need a buffer-and-reorder stage in
    front, the same caveat as every run-once fold over a stream.
    Exactness vs the batch operator under that contract is
    pytest-pinned (test_streaming_funnel_matches_batch).

    Output carries ``n_seen`` — the cumulative count of events folded
    for the user, STRICTLY increasing across the batches a user
    appears in. Sinks that must reduce update-mode rows to the user's
    CURRENT level select the row with max n_seen (``max_by(level,
    n_seen)``): the level itself is NOT monotonic in general — under
    strict_deduplication with >= 4 stages an interrupt at stage k
    reports k even when a higher level was already reached, so a
    max(level) reduction would keep the stale higher value."""
    from pyspark.sql import functions as F

    from ..operators.funnel import (
        _MODES,
        py_funnel_init,
        py_funnel_level,
        py_funnel_step,
    )

    for m in modes:
        if m not in _MODES:
            raise ValueError(f"unknown funnel mode {m!r}; in {_MODES}")
    n = len(conds)
    if n < 2:
        raise ValueError("a funnel needs at least 2 stages")
    so = "strict_order" in modes
    sd = "strict_deduplication" in modes
    si = "strict_increase" in modes

    idx = F.when(conds[0], F.lit(1))
    for i, c in enumerate(conds[1:], start=2):
        idx = idx.when(c, F.lit(i))
    idx = idx.otherwise(F.lit(0))
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        idx.alias("e"),
    )
    if not so:
        ev = ev.filter(F.col("e") > 0)

    state_schema = (
        ", ".join(
            f"f{k} long, l{k} long" for k in range(1, n + 1)
        )
        + ", fe boolean, br boolean, rs int, ns long"
    )

    def fn(
        key: Any,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            *acc, ns = state.get
            st = tuple(acc)
        else:
            st, ns = py_funnel_init(n), 0
        rows: list = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["t"].tolist(), pdf["e"].tolist())
            )
        rows.sort()
        for t, e in rows:
            st = py_funnel_step(
                st, int(t), int(e), n, window_micros, so, sd, si
            )
        ns += len(rows)
        state.update(st + (ns,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "level": [py_funnel_level(st, n)],
                "n_seen": [ns],
            }
        )

    return ev.groupBy("__u").applyInPandasWithState(
        fn,
        outputStructType="user_id long, level int, n_seen long",
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
