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

import json
import os
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: executor-side cache of loaded bootstrap-seed partitions, keyed by
#: (seed_dir, partition_id) — one parquet read per python worker per
#: state partition, O(users/num_partitions) memory each (the seed is
#: written PARTITION-ALIGNED with the stream's hash partitioning, so
#: no worker ever loads another partition's users)
_FUNNEL_SEED_CACHE: dict = {}

_FUNNEL_META = "_funnel_bootstrap_meta.json"


def _funnel_seed_partition(seed_dir: str, pid: int, n: int) -> dict:
    """Load (and cache) one seed partition: user -> (state tuple, ns).
    Missing partition dirs mean no seeded users hash there."""
    key = (seed_dir, pid)
    cached = _FUNNEL_SEED_CACHE.get(key)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    path = os.path.join(seed_dir, f"__pid={pid}")
    users: dict = {}
    if os.path.isdir(path):
        t = pq.read_table(path)
        cols = {c: t.column(c).to_pylist() for c in t.column_names}
        fields = [
            x for k in range(1, n + 1) for x in (f"f{k}", f"l{k}")
        ] + ["fe", "br", "rs"]
        for i, u in enumerate(cols["__u"]):
            st = tuple(cols[f][i] for f in fields)
            users[u] = (st, cols["ns"][i])
    _FUNNEL_SEED_CACHE[key] = users
    return users


def write_funnel_bootstrap(
    history: DataFrame,
    user_col: str,
    ts_col: str,
    conds,
    window_micros: int,
    seed_dir: str,
    modes=(),
    num_partitions: int | None = None,
) -> DataFrame:
    """Fold HISTORY once with the JVM batch pass and write a state
    seed the streaming funnel resumes from — the 'JVM fold for
    history, stream from cutover' bootstrap as code (r10 verdict
    item): at 100 TB you never replay a year of events through the
    Python stateful kernel; the batch fold runs at scan rate
    (operators/funnel.py::window_funnel_bootstrap_states), and the
    stream starts at the cutover offset with every user's accumulator
    already in place.

    The seed is written PARTITION-ALIGNED with the stream's state
    store: ``__pid = pmod(hash(user), P)`` mirrors Spark's
    HashPartitioning (Murmur3, the same function F.hash exposes), so
    the stateful task for partition p loads exactly its own users —
    O(users/P) memory per worker, no broadcast of the full state.
    ``P`` must equal the streaming query's
    ``spark.sql.shuffle.partitions`` (recorded in a meta sidecar;
    streaming_funnel_levels validates and refuses on mismatch —
    state-store partition counts are fixed at first query start).

    Returns the finalized (user, level) HISTORY frame: users that
    never appear post-cutover emit no stream row, so a dashboard sink
    starts from this table and overlays the stream's changelog
    (max_by(level, n_seen) — ns continues from the seed, so the
    reduction stays correct across the cut)."""
    from pyspark.sql import functions as F

    from ..operators.funnel import window_funnel_bootstrap_states

    spark = history.sparkSession
    P = (
        int(spark.conf.get("spark.sql.shuffle.partitions"))
        if num_partitions is None
        else int(num_partitions)
    )
    states = window_funnel_bootstrap_states(
        history, user_col, ts_col, conds, window_micros, modes
    )
    (
        states.select(
            F.col(user_col).alias("__u"),
            *[c for c in states.columns if c != user_col],
        )
        .withColumn("__pid", F.pmod(F.hash(F.col("__u")), F.lit(P)))
        .write.mode("overwrite")
        .partitionBy("__pid")
        .parquet(seed_dir)
    )
    meta = {
        "num_partitions": P,
        "n_stages": len(conds),
        "window_micros": int(window_micros),
        "modes": sorted(modes),
    }
    from .. import fs as hfs

    hfs.put_text_atomic(
        spark, f"{seed_dir}/{_FUNNEL_META}", json.dumps(meta)
    )
    return states.select(
        F.col(user_col), F.col("level"), F.col("ns").alias("n_seen")
    )


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
    bootstrap_dir: str | None = None,
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
    max(level) reduction would keep the stale higher value.

    ``bootstrap_dir``: resume from a write_funnel_bootstrap seed —
    history folded once JVM-side, the stream carrying only
    post-cutover events. A user's FIRST stream encounter loads its
    seeded accumulator (partition-aligned parquet: each stateful task
    reads only its own partition's users, cached per worker); after
    that the state store owns it. n_seen continues from the seeded
    count, so the max_by(level, n_seen) sink reduction stays correct
    across the cut. The seed's partition count / stage count / window
    / modes are validated against this query (state-store partitioning
    is fixed at first start; a mismatched seed would silently look up
    the wrong partition — refused loudly instead)."""
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

    if bootstrap_dir is not None:
        from .. import fs as hfs

        meta = json.loads(
            hfs.read_text(
                events.sparkSession, f"{bootstrap_dir}/{_FUNNEL_META}"
            )
        )
        cur_p = int(
            events.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        want = {
            "num_partitions": cur_p,
            "n_stages": n,
            "window_micros": int(window_micros),
            "modes": sorted(modes),
        }
        if meta != want:
            raise ValueError(
                f"bootstrap seed {bootstrap_dir!r} was written for "
                f"{meta}, but this query needs {want} — regenerate "
                "the seed (state-store partitioning is fixed at "
                "first query start)"
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
            if bootstrap_dir is not None:
                from pyspark import TaskContext

                seed = _funnel_seed_partition(
                    bootstrap_dir,
                    TaskContext.get().partitionId(),
                    n,
                ).get(key[0])
                if seed is not None:
                    st, ns = seed
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
