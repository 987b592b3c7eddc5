"""windowFunnel with ClickHouse mode parity (strict_order /
strict_deduplication / strict_increase).

ClickHouse's windowFunnel (public design — the documented
AggregateFunctionWindowFunnel algorithm) is a SINGLE PASS over each
user's time-sorted events keeping, per funnel level k, the pair
(anchor ts of a chain that reached k, ts of the level-k event of that
chain):

- a stage-1 event (re)sets level 1's pair to (t, t);
- a stage-k event (k>1) extends a chain: if level k-1 has a pair and
  t <= anchor + window (and, under strict_increase, the level-(k-1)
  event's ts < t), level k takes (that anchor, t); reaching the top
  level ends processing;
- strict_deduplication: a stage-k event (k>1) arriving while level k
  is ALREADY reached interrupts processing and the result IS k;
- strict_order: an event matching NO stage, after the first stage-1
  event, ends processing.

The result is the highest level with a pair (or the interrupt value).

Spark shape (100 TB): one shuffle keyed on the user column;
per-user events become one sorted array (session-scale, bounded) and
the pass is an ``F.aggregate`` fold over it — a pure JVM expression
tree, no UDF, no join explosion. The same fold is expressible in
DuckDB as a RECURSIVE CTE over the same sorted sequence, which is
what makes every mode EXACTLY oracle-checkable (duckdb_funnel_oracle
emits that SQL — NOT list_reduce; see its docstring for the measured
plan-shape bug that rules the lambda form out); both engines sort by
(ts, stage) so ties are deterministic.

Reference context: ScratchDB's flagship backend is ClickHouse
(destinations/clickhouse/query.go pass-through) — windowFunnel modes
are part of the SQL surface its users run today.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MODES = ("strict_order", "strict_deduplication", "strict_increase")


def window_funnel_levels(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds: Sequence[Column],
    window_micros: int,
    modes: Sequence[str] = (),
) -> DataFrame:
    """Per-user funnel level under the given modes: (user, level).

    ``conds`` are the stage predicates (stage 1..N, evaluated against
    the event row); ``window_micros`` is the funnel window from the
    chain's ANCHOR (its stage-1 event). Users with no stage-1 event
    in range report level 0 only if they have any event at all kept
    by the mode filter — callers aggregating a distribution usually
    filter level >= 1.

    Scale bound: the per-user sorted array is session-scale (bounded
    by one user's event count — the same bound every collect_list
    sequence operator here carries, see events_sequence_match). A
    bot-grade hot user is the skew risk: profile with
    monitor.key_skew_profile and pre-cap or divert such keys, or use
    the STREAMING twin (streaming/stateful.py::
    streaming_funnel_levels), whose state is O(1) per user and never
    materializes the history.
    """
    for m in modes:
        if m not in _MODES:
            raise ValueError(f"unknown funnel mode {m!r}; in {_MODES}")
    n = len(conds)
    if n < 2:
        raise ValueError("a funnel needs at least 2 stages")
    strict_order = "strict_order" in modes
    strict_dedup = "strict_deduplication" in modes
    strict_increase = "strict_increase" in modes

    idx = F.when(conds[0], F.lit(1))
    for i, c in enumerate(conds[1:], start=2):
        idx = idx.when(c, F.lit(i))
    idx = idx.otherwise(F.lit(0))

    ev = events.select(
        F.col(user_col).alias("__u"),
        # NTZ timestamps (the testdata's nanos conversion yields
        # TIMESTAMP_NTZ) cast first; session tz is UTC so the cast
        # is value-identity and matches DuckDB's epoch_us
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        idx.alias("e"),
    )
    if not strict_order:
        # non-matching events only matter under strict_order
        ev = ev.filter(F.col("e") > 0)
    arr = ev.groupBy("__u").agg(
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("evs")
    )

    state_fields = (
        [f"f{k}" for k in range(1, n + 1)]
        + [f"l{k}" for k in range(1, n + 1)]
        + ["fe", "br", "rs"]
    )

    def mk(acc, **over):
        cols = []
        for name in state_fields:
            if name in over:
                v = over[name]
            else:
                v = acc[name]
            cols.append(v.alias(name))
        return F.struct(*cols)

    init = F.struct(
        *(
            [F.lit(None).cast("long").alias(f"f{k}") for k in range(1, n + 1)]
            + [F.lit(None).cast("long").alias(f"l{k}") for k in range(1, n + 1)]
            + [
                F.lit(False).alias("fe"),
                F.lit(False).alias("br"),
                F.lit(0).alias("rs"),
            ]
        )
    )

    W = F.lit(int(window_micros))

    def step(acc, x):
        t, e = x["t"], x["e"]
        keep = mk(acc)  # identical rebuild (types align across branches)
        stage1 = mk(acc, f1=t, l1=t, fe=F.lit(True))
        out = F.when((acc["br"]) | (acc["rs"] > 0), keep)
        if strict_order:
            out = out.when(
                e == 0,
                F.when(acc["fe"], mk(acc, br=F.lit(True))).otherwise(keep),
            )
        out = out.when(e == 1, stage1)
        for k in range(2, n + 1):
            time_ok = t <= acc[f"f{k-1}"] + W
            if strict_increase:
                time_ok = time_ok & (acc[f"l{k-1}"] < t)
            extend = mk(
                acc,
                **{
                    f"f{k}": acc[f"f{k-1}"],
                    f"l{k}": t,
                    # reaching the top level ends processing (CH's
                    # early return): freeze the result
                    "rs": F.lit(n) if k == n else acc["rs"],
                },
            )
            chain = F.when(
                acc[f"f{k-1}"].isNotNull() & time_ok, extend
            ).otherwise(keep)
            if strict_dedup:
                chain = F.when(
                    acc[f"f{k}"].isNotNull(), mk(acc, rs=F.lit(k))
                ).otherwise(chain)
            out = out.when(e == k, chain)
        return out.otherwise(keep)

    def finish(acc):
        lvl = F.lit(0)
        for k in range(1, n + 1):  # highest set level wins
            lvl = F.when(acc[f"f{k}"].isNotNull(), F.lit(k)).otherwise(lvl)
        return F.when(acc["rs"] > 0, acc["rs"]).otherwise(lvl)

    return arr.select(
        F.col("__u").alias(user_col),
        F.aggregate(F.col("evs"), init, step, finish).alias("level"),
    )


def window_funnel_bootstrap_states(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds: Sequence[Column],
    window_micros: int,
    modes: Sequence[str] = (),
) -> DataFrame:
    """The SAME single-pass fold as window_funnel_levels, but emitting
    the raw per-user ACCUMULATOR instead of the finalized level — the
    JVM-side history bootstrap for the streaming twin (streaming/
    stateful.py::streaming_funnel_levels): fold the (cheap, scan-rate)
    batch pass over history once, seed the stream's state store
    layout, and stream only post-cutover events. Output columns match
    the streaming state schema exactly — interleaved ``f1, l1, ...,
    fn, ln`` (the py_funnel_init tuple layout) plus ``fe, br, rs``,
    ``ns`` (events folded — the stream's cumulative n_seen continues
    from it) and ``level`` (the finalized history level, for the
    sink's initial table: users that never appear post-cutover emit
    no stream row, so the dashboard starts from these).

    The fold expression and event filtering are shared with
    window_funnel_levels (same init/step), so seeded-then-streamed
    equals full-stream BY CONSTRUCTION (pytest-pinned:
    test_streaming_funnel_bootstrap_matches_full_stream)."""
    for m in modes:
        if m not in _MODES:
            raise ValueError(f"unknown funnel mode {m!r}; in {_MODES}")
    n = len(conds)
    lv = window_funnel_levels  # noqa: F841  (doc anchor)
    # rebuild the identical fold pieces (kept textually in
    # window_funnel_levels to leave its plan untouched; the parity
    # test pins the two stay in lockstep)
    strict_order = "strict_order" in modes
    strict_dedup = "strict_deduplication" in modes
    strict_increase = "strict_increase" in modes
    if n < 2:
        raise ValueError("a funnel needs at least 2 stages")
    idx = F.when(conds[0], F.lit(1))
    for i, c in enumerate(conds[1:], start=2):
        idx = idx.when(c, F.lit(i))
    idx = idx.otherwise(F.lit(0))
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        idx.alias("e"),
    )
    if not strict_order:
        ev = ev.filter(F.col("e") > 0)
    arr = ev.groupBy("__u").agg(
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("evs")
    )

    state_fields = (
        [f"f{k}" for k in range(1, n + 1)]
        + [f"l{k}" for k in range(1, n + 1)]
        + ["fe", "br", "rs"]
    )

    def mk(acc, **over):
        cols = []
        for name in state_fields:
            v = over[name] if name in over else acc[name]
            cols.append(v.alias(name))
        return F.struct(*cols)

    init = F.struct(
        *(
            [F.lit(None).cast("long").alias(f"f{k}") for k in range(1, n + 1)]
            + [F.lit(None).cast("long").alias(f"l{k}") for k in range(1, n + 1)]
            + [
                F.lit(False).alias("fe"),
                F.lit(False).alias("br"),
                F.lit(0).alias("rs"),
            ]
        )
    )
    W = F.lit(int(window_micros))

    def step(acc, x):
        t, e = x["t"], x["e"]
        keep = mk(acc)
        stage1 = mk(acc, f1=t, l1=t, fe=F.lit(True))
        out = F.when((acc["br"]) | (acc["rs"] > 0), keep)
        if strict_order:
            out = out.when(
                e == 0,
                F.when(acc["fe"], mk(acc, br=F.lit(True))).otherwise(keep),
            )
        out = out.when(e == 1, stage1)
        for k in range(2, n + 1):
            time_ok = t <= acc[f"f{k-1}"] + W
            if strict_increase:
                time_ok = time_ok & (acc[f"l{k-1}"] < t)
            extend = mk(
                acc,
                **{
                    f"f{k}": acc[f"f{k-1}"],
                    f"l{k}": t,
                    "rs": F.lit(n) if k == n else acc["rs"],
                },
            )
            chain = F.when(
                acc[f"f{k-1}"].isNotNull() & time_ok, extend
            ).otherwise(keep)
            if strict_dedup:
                chain = F.when(
                    acc[f"f{k}"].isNotNull(), mk(acc, rs=F.lit(k))
                ).otherwise(chain)
            out = out.when(e == k, chain)
        return out.otherwise(keep)

    def finish(acc):
        lvl = F.lit(0)
        for k in range(1, n + 1):
            lvl = F.when(acc[f"f{k}"].isNotNull(), F.lit(k)).otherwise(lvl)
        return F.when(acc["rs"] > 0, acc["rs"]).otherwise(lvl)

    folded = arr.select(
        F.col("__u"),
        F.aggregate(F.col("evs"), init, step).alias("acc"),
        F.size("evs").cast("long").alias("ns"),
    )
    flat = [F.col("__u").alias(user_col)]
    for k in range(1, n + 1):  # interleave to the streaming layout
        flat += [
            F.col(f"acc.f{k}").alias(f"f{k}"),
            F.col(f"acc.l{k}").alias(f"l{k}"),
        ]
    flat += [
        F.col("acc.fe").alias("fe"),
        F.col("acc.br").alias("br"),
        F.col("acc.rs").alias("rs"),
        F.col("ns"),
        finish(F.col("acc")).alias("level"),
    ]
    return folded.select(*flat)


def py_funnel_init(n: int) -> tuple:
    """Flattened fold state: (f1, l1, ..., fn, ln, fe, br, rs) —
    the exact accumulator the Spark fold carries, as a plain tuple so
    the STREAMING twin (streaming/stateful.py::streaming_funnel_levels)
    can persist it in the state store and resume across micro-batches."""
    return tuple([None] * (2 * n)) + (False, False, 0)


def py_funnel_step(
    state: tuple,
    t: int,
    e: int,
    n: int,
    window_micros: int,
    strict_order: bool = False,
    strict_dedup: bool = False,
    strict_increase: bool = False,
) -> tuple:
    """One event through the documented single-pass algorithm —
    byte-for-byte the Spark fold's transition (pinned against it by
    test_window_funnel_matches_python_reference_all_mode_combos via
    the shared reference, and directly by the streaming parity test)."""
    fl = list(state[: 2 * n])
    fe, br, rs = state[2 * n], state[2 * n + 1], state[2 * n + 2]
    if br or rs > 0:
        return state
    if e == 0:
        if strict_order and fe:
            return tuple(fl) + (fe, True, rs)
        return state
    if e == 1:
        fl[0] = fl[1] = t
        return tuple(fl) + (True, br, rs)
    if strict_dedup and fl[2 * (e - 1)] is not None:
        return tuple(fl) + (fe, br, e)
    if fl[2 * (e - 2)] is not None:
        first, last = fl[2 * (e - 2)], fl[2 * (e - 2) + 1]
        ok = t <= first + window_micros
        if strict_increase:
            ok = ok and last < t
        if ok:
            fl[2 * (e - 1)] = first
            fl[2 * (e - 1) + 1] = t
            if e == n:
                rs = n
            return tuple(fl) + (fe, br, rs)
    return state


def py_funnel_level(state: tuple, n: int) -> int:
    """Finalize: the interrupt value when set, else the highest
    reached level."""
    rs = state[2 * n + 2]
    if rs > 0:
        return rs
    for k in range(n, 0, -1):
        if state[2 * (k - 1)] is not None:
            return k
    return 0


def duckdb_funnel_oracle(
    stage_cases: str,
    window_micros: int,
    modes: Sequence[str] = (),
    n: int = 3,
    events_table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """The SAME fold as DuckDB SQL — the exact oracle for every mode.
    ``stage_cases`` maps an event row to its stage index 1..N (0 =
    no stage), e.g. "CASE event_type WHEN 'view' THEN 1 ... ELSE 0
    END". Returns SQL producing (level, n_users) for level >= 1.

    Emitted as a RECURSIVE CTE that advances every user's state one
    event per iteration (events numbered per user by (t, e) — the
    same sort Spark's array_sort uses), NOT as list_reduce: DuckDB
    1.0's list_reduce with a constant-struct list_prepend seed
    returns plan-shape-dependent results on full scans (observed:
    the same user folding to level 3 under a pushed-down filter and
    2 without), so the lambda form is not oracle-grade. Iteration
    count = max events per user; work per step = one join row per
    still-active user — trivial at oracle scale."""
    strict_order = "strict_order" in modes
    strict_dedup = "strict_deduplication" in modes
    strict_increase = "strict_increase" in modes

    active = "NOT (s.br OR s.rs > 0)"
    # per-field transition expressions (branches are disjoint by x.e
    # once gated on `active`, so one CASE per field is exact)
    br_new = (
        f"CASE WHEN {active} AND x.e = 0 AND s.fe THEN true "
        "ELSE s.br END"
        if strict_order
        else "s.br"
    )
    fe_new = f"CASE WHEN {active} AND x.e = 1 THEN true ELSE s.fe END"
    fields = {
        "f1": f"CASE WHEN {active} AND x.e = 1 THEN x.t ELSE s.f1 END",
        "l1": f"CASE WHEN {active} AND x.e = 1 THEN x.t ELSE s.l1 END",
    }
    dedups = {}
    chains = {}
    for k in range(2, n + 1):
        dedup_k = (
            f"({active} AND x.e = {k} AND s.f{k} IS NOT NULL)"
            if strict_dedup
            else "false"
        )
        time_ok = f"x.t <= s.f{k-1} + {int(window_micros)}"
        if strict_increase:
            time_ok += f" AND s.l{k-1} < x.t"
        chain_k = (
            f"({active} AND x.e = {k} AND NOT {dedup_k} "
            f"AND s.f{k-1} IS NOT NULL AND ({time_ok}))"
        )
        dedups[k] = dedup_k
        chains[k] = chain_k
        fields[f"f{k}"] = (
            f"CASE WHEN {chain_k} THEN s.f{k-1} ELSE s.f{k} END"
        )
        fields[f"l{k}"] = f"CASE WHEN {chain_k} THEN x.t ELSE s.l{k} END"
    rs_branches = "".join(
        f"WHEN {dedups[k]} THEN {k} " for k in range(2, n + 1)
        if strict_dedup
    )
    rs_new = (
        f"CASE {rs_branches}WHEN {chains[n]} THEN {n} ELSE s.rs END"
    )

    f_cols = ", ".join(
        f"({fields[f'f{k}']}) AS f{k}, ({fields[f'l{k}']}) AS l{k}"
        for k in range(1, n + 1)
    )
    null_state = ", ".join(
        f"CAST(NULL AS BIGINT) AS f{k}, CAST(NULL AS BIGINT) AS l{k}"
        for k in range(1, n + 1)
    )
    lvl = "CASE "
    for k in range(n, 0, -1):
        lvl += f"WHEN s.f{k} IS NOT NULL THEN {k} "
    lvl += "ELSE 0 END"

    ev_filter = "WHERE TRUE" if strict_order else "WHERE e > 0"
    return f"""
    WITH RECURSIVE coded AS (
      SELECT {user_col} AS u, epoch_us({ts_col}) AS t,
             ({stage_cases}) AS e
      FROM {events_table}),
    kept AS (
      SELECT u, t, e,
             row_number() OVER (PARTITION BY u ORDER BY t, e) AS i
      FROM coded {ev_filter}),
    cnt AS (SELECT u, max(i) AS mx FROM kept GROUP BY u),
    step AS (
      SELECT u, 0 AS i, {null_state},
             false AS fe, false AS br, 0 AS rs
      FROM cnt
      UNION ALL
      SELECT s.u, x.i, {f_cols},
             ({fe_new}) AS fe, ({br_new}) AS br, ({rs_new}) AS rs
      FROM step s JOIN kept x ON x.u = s.u AND x.i = s.i + 1),
    fin AS (
      SELECT s.* FROM step s JOIN cnt ON s.u = cnt.u AND s.i = cnt.mx),
    lv AS (
      SELECT u,
             CASE WHEN s.rs > 0 THEN s.rs ELSE ({lvl}) END AS level
      FROM fin s)
    SELECT level, CAST(count(*) AS BIGINT) AS n_users
    FROM lv WHERE level >= 1 GROUP BY level
    """
