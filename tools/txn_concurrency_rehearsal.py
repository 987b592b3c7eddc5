"""Concurrent-writer rehearsal for the exactly-once txn sink (r9).

The r8 exactly-once matrix was pytest-covered single-writer; this
drives N genuinely concurrent writer threads (distinct app ids, the
txn contract's unit of sequencing) against ONE table and measures
what the OCC layer actually does under contention:

- every (app, version) batch lands EXACTLY once (row count + id-sum
  vs the expected total — zero lost, zero duplicated);
- CAS conflicts are retried internally (manifest PUT losers re-commit
  the same landed files against the fresh snapshot); the rehearsal
  records the conflict-retry rate and any commits that exhausted the
  5-attempt budget (escalated to the caller, who retries — still
  exactly-once because the watermark check is part of the retried
  commit);
- a full REPLAY of every batch afterwards is a no-op (0 new rows,
  version unchanged);
- a same-app concurrent duplicate raises ConcurrentTxnError (the
  loud path, never a double apply).

Usage: python tools/txn_concurrency_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

N_WRITERS = 4
BATCHES_PER_WRITER = 8
ROWS_PER_BATCH = 50


def main() -> int:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "txn_concurrency.json"
    )
    spark = get_spark(
        "txn-concurrency", **{"spark.sql.shuffle.partitions": "8"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_txn_"))

    # count CAS losses by wrapping the manifest PUT
    real_put = snap._put_manifest
    stats_lock = threading.Lock()
    stats = {"puts": 0, "cas_conflicts": 0, "escalations": 0}

    def counting_put(*a, **kw):
        with stats_lock:
            stats["puts"] += 1
        try:
            return real_put(*a, **kw)
        except snap.CommitConflictError:
            with stats_lock:
                stats["cas_conflicts"] += 1
            raise

    snap._put_manifest = counting_put

    def batch_df(app: int, b: int):
        lo = app * 1_000_000 + b * 1_000
        return spark.createDataFrame(
            [(lo + i, app, b) for i in range(ROWS_PER_BATCH)],
            "__row_id long, app long, batch long",
        )

    errors: list = []

    def writer(app: int):
        for b in range(1, BATCHES_PER_WRITER + 1):
            df = batch_df(app, b)
            for attempt in range(10):
                try:
                    snap.append_versioned(
                        wh, "db", "t", df, txn=(f"app{app}", b)
                    )
                    break
                except snap.CommitConflictError:
                    # 5 internal attempts exhausted under heavy
                    # contention: caller retries; the watermark
                    # check inside the retried commit preserves
                    # exactly-once
                    with stats_lock:
                        stats["escalations"] += 1
                    time.sleep(0.05 * (attempt + 1))
            else:
                errors.append((app, b, "gave up"))

    t0 = time.time()
    threads = [
        threading.Thread(target=writer, args=(a,))
        for a in range(N_WRITERS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    got = snap.read_snapshot(wh, "db", "t")
    n = got.count()
    expect_n = N_WRITERS * BATCHES_PER_WRITER * ROWS_PER_BATCH
    distinct = got.select("__row_id").distinct().count()
    v_before_replay = snap.versions(wh, "db", "t")[-1]

    # full replay: every batch again, in order, single-threaded
    t0 = time.time()
    for app in range(N_WRITERS):
        for b in range(1, BATCHES_PER_WRITER + 1):
            v = snap.append_versioned(
                wh, "db", "t", batch_df(app, b), txn=(f"app{app}", b)
            )
            assert v == v_before_replay, (app, b, v)
    replay_wall = time.time() - t0
    n_after = snap.read_snapshot(wh, "db", "t").count()

    # same-app concurrent duplicate must be LOUD
    loud = False
    try:
        # watermark for app0 is BATCHES_PER_WRITER; an equal-version
        # "concurrent" writer that somehow got past the fast-path
        # check must raise, not double-apply — simulate by calling
        # the commit layer directly with the already-used version
        snap._txn_commit(
            wh, "db", "t",
            [],  # no files: the watermark check fires first
            (f"app0", BATCHES_PER_WRITER),
        )
    except snap.ConcurrentTxnError:
        loud = True

    # phase 2 — FORCED contention: natural thread interleaving rarely
    # collides (the versions-read -> PUT window is ~ms while the data
    # write is ~0.5 s), so widen the window with an injected sleep
    # and measure the CAS machinery actually retrying. Exactly-once
    # must hold regardless of the conflict rate.
    real_versions = snap.versions
    in_phase2 = threading.Event()
    in_phase2.set()

    def slow_versions(wh_, database, table):
        out = real_versions(wh_, database, table)
        if in_phase2.is_set() and table == "t2":
            time.sleep(0.15)
        return out

    snap.versions = slow_versions
    stats2 = dict(stats)
    t0 = time.time()
    threads = []

    def writer2(app: int):
        for b in range(1, 5):
            lo = 10_000_000 + app * 1_000_000 + b * 1_000
            df = spark.createDataFrame(
                [(lo + i, app, b) for i in range(10)],
                "__row_id long, app long, batch long",
            )
            for attempt in range(10):
                try:
                    snap.append_versioned(
                        wh, "db", "t2", df, txn=(f"app{app}", b)
                    )
                    break
                except snap.CommitConflictError:
                    with stats_lock:
                        stats["escalations"] += 1
                    time.sleep(0.05 * (attempt + 1))
            else:
                errors.append((app, b, "gave up (phase2)"))

    threads = [
        threading.Thread(target=writer2, args=(a,))
        for a in range(N_WRITERS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    forced_wall = time.time() - t0
    in_phase2.clear()
    snap.versions = real_versions
    forced = {
        "cas_conflicts": stats["cas_conflicts"] - stats2["cas_conflicts"],
        "caller_escalations": (
            stats["escalations"] - stats2["escalations"]
        ),
        "manifest_puts": stats["puts"] - stats2["puts"],
        "wall_s": round(forced_wall, 2),
        "rows": snap.read_snapshot(wh, "db", "t2").count(),
        "rows_expected": N_WRITERS * 4 * 10,
        "distinct_row_ids": snap.read_snapshot(wh, "db", "t2")
        .select("__row_id").distinct().count(),
    }

    snap._put_manifest = real_put
    results = {
        "forced_contention": forced,
        "writers": N_WRITERS,
        "batches_per_writer": BATCHES_PER_WRITER,
        "rows_per_batch": ROWS_PER_BATCH,
        "wall_s": round(wall, 2),
        "rows": n,
        "rows_expected": expect_n,
        "distinct_row_ids": distinct,
        "lost_batches": len(errors),
        "manifest_puts": stats["puts"],
        "cas_conflicts": stats["cas_conflicts"],
        "caller_escalations": stats["escalations"],
        "replay_wall_s": round(replay_wall, 2),
        "replay_new_rows": n_after - n,
        "concurrent_duplicate_raises": loud,
    }
    print(json.dumps(results, indent=1))
    ok = (
        n == expect_n == distinct
        and not errors
        and n_after == n
        and loud
        and forced["rows"]
        == forced["rows_expected"]
        == forced["distinct_row_ids"]
    )
    if ok:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print("OK ->", out_path)
        return 0
    print("FAILED")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
