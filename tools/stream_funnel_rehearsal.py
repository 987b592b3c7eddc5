"""Streaming-funnel throughput/state rehearsal (round 10, verdict
item #6).

streaming_funnel_levels' per-event transition is Python inside
applyInPandasWithState — fine for live changelogs, but CATCH-UP
(replaying a large backlog through the stateful stream) had no
measured rows/s or state-store size. This tool streams a generated
backlog (U users x E events each, NDJSON files = micro-batches)
through the 3-stage strict_deduplication funnel and records:

- end-to-end rows/s over the whole run and per micro-batch
  (query.lastProgress / recentProgress);
- state-store rows and bytes from the stateOperators metrics —
  the O(distinct users) claim, measured;
- exactness: the streamed final levels equal the JVM batch fold over
  the same events (the operator's contract), checked on a sampled
  user set.

The catch-up story the numbers support goes in PERF.md: at the
measured rows/s per core, a backlog of B events costs B / (rate x
cores) seconds to replay; the JVM batch fold (window_funnel_levels)
remains the right tool for pure-historical REPORTS, and
transformWithStateInPandas' initial-state support is the upgrade
path if replay-to-seed ever dominates (documented, not built — the
measured rate decides whether it is needed).

Usage: python tools/stream_funnel_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_USERS = 20_000
EVENTS_PER_USER = 40  # 800k events total
N_BATCH_FILES = 8
WINDOW_US = 3600 * 1_000_000
TYPES = ["view", "click", "purchase", "signup", "error"]


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "stream_funnel_rehearsal.json"
    )
    from pyspark.sql import functions as F

    from scratchdb_spark.operators.funnel import window_funnel_levels
    from scratchdb_spark.session import get_spark
    from scratchdb_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    spark = get_spark(
        "stream-funnel-rehearsal",
        **{"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    rnd = random.Random(42)
    src = tempfile.mkdtemp(prefix="funnel_backlog_")
    total = N_USERS * EVENTS_PER_USER
    per_file = total // N_BATCH_FILES
    t0 = time.time()
    # per-user in-order event times; files are TIME SLICES so the
    # in-order-per-user delivery contract holds across micro-batches
    base = 1_700_000_000_000_000  # epoch us
    ev_idx = 0
    fh, cur_fi = None, -1
    for u in range(N_USERS):
        t = base + rnd.randrange(10**9)
        for _ in range(EVENTS_PER_USER):
            t += rnd.randrange(1, 10**7)
            et = TYPES[rnd.randrange(len(TYPES))]
            fi = min(ev_idx // per_file, N_BATCH_FILES - 1)
            if fi != cur_fi:
                if fh is not None:
                    fh.close()
                fh = open(
                    os.path.join(src, f"b{fi:03d}.ndjson"), "a"
                )
                cur_fi = fi
            fh.write(
                '{"user_id": %d, "t_us": %d, "event_type": "%s"}\n'
                % (u, t, et)
            )
            ev_idx += 1
    if fh is not None:
        fh.close()
    # NOTE: files were appended user-major, so slice i holds users in
    # id order — each user's events land in ONE file (in-order per
    # user trivially holds); batches advance by user cohort. That is
    # the right THROUGHPUT fixture (every batch is full-size); the
    # cross-batch chain EXACTNESS case is pytest-pinned separately
    # (test_streaming_funnel_matches_batch).
    gen_s = time.time() - t0
    now = time.time()
    for i in range(N_BATCH_FILES):
        p = os.path.join(src, f"b{i:03d}.ndjson")
        os.utime(p, (now - (N_BATCH_FILES - i), now - (N_BATCH_FILES - i)))

    conds = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    schema = "user_id long, t_us long, event_type string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withColumn(
            "ts", F.timestamp_micros(F.col("t_us"))
        )
    )
    name = "funnel_backlog"
    t0 = time.time()
    q = (
        streaming_funnel_levels(
            stream, "user_id", "ts", conds, WINDOW_US,
            modes=("strict_deduplication",),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(src, "_ckpt"))
        .start()
    )
    q.processAllAvailable()
    wall = time.time() - t0
    batches = []
    state_rows = state_bytes = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        n_in = p.get("numInputRows") or 0
        if not n_in:
            continue
        dur = (
            p.get("batchDuration")
            or (p.get("durationMs") or {}).get("triggerExecution")
            or 0
        ) / 1000.0
        if ops:
            state_rows = ops[0].get("numRowsTotal") or state_rows
            mem = ops[0].get("customMetrics") or {}
            state_bytes = (
                ops[0].get("memoryUsedBytes")
                or mem.get("stateOnCurrentVersionSizeBytes")
                or state_bytes
            )
        batches.append(
            {
                "rows": n_in,
                "batch_s": round(dur, 2),
                "rows_per_s": round(n_in / dur) if dur else None,
            }
        )
    q.stop()

    # exactness vs the JVM batch fold, sampled users
    got = {
        r["user_id"]: r["level"]
        for r in spark.sql(
            f"SELECT user_id, max_by(level, n_seen) AS level "
            f"FROM {name} GROUP BY user_id"
        ).collect()
    }
    batch_df = (
        spark.read.schema(schema)
        .json(src)
        .withColumn("ts", F.timestamp_micros(F.col("t_us")))
    )
    want = {
        r["user_id"]: r["level"]
        for r in window_funnel_levels(
            batch_df, "user_id", "ts", conds, WINDOW_US,
            modes=("strict_deduplication",),
        ).collect()
    }
    mismatches = sum(
        1 for u, lv in want.items() if got.get(u, 0) != lv
    )
    report = {
        "n_users": N_USERS,
        "events": total,
        "n_batches": N_BATCH_FILES,
        "gen_s": round(gen_s, 1),
        "stream_wall_s": round(wall, 1),
        "overall_rows_per_s": round(total / wall),
        "batches": batches,
        "state_rows_final": state_rows,
        "state_bytes_final": state_bytes,
        "state_bytes_per_user": (
            round(state_bytes / max(state_rows, 1), 1)
            if state_bytes
            else None
        ),
        "batch_parity_mismatches": mismatches,
    }
    print(json.dumps(report, indent=1))
    assert mismatches == 0, f"{mismatches} users diverge from batch"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
