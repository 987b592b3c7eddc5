#!/usr/bin/env python
"""MoR churn under CONCURRENT writers (r12 verdict item 4).

mor_churn_rehearsal_r12 drove 70 sequential DML cycles;
mor_concurrency_r10 raced appenders against MoR deleters once. This
rehearsal combines them on the r12 jittered-CAS path: N threads of
mixed update_where_mor / merge_upsert_mor churn — each thread owning
a disjoint key range, so every CAS conflict is a pure VERSION race,
never a logical one — while a compaction thread runs
compact_small_files(auto_fold_dvs=True) on a fixed cadence against
them. Checks:

- every commit lands within the _CAS_ATTEMPTS=10 budget (a
  CommitConflictError escaping _retry_dml is a recorded failure);
- the final table equals a per-thread sequential REPLAY of each
  thread's ops (threads never cross ranges, compaction never changes
  rows — so the interleaving must not matter);
- CDC is exact across every fold/compaction: read_changes(v0 -> vN)
  net feed == the brute-force snapshot diff;
- file count and read wall stay cadence-bounded (sampled at each
  compaction), and the CAS conflict/retry rate is recorded.

Run SOLO. Usage: python tools/mor_concurrent_churn.py [--small]
Writes mor_concurrent_churn_r13.json at the repo root.
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

from pyspark.sql import functions as F  # noqa: E402

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

N_THREADS = 4
RANGE = 100_000  # keys per thread
NEW_BASE = 10_000_000  # private fresh-key spaces start here


def main() -> int:
    small = "--small" in sys.argv
    cycles = 4 if small else 12
    n_rows = N_THREADS * RANGE
    # base files must sit ABOVE the compaction threshold (300 KB) or
    # the cadence bin-packs the whole base layout and erases the
    # file-scoped story (the mor_churn r12 lesson; the first full run
    # here ended at live_files=1 with 96 ~210 KB base files): 400k
    # rows over 16/24 files ≈ 0.7-1.1 MB per file, while DML
    # postimage/dv debris stays well under the threshold
    n_files = 16 if small else 24
    spark = get_spark(
        "mor-concurrent-churn",
        **{"spark.sql.shuffle.partitions": "16"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mor_cc_")
    wh = Warehouse(spark, root)

    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("__row_id"),
            (F.col("id") % 1000).alias("grp"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartitionByRange(n_files, "__row_id")
    )
    snap.append_versioned(wh, "db", "t", df)
    v0 = snap.versions(wh, "db", "t")[-1]

    # CAS accounting: count manifest put attempts and conflicts
    real_put = snap._put_manifest
    lock = threading.Lock()
    cas = {"puts": 0, "conflicts": 0}

    def counting_put(*a, **k):
        with lock:
            cas["puts"] += 1
        try:
            return real_put(*a, **k)
        except snap.CommitConflictError:
            with lock:
                cas["conflicts"] += 1
            raise

    snap._put_manifest = counting_put

    errors: list[str] = []
    op_walls: list[float] = []
    done = threading.Event()

    def dml_thread(t: int) -> None:
        base = t * RANGE
        for i in range(cycles):
            t0 = time.perf_counter()
            try:
                if i % 2 == 0:
                    lo = base + i * 1500
                    snap.update_where_mor(
                        wh, "db", "t",
                        f"__row_id >= {lo} AND __row_id < {lo + 1000}",
                        {"payload": F.lit(f"u{t}_{i}")},
                    )
                else:
                    lo = base + i * 1100
                    upd = spark.range(lo, lo + 600).select(
                        F.col("id").alias("__row_id"),
                        (F.col("id") % 1000).alias("grp"),
                        F.lit(f"m{t}_{i}").alias("payload"),
                    )
                    fresh = spark.range(
                        NEW_BASE + t * RANGE + i * 200,
                        NEW_BASE + t * RANGE + i * 200 + 200,
                    ).select(
                        F.col("id").alias("__row_id"),
                        (F.col("id") % 1000).alias("grp"),
                        F.lit(f"n{t}_{i}").alias("payload"),
                    )
                    snap.merge_upsert_mor(
                        wh, "db", "t",
                        upd.unionByName(fresh), "__row_id",
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(f"t{t} c{i}: {type(e).__name__}: {e}")
            with lock:
                op_walls.append(
                    round(time.perf_counter() - t0, 2)
                )

    maint: list[dict] = []

    def compactor() -> None:
        # cadence: frequent enough to genuinely race the DML threads
        # several times per run, not a per-second commit firehose (a
        # 1 s cadence manufactured a livelock no deployment runs:
        # every multi-second DML recompute window overlapped a
        # packing commit, and one merge starved past the whole retry
        # budget — kept as the honest PERF.md negative)
        while not done.is_set():
            time.sleep(5.0 if small else 8.0)
            t0 = time.perf_counter()
            try:
                snap.compact_small_files(
                    wh, "db", "t",
                    small_file_bytes=300_000,
                    auto_fold_dvs=True,
                )
                err = None
            except snap.CommitConflictError:
                # expected under the race: compaction is a cadence
                # job — a lost CAS just means it re-runs next tick
                err = "conflict"
            except Exception as e:  # noqa: BLE001
                err = f"{type(e).__name__}: {e}"
            m = snap._manifest(
                wh, "db", "t", snap.versions(wh, "db", "t")[-1]
            )
            maint.append(
                {
                    "wall_s": round(time.perf_counter() - t0, 2),
                    "live_files": snap._manifest_n_files(m),
                    "dv_rows": m.get("dv_rows", 0),
                    "error": err,
                }
            )

    threads = [
        threading.Thread(target=dml_thread, args=(t,))
        for t in range(N_THREADS)
    ]
    comp = threading.Thread(target=compactor)
    wall0 = time.perf_counter()
    comp.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    done.set()
    comp.join()
    total_wall = round(time.perf_counter() - wall0, 2)
    snap._put_manifest = real_put

    # ---- verification -------------------------------------------
    # per-thread sequential replay -> expected final payload of every
    # touched row (threads own disjoint ranges; interleaving must not
    # matter)
    expected: dict[int, str] = {}
    for t in range(N_THREADS):
        base = t * RANGE
        for i in range(cycles):
            if i % 2 == 0:
                lo = base + i * 1500
                for rid in range(lo, lo + 1000):
                    expected[rid] = f"u{t}_{i}"
            else:
                lo = base + i * 1100
                for rid in range(lo, lo + 600):
                    expected[rid] = f"m{t}_{i}"
                for rid in range(
                    NEW_BASE + t * RANGE + i * 200,
                    NEW_BASE + t * RANGE + i * 200 + 200,
                ):
                    expected[rid] = f"n{t}_{i}"

    cur = snap.read_snapshot(wh, "db", "t")
    got = {
        r["__row_id"]: r["payload"]
        for r in cur.filter(
            F.col("payload").rlike("^[umn][0-9]")
        ).collect()
    }
    mismatches = {
        rid
        for rid in set(expected) | set(got)
        if expected.get(rid) != got.get(rid)
    }
    n_final = cur.count()
    n_expected = n_rows + N_THREADS * (cycles // 2) * 200

    # CDC exactness across the whole concurrent span
    old = snap.read_snapshot(wh, "db", "t", version=v0)
    cols = ["__row_id", "grp", "payload"]
    exp_ins = cur.select(cols).exceptAll(old.select(cols))
    exp_del = old.select(cols).exceptAll(cur.select(cols))
    ch = snap.read_changes(wh, "db", "t", v0)

    def _chk(frame):
        r = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.crc32(F.concat_ws("|", *cols))).alias("chk"),
        ).collect()[0]
        return [r["n"], r["chk"]]

    cdc = {
        "inserts": {
            "expected": _chk(exp_ins),
            "got": _chk(ch.filter("_change_type = 'insert'").select(cols)),
        },
        "deletes": {
            "expected": _chk(exp_del),
            "got": _chk(ch.filter("_change_type = 'delete'").select(cols)),
        },
    }
    cdc["exact"] = (
        cdc["inserts"]["expected"] == cdc["inserts"]["got"]
        and cdc["deletes"]["expected"] == cdc["deletes"]["got"]
    )

    def read_wall():
        t0 = time.perf_counter()
        snap.read_snapshot(wh, "db", "t").agg(
            F.count(F.lit(1)), F.sum("grp")
        ).collect()
        return round(time.perf_counter() - t0, 3)

    read_wall()
    res = {
        "n_threads": N_THREADS,
        "cycles_per_thread": cycles,
        "commits_attempted": N_THREADS * cycles,
        "total_wall_s": total_wall,
        "errors": errors,
        "cas_puts": cas["puts"],
        "cas_conflicts": cas["conflicts"],
        "conflict_rate": round(
            cas["conflicts"] / max(1, cas["puts"]), 3
        ),
        "op_wall_median_s": sorted(op_walls)[len(op_walls) // 2]
        if op_walls
        else None,
        "op_wall_max_s": max(op_walls) if op_walls else None,
        "payload_mismatches": len(mismatches),
        "rows_final": n_final,
        "rows_expected": n_expected,
        "cdc": cdc,
        "compactions": len(maint),
        "compaction_conflicts": sum(
            1 for m in maint if m["error"] == "conflict"
        ),
        "compaction_errors": [
            m["error"]
            for m in maint
            if m["error"] and m["error"] != "conflict"
        ],
        "live_files_max": max(
            (m["live_files"] for m in maint), default=None
        ),
        "live_files_final": snap._manifest_n_files(
            snap._manifest(
                wh, "db", "t", snap.versions(wh, "db", "t")[-1]
            )
        ),
        "read_wall_final_s": read_wall(),
    }
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mor_concurrent_churn_r13.json",
    )
    with open(dst, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    ok = (
        not errors
        and not res["compaction_errors"]
        and res["payload_mismatches"] == 0
        and res["rows_final"] == n_expected
        and cdc["exact"]
    )
    print("OK" if ok else "FAILED")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
