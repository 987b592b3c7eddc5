#!/usr/bin/env python
"""Sustained-DML churn rehearsal for the MoR family (r12, verdict
item 2).

r11 measured a SINGLE MoR update/merge; a 100 TB operator runs
hundreds back-to-back. The claims a sustained run must hold:

- file count and read wall are bounded by the MAINTENANCE CADENCE
  (compact_small_files every `maint_every` cycles, auto_fold_dvs on),
  never monotone in the number of DMLs;
- the dv_fold_due signal fires as vectors accumulate, and the
  cadence's automatic fold brings dv_rows / dv_files back down;
- CDC stays EXACT across folds and compactions mid-sequence: the
  net change feed from the pre-churn version equals the brute-force
  snapshot diff (read_changes rides manifest file diffs; the
  brute-force check rides the masked read path — independent
  mechanisms must agree);
- per-DML write amplification stays O(matched rows): postimage/dv
  bytes per commit, never a table rewrite.

Workload: a range-clustered table (repartitionByRange on __row_id,
so a DML's predicate window touches ~1-2 files — the file-scoped
shape), then `n_cycles` alternating DMLs: even cycles
update_where_mor over a sliding 2000-row window, odd cycles
merge_upsert_mor with 1500 replacements + 500 brand-new keys.

Writes mor_churn_rehearsal_r12.json at the repo root.

Usage: python tools/mor_churn_rehearsal.py [n_rows] [n_files] [n_cycles]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    maint_every = 10
    spark = get_spark("mor-churn-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mor_churn_")
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
    base_bytes = _dir_bytes(root)

    def manifest_stats():
        m = snap._manifest(wh, "db", "t", snap.versions(wh, "db", "t")[-1])
        return m, {
            "live_files": snap._manifest_n_files(m),
            "dv_rows": m.get("dv_rows", 0),
            "dv_files": len(m.get("dv_files") or []),
            "fold_due": snap.dv_fold_due(m),
        }

    def read_wall():
        t0 = time.perf_counter()
        snap.read_snapshot(wh, "db", "t").agg(
            F.count(F.lit(1)), F.sum("grp")
        ).collect()
        return round(time.perf_counter() - t0, 3)

    out: dict = {
        "n_rows": n_rows,
        "n_files": n_files,
        "n_cycles": n_cycles,
        "maint_every": maint_every,
        "cycles": [],
        "maintenance": [],
    }
    next_new_key = n_rows
    bytes_before = base_bytes
    for i in range(n_cycles):
        lo = (i * 3_000) % (n_rows - 5_000)
        t0 = time.perf_counter()
        if i % 2 == 0:
            _, n_changed = snap.update_where_mor(
                wh,
                "db",
                "t",
                f"__row_id >= {lo} AND __row_id < {lo + 2000}",
                {"payload": F.lit(f"upd{i}")},
            )
            kind = "update"
        else:
            upd = spark.range(lo, lo + 1500).select(
                F.col("id").alias("__row_id"),
                (F.col("id") % 1000).alias("grp"),
                F.lit(f"merged{i}").alias("payload"),
            )
            fresh = spark.range(
                next_new_key, next_new_key + 500
            ).select(
                F.col("id").alias("__row_id"),
                (F.col("id") % 1000).alias("grp"),
                F.lit(f"new{i}").alias("payload"),
            )
            next_new_key += 500
            _, nu, ni = snap.merge_upsert_mor(
                wh, "db", "t", upd.unionByName(fresh), "__row_id"
            )
            n_changed = nu + ni
            kind = "merge"
        dml_wall = round(time.perf_counter() - t0, 3)
        bytes_after = _dir_bytes(root)
        _, stats = manifest_stats()
        row = {
            "cycle": i,
            "kind": kind,
            "rows_changed": n_changed,
            "dml_wall_s": dml_wall,
            "commit_bytes": bytes_after - bytes_before,
            "read_wall_s": read_wall(),
            **stats,
        }
        bytes_before = bytes_after
        out["cycles"].append(row)
        print(json.dumps(row), flush=True)

        if (i + 1) % maint_every == 0:
            m_pre, pre = manifest_stats()
            t0 = time.perf_counter()
            # small_file_bytes below the base-file size: at 100 TB
            # the base files are ~1 GB and never qualify as "small";
            # the rehearsal's 0.4 MB base files would all bin-pack
            # into one on the first pass (measured — it collapses the
            # 200-file layout and erases the file-scoped story).
            # Scoping the threshold under the base-file size keeps
            # the compaction doing exactly its production job: fold
            # due vectors, pack the DML postimage backlog, leave the
            # base layout alone.
            cstats = snap.compact_small_files(
                wh, "db", "t",
                small_file_bytes=300_000,
                auto_fold_dvs=True,
            )
            wall = round(time.perf_counter() - t0, 3)
            bytes_before = _dir_bytes(root)
            _, post = manifest_stats()
            ev = {
                "after_cycle": i,
                "wall_s": wall,
                "pre": pre,
                "post": post,
                "folded": pre["dv_rows"] > 0 and post["dv_rows"] == 0,
                "compacted": {
                    k: cstats[k]
                    for k in ("files_in", "files_out")
                    if k in cstats
                },
            }
            out["maintenance"].append(ev)
            print(json.dumps(ev), flush=True)

    # CDC exactness across every fold/compaction in the sequence:
    # net change feed from v0 == brute-force snapshot diff
    old = snap.read_snapshot(wh, "db", "t", version=v0)
    new = snap.read_snapshot(wh, "db", "t")
    cols = ["__row_id", "grp", "payload"]
    exp_ins = new.select(cols).exceptAll(old.select(cols))
    exp_del = old.select(cols).exceptAll(new.select(cols))
    ch = snap.read_changes(wh, "db", "t", v0)
    got_ins = ch.filter("_change_type = 'insert'").select(cols)
    got_del = ch.filter("_change_type = 'delete'").select(cols)

    def _chk(frame):
        r = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.crc32(F.concat_ws("|", *cols))
            ).alias("chk"),
        ).collect()[0]
        return (r["n"], r["chk"])

    cdc = {
        "inserts": {"expected": _chk(exp_ins), "got": _chk(got_ins)},
        "deletes": {"expected": _chk(exp_del), "got": _chk(got_del)},
    }
    cdc["exact"] = (
        cdc["inserts"]["expected"] == cdc["inserts"]["got"]
        and cdc["deletes"]["expected"] == cdc["deletes"]["got"]
    )
    out["cdc_across_folds"] = cdc

    # Terminal maintain_table (AFTER the CDC check — it truncates
    # history, so v0 must be consumed first): the no-signal-needed
    # full rewrite; read wall must return to the clean-layout floor.
    t0 = time.perf_counter()
    mstats = snap.maintain_table(wh, "db", "t", reclaim_grace_ms=0)
    out["final_maintain"] = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "read_wall_s": read_wall(),
        **manifest_stats()[1],
        "stats": {
            k: v
            for k, v in mstats.items()
            if isinstance(v, (int, float, str, bool))
        },
    }
    print(json.dumps(out["final_maintain"]), flush=True)

    reads = [c["read_wall_s"] for c in out["cycles"]]
    files = [c["live_files"] for c in out["cycles"]]
    out["summary"] = {
        "read_wall_first_s": reads[0],
        "read_wall_last_s": reads[-1],
        "read_wall_max_s": max(reads),
        "live_files_max": max(files),
        "live_files_final": files[-1],
        "fold_events": sum(1 for m in out["maintenance"] if m["folded"]),
        "total_commit_mb": round(
            sum(c["commit_bytes"] for c in out["cycles"]) / 1e6, 2
        ),
        "base_table_mb": round(base_bytes / 1e6, 2),
        "cdc_exact": cdc["exact"],
    }
    print(json.dumps(out["summary"]), flush=True)

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mor_churn_rehearsal_r12.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
