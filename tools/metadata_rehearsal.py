"""Metadata-scale rehearsal (round-8): measure the snapshot layer's
METADATA costs — commit latency, pruned-scan planning, CDC planning —
at ~100k data files, 50x the manifest-sharding threshold (the round-7
design claims had only a 10k-file test behind them).

Method: tiny parquet files are written DIRECTLY with pyarrow (16
threads; Spark would add job overhead per file and we are measuring
metadata, not data IO), with disjoint ``k`` ranges per file so zone
maps are maximally selective. The table grows 4k -> 20k -> 100k via
adopt/append commits, then takes a +100-file churn commit, pruned
plans, and a CDC window read. Each measurement is wall-clock on
local[32]; host variance ~±3x applies as everywhere in PERF.md.

What the numbers must show for the 100 TB story:
- append-commit cost tracks the BATCH (fresh-stats job over new files
  + O(churn) shard rewrites), not the table;
- the +100-file commit on a 100k-file table costs ~the same as on a
  4k-file table (shard reuse by reference);
- pruned planning opens only the shards the predicate can live in
  (time ~ shards opened, not table files);
- CDC planning diffs shard LISTS (O(churn shards)), and reading the
  window scans only the churn files.

Usage: python tools/metadata_rehearsal.py [n_files] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

ROWS_PER_FILE = 20


def _write_files(base: str, start: int, stop: int) -> None:
    os.makedirs(base, exist_ok=True)

    def one(i: int) -> None:
        lo = i * ROWS_PER_FILE
        t = pa.table(
            {
                "__row_id": pa.array(
                    range(lo, lo + ROWS_PER_FILE), pa.int64()
                ),
                "k": pa.array(range(lo, lo + ROWS_PER_FILE), pa.int64()),
            }
        )
        pq.write_table(t, f"{base}/gen-{i:07d}.parquet")

    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(one, range(start, stop)))


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        "metadata-rehearsal", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    root = tempfile.mkdtemp(prefix="wh_meta_")
    wh = Warehouse(spark, root)
    base = wh._path("db", "t")
    results: dict = {"levels": [], "n_target": n_target}

    levels = sorted(
        {lv for lv in (4_000, 20_000, n_target) if lv <= n_target}
    )
    prev = 0
    for lv in levels:
        t0 = time.time()
        _write_files(base, prev, lv)
        t_write = time.time() - t0

        t0 = time.time()
        v = snap.commit_snapshot(wh, "db", "t", stat_cols=["k"])
        t_commit = time.time() - t0

        m = snap._manifest(wh, "db", "t", v)
        n_shards = len(m.get("shards", []))

        # pruned planning: a k-range covering ~one shard's rows
        lo = (lv // 2) * ROWS_PER_FILE
        hi = lo + 1000 * ROWS_PER_FILE  # ~1000 files ~ 1 shard
        t0 = time.time()
        planned = snap._plan_files(
            wh, "db", "t", m, ("k", lo, hi), None
        )
        t_plan_pruned = time.time() - t0

        # point-lookup planning (dict/eq path)
        t0 = time.time()
        planned_eq = snap._plan_files(
            wh, "db", "t", m, None, ("k", lo)
        )
        t_plan_eq = time.time() - t0

        # full (unpruned) planning for contrast
        t0 = time.time()
        planned_all = snap._plan_files(wh, "db", "t", m, None, None)
        t_plan_full = time.time() - t0

        results["levels"].append(
            {
                "files": lv,
                "fresh_files": lv - prev,
                "version": v,
                "n_shards": n_shards,
                "write_s": round(t_write, 2),
                "commit_s": round(t_commit, 2),
                "plan_pruned_s": round(t_plan_pruned, 3),
                "plan_pruned_files": len(planned),
                "plan_eq_s": round(t_plan_eq, 3),
                "plan_eq_files": len(planned_eq),
                "plan_full_s": round(t_plan_full, 3),
                "plan_full_files": len(planned_all),
            }
        )
        print(json.dumps(results["levels"][-1]), flush=True)
        prev = lv

    # churn commit: +100 files on the full table — the steady-state
    # append cost the O(churn) claim is about
    v_before = snap.versions(wh, "db", "t")[-1]
    _write_files(base, prev, prev + 100)
    t0 = time.time()
    v_churn = snap.commit_snapshot(wh, "db", "t")
    t_commit_churn = time.time() - t0

    # CDC planning + window read over the churn commit
    t0 = time.time()
    ch = snap.read_changes(wh, "db", "t", v_before, v_churn)
    t_cdc_plan = time.time() - t0
    t0 = time.time()
    n_ch = ch.count()
    t_cdc_read = time.time() - t0

    results["churn"] = {
        "files_added": 100,
        "commit_s": round(t_commit_churn, 2),
        "cdc_plan_s": round(t_cdc_plan, 3),
        "cdc_read_s": round(t_cdc_read, 2),
        "cdc_rows": n_ch,
    }
    print(json.dumps(results["churn"]), flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
