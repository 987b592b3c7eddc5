"""Commit-path metadata-op accounting at object-store latencies
(round 10, verdict item #7).

The r9 commit speedups (80k-file adopt 47.7 -> 7.9 s, churn commits
2-3 s) were measured on the local FS, where a metadata round trip is
~microseconds. On an object store every exists/list/GET/PUT is a
~50 ms request, so what matters is HOW MANY serialized metadata ops a
commit issues — not how fast the local syscalls are. fs.SIM_LATENCY_S
(r10) injects that per-op latency into every driver-side hfs call, so
this tool measures, for each commit shape:

- metadata ops issued (fs.SIM_OP_COUNT) and the commit wall at 0 ms
  and at 50 ms injected latency;
- the serialization gap: wall_50ms - wall_0ms vs ops x 50 ms — equal
  means every op is serialized; smaller means the path overlaps its
  metadata IO (pooled shard reads / sidecar prefetch).

NOT covered by the knob (executor-side data IO, documented in
PERF.md with the math instead): the per-file parquet reads of the
arrow stats kernel and the scan itself. Those fan out over
executors — files/executor-task x ~50 ms per open — and s3a hides
most of it with fs.s3a.connection.maximum + readahead; the driver's
SERIAL metadata chain measured here is the part parallelism cannot
hide.

Shapes measured (all on a temp warehouse):
1. append_versioned of a 256-file batch with stats (fresh table);
2. +8-file churn append on the now-larger table;
3. delete_where COW commit;
4. read_snapshot planning (version resolve + manifest parse).

Usage: python tools/commit_latency_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_FILES = 256
CHURN_FILES = 8
LATENCY_S = 0.05


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "commit_latency_rehearsal.json"
    )
    from pyspark.sql import functions as F

    from scratchdb_spark import fs as hfs
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.session import get_spark
    from scratchdb_spark.tables import Warehouse

    spark = get_spark(
        "commit-latency-rehearsal",
        **{"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(N_FILES * 500).select(
        F.col("id").alias("__row_id"),
        (F.col("id") % N_FILES).alias("fpart"),
        (F.col("id") * 3 % 997).alias("v"),
    ).repartitionByRange(N_FILES, "fpart").persist()
    df.count()
    churn = spark.range(CHURN_FILES * 500).select(
        (F.col("id") + 10_000_000).alias("__row_id"),
        (F.col("id") % CHURN_FILES).alias("fpart"),
        (F.col("id") * 7 % 997).alias("v"),
    ).repartitionByRange(CHURN_FILES, "fpart").persist()
    churn.count()

    def run(latency: float) -> dict:
        wh = Warehouse(
            spark, tempfile.mkdtemp(prefix=f"wh_lat{int(latency*1000)}_")
        )
        out: dict = {}
        hfs.SIM_LATENCY_S = latency
        try:
            for label, fn in (
                (
                    "bulk_append_256f",
                    lambda: snap.append_versioned(
                        wh, "db", "t", df, stat_cols=["v"]
                    ),
                ),
                (
                    "churn_append_8f",
                    lambda: snap.append_versioned(
                        wh, "db", "t", churn, stat_cols=["v"]
                    ),
                ),
                (
                    "cow_delete",
                    lambda: snap.delete_where(
                        wh, "db", "t", F.col("v") == 13
                    ),
                ),
                (
                    "read_plan",
                    lambda: snap.read_snapshot(
                        wh, "db", "t", prune=("v", 100, 120)
                    ).count(),
                ),
            ):
                hfs.SIM_OP_COUNT = 0
                t0 = time.time()
                fn()
                out[label] = {
                    "wall_s": round(time.time() - t0, 2),
                    "metadata_ops": hfs.SIM_OP_COUNT,
                }
        finally:
            hfs.SIM_LATENCY_S = 0.0
        return out

    base = run(0.0)
    injected = run(LATENCY_S)  # also carries the op counts
    report = {
        "n_files_bulk": N_FILES,
        "n_files_churn": CHURN_FILES,
        "latency_ms": LATENCY_S * 1000,
        "shapes": {},
    }
    for label in base:
        n_ops = injected[label]["metadata_ops"]
        gap = injected[label]["wall_s"] - base[label]["wall_s"]
        serial_bound = round(n_ops * LATENCY_S, 2)
        report["shapes"][label] = {
            "wall_local_s": base[label]["wall_s"],
            "wall_50ms_s": injected[label]["wall_s"],
            "metadata_ops": n_ops,
            "serial_bound_s": serial_bound,
            "overlap_saved_s": round(max(serial_bound - gap, 0.0), 2),
        }
    print(json.dumps(report, indent=1))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
