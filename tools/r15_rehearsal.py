#!/usr/bin/env python
"""Round-14 rehearsal: the r13 verdict's remaining items measured.

Scenarios (writes r15_rehearsal.json at the repo root):

- gate_cadence_defer (verdict item 4): sustained dedup-GATED ingest
  in ``refresh='defer'`` mode against the r13 fixture (500k docs /
  20k-file index): 12 consecutive append_deduped batches of 200 docs
  (50 corpus dups + 150 fresh, disjoint dup targets per batch), with
  refresh_dedup_index run every 4 batches AS ITS OWN cadence instead
  of inline per batch. Per-batch gate wall and per-refresh wall are
  recorded separately; drops must be exact (50/0/150) EVERY batch —
  including the batches that probe the un-indexed tail — and after
  the final refresh the index must equal a frozen-params rebuild
  (count + exceptAll both ways). Backlog trajectories computed from
  measured walls two ways: gate-only (refresh on its own
  driver/cadence — the design point) and single-driver (every 4th
  batch additionally pays its refresh wall).

- cross_process_txn (verdict item 5): two SEPARATE Spark driver
  processes replay the SAME (app_id, version) txn append window
  concurrently against one warehouse. Exactly one adoption is
  required: the final table holds the batch ONCE (multiset check),
  the txn watermark records the version once, and each process
  reports landed / zero-write-replay / ConcurrentTxnError — both of
  the latter are contract-conforming loser outcomes. Repeated for
  n_rounds windows.

- cross_process_dml (verdict item 1's honest bound): two separate
  driver processes race mixed MoR updates (disjoint key ranges) on
  ONE table — cross-process there is no commit gate, so progress
  rides pure version-number OCC plus the r14
  rebase-on-disjoint-files protocol. All ops must land within the
  retry budget in both processes; the final table must equal the
  commuted expectation (disjoint ranges); rebase vs recompute
  frequency is read back from the manifests' rebased_onto summaries.

Timing hygiene: run SOLO; session warm-up before any timed point.

Usage: python tools/r14_rehearsal.py [--small] [--skip-xproc]
        [--skip-gate]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.operators import dedup_index as di  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIG = 10_000_000_000


def _doc_text(col):
    """Same deterministic 30-token construction as r13_rehearsal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"tok{j}_"),
                ((c * (j * 2 + 1)) % 1_000_003).cast("string"),
            )
            for j in range(30)
        ],
    )


def gate_cadence_defer(
    spark, wh, n_corpus: int, n_files: int, n_batches: int,
    refresh_every: int = 4,
) -> dict:
    out: dict = {
        "n_corpus": n_corpus,
        "n_batches": n_batches,
        "batch_docs": 200,
        "refresh_every": refresh_every,
    }
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("__row_id"),
        F.col("id").alias("doc_id"),
        _doc_text("id").alias("text"),
    )
    snap.append_versioned(
        wh, "db", "docs", corpus, stat_cols=["doc_id"]
    )
    t0 = time.perf_counter()
    di.build_dedup_index(wh, "db", "docs", "docs_idx", n_files=n_files)
    out["index_build_s"] = round(time.perf_counter() - t0, 2)
    v = snap.versions(wh, "db", "docs_idx")[-1]
    out["n_index_files"] = snap._manifest_n_files(
        snap._manifest(wh, "db", "docs_idx", v)
    )

    def batch_frame(b: int):
        # identical id-space discipline to r13_rehearsal.gate_cadence
        win = BIG + 2_000_000 + b * 1000
        dups = spark.range(50).select(
            (F.col("id") + win).alias("doc_id"),
            _doc_text(F.col("id") + b * 50).alias("text"),
        )
        fresh = spark.range(150).select(
            (F.col("id") + win + 200).alias("doc_id"),
            _doc_text(F.col("id") + 600_000 + b * 150).alias("text"),
        )
        return dups.unionByName(fresh)

    gate_walls: list[float] = []
    refresh_walls: dict[int, float] = {}
    out["batches"] = []
    for b in range(n_batches):
        t0 = time.perf_counter()
        stats = di.append_deduped(
            wh, "db", "docs_idx", batch_frame(b), refresh="defer"
        )
        wall = round(time.perf_counter() - t0, 2)
        gate_walls.append(wall)
        row = {
            "batch": b,
            "gate_wall_s": wall,
            "n_tail": stats["n_tail"],
            "n_dropped_vs_corpus": stats["n_dropped_vs_corpus"],
            "n_dropped_in_batch": stats["n_dropped_in_batch"],
            "n_appended": stats["n_appended"],
            "drops_exact": stats["n_dropped_vs_corpus"] == 50
            and stats["n_dropped_in_batch"] == 0
            and stats["n_appended"] == 150,
        }
        if (b + 1) % refresh_every == 0:
            t0 = time.perf_counter()
            r = di.refresh_dedup_index(wh, "db", "docs_idx")
            refresh_walls[b] = round(time.perf_counter() - t0, 2)
            row["refresh_wall_s"] = refresh_walls[b]
            row["refresh_inserted"] = r["n_inserted"]
        out["batches"].append(row)
        print(json.dumps(row), flush=True)

    # terminal refresh (if the loop didn't land on a refresh batch),
    # then refreshed index == frozen-params rebuild
    if n_batches % refresh_every:
        di.refresh_dedup_index(wh, "db", "docs_idx")
    meta = di._load_dedup_meta(wh, "db", "docs_idx")
    live = snap.read_snapshot(wh, "db", "docs_idx")
    rebuilt = di._band_rows(
        snap.read_snapshot(wh, "db", "docs"),
        meta["text_col"], meta["id_col"], meta["n"],
        meta["num_hashes"], meta["bands"],
    )
    out["refresh_equals_rebuild"] = (
        live.count() == rebuilt.count()
        and live.exceptAll(rebuilt).limit(1).count() == 0
        and rebuilt.exceptAll(live).limit(1).count() == 0
    )

    s = sorted(gate_walls)
    out["gate_wall_median_s"] = s[len(s) // 2]
    out["gate_wall_p95_s"] = s[
        min(len(s) - 1, math.ceil(0.95 * len(s)) - 1)
    ]
    out["gate_wall_max_s"] = max(gate_walls)
    out["refresh_walls_s"] = {
        str(k): v for k, v in refresh_walls.items()
    }

    def trajectory(walls_by_batch):
        res = {}
        for T in (10, 15, 20, 30, 45):
            backlog = peak = 0.0
            for w in walls_by_batch:
                backlog = max(0.0, backlog + w - T)
                peak = max(peak, backlog)
            res[str(T)] = {
                "final_s": round(backlog, 1),
                "peak_s": round(peak, 1),
                "feasible": backlog == 0.0,
            }
        return res

    # design point: refresh on its own cadence/driver -> batches pay
    # the gate only
    out["backlog_gate_only"] = trajectory(gate_walls)
    # honest single-driver view: the refresh batch pays both
    combined = [
        w + refresh_walls.get(i, 0.0)
        for i, w in enumerate(gate_walls)
    ]
    out["backlog_single_driver"] = trajectory(combined)
    for key in ("backlog_gate_only", "backlog_single_driver"):
        out[f"min_feasible_trigger_{key[8:]}_s"] = min(
            (
                int(T)
                for T, v in out[key].items()
                if v["feasible"]
            ),
            default=None,
        )
    print(
        json.dumps({k: v for k, v in out.items() if k != "batches"}),
        flush=True,
    )
    return out


_XPROC_TXN_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import functions as F
from scratchdb_spark import snapshots as snap
from scratchdb_spark.session import get_spark
from scratchdb_spark.tables import Warehouse

root, tv, start_at, tag = (
    sys.argv[1], int(sys.argv[2]), float(sys.argv[3]), sys.argv[4]
)
spark = get_spark("xproc-txn-" + tag)
spark.sparkContext.setLogLevel("ERROR")
wh = Warehouse(spark, root)
batch = spark.range(1000).select(
    (F.col("id") + tv * 10_000).alias("__row_id"),
    (F.col("id") % 97).alias("amount"),
)
# barrier: both processes fire the same replay at the same instant
time.sleep(max(0.0, start_at - time.time()))
try:
    v = snap.append_versioned(
        wh, "db", "t", batch, txn=("stream-app", tv)
    )
    # "returned" covers both contract-conforming success shapes: the
    # winner's landed commit and the loser's zero-write replay (the
    # watermark was already advanced when it entered). The parent
    # process decides exactly-once from ground truth — row multiset
    # and watermark — not from these labels.
    print("XP:" + json.dumps({"outcome": "returned", "version": v}))
except snap.ConcurrentTxnError:
    print("XP:" + json.dumps({"outcome": "concurrent_txn_error"}))
"""


def _spawn(script: str, args: list[str]):
    env = {
        **os.environ,
        "SPARK_GRAFT_DRIVER_MEM": "6g",
        "SPARK_GRAFT_CPUS": "8",
    }
    return subprocess.Popen(
        [sys.executable, "-c", script.replace("@@REPO@@", REPO), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
        env=env,
    )


def cross_process_txn(spark, n_rounds: int) -> dict:
    root = tempfile.mkdtemp(prefix="r15_xtxn_")
    wh = Warehouse(spark, root)
    out: dict = {"n_rounds": n_rounds, "rounds": []}
    try:
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(0, 0)], "__row_id long, amount long"
            ),
        )
        ok_all = True
        for tv in range(1, n_rounds + 1):
            start_at = time.time() + 30  # both sessions up by then
            procs = [
                _spawn(
                    _XPROC_TXN_SCRIPT,
                    [root, str(tv), str(start_at), f"p{i}"],
                )
                for i in range(2)
            ]
            results = []
            for p in procs:
                stdout, _ = p.communicate(timeout=600)
                for line in stdout.splitlines():
                    if line.startswith("XP:"):
                        results.append(json.loads(line[3:]))
            # ground truth from THIS session: the batch appears once
            rows = (
                snap.read_snapshot(wh, "db", "t")
                .filter(F.col("__row_id") >= tv * 10_000)
                .filter(F.col("__row_id") < tv * 10_000 + 1000)
                .count()
            )
            vs = snap.versions(wh, "db", "t")
            m = snap._manifest(wh, "db", "t", vs[-1])
            watermark = m.get("txns", {}).get("stream-app")
            row = {
                "tv": tv,
                "outcomes": sorted(r["outcome"] for r in results),
                "rows_from_window": rows,
                "watermark": watermark,
                "exactly_once": rows == 1000
                and watermark == tv
                and len(results) == 2,
            }
            ok_all = ok_all and row["exactly_once"]
            out["rounds"].append(row)
            print(json.dumps(row), flush=True)
        out["all_exactly_once"] = ok_all
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_XPROC_DML_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import functions as F
from scratchdb_spark import snapshots as snap
from scratchdb_spark.session import get_spark
from scratchdb_spark.tables import Warehouse

root, tag, lo, n_cycles, start_at = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    float(sys.argv[5]),
)
spark = get_spark("xproc-dml-" + tag)
spark.sparkContext.setLogLevel("ERROR")
wh = Warehouse(spark, root)
time.sleep(max(0.0, start_at - time.time()))
ops = []
for c in range(n_cycles):
    w0 = lo + c * 2000
    t0 = time.perf_counter()
    _v, n = snap.update_where_mor(
        wh, "db", "t",
        (F.col("__row_id") >= w0) & (F.col("__row_id") < w0 + 2000),
        {"amount": F.col("amount") + 1},
    )
    ops.append({
        "op": "update_where_mor", "cycle": c, "rows": n,
        "wall_s": round(time.perf_counter() - t0, 2),
    })
print("XD:" + json.dumps({"tag": tag, "ops": ops}))
"""


def cross_process_dml(spark, n_cycles: int) -> dict:
    """Two driver processes race disjoint-range MoR updates on one
    table — no in-process gate applies across them; progress rides
    OCC + the r14 rebase protocol. Every op must land; the final
    table must equal the commuted expectation."""
    root = tempfile.mkdtemp(prefix="r15_xdml_")
    wh = Warehouse(spark, root)
    out: dict = {"n_cycles_per_proc": n_cycles}
    try:
        base = spark.range(100_000).select(
            F.col("id").alias("__row_id"),
            (F.col("id") % 97).alias("amount"),
        )
        snap.append_versioned(wh, "db", "t", base)
        start_at = time.time() + 30
        t_race = time.perf_counter()
        procs = [
            _spawn(
                _XPROC_DML_SCRIPT,
                [
                    root, f"p{i}", str(i * 50_000), str(n_cycles),
                    str(start_at),
                ],
            )
            for i in range(2)
        ]
        results = []
        for p in procs:
            stdout, _ = p.communicate(timeout=1800)
            for line in stdout.splitlines():
                if line.startswith("XD:"):
                    results.append(json.loads(line[3:]))
        out["race_wall_s"] = round(time.perf_counter() - t_race, 1)
        out["procs"] = results
        out["all_ops_landed"] = (
            len(results) == 2
            and all(
                len(r["ops"]) == n_cycles
                and all(o["rows"] == 2000 for o in r["ops"])
                for r in results
            )
        )
        out["op_wall_max_s"] = max(
            (
                o["wall_s"]
                for r in results
                for o in r.get("ops", [])
            ),
            default=None,
        )
        # rebase vs recompute frequency from the manifests' own
        # provenance (every rebased commit records rebased_onto)
        vs = snap.versions(wh, "db", "t")
        n_rebased = 0
        for v in vs:
            m = snap._manifest(wh, "db", "t", v)
            if (m.get("summary") or {}).get("rebased_onto") is not None:
                n_rebased += 1
        out["n_commits"] = len(vs)
        out["n_rebased_commits"] = n_rebased
        # expectation: +1 exactly once per named window; ranges are
        # disjoint per process
        expected = base.withColumn(
            "amount",
            F.col("amount")
            + F.when(
                (F.col("__row_id") < n_cycles * 2000)
                | (
                    (F.col("__row_id") >= 50_000)
                    & (
                        F.col("__row_id")
                        < 50_000 + n_cycles * 2000
                    )
                ),
                1,
            ).otherwise(0),
        )
        final = snap.read_snapshot(wh, "db", "t")
        out["payload_exact"] = (
            final.count() == 100_000
            and final.select("__row_id", "amount")
            .exceptAll(expected)
            .limit(1)
            .count()
            == 0
            and expected.exceptAll(
                final.select("__row_id", "amount")
            )
            .limit(1)
            .count()
            == 0
        )
        print(
            json.dumps(
                {k: v for k, v in out.items() if k != "procs"}
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    small = "--small" in sys.argv
    spark = get_spark(
        "r15-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg(F.sum("id")).collect()

    n_corpus = 50_000 if small else 500_000
    n_files = 2_000 if small else 20_000
    n_batches = 4 if small else 12
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])

    dst = os.path.join(REPO, "r15_rehearsal.json")
    out: dict = {}
    if os.path.exists(dst):
        with open(dst) as f:
            out = json.load(f)
    if "--skip-gate" not in sys.argv:
        root = tempfile.mkdtemp(prefix="r15_gate_")
        wh = Warehouse(spark, root)
        key = (
            "gate_cadence_defer_small" if small else "gate_cadence_defer"
        )
        if "--batches" in sys.argv:
            key += f"_b{n_batches}"  # keep the default-window run too
        try:
            out[key] = gate_cadence_defer(
                spark, wh, n_corpus, n_files, n_batches,
                refresh_every=2 if small else 4,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    if "--skip-xproc" not in sys.argv:
        out["cross_process_txn"] = cross_process_txn(
            spark, n_rounds=1 if small else 3
        )
        out["cross_process_dml"] = cross_process_dml(
            spark, n_cycles=2 if small else 6
        )

    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
