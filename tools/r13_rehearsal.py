#!/usr/bin/env python
"""Round-13 rehearsal: the r12 verdict's weak item and its follow-ons.

Scenarios (writes r13_rehearsal.json at the repo root):

- probe_pruning: the dedup index at PRODUCTION-DIRECTION granularity
  (500k docs -> 8M band rows over 20_000 range-clustered files, ~400
  rows/file — file count scales with the corpus, the 100 TB shape).
  Probes of 100 / 300 / 1000 docs (1.6k / ~4.8k / ~16k distinct band
  hashes — the last two ABOVE the historical 4096-hash cap whose
  fallback read the whole index in r12). For each probe: distinct
  hashes h, files planned by the manifest pass vs the uniform-hash
  model F*(1-(1-1/F)^h), the driver-side planning wall (the
  _EqValues normalization cost), the end-to-end probe wall on the
  pruned path, and the UNPRUNED control (read_snapshot patched to
  drop prune_eq — the r12 above-cap behavior) — with exact pair
  counts required identical on both paths.

- gate_cadence (verdict item 2): sustained dedup-GATED ingest against
  the same 20k-file corpus — 12 consecutive append_deduped batches of
  200 docs (50 corpus dups + 150 fresh each, disjoint dup targets per
  batch so expected drops stay exactly 50/batch as the corpus grows).
  Records per-batch gate wall, the median/p95 envelope, and a backlog
  trajectory computed from the measured walls for candidate trigger
  intervals — the honest feasible-cadence statement the r12 verdict
  asked for, plus the pruned-vs-unpruned probe contrast on the first
  batch.

- spearman_dup_heavy (verdict item 3 evidence): 20M rows where ONE
  (x, y) pair holds 50% of the data and y is a function of x (~5k
  distinct pairs) — the exact degeneracy salted_join's whole-row salt
  cannot spread (identical rows hash to one salt). Measured three
  ways, all with the planner's auto-broadcast disabled so nothing
  hides the shuffle: the r12 path (rank joins against RAW rows,
  salted — 10M identical rows on one reducer), the r13 path (salted
  after duplicate pre-aggregation — join input ~5k weighted rows),
  and the r13 production default (proven-cardinality broadcast).
  rho must be identical across all three.

Timing hygiene: run SOLO (no concurrent Spark processes); the session
warms up on a throwaway query before any timed point.

Usage: python tools/r13_rehearsal.py [--small] [--skip-spearman]
"""

from __future__ import annotations

import json
import math
import os
import shutil
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

BIG = 10_000_000_000  # probe/batch id space, far above any corpus id


def _doc_text(col):
    """Deterministic ~30-token pseudo-sentence per id (pure column
    expr — no Python row loop; same construction as r12c_rehearsal).
    Modulus far above every id used here, so distinct ids share ZERO
    tokens and overlap is exactly what the caller constructs."""
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


def _probe_frame(spark, k: int, base: int = BIG):
    """k exact copies of corpus docs 0..k-1 under fresh ids — each
    must pair with exactly its source (jaccard 1.0), nothing else."""
    return spark.range(k).select(
        (F.col("id") + base).alias("doc_id"),
        _doc_text("id").alias("text"),
    )


def _unpruned_reads():
    """Context manager: read_snapshot with prune_eq dropped — the r12
    above-cap behavior, reconstructed as the rehearsal control."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = di.snap.read_snapshot

        def full(*a, **k):
            k.pop("prune_eq", None)
            return orig(*a, **k)

        di.snap.read_snapshot = full
        try:
            yield
        finally:
            di.snap.read_snapshot = orig

    return ctx()


def probe_pruning(spark, wh, n_corpus: int, n_files: int) -> dict:
    out: dict = {"n_corpus": n_corpus, "n_index_files_target": n_files}
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("__row_id"),
        F.col("id").alias("doc_id"),
        _doc_text("id").alias("text"),
    )
    # production posture: the source records doc_id zone maps, so the
    # r13 verify-side candidate prune and the refresh-side changed-id
    # range prune actually skip files (without stats both prunes are
    # superset no-ops — the pre-r13 plan)
    snap.append_versioned(
        wh, "db", "docs", corpus, stat_cols=["doc_id"]
    )
    t0 = time.perf_counter()
    di.build_dedup_index(
        wh, "db", "docs", "docs_idx", n_files=n_files
    )
    out["index_build_s"] = round(time.perf_counter() - t0, 2)
    v = snap.versions(wh, "db", "docs_idx")[-1]
    m = snap._manifest(wh, "db", "docs_idx", v)
    F_total = snap._manifest_n_files(m)
    out["n_index_files"] = F_total
    out["sharded_manifest"] = "shards" in m
    meta = di._load_dedup_meta(wh, "db", "docs_idx")

    out["probes"] = []
    for k in (100, 300, 1000):
        probe = _probe_frame(spark, k)
        hashes = [
            r["band_hash"]
            for r in di._band_rows(
                probe, "text", "doc_id", meta["n"],
                meta["num_hashes"], meta["bands"],
            )
            .select("band_hash")
            .distinct()
            .collect()
        ]
        h = len(hashes)
        t0 = time.perf_counter()
        planned = snap._plan_files(
            wh, "db", "docs_idx", m, None, ("band_hash", hashes)
        )
        plan_wall = round(time.perf_counter() - t0, 3)
        model = F_total * (1 - (1 - 1 / F_total) ** h)

        def run() -> tuple[int, float]:
            t0 = time.perf_counter()
            pairs = di.query_dedup_index(
                wh, "db", "docs_idx", probe
            ).collect()
            wall = round(time.perf_counter() - t0, 2)
            assert {(r["probe_id"], r["corpus_id"]) for r in pairs} \
                == {(BIG + i, i) for i in range(k)}, "pair mismatch"
            return len(pairs), wall

        n_pairs, pruned_wall = run()
        with _unpruned_reads():
            n_pairs_full, unpruned_wall = run()
        row = {
            "probe_docs": k,
            "distinct_hashes": h,
            "above_cap": h > di._PRUNE_MAX_HASHES,
            "planned_files": len(planned),
            "model_files": round(model, 1),
            "total_files": F_total,
            "plan_wall_s": plan_wall,
            "pruned_probe_wall_s": pruned_wall,
            "unpruned_probe_wall_s": unpruned_wall,
            "n_pairs": n_pairs,
            "pairs_identical": n_pairs == n_pairs_full == k,
        }
        out["probes"].append(row)
        print(json.dumps(row), flush=True)
    return out


def gate_cadence(spark, wh, n_corpus: int, n_batches: int) -> dict:
    out: dict = {"n_batches": n_batches, "batch_docs": 200}

    def batch_frame(b: int):
        # 50 copies of corpus docs [b*50, b*50+50) + 150 fresh. Every
        # id space is explicit and collision-checked (the r12c
        # lesson, re-learned here: the first draft's dup doc_ids
        # overlapped its fresh doc_ids for b >= 1, and its fresh TEXT
        # ids at 3.5M wrapped mod 1_000_003 back onto corpus ids —
        # both caught by drops_exact going false mid-cadence):
        # - doc_id: each batch owns a 1000-wide window; dups at
        #   [0, 50), fresh at [200, 350) within it — disjoint always;
        # - text id: dups reuse corpus ids b*50..b*50+50 (that IS the
        #   dup), fresh use 600_000 + b*150 + i — above every corpus
        #   id at either scale and far below the 1_000_003 modulus.
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

    # pruned-vs-unpruned probe contrast on batch 0's content (query
    # only — no append, so the cadence loop below starts clean)
    b0 = batch_frame(0)
    t0 = time.perf_counter()
    n_b0 = di.query_dedup_index(wh, "db", "docs_idx", b0).count()
    out["probe_pruned_wall_s"] = round(time.perf_counter() - t0, 2)
    with _unpruned_reads():
        t0 = time.perf_counter()
        n_b0_full = di.query_dedup_index(
            wh, "db", "docs_idx", b0
        ).count()
        out["probe_unpruned_wall_s"] = round(
            time.perf_counter() - t0, 2
        )
    out["probe_pairs_identical"] = n_b0 == n_b0_full

    # what the r13 append-only refresh scoping SKIPS per batch: the
    # r12 refresh called delete_keys on every changed id, and
    # delete_keys discovers "nothing affected" by tagging EVERY index
    # row with its file. One no-match delete_keys on this index IS
    # that per-batch cost, measured directly.
    t0 = time.perf_counter()
    _v, n_del = snap.delete_keys(
        wh, "db", "docs_idx",
        spark.range(1).select(
            (F.col("id") - 10).alias("doc_id")  # matches nothing
        ),
        "doc_id",
    )
    out["delete_scan_cost_s"] = round(time.perf_counter() - t0, 2)
    out["delete_scan_rows_deleted"] = n_del

    walls = []
    out["batches"] = []
    for b in range(n_batches):
        t0 = time.perf_counter()
        stats = di.append_deduped(
            wh, "db", "docs_idx", batch_frame(b)
        )
        wall = round(time.perf_counter() - t0, 2)
        walls.append(wall)
        row = {
            "batch": b,
            "gate_wall_s": wall,
            "n_dropped_vs_corpus": stats["n_dropped_vs_corpus"],
            "n_dropped_in_batch": stats["n_dropped_in_batch"],
            "n_appended": stats["n_appended"],
            "drops_exact": stats["n_dropped_vs_corpus"] == 50
            and stats["n_dropped_in_batch"] == 0
            and stats["n_appended"] == 150,
        }
        out["batches"].append(row)
        print(json.dumps(row), flush=True)

    s = sorted(walls)
    med = s[len(s) // 2]
    p95 = s[min(len(s) - 1, math.ceil(0.95 * len(s)) - 1)]
    out["wall_median_s"] = med
    out["wall_p95_s"] = p95
    out["wall_max_s"] = max(walls)
    # backlog trajectory for candidate trigger intervals, from the
    # MEASURED walls (no sleeping): backlog_i = max(0, prev + wall - T)
    out["backlog_by_trigger_s"] = {}
    for T in (15, 30, 45, 60, 90):
        backlog = 0.0
        peak = 0.0
        for w in walls:
            backlog = max(0.0, backlog + w - T)
            peak = max(peak, backlog)
        out["backlog_by_trigger_s"][str(T)] = {
            "final_s": round(backlog, 1),
            "peak_s": round(peak, 1),
            "feasible": backlog == 0.0,
        }
    out["min_feasible_trigger_s"] = min(
        (
            int(T)
            for T, v in out["backlog_by_trigger_s"].items()
            if v["feasible"]
        ),
        default=None,
    )
    print(
        json.dumps(
            {k: v for k, v in out.items() if k != "batches"}
        ),
        flush=True,
    )
    return out


def spearman_dup_heavy(spark, n_rows: int) -> dict:
    """The degenerate duplicate-heavy shape, three ways. y is a pure
    function of x, so distinct (x, y) pairs == distinct x (~5k) and
    the hot pair (42, 42%97) holds HALF of all rows."""
    import bench

    from scratchdb_spark.catalog import analytics as an
    from scratchdb_spark.operators.prefix_sum import (
        bucketed_running_sum,
    )
    from scratchdb_spark.operators.skew import salted_join

    path = "/tmp/r13_dup_heavy.parquet"
    spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(42))
        .otherwise((F.col("id") * 2654435761) % 5_000)
        .cast("long")
        .alias("x"),
    ).withColumn("y", F.col("x") % 97).write.mode(
        "overwrite"
    ).parquet(path)
    rows = spark.read.parquet(path)

    def timed(df_builder) -> dict:
        before = bench._stage_totals_stable(spark)
        t0 = time.perf_counter()
        r = df_builder().collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        after = bench._stage_totals_stable(spark)
        return {
            "rho": r["spearman_rho"],
            "n": r["n"],
            "wall_s": wall,
            "shuffle_mb": round((after[0] - before[0]) / 1e6, 2)
            if before and after
            else None,
            "tasks": (after[1] - before[1])
            if before and after
            else None,
        }

    def r12_salted_raw():
        """The pre-r13 construction verbatim: rank joins against the
        RAW row frame, salted — every row of the hot (x, y) pair is
        IDENTICAL, hashes to one salt, and lands on one reducer."""

        def join_ranks(base, col, out):
            g = rows.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
            r, _ = bucketed_running_sum(g, col, "c", "cum")
            r = r.select(
                col,
                (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1)
                .cast("long")
                .alias(out),
            )
            return salted_join(base, r, col)

        j = join_ranks(join_ranks(rows, "x", "ra"), "y", "rb")
        dec = "decimal(38,0)"
        a, b = (
            F.col("ra").cast("decimal(18,0)"),
            F.col("rb").cast("decimal(18,0)"),
        )
        s = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ra").cast(dec)).alias("sa"),
            F.sum(F.col("rb").cast(dec)).alias("sb"),
            F.sum((a * a).cast(dec)).alias("saa"),
            F.sum((b * b).cast(dec)).alias("sbb"),
            F.sum((a * b).cast(dec)).alias("sab"),
        )
        n_d = F.col("n").cast("double")
        sa, sb = (
            F.col("sa").cast("double"),
            F.col("sb").cast("double"),
        )
        saa, sbb, sab = (
            F.col("saa").cast("double"),
            F.col("sbb").cast("double"),
            F.col("sab").cast("double"),
        )
        return s.select(
            F.col("n").cast("long").alias("n"),
            F.round(
                (n_d * sab - sa * sb)
                / F.sqrt(
                    (n_d * saa - sa * sa) * (n_d * sbb - sb * sb)
                ),
                6,
            ).alias("spearman_rho"),
        )

    out: dict = {"n_rows": n_rows}
    # production default first (broadcast — proven cardinality)
    out["r13_broadcast"] = timed(
        lambda: an._spearman_from_rows(rows)
    )
    # controls: planner auto-broadcast OFF so the planner's size
    # estimate can't quietly broadcast either control (r12c lesson)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    budget = an._RANK_BROADCAST_ROWS
    an._RANK_BROADCAST_ROWS = 0
    try:
        out["r13_salted_preagg"] = timed(
            lambda: an._spearman_from_rows(rows)
        )
        out["r12_salted_raw"] = timed(r12_salted_raw)
    finally:
        an._RANK_BROADCAST_ROWS = budget
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    out["identical_rho"] = (
        out["r13_broadcast"]["rho"]
        == out["r13_salted_preagg"]["rho"]
        == out["r12_salted_raw"]["rho"]
    )
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    small = "--small" in sys.argv
    spark = get_spark(
        "r13-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up (codegen/UI one-time costs — r11c lesson)
    spark.range(1_000_000).agg(F.sum("id")).collect()

    n_corpus = 50_000 if small else 500_000
    n_files = 2_000 if small else 20_000
    n_batches = 4 if small else 12
    n_sp = 2_000_000 if small else 20_000_000

    out: dict = {}
    root = tempfile.mkdtemp(prefix="r13_probe_")
    wh = Warehouse(spark, root)
    try:
        out["probe_pruning"] = probe_pruning(
            spark, wh, n_corpus, n_files
        )
        out["gate_cadence"] = gate_cadence(
            spark, wh, n_corpus, n_batches
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if "--skip-spearman" not in sys.argv:
        out["spearman_dup_heavy"] = spearman_dup_heavy(spark, n_sp)

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "r13_rehearsal.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
