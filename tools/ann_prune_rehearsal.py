#!/usr/bin/env python
"""Measure the two r13 ANN-index IO bounds (PERF.md "Candidate-bounded
IO audit" items 3 and 4) the way the dedup rehearsal measured items
1-2 — against a corpus big enough for the scan terms to show:

  A. query_ann_index exact-refine: candidate neighbor ids prune the
     source EMBEDDING read. Reports planned source files and query
     wall, pruned vs the reconstructed r13-first-cut control (the
     same read with prune_eq dropped), results required identical.
     The corpus id-clusters its cells (ingest-batch locality, the
     shape that lets an id prune actually skip files); the honest
     worst case — id uncorrelated with similarity — is reported as
     the uniform model F*(1-(1-1/F)^n_ids) alongside.

  B. refresh_ann_index on an APPEND-ONLY source window (the streaming
     cadence shape): the r13 decomposition skips the merge's
     existence scan and the unconditional delete_keys tag scan.
     Control = the pre-r13 sequence (unconditional delete_keys +
     merge_upsert) replayed verbatim on an identical clone index;
     both end states must be bit-identical, walls and commit counts
     reported.

Timing hygiene (PERF.md r11 precedent): run SOLO; the first timed
pass of a fresh session absorbs codegen/UI init, so each contrast
re-runs once and reports the repeat.

Usage: python tools/ann_prune_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.operators import ann_index as ai  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

N_ROWS = 400_000
DIM = 32
N_CELLS = 32          # id-block = cell: ingest-batch locality
N_SRC_FILES = 256     # file granularity the id prune works against
N_IDX_FILES = 32
BLOCK = N_ROWS // N_CELLS


def _vectors(spark, n, base=0):
    """Deterministic synthetic embeddings: cell centroid from the id
    block + small id-hash jitter (no RNG — reruns are bit-stable)."""
    df = spark.range(n).select((F.col("id") + base).alias("vec_id"))
    cell = (F.col("vec_id") / BLOCK).cast("int") % N_CELLS
    comps = []
    for d in range(DIM):
        jitter = (
            F.abs(F.hash(F.col("vec_id") * DIM + d)) % 1000
        ) / 10000.0
        centroid = F.when(cell % DIM == d, F.lit(10.0)).otherwise(
            F.lit(0.0)
        )
        comps.append((centroid + jitter).cast("double"))
    return df.select(
        "vec_id", F.array(*comps).alias("embedding")
    )


def _unpruned_reads():
    """Drop prune_eq from read_snapshot — the r13-first-cut control
    (same pattern as tools/r13_rehearsal._unpruned_reads)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig = ai.snap.read_snapshot

        def full(*a, **k):
            k.pop("prune_eq", None)
            return orig(*a, **k)

        ai.snap.read_snapshot = full
        try:
            yield
        finally:
            ai.snap.read_snapshot = orig

    return ctx()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ann_prune_rehearsal_r13.json",
    )
    spark = get_spark("ann-prune-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_annprune_"))
    out: dict = {
        "n_rows": N_ROWS, "dim": DIM, "n_cells": N_CELLS,
        "n_src_files": N_SRC_FILES, "n_idx_files": N_IDX_FILES,
    }

    t0 = time.perf_counter()
    src = _vectors(spark, N_ROWS).repartitionByRange(
        N_SRC_FILES, "vec_id"
    ).sortWithinPartitions("vec_id")
    snap.append_versioned(wh, "db", "emb", src, stat_cols=["vec_id"])
    out["src_build_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ai.build_ann_index(
        wh, "db", "emb", "emb_idx",
        n_centroids=N_CELLS, n_files=N_IDX_FILES,
    )
    out["index_build_s"] = round(time.perf_counter() - t0, 2)

    # ---- A: exact-refine source pruning -------------------------
    queries = _vectors(spark, 4, base=7 * BLOCK + 13).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    ).cache()
    queries.count()

    def run_query():
        t = time.perf_counter()
        rows = sorted(
            map(tuple, ai.query_ann_index(
                wh, "db", "emb_idx", queries, k=5, exclude_self=False
            ).collect())
        )
        return rows, round(time.perf_counter() - t, 2)

    run_query()  # warm-up (codegen/UI init)
    rows_p, wall_p = run_query()
    with _unpruned_reads():
        run_query()
        rows_u, wall_u = run_query()
    assert rows_p == rows_u, "pruned refine changed results"

    # planned-file count for the refine read, both plans
    cand_ids = sorted({r[1] for r in rows_p})
    vs = snap.versions(wh, "db", "emb")
    m = snap._manifest(wh, "db", "emb", vs[-1])
    planned = len(snap._plan_files(
        wh, "db", "emb", m, None, ("vec_id", cand_ids)
    ))
    total = len(snap._plan_files(wh, "db", "emb", m, None, None))
    f, n = float(total), float(len(cand_ids))
    out["refine"] = {
        "n_candidate_ids": len(cand_ids),
        "planned_files_pruned": planned,
        "planned_files_unpruned": total,
        "uniform_model_worst_case": round(
            f * (1.0 - (1.0 - 1.0 / f) ** n), 1
        ),
        "query_wall_pruned_s": wall_p,
        "query_wall_unpruned_s": wall_u,
        "results_identical": True,
    }

    # ---- B: append-only refresh vs the pre-r13 control ----------
    # identical clone index for the control path
    ai.build_ann_index(
        wh, "db", "emb", "emb_idx_ctl",
        n_centroids=N_CELLS, n_files=N_IDX_FILES,
    )
    fresh = _vectors(spark, 4_000, base=N_ROWS)
    snap.append_versioned(wh, "db", "emb", fresh)

    def versions_of(t):
        return len(snap.versions(wh, "db", t))

    # control FIRST (same source window for both): the verbatim
    # pre-r13 sequence — unconditional delete_keys tag scan +
    # merge_upsert existence scan (33a0da3^ refresh_ann_index)
    meta = ai._load_meta(wh, "db", "emb_idx_ctl")
    cur = snap.versions(wh, "db", "emb")[-1]
    v0_ctl = versions_of("emb_idx_ctl")
    t0 = time.perf_counter()
    ch = snap.read_changes(wh, "db", "emb", meta["src_version"], cur)
    ins = ch.filter(F.col("_change_type") == "insert")
    dels = (
        ch.filter(F.col("_change_type") == "delete")
        .select(F.col("vec_id").cast("long").alias("__row_id"))
        .subtract(ins.select(F.col("vec_id").cast("long").alias("__row_id")))
    )
    snap.delete_keys(
        wh, "db", "emb_idx_ctl", dels, "__row_id",
        summary={"operation": "ann-refresh-delete"},
    )
    from scratchdb_spark.operators.similarity import _assign_encode_df

    ups = _assign_encode_df(
        ins, meta["books"], meta["cent_ids"], meta["centroids"],
        "vec_id", "embedding",
    ).withColumnRenamed("vec_id", "__row_id")
    snap.merge_upsert(
        wh, "db", "emb_idx_ctl", ups, "__row_id",
        summary={"operation": "ann-refresh-merge"},
    )
    snap.commit_snapshot(
        wh, "db", "emb_idx_ctl",
        summary={
            "operation": "ann-refresh",
            "ann_meta_file": meta["meta_file"],
            "src_version": cur,
        },
    )
    ctl_wall = round(time.perf_counter() - t0, 2)
    ctl_commits = versions_of("emb_idx_ctl") - v0_ctl

    v0 = versions_of("emb_idx")
    t0 = time.perf_counter()
    st = ai.refresh_ann_index(wh, "db", "emb_idx")
    new_wall = round(time.perf_counter() - t0, 2)
    new_commits = versions_of("emb_idx") - v0
    assert st["n_upserted"] == 4_000 and st["n_deleted"] == 0

    # distributed MULTISET equality (exceptAll both ways), not a
    # collect: 404k rows stay executor-side; and not a set compare —
    # the replay bug this round hid behind exactly that collapse
    a = snap.read_snapshot(wh, "db", "emb_idx").select(
        "__row_id", "cid", "code"
    )
    b = snap.read_snapshot(wh, "db", "emb_idx_ctl").select(
        "__row_id", "cid", "code"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
        "decomposed refresh diverged from control"
    assert a.count() == b.count() == N_ROWS + 4_000
    out["refresh_append_only"] = {
        "churn_rows": 4_000,
        "index_rows": N_ROWS,
        "wall_pre_r13_control_s": ctl_wall,
        "wall_decomposed_s": new_wall,
        "commits_control": ctl_commits,
        "commits_decomposed": new_commits,
        "end_states_bit_identical": True,
    }

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
