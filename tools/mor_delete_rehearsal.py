#!/usr/bin/env python
"""Merge-on-read vs copy-on-write takedown rehearsal.

The claim to verify (the reason deletion vectors exist): on a table
with many files, deleting a FEW rows via copy-on-write rewrites every
affected file (cost ~ affected bytes), while the MoR path writes a
KB-scale tombstone sidecar (cost ~ matched rows) — and the standing
vector costs readers only a broadcast anti-join until
apply_deletion_vectors folds it in.

Measures, on a ~N_ROWS-row table spread over ~N_FILES files:
  - cow_delete_s / bytes_rewritten: delete_where of K scattered rows
  - mor_delete_s / dv_bytes:        delete_where_mor of a same-shape
                                    predicate (fresh twin table)
  - scan_clean_s vs scan_masked_s:  full-scan agg with no vectors vs
    with the standing vector (the reader-side mask overhead)
  - apply_s: the deferred physical rewrite

r11 adds the FILE-SCOPED masking scenario (the r10 verdict item):
a NARROW vector naming rows of ONE file out of n_files — under the
r11 split read ((dv-named -> masked) UNION (rest -> raw)) the
unaffected n_files-1 files skip the basename projection and the
anti-join entirely, so the full-scan overhead must be ~0; the WIDE
vector (one victim per ~2 files) keeps paying proportionally to its
affected-file share. dv_files counts are recorded per scenario.

Writes mor_rehearsal_r11.json at the repo root.

Usage: python tools/mor_delete_rehearsal.py [n_rows] [n_files]
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


def build(wh, name: str, n_rows: int, n_files: int) -> None:
    df = (
        wh.spark.range(n_rows)
        .select(
            F.col("id").alias("__row_id"),
            (F.col("id") % 1000).alias("grp"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)
    )
    snap.append_versioned(wh, "db", name, df)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("mor-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mor_rehearsal_")
    wh = Warehouse(spark, root)
    out: dict = {"n_rows": n_rows, "n_files": n_files}

    # K scattered victim rows: one per ~n_files files (worst case for
    # COW: every file containing a victim rewrites whole)
    k = n_files // 2
    victims = [i * (n_rows // k) + 7 for i in range(k)]
    pred = f"__row_id IN ({', '.join(str(v) for v in victims)})"
    out["k_deleted"] = k

    for mode in ("cow", "mor"):
        name = f"t_{mode}"
        build(wh, name, n_rows, n_files)
        base = wh._path("db", name)
        size_before = _dir_bytes(base)
        t0 = time.perf_counter()
        if mode == "cow":
            _v, n = snap.delete_where(wh, "db", name, pred)
        else:
            _v, n = snap.delete_where_mor(wh, "db", name, pred)
        wall = time.perf_counter() - t0
        assert n == k, (mode, n, k)
        grew = _dir_bytes(base) - size_before
        out[f"{mode}_delete_s"] = round(wall, 2)
        out[f"{mode}_bytes_written"] = grew
        print(
            f"{mode}: {wall:.2f}s, +{grew/1e6:.2f} MB written",
            flush=True,
        )

    # reader overhead of the standing vector (t_mor has one;
    # t_cow is clean) — same full-scan aggregate
    def scan(name: str) -> float:
        t0 = time.perf_counter()
        snap.read_snapshot(wh, "db", name).agg(
            F.count(F.lit(1)), F.sum("grp")
        ).collect()
        return time.perf_counter() - t0

    scan(f"t_cow"); scan(f"t_mor")  # warm both paths
    out["scan_clean_s"] = round(scan("t_cow"), 2)
    out["scan_masked_wide_s"] = round(scan("t_mor"), 2)
    m_wide = snap._manifest(
        wh, "db", "t_mor", snap.versions(wh, "db", "t_mor")[-1]
    )
    out["wide_dv_files"] = len(m_wide.get("dv_files", []))
    print(
        f"scan clean {out['scan_clean_s']}s vs wide-masked "
        f"{out['scan_masked_wide_s']}s "
        f"({out['wide_dv_files']}/{n_files} files named)",
        flush=True,
    )

    # r11 file-scoped scenario: a narrow vector naming ONE file —
    # the split read must make the full-scan overhead ~0
    build(wh, "t_narrow", n_rows, n_files)
    base_n = wh._path("db", "t_narrow")
    one_file = snap._manifest_files(
        wh, "db", "t_narrow",
        snap._manifest(
            wh, "db", "t_narrow", snap.versions(wh, "db", "t_narrow")[-1]
        ),
    )[0]
    ids = [
        r["__row_id"]
        for r in spark.read.parquet(f"{base_n}/{one_file}")
        .select("__row_id").limit(100).collect()
    ]
    _v, n_narrow = snap.delete_where_mor(
        wh, "db", "t_narrow",
        f"__row_id IN ({', '.join(str(i) for i in ids)})",
    )
    assert n_narrow == len(ids)
    m_narrow = snap._manifest(
        wh, "db", "t_narrow", snap.versions(wh, "db", "t_narrow")[-1]
    )
    out["narrow_dv_files"] = len(m_narrow.get("dv_files", []))
    scan("t_narrow")  # warm
    out["scan_masked_narrow_s"] = round(scan("t_narrow"), 2)
    print(
        f"narrow-masked scan {out['scan_masked_narrow_s']}s "
        f"({out['narrow_dv_files']}/{n_files} files named)",
        flush=True,
    )

    t0 = time.perf_counter()
    _v, nf = snap.apply_deletion_vectors(wh, "db", "t_mor")
    out["apply_s"] = round(time.perf_counter() - t0, 2)
    out["apply_files_rewritten"] = nf
    out["scan_after_apply_s"] = round(scan("t_mor"), 2)
    print(
        f"apply {out['apply_s']}s ({nf} files); scan after "
        f"{out['scan_after_apply_s']}s",
        flush=True,
    )

    # r11 UPDATE twins: same K-scattered-victims shape through the new
    # predicate-UPDATE DML — COW rewrites every affected file, MoR
    # writes the tombstone sidecar + a K-row postimage file
    for mode in ("updcow", "updmor"):
        name = f"t_{mode}"
        build(wh, name, n_rows, n_files)
        b = wh._path("db", name)
        size_before = _dir_bytes(b)
        t0 = time.perf_counter()
        if mode == "updcow":
            _v, n = snap.update_where(
                wh, "db", name, pred, {"grp": "grp + 1000"}
            )
        else:
            _v, n = snap.update_where_mor(
                wh, "db", name, pred, {"grp": "grp + 1000"}
            )
        wall = time.perf_counter() - t0
        assert n == k, (mode, n, k)
        grew = _dir_bytes(b) - size_before
        out[f"{mode}_update_s"] = round(wall, 2)
        out[f"{mode}_bytes_written"] = grew
        print(
            f"{mode}: {wall:.2f}s, +{grew/1e6:.2f} MB written",
            flush=True,
        )

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mor_rehearsal_r11.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
