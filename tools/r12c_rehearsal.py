#!/usr/bin/env python
"""10x scale rehearsal for the round-11/12 warehouse additions
(r12, verdict item 5): the MoR DML family, file-scoped masked reads,
dedup-gated ingest, and the r12 size-aware Spearman rank-frame
broadcast on a heavy-hitter metric.

r11 measured these at 2M rows / fixture scale only. Scenarios, each
at BASE (2M rows / 200 files; dedup corpus 50k docs) and 10X
(20M rows / 2000 files; corpus 500k docs) — note files scale WITH
rows (constant file size, the 100 TB direction), so per-file work is
scale-invariant:

- mor_update / mor_merge: one update_where_mor over a range-clustered
  2000-row window (~1-2 files) and one merge_upsert_mor (1500
  replacements + 500 new keys). O(matched rows) prediction: commit
  bytes ~flat across 10x; wall dominated by the matched-file
  rewrite-free probe, reported honestly.
- file_scoped_read: full-scan agg BEFORE any DML (clean) vs AFTER
  (standing vectors naming a few of the files). r11's file-scoped
  claim at 10x: overhead is ~ the affected-file share, so the
  RELATIVE overhead must SHRINK as unaffected files multiply.
- dedup_gated_batch: append_deduped of a fixed 1000-doc batch (250
  in-batch dups, 500 corpus dups, 250 fresh) against a 10x larger
  indexed corpus. Candidate-bounded prediction: gate wall ~flat
  while the corpus (and its index) grow 10x; only the CDC refresh
  scales with appended rows (fixed here).
- spearman_heavy_hitter: agg_spearman_rank_corr's construction on a
  metric where ONE value holds ~50% of all rows (constant-heavy
  telemetry shape). The r12 proven-cardinality broadcast must keep
  wall ~linear-in-rows with NO skewed value-keyed shuffle; the
  control run forces the pre-r12 shuffle join (_RANK_BROADCAST_ROWS
  monkeypatched to 0) to show what the broadcast avoids. Both paths
  must agree on rho exactly.

Writes r12c_rehearsal.json at the repo root.

Usage: python tools/r12c_rehearsal.py [--small]
"""

from __future__ import annotations

import json
import os
import shutil
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


def mor_scenarios(spark, n_rows: int, n_files: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"r12c_mor_{n_rows}_")
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
    base_bytes = _dir_bytes(root)

    def scan():
        t0 = time.perf_counter()
        snap.read_snapshot(wh, "db", "t").agg(
            F.count(F.lit(1)), F.sum("grp")
        ).collect()
        return round(time.perf_counter() - t0, 3)

    scan()  # warm-up (parquet footers, codegen)
    clean_scan = scan()

    lo = n_rows // 2
    b0 = _dir_bytes(root)
    t0 = time.perf_counter()
    _, n_upd = snap.update_where_mor(
        wh, "db", "t",
        f"__row_id >= {lo} AND __row_id < {lo + 2000}",
        {"payload": F.lit("updated")},
    )
    upd_wall = round(time.perf_counter() - t0, 3)
    upd_bytes = _dir_bytes(root) - b0

    upd_rows = spark.range(1000, 2500).select(
        F.col("id").alias("__row_id"),
        (F.col("id") % 1000).alias("grp"),
        F.lit("merged").alias("payload"),
    )
    fresh = spark.range(n_rows, n_rows + 500).select(
        F.col("id").alias("__row_id"),
        (F.col("id") % 1000).alias("grp"),
        F.lit("new").alias("payload"),
    )
    b0 = _dir_bytes(root)
    t0 = time.perf_counter()
    _, nu, ni = snap.merge_upsert_mor(
        wh, "db", "t", upd_rows.unionByName(fresh), "__row_id"
    )
    merge_wall = round(time.perf_counter() - t0, 3)
    merge_bytes = _dir_bytes(root) - b0

    masked_scan = min(scan(), scan())
    m = snap._manifest(wh, "db", "t", snap.versions(wh, "db", "t")[-1])
    res = {
        "table_mb": round(base_bytes / 1e6, 2),
        "clean_scan_s": clean_scan,
        "update": {
            "rows": n_upd,
            "wall_s": upd_wall,
            "commit_mb": round(upd_bytes / 1e6, 3),
        },
        "merge": {
            "updated": nu,
            "inserted": ni,
            "wall_s": merge_wall,
            "commit_mb": round(merge_bytes / 1e6, 3),
        },
        "masked_scan_s": masked_scan,
        "mask_overhead_s": round(masked_scan - clean_scan, 3),
        "dv_rows": m.get("dv_rows", 0),
        "dv_files": len(m.get("dv_files") or []),
        "live_files": snap._manifest_n_files(m),
    }
    shutil.rmtree(root, ignore_errors=True)
    return res


def _doc_text(col):
    """Deterministic ~30-token pseudo-sentence per id (pure column
    expr — no Python row loop). Accepts a column name or Column."""
    c = F.col(col) if isinstance(col, str) else col
    # modulus FAR above any id used: distinct ids then share ZERO
    # tokens (id1*(2j+1) == id2*(2j+1) mod p only when id1 == id2
    # mod p), so batch overlap is exactly what the caller constructs
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


def dedup_gated(spark, n_corpus: int) -> dict:
    root = tempfile.mkdtemp(prefix=f"r12c_dedup_{n_corpus}_")
    wh = Warehouse(spark, root)
    from scratchdb_spark.operators.dedup_index import (
        append_deduped,
        build_dedup_index,
    )

    corpus = spark.range(n_corpus).select(
        F.col("id").alias("__row_id"),
        F.col("id").alias("doc_id"),
        _doc_text("id").alias("text"),
    )
    snap.append_versioned(wh, "db", "docs", corpus)
    t0 = time.perf_counter()
    build_dedup_index(
        wh, "db", "docs", "docs_idx",
        n_files=max(16, n_corpus // 25_000),
    )
    build_wall = round(time.perf_counter() - t0, 2)

    # 1000-doc batch: 500 dup the corpus (same text as ids 0..499
    # under fresh ids), 250 dup each other in-batch, 250 fresh
    big = 10_000_000_000
    dups = spark.range(500).select(
        (F.col("id") + big).alias("doc_id"), _doc_text("id").alias("text")
    )
    # 125 distinct token-disjoint texts, each twice -> 125 in-batch
    # drops. Effective text-id space 900_000..900_124 sits INSIDE the
    # token modulus and above every corpus/fresh id — no wrap-around
    # collisions (the first draft used 2_000_000, which wraps mod
    # 1_000_003 back onto corpus ids 0..118 — caught by the count)
    inbatch = spark.range(250).select(
        (F.col("id") + big + 500).alias("doc_id"),
        _doc_text(F.col("id") % 125 + 900_000).alias("text"),
    )
    fresh = spark.range(250).select(
        (F.col("id") + big + 750).alias("doc_id"),
        _doc_text(F.col("id") + n_corpus + 777).alias("text"),
    )
    batch = dups.unionByName(inbatch).unionByName(fresh)
    t0 = time.perf_counter()
    stats = append_deduped(wh, "db", "docs_idx", batch)
    gate_wall = round(time.perf_counter() - t0, 2)
    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_corpus": n_corpus,
        "index_build_s": build_wall,
        "gate_wall_s": gate_wall,
        **{k: v for k, v in stats.items() if k != "src_version"},
    }


def spearman_heavy_hitter(spark, n_rows: int) -> dict:
    """agg_spearman_rank_corr's exact construction on a heavy-hitter
    metric: x has 100k distinct values but value 42 holds ~50% of all
    rows. Run the production path (proven-cardinality broadcast) and
    the pre-r12 control (broadcast disabled -> value-keyed shuffle
    join) and compare wall / shuffle / result."""
    import bench

    from scratchdb_spark.catalog import analytics as an
    from scratchdb_spark.operators.prefix_sum import (
        bucketed_running_sum,
    )

    rows = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(42))
        .otherwise((F.col("id") * 2654435761) % 100_000)
        .cast("long")
        .alias("x"),
        ((F.col("id") * 48271) % 1_000_000).cast("long").alias("y"),
    )
    rows.write.mode("overwrite").parquet("/tmp/r12c_hh.parquet")
    rows = spark.read.parquet("/tmp/r12c_hh.parquet")

    def rho(strategy: str) -> tuple[float, float, float, int]:
        from scratchdb_spark.operators.skew import salted_join

        def join_ranks(base, col, out):
            g = rows.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
            d: dict = {}
            r, _ = bucketed_running_sum(g, col, "c", "cum", diag=d)
            r = r.select(
                col,
                (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1)
                .cast("long")
                .alias(out),
            )
            if strategy == "broadcast":
                return base.join(F.broadcast(r), col)
            if strategy == "salted":  # the r12 above-budget fallback
                return salted_join(base, r, col)
            return base.join(r, col)  # plain value-keyed shuffle

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
        before = bench._stage_totals_stable(spark)
        t0 = time.perf_counter()
        r = s.collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        after = bench._stage_totals_stable(spark)
        import math

        n, sa, sb = float(r["n"]), float(r["sa"]), float(r["sb"])
        saa, sbb, sab = float(r["saa"]), float(r["sbb"]), float(r["sab"])
        rho_v = round(
            (n * sab - sa * sb)
            / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            6,
        )
        sh = (
            round((after[0] - before[0]) / 1e6, 2)
            if before and after
            else None
        )
        tk = (after[1] - before[1]) if before and after else None
        return rho_v, wall, sh, tk

    _ = an  # the production strategy thresholds live in analytics
    rho_b, wall_b, sh_b, tk_b = rho("broadcast")
    # controls: planner auto-broadcast off — at rehearsal sizes the
    # planner's size estimate still sees the small rank frame and
    # quietly broadcasts (exactly the estimate a 100 TB plan can't
    # rely on), which would fake a flat control
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # pre-r12 shape: plain value-keyed shuffle join
        rho_s, wall_s, sh_s, tk_s = rho("shuffle")
        # the r12 above-budget fallback: salted equi-join
        rho_x, wall_x, sh_x, tk_x = rho("salted")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    shutil.rmtree("/tmp/r12c_hh.parquet", ignore_errors=True)
    return {
        "n_rows": n_rows,
        "broadcast": {
            "rho": rho_b, "wall_s": wall_b,
            "shuffle_mb": sh_b, "tasks": tk_b,
        },
        "shuffle_control": {
            "rho": rho_s, "wall_s": wall_s,
            "shuffle_mb": sh_s, "tasks": tk_s,
        },
        "salted_fallback": {
            "rho": rho_x, "wall_s": wall_x,
            "shuffle_mb": sh_x, "tasks": tk_x,
        },
        "identical_rho": rho_b == rho_s == rho_x,
    }


def main() -> None:
    small = "--small" in sys.argv
    spearman_only = "--spearman-only" in sys.argv
    spark = get_spark(
        "r12c-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "r12c_rehearsal.json",
    )
    out: dict = {}
    if spearman_only and os.path.exists(dst):
        with open(dst) as f:  # merge into the standing artifact
            out = json.load(f)

    scales = (
        [("base", 200_000, 40, 10_000, 200_000)]
        if small
        else [
            ("base", 2_000_000, 200, 50_000, 2_000_000),
            ("10x", 20_000_000, 2_000, 500_000, 20_000_000),
        ]
    )
    for label, n_rows, n_files, n_corpus, n_hh in scales:
        out.setdefault(label, {})
        if not spearman_only:
            out[label]["mor"] = mor_scenarios(spark, n_rows, n_files)
            print(json.dumps({label: out[label]["mor"]}), flush=True)
            out[label]["dedup_gated"] = dedup_gated(spark, n_corpus)
            print(json.dumps(out[label]["dedup_gated"]), flush=True)
        out[label]["spearman_heavy_hitter"] = spearman_heavy_hitter(
            spark, n_hh
        )
        print(json.dumps(out[label]["spearman_heavy_hitter"]), flush=True)

    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
