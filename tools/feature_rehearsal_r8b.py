"""Round-8 (continued) feature rehearsal: measured evidence for the
two new scale mechanisms, so their 100 TB claims ship with numbers,
not adjectives (same policy as the metadata/ANN/pipeline rehearsals).

1. BLOOM FILE SKIPPING at metadata scale: a 4,000-file sharded table
   whose key column is high-cardinality and UNclustered (sha256
   strings: every file spans the whole lexical range, and the
   per-file dictionary overflows) — the regime where zone maps and
   dicts are both useless. Measures the bloom build surcharge on the
   commit (one extra sha2 aggregation riding the existing stats job),
   the metadata size surcharge (~0.7 KB/file/col of base64 bitmap),
   and point-lookup PLANNING: files planned + driver wall for present
   and absent probes, with and without blooms. The claim under test:
   a point lookup on an unclustered key plans O(1) files instead of
   O(table), at plan time, before any footer is opened.

2. SEMDEDUP SCALING: semdedup_prune over seeded gaussian-mixture
   corpora at N=2k and N=20k. The within-cell stage is quadratic in
   CELL size by SemDedup's contract, so the scale knob is n_cells ~
   N / target_cell_size: with n_cells scaled 10x alongside N, wall
   and shuffle must scale ~linearly; with n_cells HELD FIXED the
   per-cell pair count grows 10x — the measured gap is the documented
   reason the knob exists.

Usage: python tools/feature_rehearsal_r8b.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_FILES = 4000
ROWS_PER_FILE = 100  # > _DICT_CAP so the exact dictionary is out


def _write_files(base: str) -> None:
    os.makedirs(base, exist_ok=True)

    def one(i: int) -> None:
        lo = i * ROWS_PER_FILE
        ids = list(range(lo, lo + ROWS_PER_FILE))
        t = pa.table(
            {
                "__row_id": pa.array(ids, pa.int64()),
                "k": pa.array(
                    [
                        hashlib.sha256(str(x).encode()).hexdigest()
                        for x in ids
                    ],
                    pa.string(),
                ),
            }
        )
        pq.write_table(t, f"{base}/gen-{i:07d}.parquet")

    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(one, range(N_FILES)))


def _tree_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def bloom_rehearsal(spark) -> dict:
    import tempfile

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.tables import Warehouse

    out: dict = {"n_files": N_FILES, "rows_per_file": ROWS_PER_FILE}
    for label, blooms in (("no_bloom", None), ("bloom", ["k"])):
        wh = Warehouse(spark, tempfile.mkdtemp(prefix=f"wh_{label}_"))
        _write_files(wh._path("db", "t"))
        t0 = time.perf_counter()
        v = snap.commit_snapshot(
            wh, "db", "t", stat_cols=["k"], bloom_cols=blooms
        )
        commit_s = time.perf_counter() - t0
        m = snap._manifest(wh, "db", "t", v)
        meta_bytes = _tree_bytes(
            f"{wh._path('db', 't')}/_snapshots"
        )
        probes = {}
        for pname, key in (
            ("present", hashlib.sha256(b"123456").hexdigest()),
            ("absent", "a" * 64),  # inside the lexical hex range
        ):
            t0 = time.perf_counter()
            files = snap._plan_files(
                wh, "db", "t", m, None, ("k", key)
            )
            plan_s = time.perf_counter() - t0
            probes[pname] = {
                "files_planned": len(files),
                "plan_s": round(plan_s, 3),
            }
        # end-to-end correctness of the pruned read (present key)
        key = hashlib.sha256(b"123456").hexdigest()
        from pyspark.sql import functions as F

        found = (
            snap.read_snapshot(wh, "db", "t", prune_eq=("k", key))
            .filter(F.col("k") == key)
            .count()
        )
        out[label] = {
            "commit_s": round(commit_s, 2),
            "snapshots_meta_mb": round(meta_bytes / 1e6, 2),
            "probes": probes,
            "present_rows_found": found,
        }
    return out


def semdedup_rehearsal(spark) -> dict:
    from bench import _stage_totals

    from scratchdb_spark.operators.similarity import semdedup_prune

    out: dict = {}
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(32, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def corpus(n):
        ci = rng.integers(0, 32, size=n)
        V = centers[ci] + 0.25 * rng.normal(size=(n, 64))
        return spark.createDataFrame(
            [(int(i), [float(x) for x in V[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )

    for n, cells_list in ((2_000, [16]), (20_000, [16, 160])):
        emb = corpus(n)
        emb.persist().count()
        for n_cells in cells_list:
            # warm-up then timed pass (same protocol as the 10x
            # data-scale rehearsal)
            semdedup_prune(
                emb, tau=0.9, n_cells=n_cells,
                max_cell_rows=None,
            ).count()
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            res = semdedup_prune(
                emb, tau=0.9, n_cells=n_cells, max_cell_rows=None,
            )
            kept = res.filter("kept").count()
            wall = time.perf_counter() - t0
            after = _stage_totals(spark)
            out[f"n{n}_cells{n_cells}"] = {
                "wall_s": round(wall, 2),
                "kept": kept,
                "shuffle_mb": round((after[0] - before[0]) / 1e6, 2)
                if before and after
                else None,
            }
            print(
                f"semdedup n={n} cells={n_cells} "
                f"wall={wall:.2f}s kept={kept}",
                flush=True,
            )
        emb.unpersist()
    return out


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "feature_rehearsal_r8b.json"
    )
    from scratchdb_spark.session import get_spark

    spark = get_spark(
        "feature-rehearsal-r8b",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.sql.shuffle.partitions": "32",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {
        "bloom": bloom_rehearsal(spark),
        "semdedup": semdedup_rehearsal(spark),
    }
    print(json.dumps(results, indent=1))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
