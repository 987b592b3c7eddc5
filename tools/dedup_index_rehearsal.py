#!/usr/bin/env python
"""Dedup-index scale rehearsal (r9): the claim worth measuring is
"probe cost tracks the BATCH, not the corpus" — build the persistent
minhash-LSH index over the sf0.1 documents (5k docs) and over the
r9c 10x corpus (50k docs), probe both with the SAME 100-doc batch,
and record build wall, probe wall, and the index files the probe's
band-hash IN-list actually plans (manifest zone-map skipping).

r10 addition (verdict item #4): file-GRANULARITY curve on the 50k
corpus — the same index rebuilt at 64 / 1024 / 4096 files, batch and
point probes planned against each. The model: files are
range-clustered on uniform band hashes, so a probe of h distinct
hashes plans ~F x (1 - (1 - 1/F)^h) of F files — ~all files while
F <~ h (the 64-file r9 rehearsal could only show 64/64), and
SATURATING AT ~h (one file per probed hash) as F grows past h. That
saturation is the 100 TB batch-probe claim in measurable form: at
fine granularity a <=4096-hash probe plans at most ~h files no
matter how many files the corpus has — sub-linear in corpus files,
bounded by the probe. Point probes (~bands hashes) stay ~bands files
at every granularity.

Usage: python tools/dedup_index_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r8c_rehearsal import SRC, build  # noqa: E402


def main() -> int:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "dedup_index_rehearsal.json"
    )
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators import dedup_index as di
    from scratchdb_spark.session import get_spark
    from scratchdb_spark.tables import Warehouse, table

    spark = get_spark(
        "dedup-index-rehearsal", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = tempfile.mkdtemp(prefix="sf1_lsh_")
    build(sf1)

    results: dict = {}
    for label, sf_dir, n_files in (
        ("sf0.1", SRC, 16),
        ("sf1", sf1, 64),
        ("sf1_1024f", sf1, 1024),
        ("sf1_4096f", sf1, 4096),
    ):
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        wh = Warehouse(spark, tempfile.mkdtemp(prefix=f"wh_{label}_"))
        snap.append_versioned(wh, "db", "docs", docs)
        t0 = time.time()
        di.build_dedup_index(
            wh, "db", "docs", "docs_lsh", n_files=n_files
        )
        build_s = time.time() - t0

        probe = docs.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).persist()
        probe.count()
        # warm-up then measured probe
        di.query_dedup_index(wh, "db", "docs_lsh", probe).count()
        t0 = time.time()
        n_pairs = di.query_dedup_index(
            wh, "db", "docs_lsh", probe
        ).count()
        probe_s = time.time() - t0

        # manifest file-skipping evidence: files planned for the
        # probe's band hashes vs the full index
        meta = di._load_dedup_meta(wh, "db", "docs_lsh")
        prows = di._band_rows(
            probe.select(F.col("doc_id"), F.col("text")),
            "text", "doc_id", meta["n"], meta["num_hashes"],
            meta["bands"],
        )
        hashes = [
            r["band_hash"]
            for r in prows.select("band_hash").distinct().collect()
        ]
        m = snap._manifest(
            wh, "db", "docs_lsh",
            snap.versions(wh, "db", "docs_lsh")[-1],
        )
        planned = snap._plan_files(
            wh, "db", "docs_lsh", m, None, ("band_hash", hashes)
        )
        # point probe: ONE doc's ~bands hashes — the regime the
        # range clustering exists for
        one = di._band_rows(
            probe.filter(F.col("doc_id") == 10_000_000),
            "text", "doc_id", meta["n"], meta["num_hashes"],
            meta["bands"],
        )
        one_hashes = [
            r["band_hash"]
            for r in one.select("band_hash").distinct().collect()
        ]
        planned_one = snap._plan_files(
            wh, "db", "docs_lsh", m, None, ("band_hash", one_hashes)
        )
        total = snap._plan_files(wh, "db", "docs_lsh", m, None, None)
        F_n, h = len(total), len(hashes)
        results[label] = {
            "corpus_docs": n_docs,
            "index_files": F_n,
            "build_s": round(build_s, 2),
            "probe_docs": 100,
            "probe_hashes": h,
            "probe_s": round(probe_s, 2),
            "probe_pairs": n_pairs,
            "probe_files_planned": len(planned),
            # uniform-hash model: F x (1 - (1-1/F)^h), saturating at
            # ~h as F grows — the sub-linear-in-files claim
            "probe_files_model": round(
                F_n * (1.0 - (1.0 - 1.0 / F_n) ** h)
            ),
            "point_probe_hashes": len(one_hashes),
            "point_probe_files_planned": len(planned_one),
        }
        print(label, json.dumps(results[label]), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
