"""Token-bloom (tokenbf) metadata-scale rehearsal: measured evidence
for the full-text file-skipping claims, same policy as the other
round-8 rehearsals (numbers in PERF.md, not adjectives).

Setup: a 1,000-file documents-style table (200 docs/file, ~55-token
bodies from a 30k-word vocabulary, plus one file-local rare marker
token per file) committed twice — without and with
bloom_cols=["body:tokens"]. Measures:

- commit wall with/without the token blooms (the build surcharge is
  one explode+groupBy aggregation per commit over ONLY the fresh
  files' text column; the driver receives <= 2048 bitmap words per
  file, never one row per token);
- snapshot metadata size (≈ 22 KB base64 per file/col at 128 Ki
  bits — the price of 1%-FPP full-text skipping, linear in files);
- PLANNING cost and files planned for (a) a file-local marker token
  (expect 1), (b) an absent token (expect 0), (c) a stopword-like
  token present everywhere (expect all files) — all at plan time,
  before any parquet footer is opened.

Usage: python tools/tokbloom_rehearsal.py [out.json]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_FILES = 1000
DOCS_PER_FILE = 200
VOCAB = 30_000


def _tree_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "tokbloom_rehearsal.json"
    import tempfile

    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.session import get_spark
    from scratchdb_spark.tables import Warehouse

    spark = get_spark("tokbloom-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    rnd = random.Random(42)
    words = [
        "w%05d" % rnd.randrange(VOCAB) for _ in range(55)
    ]  # template; per-doc sampling below keeps generation cheap

    def gen_rows():
        rows = []
        for f in range(N_FILES):
            marker = f"marker{f:05d}xq"
            for d in range(DOCS_PER_FILE):
                body = " ".join(
                    "w%05d" % rnd.randrange(VOCAB) for _ in range(55)
                )
                if d == 0:
                    body += " " + marker
                body += " commonstop"
                rows.append((f * DOCS_PER_FILE + d, f, body))
        return rows

    t0 = time.time()
    rows = gen_rows()
    df = spark.createDataFrame(
        rows, "__row_id long, fpart long, body string"
    ).repartitionByRange(N_FILES, "fpart")
    df.persist().count()
    gen_s = time.time() - t0

    results: dict = {"n_files": N_FILES, "docs_per_file": DOCS_PER_FILE,
                     "gen_s": round(gen_s, 2)}

    for label, blooms in (("no_bloom", None), ("tok_bloom", ["body:tokens"])):
        wh = Warehouse(spark, tempfile.mkdtemp(prefix=f"wh_tok_{label}_"))
        t0 = time.time()
        v = snap.append_versioned(
            wh, "db", "docs", df, bloom_cols=blooms
        )
        commit_s = time.time() - t0
        m = snap._manifest(wh, "db", "docs", v)
        snapd = snap._snap_dir(wh, "db", "docs").replace("file:", "")
        meta_mb = _tree_bytes(snapd) / 1e6
        # r9 split: the INLINE metadata (manifest + shards — what the
        # planner parses on every resolution) vs the lazily-read
        # bloom sidecars (opened only by token probes)
        sidecar_mb = _tree_bytes(
            os.path.join(snapd, snap._BLOOMS_DIR)
        ) / 1e6 if os.path.isdir(
            os.path.join(snapd, snap._BLOOMS_DIR)
        ) else 0.0
        inline_mb = meta_mb - sidecar_mb
        probes = {}
        for pname, toks in (
            ("marker_present", ["marker00421xq"]),
            ("absent", ["zz99neverthere"]),
            ("stopword", ["commonstop"]),
            ("marker_and_absent", ["marker00421xq", "zz99neverthere"]),
        ):
            t0 = time.time()
            planned = snap._plan_files(
                wh, "db", "docs", m, None, None, ("body", toks)
            )
            probes[pname] = {
                "files_planned": len(planned),
                "plan_s": round(time.time() - t0, 3),
            }
        found = (
            snap.read_snapshot(
                wh, "db", "docs",
                prune_tokens=("body", ["marker00421xq"]),
            )
            .filter(F.col("body").contains("marker00421xq"))
            .count()
        )
        results[label] = {
            "commit_s": round(commit_s, 2),
            "snapshots_meta_mb": round(meta_mb, 2),
            "inline_meta_mb": round(inline_mb, 2),
            "sidecar_mb": round(sidecar_mb, 2),
            "probes": probes,
            "marker_rows_found": found,
        }
        print(label, json.dumps(results[label]))

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
