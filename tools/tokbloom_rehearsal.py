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

r10 addition (verdict item #3): the MULTI-BATCH scenario. Sidecars
are per-commit-batch, so the same 1000 files accreted over 50 commits
spread a probe's surviving records over 50 sidecars instead of 1. The
scenario measures: (a) probes on the local FS (files planned must
equal the single-batch scenario's — same corpus, same blooms);
(b) probes with fs.SIM_LATENCY_S = 50 ms injected per metadata op
(the object-store model), comparing the shipped POOLED sidecar
prefetch (_bloom_resolver.prefetch, 16-way) against a measured
SERIAL resolve of the same refs — the O(batches) x latency shape the
pooling removes.

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

    # --- r10: multi-batch accretion -------------------------------
    from scratchdb_spark import fs as hfs

    N_BATCHES = 50
    per = N_FILES // N_BATCHES
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_tok_multibatch_"))
    t0 = time.time()
    for b in range(N_BATCHES):
        v = snap.append_versioned(
            wh, "db", "docs",
            df.filter(
                (F.col("fpart") >= b * per)
                & (F.col("fpart") < (b + 1) * per)
            ).repartitionByRange(per, "fpart"),
            bloom_cols=["body:tokens"],
        )
    commits_s = time.time() - t0
    m = snap._manifest(wh, "db", "docs", v)
    snapd = snap._snap_dir(wh, "db", "docs").replace("file:", "")
    n_sidecars = len(
        [
            n
            for n in os.listdir(os.path.join(snapd, snap._BLOOMS_DIR))
            if n.endswith(".json")
        ]
    )
    mb: dict = {
        "n_batches": N_BATCHES,
        "commits_s": round(commits_s, 2),
        "n_sidecars": n_sidecars,
        "probes_local": {},
        "probes_latency_50ms": {},
    }
    probe_specs = (
        ("marker_present", ["marker00421xq"]),
        ("absent", ["zz99neverthere"]),
        ("stopword", ["commonstop"]),
    )
    for pname, toks in probe_specs:
        t0 = time.time()
        planned = snap._plan_files(
            wh, "db", "docs", m, None, None, ("body", toks)
        )
        mb["probes_local"][pname] = {
            "files_planned": len(planned),
            "plan_s": round(time.time() - t0, 3),
        }
    # object-store model: 50 ms per driver-side metadata op. The
    # shipped path pools sidecar fetches 16-wide; the serial resolve
    # of the same refs is measured alongside as the shape the pooling
    # removes (O(sidecars) x latency).
    hfs.SIM_LATENCY_S = 0.05
    try:
        for pname, toks in probe_specs:
            hfs.SIM_OP_COUNT = 0
            t0 = time.time()
            planned = snap._plan_files(
                wh, "db", "docs", m, None, None, ("body", toks)
            )
            mb["probes_latency_50ms"][pname] = {
                "files_planned": len(planned),
                "plan_s": round(time.time() - t0, 3),
                "metadata_ops": hfs.SIM_OP_COUNT,
            }
        # measured serial baseline for the marker probe: resolve every
        # referenced sidecar one by one through a FRESH resolver
        bkey = "body" + snap._TOKEN_MARKER + "__bloom"
        stats = (
            m.get("stats")
            or {
                n: rec
                for sh in snap._read_shards(
                    wh, "db", "docs",
                    [r["name"] for r in m.get("shards", [])],
                )
                for n, rec in sh.get("stats", {}).items()
            }
        )
        refs = [
            rec[bkey]
            for rec in stats.values()
            if isinstance(rec.get(bkey), dict) and "sc" in rec[bkey]
        ]
        seen: set = set()
        uniq_refs = [
            r for r in refs
            if r["sc"] not in seen and not seen.add(r["sc"])
        ]
        res = snap._bloom_resolver(wh, "db", "docs")
        t0 = time.time()
        for r in uniq_refs:
            res(r)  # serial: one 50 ms GET per sidecar
        mb["serial_sidecar_resolve_s"] = round(time.time() - t0, 3)
        mb["n_refs_resolved_serially"] = len(uniq_refs)
    finally:
        hfs.SIM_LATENCY_S = 0.0
    n_total = len(snap._plan_files(wh, "db", "docs", m, None, None))
    mb["n_files_total"] = n_total
    # correctness: the pruned scan still finds every marker row
    mb["marker_rows_found"] = (
        snap.read_snapshot(
            wh, "db", "docs",
            prune_tokens=("body", ["marker00421xq"]),
        )
        .filter(F.col("body").contains("marker00421xq"))
        .count()
    )
    # invariants. Exact file-set parity with the single-batch table
    # is NOT expected (repartitionByRange sampling can split fparts
    # differently, changing each file's bloom and so its false
    # positives) — the load-bearing ones are:
    # 1) pooled prefetch plans EXACTLY what serial local planning
    #    plans (pooling must not change planning);
    # 2) probe semantics hold at this granularity: marker probes a
    #    handful of files, absent stays FPP-bounded, stopword scans
    #    everything.
    for pname, _toks in probe_specs:
        assert (
            mb["probes_local"][pname]["files_planned"]
            == mb["probes_latency_50ms"][pname]["files_planned"]
        ), pname
    assert mb["marker_rows_found"] == 1
    # bloom-FPP-bounded pruning (r9's committed single-batch numbers:
    # marker 54/1000, absent 14/1000 — same config here)
    assert (
        mb["probes_local"]["marker_present"]["files_planned"]
        <= n_total // 10
    )
    assert (
        mb["probes_local"]["absent"]["files_planned"] <= n_total // 10
    )
    assert mb["probes_local"]["stopword"]["files_planned"] == n_total
    results["tok_bloom_multibatch"] = mb
    print("tok_bloom_multibatch", json.dumps(mb))

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
