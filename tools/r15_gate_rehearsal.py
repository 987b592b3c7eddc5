#!/usr/bin/env python
"""r15 — VERDICT r14 item 4: dedup-gate cadence at PRODUCTION
granularity (h << F). Same harness as tools/r14_rehearsal.py's
gate_cadence_defer (identical corpus/batch discipline: 500k docs,
200-doc batches with 50 corpus-dup + 150 fresh, refresh every 4 on
its own cadence), but the index is built at F=100,000 files so the
probe's ~h≈3200 planned files are a small fraction of F and each
planned file holds ~80 band rows instead of ~400 — the regime the
r13/r14 saturation model predicts the gate floor drops in.

Writes gate_cadence_defer_f100k into r15_rehearsal.json.

Usage: python tools/r15_gate_rehearsal.py [--files N] [--batches N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from r14_rehearsal import gate_cadence_defer  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402


def main() -> None:
    n_files = 100_000
    n_batches = 12
    if "--files" in sys.argv:
        n_files = int(sys.argv[sys.argv.index("--files") + 1])
    if "--batches" in sys.argv:
        n_batches = int(sys.argv[sys.argv.index("--batches") + 1])
    spark = get_spark(
        "r15-gate-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg(F.sum("id")).collect()

    dst = os.path.join(REPO, "r15_rehearsal.json")
    out: dict = {}
    if os.path.exists(dst):
        with open(dst) as f:
            out = json.load(f)
    root = tempfile.mkdtemp(prefix="r15_gate_")
    wh = Warehouse(spark, root)
    try:
        out[f"gate_cadence_defer_f{n_files // 1000}k"] = (
            gate_cadence_defer(
                spark, wh, 500_000, n_files, n_batches, refresh_every=4
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
