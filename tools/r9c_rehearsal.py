#!/usr/bin/env python
"""10x scale rehearsal for the round-9 operators (windowFunnel fold
modes, mixture sampler, scale-safe epoch shuffle, k-means-quantizer
IVFADC build): reuse r8c_rehearsal's workload-preserving ~sf1 build
(events: user/item-shifted copies — per-user streams preserved
exactly, so funnel folds see 10x users at identical per-user depth;
documents: id-shifted copies — per-source token masses scale 10x at
identical share structure; embeddings: rotated id-shifted copies) and
record wall + shuffle bytes at both scales.

What the numbers must show:
- funnel modes: shuffle ~10x (user-keyed), wall sub-linear (32 cores
  underused at sf0.1), NO blowup from the fold (arrays stay per-user
  sized);
- epoch_shuffle: shuffle ~10x across 256 bucket partitions — the
  whole point of the r9 two-pass fix (the r8 form would have pushed
  10x rows through ONE sort task);
- mixture sample: totals agg ~KBs shuffled regardless of scale (the
  keep filter is a pure map);
- kmeans IVFADC: Lloyd iterations scale with corpus (3 fused
  passes), candidate scan stays probed-cells-only.

Usage: python tools/r9c_rehearsal.py [out_dir] [--build-only|--run-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r8c_rehearsal import SRC, build  # noqa: E402

QUERIES = [
    "events_window_funnel_default",
    "events_window_funnel_strict_order",
    "events_window_funnel_strict_dedup",
    "split_epoch_shuffle",
    "curate_mixture_sample",
    "ann_ivfpq_kmeans_topk",
]


def run(out_dir: str) -> None:
    from bench import _stage_totals
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.session import get_spark

    spark = get_spark(
        "r9c-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    results: dict[str, dict] = {}
    from pyspark.sql import functions as F

    def consume(df):
        # count() lets Catalyst prune the rank window entirely (the
        # rank column is dead under COUNT) — force materialization of
        # every output column so the measured shuffle is the one a
        # real consumer pays
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.max(F.xxhash64(c)).alias(f"h_{c}")
                for c in df.columns
            ],
        ).collect()[0]["n"]

    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1", out_dir)):
        for name in QUERIES:
            spec = reg[name]
            consume(spec.spark_fn(spark, sf_dir))  # warm-up
            spark.catalog.clearCache()
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            n = consume(spec.spark_fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            after = _stage_totals(spark)
            spark.catalog.clearCache()
            results.setdefault(name, {})[sf_label] = {
                "wall": round(wall, 2),
                "rows": n,
                "shuffle_mb": round((after[0] - before[0]) / 1e6, 2)
                if before and after
                else None,
            }
            print(
                f"{sf_label:6s} {name:34s} {wall:7.2f}s rows={n} "
                f"shuffle={results[name][sf_label]['shuffle_mb']}MB",
                flush=True,
            )
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "r9c_rehearsal.json",
        ),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = next(
        (a for a in args if not a.startswith("--")), "/tmp/sf1_r9c"
    )
    if "--run-only" not in args:
        t0 = time.time()
        build(out_dir)
        print(f"built {out_dir} in {time.time() - t0:.1f}s", flush=True)
    if "--build-only" not in args:
        run(out_dir)


if __name__ == "__main__":
    main()
