#!/usr/bin/env python
"""10x scale rehearsal for the round-11 operators: the prefix-sum-
backed statistics (KS, Spearman, the re-based Mann-Whitney twin
rollup_histogram_quantiles / curate_domain_token_budget), Cramer's V,
and the de-windowed as-of tolerance join. Reuses r8c_rehearsal's
workload-preserving ~sf1 build and r9c's per-column-hash consumption
(bare count() lets Catalyst prune rank windows and under-report
shuffle ~20x).

What the numbers must show:
- events_ab_kolmogorov_smirnov / rollup_histogram_quantiles: grouped
  counts per distinct value / histogram bucket — shuffle bounded by
  CARDINALITY (the fixture's value span is scale-invariant), wall
  flat-ish; the cumulative rides partitioned prefix-sum windows.
- events_cramers_v: one (a, b)-grouped count — shuffle ~KBs, flat
  (the contingency table is category-bounded).
- agg_spearman_rank_corr: the two value-keyed rank joins ship the ROW
  frame — shuffle ~10x by design; wall sub-linear at 32 cores, and
  the DECIMAL(38) moment sums stay exact (rows returned == 1 at both
  scales with finite rho).
- curate_domain_token_budget: per-domain agg (bounded) + linear
  corpus scan; the cumulative-share frame rides the prefix-sum
  window, never one task.
- asof_tolerance_click_purchase: the union+window as-of shuffle ~10x
  at flat-ish wall; the n_within scalar is a 1-row broadcast, so no
  SinglePartition window appears at either scale.

Usage: python tools/r11c_rehearsal.py [out_dir] [--build-only|--run-only]
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
    "events_ab_kolmogorov_smirnov",
    "events_cramers_v",
    "agg_spearman_rank_corr",
    "rollup_histogram_quantiles",
    "curate_domain_token_budget",
    "asof_tolerance_click_purchase",
]


def run(out_dir: str) -> None:
    from bench import _stage_totals
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.session import get_spark

    spark = get_spark(
        "r11c-rehearsal",
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
                "shuffle_mb": round((after[0] - before[0]) / 1e6, 3)
                if before and after
                else None,
                "tasks": (after[1] - before[1])
                if before and after
                else None,
            }
            print(
                f"{sf_label:6s} {name:34s} {wall:7.2f}s rows={n} "
                f"shuffle={results[name][sf_label]['shuffle_mb']}MB "
                f"tasks={results[name][sf_label]['tasks']}",
                flush=True,
            )
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "r11c_rehearsal.json",
        ),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = next(
        (a for a in args if not a.startswith("--")), "/tmp/sf1_r11c"
    )
    if "--run-only" not in args:
        t0 = time.time()
        build(out_dir)
        print(f"build: {time.time() - t0:.1f}s", flush=True)
    if "--build-only" in args:
        return
    run(out_dir)


if __name__ == "__main__":
    main()
