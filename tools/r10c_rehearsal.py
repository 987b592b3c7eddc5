#!/usr/bin/env python
"""10x scale rehearsal for the round-10 operators (salted
balance_classes under a dominant label, the exact-moment A/B tests,
entropy, exact weighted quantile, the adjacent-pair sequenceNextNode):
reuse r8c_rehearsal's workload-preserving ~sf1 build and record wall +
shuffle bytes at both scales, through the same per-column-hash
consumption r9c established (bare count() lets Catalyst prune rank
windows and under-report shuffle ~20x).

What the numbers must show:
- split_balance_classes_skewed: shuffle ~10x (phase 1 ships the md5
  key through the salted exchange) but spread over (label, salt)
  partitions — the dominant label NEVER concentrates in one task
  (the r9 weak this round fixed); wall flat-ish at 32 cores.
- events_ab_welch_ttest / events_entropy: map-side-combined
  aggregates — shuffle ~KBs and FLAT in scale (partials per
  partition, not per row).
- events_ab_mann_whitney / agg_quantile_exact_weighted: grouped
  counts per DISTINCT metric value — shuffle bounded by value
  cardinality (491 / 11 rows), flat in scale; the cumulative window
  runs over those rows only.
- events_sequence_next_after_pair: one user-keyed window shuffle,
  ~10x bytes at ~flat wall (same shape as the funnel family).

Usage: python tools/r10c_rehearsal.py [out_dir] [--build-only|--run-only]
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
    "split_balance_classes_skewed",
    "events_ab_welch_ttest",
    "events_ab_mann_whitney",
    "events_entropy",
    "agg_quantile_exact_weighted",
    "events_sequence_next_after_pair",
    # round-10 continuation additions:
    # - delta_sum: one user-keyed window shuffle, ~10x bytes flat wall
    # - max_concurrent_sessions: user-keyed sessionize shuffle ~10x;
    #   the endpoint sweep rides day-bucket partitioned windows whose
    #   offsets collect is constant (same time span at both scales)
    # - span_rewrite: chunk explode/groupBy ~10x (the replicated docs
    #   are 10-way duplicated text, so the rewrite also demonstrates
    #   mass removal: every shifted copy collapses to '')
    "events_delta_sum_value",
    "events_max_concurrent_sessions",
    "dedup_span_rewrite",
    # interval union length: same sessionize shuffle as
    # max_concurrent_sessions plus the bucket-boundary lead lookup
    "events_interval_length_sum",
    # lttb: one user-keyed shuffle into 64 hash buckets, Python cost
    # bounded by per-bucket series share -> ~10x bytes, flat-ish wall
    "ts_lttb_downsample",
    # filtered IVF: the semi-join filter shrinks candidates BEFORE
    # exact scoring, so shuffle grows sub-linearly vs the corpus
    "ann_ivf_filtered_topk",
]


def run(out_dir: str) -> None:
    from bench import _stage_totals
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.session import get_spark

    spark = get_spark(
        "r10c-rehearsal",
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
            "r10c_rehearsal.json",
        ),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = next(
        (a for a in args if not a.startswith("--")), "/tmp/sf1_r10c"
    )
    if "--run-only" not in args:
        t0 = time.time()
        build(out_dir)
        print(f"built {out_dir} in {time.time() - t0:.1f}s", flush=True)
    if "--build-only" not in args:
        run(out_dir)


if __name__ == "__main__":
    main()
