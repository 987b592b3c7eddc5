#!/usr/bin/env python
"""Headline-query benchmark. Prints ONE short JSON line:

    {"metric": "catalog_total_wall", "value": N, "unit": "sec",
     "queries": {<headline subset>}, "sf": ..., "n_queries": 92,
     "detail": "BENCH.json"}

and writes the FULL per-query timing map to BENCH.json next to this
file.  The printed line is kept deliberately short (<1 KB): the
per-round driver captures only the tail of stdout, and rounds 1-2
produced `parsed: null` because the full 92-query JSON line overflowed
that capture window (BENCH_r01/r02.json `tail` starts mid-line).

Runs every catalog query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per-query time is
the full plan+execute wall clock, materialized via a count-style
collect of the result.  $SPARK_GRAFT_REPEAT (or --repeat N) > 1 runs
the whole catalog N times and reports the per-query MEDIAN — host
timing variance was measured at up to ±3x (PERF.md).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402

# Representative queries inlined in the printed line (one per family:
# TPC-H agg/join breadth, dedup, ANN, text, streaming-ish, UDF).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q21_lone_returning_supplier",
    "dedup_minhash_near_pairs",
    "dedup_cc_clusters",
    "dedup_simhash_near_pairs",
    "ann_ivf_topk",
    "emb_near_dup_pairs",
    "text_tfidf_top_terms",
    "sessionize_events",
    "range_join_click_purchase",
    "udf_resample_daily",
    "dedup_prefix_filter_pairs",
    "graph_pagerank_custsupp",
    "search_rrf_hybrid",
    "pipeline_curate_corpus",
]


def run_catalog(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name, spec in sorted(catalog.registry().items()):
        if not spec.bench:
            continue
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.count()
        times[name] = round(time.perf_counter() - t0, 4)
        # Operators that persist() intermediates (minhash, simhash, CC)
        # would otherwise accumulate cached blocks across 90+ queries;
        # evict between queries (untimed) so memory stays flat.
        spark.catalog.clearCache()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    # default 2: per-query medians absorb host-load spikes (PERF.md
    # measured ±3x single-run variance), so round-over-round artifact
    # comparisons don't need a load caveat
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "2"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    spark = get_spark("scratchdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (untimed): touch every table's parquet footer and start
    # the Arrow/Python UDF workers, so the first timed query measures
    # itself rather than session/codegen/worker init.
    from scratchdb_spark.tables import TESTDATA_TABLES, table

    for t in TESTDATA_TABLES:
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    # Time-budget guard: the repeat pass halves timing noise but must
    # not push the driver's capture window past its timeout — if one
    # catalog pass already took >180 s (loaded host / bigger sf), the
    # median isn't worth risking a lost artifact.
    runs = []
    for i in range(max(1, repeat)):
        t0 = time.perf_counter()
        runs.append(run_catalog(spark, sf_dir))
        if time.perf_counter() - t0 > 180 and i + 1 < repeat:
            repeat = len(runs)
            break
    # With more than one pass, the FIRST is warm-up only: a query's
    # first execution pays per-plan codegen/broadcast/checkpoint init
    # that steady state never sees (measured: cc_clusters 10.6 s cold
    # vs 2.7 s warm), and a median over [cold, warm] still carries
    # half the cold cost. Report steady-state medians.
    timed = runs[1:] if len(runs) > 1 else runs
    times = {
        name: round(statistics.median(r[name] for r in timed), 4)
        for name in timed[0]
    }

    total = round(sum(times.values()), 4)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "repeat": repeat,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
            },
            f,
            indent=1,
            sort_keys=True,
        )

    headline = {n: times[n] for n in HEADLINE if n in times}
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "sf": sf,
                "n_queries": len(times),
                "detail": "BENCH.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
