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


def _stage_totals(spark) -> tuple[int, int] | None:
    """Cumulative (shuffle bytes, completed tasks) over all completed
    stages, via the UI REST status API (the bench session enables the
    UI; spark.ui.retainedStages is raised so multi-pass runs never
    evict stages mid-diff). Shuffle bytes = write side only, so each
    shuffle is counted once."""
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    if not url:
        return None
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as resp:
            stages = json.load(resp)
    except Exception:
        return None
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("numCompleteTasks", 0) for s in stages),
    )


def _stage_totals_stable(spark) -> tuple[int, int] | None:
    """_stage_totals, read until two consecutive samples agree: stage
    completion events land on the UI store asynchronously, so a
    single read taken right at a query boundary can attribute a
    late-completing stage to the NEXT query (observed once in r10 as
    a phantom +0.5 MB/+1-task diff on an untouched query). Bounded:
    gives up after ~2 s and returns the last sample."""
    last = _stage_totals(spark)
    for i in range(40):
        if i:  # re-sample immediately first; sleep only if unstable
            time.sleep(0.05)
        cur = _stage_totals(spark)
        if cur == last:
            return cur
        last = cur
    return last


def run_catalog(
    spark, sf_dir: str, stage_metrics: dict[str, dict] | None = None
) -> dict[str, float]:
    """One timed pass over the benchable catalog. When
    ``stage_metrics`` is passed, per-query shuffle bytes and task
    counts (diffs of the cumulative stage totals, REST calls outside
    the timed window) are recorded into it — plan-shape regressions
    (an extra shuffle, a blown-up task count) then separate from
    host-load noise in round-over-round comparisons."""
    times: dict[str, float] = {}
    for name, spec in sorted(catalog.registry().items()):
        if not spec.bench:
            continue
        before = (
            _stage_totals_stable(spark)
            if stage_metrics is not None
            else None
        )
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.count()
        times[name] = round(time.perf_counter() - t0, 4)
        if stage_metrics is not None and before is not None:
            after = _stage_totals_stable(spark)
            if after is not None:
                stage_metrics[name] = {
                    "shuffle_bytes": max(0, after[0] - before[0]),
                    "tasks": max(0, after[1] - before[1]),
                }
        # Operators that persist() intermediates (minhash, simhash, CC)
        # would otherwise accumulate cached blocks across 90+ queries;
        # evict between queries (untimed) so memory stays flat.
        spark.catalog.clearCache()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    # default 3: pass 1 is the recorded warm-up, the per-query MEDIAN
    # over passes 2..N absorbs host-load spikes (PERF.md measured ±3x
    # single-run variance), so round-over-round artifact comparisons
    # don't need a load caveat
    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "3"))
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    spark = get_spark(
        "scratchdb-bench",
        **{
            # UI on for this session only: the REST status API is how
            # per-query shuffle/task metrics are collected
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
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
    stage_metrics: dict[str, dict] = {}
    for i in range(max(1, repeat)):
        t0 = time.perf_counter()
        # stage metrics collected on the LAST planned pass (steady
        # state; REST diffs happen outside the timed window)
        collect = stage_metrics if i + 1 == max(1, repeat) else None
        runs.append(run_catalog(spark, sf_dir, stage_metrics=collect))
        # 240 s: the catalog grew to 196 benchable queries and the
        # COLD first pass alone is ~180 s — a guard at 180 collapsed
        # one r10 run to a single cold pass (reported 186 s instead
        # of the ~130 s steady state). Total budget stays bounded:
        # cold + 2 warm + metric quiesce ~ 500 s.
        if time.perf_counter() - t0 > 240 and i + 1 < repeat:
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
                # per-query {median, min, shuffle_bytes, tasks}: the
                # min separates host noise (median >> min) from plan
                # regressions (shuffle_bytes/tasks moved)
                "detail": {
                    name: {
                        "median": times[name],
                        "min": round(min(r[name] for r in runs), 4),
                        **stage_metrics.get(name, {}),
                    }
                    for name in times
                },
                "warmup_pass": (
                    runs[0] if len(runs) > 1 else None
                ),
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
