#!/usr/bin/env python
"""Round-15 optimization measurement harness.

For each named catalog query (default: the r15 target list), capture
the `.explain("formatted")` plan into plans/r15/<query>_<tag>.txt and
time the query solo (one untimed warm-up execution, then --repeat
timed runs; per-query MEDIAN reported) with per-query shuffle-bytes /
task counts diffed off the UI REST API, exactly like bench.py.

Usage:
    python tools/r15_measure.py --tag before [--repeat 3] [--sf DIR] \
        [--plans-only | --times-only] [query ...]

Writes plans/r15/r15_times_<tag>.json with the timing map.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402

# Top bench cost centers (driver BENCH_r13 medians) + the two queries
# whose plans r13 deliberately changed.
DEFAULT_TARGETS = [
    "graph_pagerank_custsupp",
    "ann_ivfpq_kmeans_topk",
    "ann_ivfpq_adaptive_topk",
    "agg_robust_price_stats",
    "graph_triangle_counts",
    "agg_spearman_rank_corr",
    "dedup_prefix_filter_pairs",
    "dedup_cc_clusters",
    "emb_near_dup_pairs",
    "curate_full_pipeline",
    "dedup_cross_corpus_near_dups",
    "ann_ivf_filtered_topk",
    "warehouse_changes_feed",
    "dedup_simhash_near_pairs",
    "dedup_ngram_span_coverage",
    "dedup_minhash_near_pairs",
    "ann_kmeans_centroids",
    "ann_ivfpq_topk",
    "ann_ivfpq_residual_topk",
    "ann_ivf_topk",
    "rcte_nation_chains",
    "emb_semdedup_prune",
    "text_cms_token_freq",
    "ann_pq_refine_topk",
    "agg_spearman_dup_heavy",
]


def _stage_totals(spark):
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


def _stable(spark):
    last = _stage_totals(spark)
    for i in range(40):
        if i:
            time.sleep(0.05)
        cur = _stage_totals(spark)
        if cur == last:
            return cur
        last = cur
    return last


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    repeat = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_only = times_only = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--plans-only":
            plans_only = True
            i += 1
        elif a == "--times-only":
            times_only = True
            i += 1
        else:
            names.append(a)
            i += 1
    if not names:
        names = DEFAULT_TARGETS

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        "r15-measure",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    reg = catalog.registry()
    missing = [n for n in names if n not in reg]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return sys.exit(2)

    # table-footer + python-worker warm-up (bench.py protocol)
    from scratchdb_spark.tables import TESTDATA_TABLES, table

    for t in TESTDATA_TABLES:
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    times: dict[str, dict] = {}
    for name in names:
        spec = reg[name]
        spark.sparkContext.setJobDescription(f"r15:{name}")
        if not plans_only:
            # untimed warm-up execution (codegen/broadcast init)
            df = spec.spark_fn(spark, sf_dir)
            df.count()
            spark.catalog.clearCache()
            samples = []
            builds = []
            before = _stable(spark)
            for _ in range(repeat):
                t0 = time.perf_counter()
                df = spec.spark_fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.count()
                samples.append(round(time.perf_counter() - t0, 4))
                builds.append(round(t1 - t0, 4))
                spark.catalog.clearCache()
            after = _stable(spark)
            times[name] = {
                "median": round(statistics.median(samples), 4),
                "min": round(min(samples), 4),
                "build_median": round(statistics.median(builds), 4),
                "samples": samples,
                "shuffle_bytes_total": (
                    max(0, after[0] - before[0])
                    if before and after
                    else None
                ),
                "tasks_total": (
                    max(0, after[1] - before[1])
                    if before and after
                    else None
                ),
                "repeat": repeat,
            }
            print(f"{name:42s} median {times[name]['median']:7.3f}s "
                  f"min {times[name]['min']:7.3f}s", flush=True)
        if not times_only:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(out_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    if not plans_only:
        path = os.path.join(out_dir, f"r15_times_{tag}.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing.update(times)
        with open(path, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
