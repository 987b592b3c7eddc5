#!/usr/bin/env python
"""Interleaved same-session A/B for the r15 optimization round.

Same methodology as tools/r14b_ab.py (OPTIMIZATION_r14.md): the host
carries multi-x co-tenant noise, so every accept/reject decision runs
OLD and NEW interleaved in ONE warm session, repeat-N, and verifies
result parity (sorted collect compare).

Cases toggle the change under test via module-level hooks so both
shapes run from the same tree.

Usage:
    python tools/r15_ab.py [ivf|simhash|...] [--repeat 5] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(repr(v) for v in r) for r in rows)


def _ab(spark, name, build_a, build_b, repeat):
    pa, pb = _canon(build_a()), _canon(build_b())
    identical = pa == pb
    spark.catalog.clearCache()
    ta, tb = [], []
    build_a().count()
    spark.catalog.clearCache()
    build_b().count()
    spark.catalog.clearCache()
    for _ in range(repeat):
        t0 = time.perf_counter()
        build_a().count()
        ta.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build_b().count()
        tb.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    res = {
        "identical": identical,
        "rows": len(pa),
        "old_median_s": round(statistics.median(ta), 3),
        "new_median_s": round(statistics.median(tb), 3),
        "old_samples": [round(x, 3) for x in ta],
        "new_samples": [round(x, 3) for x in tb],
    }
    print(f"{name}: {json.dumps(res)}", flush=True)
    return res


def case_ivf(spark, repeat):
    """ann_ivf_topk / ann_filtered_cosine_topk: bytes-per-task floor
    at the ivf assignment site (similarity.py) vs full widen
    parallelism — the r14 driver regression (1.93->2.24 s, 8-core run
    faster than 32)."""
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.operators import similarity as sim

    reg = catalog.registry()
    for q in ("ann_ivf_topk", "ann_filtered_cosine_topk"):
        spec = reg[q]
        floor = sim._GEMM_MIN_TASK_BYTES

        def with_floor(spec=spec, floor=floor):
            sim._GEMM_MIN_TASK_BYTES = floor
            return spec.spark_fn(spark, SF_DIR)

        def without_floor(spec=spec, floor=floor):
            # patch only for plan construction; kernels capture the
            # resulting partitioning in the plan
            sim._GEMM_MIN_TASK_BYTES = None
            try:
                return spec.spark_fn(spark, SF_DIR)
            finally:
                sim._GEMM_MIN_TASK_BYTES = floor

        _ab(spark, q, with_floor, without_floor, repeat)


def case_norm(spark, repeat):
    """similarity._normalized: zip_with/array_repeat (norm evaluated
    once per row) vs the old transform form (norm — an O(d) aggregate
    — re-evaluated per ELEMENT)."""
    from pyspark.sql import functions as F

    from scratchdb_spark import queries as catalog
    from scratchdb_spark.operators import similarity as sim

    def _old_normalized(vec_col):
        col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
        n = sim._norm(col)
        return F.transform(col, lambda x: x.cast("double") / n)

    new_impl = sim._normalized
    reg = catalog.registry()
    for q in (
        "ann_ivf_topk",
        "ann_lsh_topk",
        "emb_near_dup_pairs",
        "ann_kmeans_centroids",
        "ann_ivfpq_kmeans_topk",
        "ann_mmr_rerank",
        "ann_filtered_cosine_topk",
        "emb_semdedup_prune",
    ):
        spec = reg[q]

        def old(spec=spec):
            sim._normalized = _old_normalized
            try:
                return spec.spark_fn(spark, SF_DIR)
            finally:
                sim._normalized = new_impl

        def new(spec=spec):
            sim._normalized = new_impl
            return spec.spark_fn(spark, SF_DIR)

        _ab(spark, q, old, new, repeat)


def case_pagerank(spark, repeat):
    """pagerank_int checkpoint thinning (VERDICT r14 item 6): the
    per-iteration localCheckpoint executes a job at plan-construction
    time under AQE (r14 finding); checkpointing every K=4 iterations
    lets the catalog's 3-iteration query fuse into one action."""
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.operators import graph

    spec = catalog.registry()["graph_pagerank_custsupp"]

    def old():
        graph._PAGERANK_CKPT_EVERY = 1
        try:
            return spec.spark_fn(spark, SF_DIR)
        finally:
            graph._PAGERANK_CKPT_EVERY = 4

    def new():
        graph._PAGERANK_CKPT_EVERY = 4
        return spec.spark_fn(spark, SF_DIR)

    _ab(spark, "graph_pagerank_custsupp", old, new, repeat)


CASES = {
    "ivf": case_ivf,
    "norm": case_norm,
    "pagerank": case_pagerank,
}


def main():
    args = sys.argv[1:]
    repeat = 5
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            global SF_DIR
            SF_DIR = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("r15-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from scratchdb_spark.tables import TESTDATA_TABLES, table

    for t in TESTDATA_TABLES:
        try:
            table(spark, SF_DIR, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    for n in names or list(CASES):
        CASES[n](spark, repeat)


if __name__ == "__main__":
    main()
