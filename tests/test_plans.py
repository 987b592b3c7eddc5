"""Plan-shape audit over the whole query catalog.

Correctness tests prove the numbers; these prove the PLANS stay
scalable: no query may silently regress into a cross product or a
row-level nested-loop join, because at 100 TB that plan shape is the
difference between "finishes" and "never finishes". Queries that are
intentionally quadratic (exact baselines for approximate operators,
deliberate cross/theta joins, block-level pair enumeration) are
allowlisted with the reason inline.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scratchdb_spark import queries as catalog

from conftest import SF_DIR

# name -> why a nested-loop/cartesian is acceptable there
ALLOWED_NESTED_LOOP = {
    # deliberate cross/theta joins (the operator IS the cross product)
    "join_cross_region_segment": "cross join is the query's semantics",
    "join_theta_nation_pairs": "non-equi theta join on tiny dims",
    # exact quadratic baselines for approximate operators
    "text_ngram_jaccard_pairs": "exact quadratic jaccard baseline",
    "ann_cosine_topk": "exact brute-force baseline; query batch broadcast",
    "ann_filtered_cosine_topk": (
        "exact scoring over a predicate-shrunk corpus; query batch "
        "broadcast — the filter bounds the pair count, and the scale "
        "path is lsh/ivf over the same filtered corpus"
    ),
    # block-LEVEL pair join: rows are pre-packed blocks, so the
    # nested-loop touches B(B+1)/2 block rows, never row pairs
    "emb_near_dup_pairs": "block-pair enumeration over packed blocks",
    # scalar subquery / literal-joined singles (1-row broadcast side)
    "subq_scalar_above_avg_price": "1-row scalar subquery join",
    "q15_top_supplier": "1-row max-revenue join",
    "q11_important_parts": "1-row global-fraction threshold join",
    "text_tfidf_top_terms": "1-row corpus-size (N) join",
    "q17_small_qty_revenue": "scalar threshold join",
    "q22_idle_rich_customers": "1-row avg-balance join",
    "ann_ivf_topk": "centroid table is a collected constant",
    "text_bm25_topk": "1-row (N, avgdl) corpus-stats join",
    "text_bigram_pmi": "1-row (n_tok, n_big) corpus-total joins",
    "split_temporal_cutoff": "1-row time-span cutoff scalar join",
    "warehouse_rollback": "1-row state agg x 1-row CDC-count agg",
    "join_salted_user_totals": (
        "deliberate bounded replication: small side x 8-row broadcast "
        "salt table IS the salted-join technique"
    ),
    "search_rrf_hybrid": (
        "BM25 1-row corpus-stats join + exact-cosine baseline with a "
        "1-row broadcast query batch; fusion itself joins two top-k "
        "lists"
    ),
    "text_unigram_logprob": "1-row (corpus_tokens, vocab) totals join",
    "approx_kmv_segment_overlap": (
        "1x1 join of two single-sketch rows (<= k longs each); the "
        "set algebra runs on constant-size arrays"
    ),
    "sketch_topk_heavy_hitters": (
        "1-row global error-bound aggregate joined onto the <= k "
        "surviving heavy-hitter rows (topk_sketch's crossJoin of the "
        "summed prune decrements)"
    ),
    "sketch_topk_weighted": (
        "same 1-row error-bound crossJoin as sketch_topk_heavy_hitters"
    ),
    "ann_mmr_rerank": (
        "exact-cosine candidate stage broadcasts the 10-row query "
        "batch (brute_force_topk's guarded crossJoin); the MMR "
        "selection itself is per-query over <= pool rows"
    ),
    "events_entropy": (
        "1-row total-count broadcast joined onto the per-class "
        "counts (category-cardinality rows)"
    ),
    "events_cramers_v": (
        "1-row total-count broadcast joined onto the ~20-cell "
        "contingency table (category-bounded, never event-bounded)"
    ),
    "events_theils_u": (
        "1-row total-count broadcast joined onto the ~20-cell "
        "contingency table and its category-bounded marginals "
        "(same machinery as events_cramers_v)"
    ),
    "events_contingency_coef": (
        "1-row total-count broadcast joined onto the ~20-cell "
        "contingency table (the cramersV chi2 fold, different "
        "normalization)"
    ),
    "asof_tolerance_click_purchase": (
        "1-row global-count broadcast joined onto the as-of rows "
        "(replaced the r1-r10 partitionless count-OVER() window)"
    ),
}


@pytest.mark.parametrize(
    "spec",
    list(catalog.registry().values()),
    ids=list(catalog.registry().keys()),
)
def test_no_accidental_cross_products(spark, spec):
    df = spec.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        tok
        for tok in ("CartesianProduct", "BroadcastNestedLoopJoin")
        if tok in plan
    ]
    if bad and spec.name not in ALLOWED_NESTED_LOOP:
        raise AssertionError(
            f"{spec.name}: plan contains {bad} and is not allowlisted; "
            f"either fix the join or document why it's safe.\n{plan[:2000]}"
        )


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Same-bucketed tables must join with zero shuffle AND zero sort:
    the write-time layout replaces both."""
    from scratchdb_spark.operators.bucketing import bucketed_join, write_bucketed
    from scratchdb_spark.tables import table

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "bktest.orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "bktest.lineitem_b", "o_orderkey", 8)
    try:
        joined = bucketed_join(
            spark, "bktest.orders_b", "bktest.lineitem_b", "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:1500]}"
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
        # NB: a per-bucket Sort remains — Spark 3+ ignores write-time
        # sortBy at read unless
        # spark.sql.legacy.bucketedTableScan.outputOrdering=true; the
        # shuffle elimination is the scale win, the residual sort is
        # per-bucket and spills bounded.
        # sanity: same answer as the plain join
        expected = (
            table(spark, sf_dir, "orders")
            .join(
                table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
        spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
        spark.sql("DROP DATABASE IF EXISTS bktest")


def test_date_partitioned_scan_prunes(spark, sf_dir):
    from scratchdb_spark.operators.bucketing import write_date_partitioned
    from scratchdb_spark.tables import table

    spark.sql("CREATE DATABASE IF NOT EXISTS bktest2")
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    write_date_partitioned(ev, "bktest2.events_p", "ts")
    try:
        one_day = spark.table("bktest2.events_p").filter(
            F.col("part_date") == "2024-01-03"
        )
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(part_date" in plan
        # pruning must actually reduce the partition count
        total = spark.table("bktest2.events_p").count()
        day = one_day.count()
        assert 0 < day < total
    finally:
        spark.sql("DROP TABLE IF EXISTS bktest2.events_p")
        spark.sql("DROP DATABASE IF EXISTS bktest2")


def test_q1_scan_is_pruned_and_pushed(spark):
    """Spot-check the headline query's scan: filter pushed to parquet,
    only referenced columns read."""
    spec = catalog.registry()["q1_pricing_summary"]
    df = spec.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThanOrEqual(l_shipdate" in plan
    # ReadSchema must not include unreferenced wide columns
    assert "l_comment" not in plan


def test_udtf_chunk_windows_filter_below_udtf(spark):
    """The doc_id predicate must reach the parquet scan BELOW the
    ArrowEvalPythonUDTF (r14b): written as a top-level WHERE, Spark 4
    left it above the UDTF and Python chunked every document — 96% of
    the UDTF output discarded (plans/r14/udtf_chunk_windows_before.txt,
    measured 0.99 s -> 0.26 s). The subquery form pins the pushdown."""
    spec = catalog.registry()["udtf_chunk_windows"]
    df = spec.spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(doc_id,200)" in plan  # pushed to the scan
    assert "ArrowEvalPythonUDTF" in plan  # still the UDTF surface


def test_lsh_candidate_dedup_carries_no_vectors(spark, sf_dir):
    """lsh_topk's candidate discovery must shuffle KEYS ONLY (r14b):
    the pre-change plan ran the (query_id, neighbor_id) dedup with
    first(q_vec)/first(c_vec) aggregates, shipping ~1 KB of vectors
    per candidate through the exchange and broadcasting the corpus
    explode WITH vectors; vectors now re-attach once per side after
    dedup (measured: per-run shuffle 5.2 MB -> 0.6 MB, results
    bit-identical vs the golden fixture)."""
    from scratchdb_spark.operators.similarity import lsh_topk
    from scratchdb_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    df = lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "first(q_vec" not in plan
    assert "first(c_vec" not in plan


@pytest.mark.parametrize("n_probe", [100, 5000])
def test_dedup_probe_plans_files_bounded_by_probe(
    spark, tmp_path, n_probe
):
    """Saturation contract of operators/dedup_index.py as an
    EXECUTABLE assertion (r12 verdict item 6), pinned at two
    granularities — below and ABOVE the historical 4096-hash cap
    whose full-scan fallback was the r12 weak: a probe whose band
    hashes all live in ONE file's zone-map range must plan a handful
    of files no matter how many the index has, and that must hold for
    a 5000-value IN-list exactly as it does for 100 (r13: the
    _EqValues-normalized manifest pass replaced the above-cap
    read-everything branch in dedup_index.py)."""
    import math

    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators import dedup_index as di
    from scratchdb_spark.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(12)))
            for i in range(400)
        ],
        "doc_id long, text string",
    )
    snap.append_versioned(wh, "db", "docs", docs)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh", n_files=64)
    v = snap.versions(wh, "db", "docs_lsh")[-1]
    m = snap._manifest(wh, "db", "docs_lsh", v)
    stats = m["stats"]
    n_total = len(m["files"])
    assert n_total >= 32  # the fixture is genuinely multi-file

    # the file with the lowest recorded band_hash min is the probe
    # target; every probe value lands inside ITS [mn, mx]
    ranged = [
        (name, stats[name]["band_hash"])
        for name in m["files"]
        if stats.get(name, {}).get("band_hash") is not None
    ]
    assert len(ranged) == n_total  # zone maps recorded everywhere
    target, (mn, mx) = min(ranged, key=lambda p: p[1][0])
    assert mx > mn
    real = [
        r["band_hash"]
        for r in snap.read_snapshot(wh, "db", "docs_lsh")
        .filter(
            (F.col("band_hash") >= mn) & (F.col("band_hash") <= mx)
        )
        .select("band_hash")
        .distinct()
        .limit(40)
        .collect()
    ]
    assert real  # the range really holds data
    values = set(real)
    k = 1
    while len(values) < n_probe:
        values.add(mn + (mx - mn) * k // (n_probe + 1))
        k += 1
    values = sorted(values)[:n_probe]
    assert len(values) == n_probe
    if n_probe > 4096:
        assert len(values) > di._PRUNE_MAX_HASHES  # the above-cap leg

    planned = snap._plan_files(
        wh, "db", "docs_lsh", m, None, ("band_hash", values)
    )
    # the regression pin: pruning is ALIVE at every probe size — a
    # range-confined probe plans the target file (+ boundary
    # neighbors at most), never the corpus
    assert target in planned
    assert 1 <= len(planned) <= 8 < n_total
    # the verdict-quoted contract shapes, as executable math
    assert len(planned) <= n_probe
    assert len(planned) <= math.ceil(n_probe / 4096) * 4096


def test_rank_frame_consumers_have_no_planner_estimated_joins(
    spark, sf_dir
):
    """r12 verdict item 5 (r13): audit every consumer of the
    prefix-bucket rank/cumulative construction for a join-back or
    broadcast that trusts PLANNER ESTIMATES rather than a proven
    cardinality. Audit outcome, pinned executable: the Spearman rank
    join is the ONLY value-keyed join-back off this construction
    (its strategy is diag-proven — broadcast under the budget, salted
    above; test_spearman_rank_join_strategies_agree pins the flip);
    every OTHER consumer folds its cum frame directly into an
    aggregate, and the construction's one internal join
    (prefix_sum.py's >1024-bucket offset frame) is an explicit
    F.broadcast over n_final_buckets rows. So these plans must
    contain NO SortMergeJoin / ShuffledHashJoin — any appearing is a
    new planner-trusted join that needs its own proof."""
    from scratchdb_spark.catalog.analytics import (
        agg_quantile_exact_weighted,
        events_longtail_cum_dist,
        rollup_histogram_quantiles,
    )
    from scratchdb_spark.catalog.curation_queries import (
        curate_domain_token_budget,
    )
    from scratchdb_spark.catalog.lakehouse_misc import (
        events_ab_kolmogorov_smirnov,
        events_ab_mann_whitney,
    )

    for fn in (
        events_ab_mann_whitney,
        agg_quantile_exact_weighted,
        events_ab_kolmogorov_smirnov,
        rollup_histogram_quantiles,
        curate_domain_token_budget,
        events_longtail_cum_dist,
    ):
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan, fn.__name__
        assert "ShuffledHashJoin" not in plan, fn.__name__
