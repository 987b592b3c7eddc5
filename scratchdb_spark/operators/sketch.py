"""Mergeable sketches: count-min over token streams, KMV/theta for
distinct counts with set algebra.

The build is the cheapest aggregation shape Spark can run: one narrow
scan computes a PER-PARTITION count-min matrix inside a vectorized
mapInPandas kernel (np.add.at scatter), and the fixed-size partials
(depth x width x 8 bytes, 256 KB at defaults) collect to the driver
and ADD together. Integer addition is associative and commutative, so
the merged sketch is bit-identical under ANY partitioning — the same
determinism contract as the repo's decimal/HLL aggregates. No shuffle
ever touches the token stream.

At 100 TB this replaces a vocabulary-sized groupBy with constant
state: per-day (or per-shard) sketches persist as KBs and MERGE by
matrix addition — the incremental-rollup form of term counting, the
CMS analogue of approx_hll_sketch_union's estimate-from-merged-state
pattern (Cormode & Muthukrishnan 2005). Point queries are O(depth).

Companions in the catalog: text_heavy_hitters (exact twin for top
tokens), approx_hll_sketch_union (distinct-count sketch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _splitmix_salts, widen
from .text import _tokens


def _cms_positions(h: np.ndarray, mul, add, width: int) -> np.ndarray:
    """(n,) uint64 token hashes -> (n, depth) column positions."""
    x = h[:, None] * mul[None, :] + add[None, :]
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return x & np.uint64(width - 1)


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 8192,
) -> np.ndarray:
    """Merged (depth, width) int64 count-min sketch of the corpus's
    token stream. Tokens are xxhash64'd JVM-side (engine-consistent
    with every other text operator); the kernel only ever sees longs.
    """
    if width & (width - 1):
        raise ValueError("width must be a power of two")
    mul, add = _splitmix_salts(depth, seed=0xC0DE5)

    toks = widen(df.select(F.col(text_col))).select(
        F.explode(_tokens(F.col(text_col))).alias("tok")
    ).select(F.xxhash64("tok").alias("h"))

    def build(batches):
        counts = np.zeros((depth, width), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf["h"].values.astype(np.uint64)
            pos = _cms_positions(h, mul, add, width)
            for d in range(depth):
                np.add.at(counts[d], pos[:, d].astype(np.int64), 1)
        yield pd.DataFrame({"cms": [counts.tobytes()]})

    def merge(batches):
        acc = np.zeros(depth * width, dtype=np.int64)
        for pdf in batches:
            for b in pdf["cms"]:
                acc += np.frombuffer(b, dtype=np.int64)
        yield pd.DataFrame({"cms": [acc.tobytes()]})

    # two-level merge: P per-partition matrices reduce executor-side in
    # ~sqrt(P) groups (integer addition is associative/commutative, so
    # the result is partition-invariant); the driver sums <= sqrt(P)
    # matrices instead of P — the same driver-funnel fix as
    # build_bloom_bitmap
    import math

    partials = toks.mapInPandas(build, "cms binary")
    n_parts = toks.rdd.getNumPartitions()
    groups = max(1, math.isqrt(n_parts))
    if groups > 1:
        partials = partials.repartition(groups).mapInPandas(
            merge, "cms binary"
        )
    merged = np.zeros((depth, width), dtype=np.int64)
    for r in partials.collect():
        merged += np.frombuffer(r["cms"], dtype=np.int64).reshape(
            depth, width
        )
    return merged


def cms_token_frequency(
    df: DataFrame,
    tokens: list[str],
    text_col: str = "text",
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point-query the corpus CMS for a fixed token list.

    Output: (tok, est_n) — est_n >= the true count always (counters
    only over-count on hash collisions), within eps = e/width of the
    stream length with probability 1 - e^-depth. Deterministic and
    partition-invariant, so the golden-fixture oracle snapshots it;
    the exact twin for the hot tokens is text_heavy_hitters.
    """
    spark = df.sparkSession
    cms = cms_build(df, text_col=text_col, depth=depth, width=width)
    mul, add = _splitmix_salts(depth, seed=0xC0DE5)

    # hash the query tokens with the ENGINE's xxhash64, not a Python
    # reimplementation, so probe keys match the build exactly
    qh = (
        spark.createDataFrame([(t,) for t in tokens], "tok string")
        .select("tok", F.xxhash64("tok").alias("h"))
        .collect()
    )
    h = np.array([r["h"] for r in qh], dtype=np.int64).astype(np.uint64)
    pos = _cms_positions(h, mul, add, width)
    est = np.min(
        np.stack([cms[d][pos[:, d].astype(np.int64)] for d in range(depth)]),
        axis=0,
    )
    rows = [
        (r["tok"], int(e)) for r, e in zip(qh, est)
    ]
    return spark.createDataFrame(rows, "tok string, est_n long")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) distinct sketch
# ---------------------------------------------------------------------------
#
# Keep the k smallest distinct xxhash64 values per group. theta = the
# k-th smallest hash mapped to [0, 1); the sketch "sees" exactly the
# distinct values hashing below theta, so distinct ~= (k-1) / theta
# (Bar-Yossef et al. 2002; Dasu et al.'s KMV form). Unlike HLL the
# retained sample supports SET ALGEBRA: union = merge + re-truncate,
# intersection = common survivors below min(theta_a, theta_b) scaled
# by 1/theta — the theta-sketch operations (Dasgupta et al., "Theta
# sketch framework").
#
# Scale shape (all built-ins, no kernels): one map-side-combined
# distinct on (key, hash) — the only shuffle that touches the data —
# then a per-key top-k window over the distinct hashes. State per key
# afterwards is <= k longs, so sketches persist as small arrays and
# MERGE without rescanning, the same incremental-rollup contract as
# the HLL/CMS partials. Deterministic: xxhash64 is seed-fixed and the
# k-minima of a set don't depend on partitioning or arrival order.


def _theta(kmv_col, n_col, k: int):
    """theta in (0, 1]: 1.0 while the sketch is exact (fewer than k
    distinct values seen), else the k-th smallest hash normalized.
    Signed-long order IS unsigned order after the +2^63 shift, so the
    sort stays JVM-native and normalization is (h/2^64) + 0.5."""
    kth = F.element_at(kmv_col, k).cast("double")
    return F.when(
        n_col < F.lit(k), F.lit(1.0)
    ).otherwise(kth / F.lit(2.0**64) + F.lit(0.5))


def _estimate(kmv_col, n_col, k: int):
    """Distinct-count estimate: exact below k, else (k-1)/theta."""
    return F.when(
        n_col < F.lit(k), n_col.cast("double")
    ).otherwise(F.lit(float(k - 1)) / _theta(kmv_col, n_col, k))


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-key KMV sketch: (key, kmv array<long> of <= k sorted
    hashes, n_mins, theta, est_distinct)."""
    from pyspark.sql.window import Window

    distinct = (
        df.select(
            F.col(key_col).alias("key"),
            F.xxhash64(F.col(value_col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("h")
    mins = (
        distinct.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("key")
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).alias("n_mins"),
        )
    )
    return mins.select(
        "key",
        "kmv",
        "n_mins",
        _theta(F.col("kmv"), F.col("n_mins"), k).alias("theta"),
        _estimate(F.col("kmv"), F.col("n_mins"), k).alias("est_distinct"),
    )


def kmv_merge_pair(sketches: DataFrame, key_a, key_b, k: int = 256):
    """Union + intersection estimates for two sketch rows.

    Returns one row: (est_a, est_b, est_union, est_intersect). Union
    re-truncates the merged minima to k; intersection counts common
    survivors below theta = min(theta_a, theta_b) and scales by
    1/theta. All array work is on <= 2k elements — driver-free and
    constant-size regardless of the underlying cardinalities."""
    a = sketches.filter(F.col("key") == key_a).select(
        F.col("kmv").alias("kmv_a"),
        F.col("n_mins").alias("n_a"),
        F.col("theta").alias("theta_a"),
        F.col("est_distinct").alias("est_a"),
    )
    b = sketches.filter(F.col("key") == key_b).select(
        F.col("kmv").alias("kmv_b"),
        F.col("n_mins").alias("n_b"),
        F.col("theta").alias("theta_b"),
        F.col("est_distinct").alias("est_b"),
    )
    j = a.crossJoin(b)  # 1 x 1: two single-sketch rows

    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("kmv_a", "kmv_b"))), 1, k
    )
    n_merged = F.least(
        F.size(F.array_distinct(F.concat("kmv_a", "kmv_b"))), F.lit(k)
    ).cast("long")
    theta_min = F.least("theta_a", "theta_b")
    # unsigned threshold back in signed-long space: hashes below
    # theta_min are those with (h/2^64 + 0.5) < theta_min
    common_below = F.size(
        F.filter(
            F.array_intersect("kmv_a", "kmv_b"),
            lambda h: (h.cast("double") / F.lit(2.0**64) + F.lit(0.5))
            < theta_min,
        )
    )
    return j.select(
        F.round("est_a", 1).alias("est_a"),
        F.round("est_b", 1).alias("est_b"),
        F.round(_estimate(merged, n_merged, k), 1).alias("est_union"),
        F.round(common_below.cast("double") / theta_min, 1).alias(
            "est_intersect"
        ),
    )


# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving top-k heavy hitters
# ---------------------------------------------------------------------------
#
# ClickHouse's topK()/topKWeighted() (the reference's backend dialect;
# CH docs describe it as Filtered Space-Saving, Metwally et al. 2005)
# re-expressed as the MERGEABLE Misra-Gries summary (Agarwal et al.,
# "Mergeable Summaries", PODS 2012): each partition keeps at most
# `capacity` bounded counters, pruning by subtracting the
# (capacity+1)-th largest count whenever the table overflows; partials
# MERGE by per-item count addition, and the summed prune decrements
# give a single additive error bound `err` valid for EVERY item:
#
#     est_n <= true count <= est_n + err,       err <= N / (capacity+1)
#
# so any item whose true count exceeds `err` is guaranteed present in
# the merged summary — the classic frequent-items guarantee.
#
# Scale shape: one narrow scan; the raw item stream is never shuffled.
# Partials are <= capacity+1 rows per partition (KBs), the only
# shuffle is the groupBy over <= capacity * P partial rows, and the
# global decrement total rides a 1-row aggregate broadcast. With
# capacity >= the per-partition distinct count the summary never
# prunes and the result is EXACT with err = 0 — the regime the
# hash-checked catalog query pins; the approximate regime's bounds are
# pinned by pytest under adversarial repartitioning.


def _mg_prune(cnt: dict, capacity: int) -> int:
    """Misra-Gries overflow step: subtract the (capacity+1)-th largest
    count from every counter, drop the non-positive ones. Returns the
    decrement applied (0 when the table already fits)."""
    if len(cnt) <= capacity:
        return 0
    counts = sorted(cnt.values(), reverse=True)
    cstar = counts[capacity]
    for item in [i for i, c in cnt.items() if c <= cstar]:
        del cnt[item]
    for item in cnt:
        cnt[item] -= cstar
    return cstar


def topk_sketch(
    items: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Top-k heavy hitters of `items[item_col]` (one row per
    occurrence) with deterministic per-item error bounds.

    Output: (item string, est_n long, err long), the k largest by
    est_n (ties broken on the item) — est_n is a LOWER bound on the
    true count and est_n + err an upper bound, with `err` shared by
    all items (sum of every partition's prune decrements).

    Memory is bounded DURING accumulation, not just at emit: the
    per-partition counter table prunes whenever it exceeds 4x
    capacity, so a partition with unbounded distinct items holds at
    most 4 * capacity counters at any instant.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    src = items.select(F.col(item_col).cast("string").alias("item"))

    def partials(batches):
        cnt: dict = {}
        dec = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vc = pdf["item"].dropna().value_counts()
            for item, c in vc.items():
                cnt[item] = cnt.get(item, 0) + int(c)
            if len(cnt) > 4 * capacity:
                dec += _mg_prune(cnt, capacity)
        dec += _mg_prune(cnt, capacity)
        yield pd.DataFrame(
            {
                "item": list(cnt.keys()) + [None],
                "est": list(cnt.values()) + [0],
                "dec": [0] * len(cnt) + [dec],
            }
        )

    pt = src.mapInPandas(partials, "item string, est long, dec long")
    merged = (
        pt.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est_n"))
    )
    total_dec = pt.agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("err")
    )
    return (
        merged.crossJoin(total_dec)  # 1-row global error bound
        .orderBy(F.desc("est_n"), F.asc("item"))
        .limit(k)
        .select("item", "est_n", "err")
    )


def topk_weighted_sketch(
    items: DataFrame,
    item_col: str,
    weight_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Weighted top-k heavy hitters (ClickHouse topKWeighted parity):
    items ranked by SUM of an integer weight column instead of row
    count — same mergeable Misra-Gries summary as `topk_sketch`, with
    counter increments of `weight` and the overflow prune subtracting
    the (capacity+1)-th largest weighted count (the weighted
    Space-Saving generalization, Metwally et al. 2005, public
    literature).

    Output: (item string, est_w long, err long) — est_w is a LOWER
    bound on the true weighted count, est_w + err an upper bound,
    `err` = the summed prune decrements (<= W/(capacity+1) for total
    weight W). Weights are cast to BIGINT JVM-side before the kernel:
    integer accumulation keeps partials exact and merge-order
    invariant (float weights would drift under repartitioning).
    Negative weights are rejected (they would break the lower-bound
    invariant). Memory stays bounded during accumulation exactly as
    in topk_sketch (prune at 4x capacity).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    src = items.select(
        F.col(item_col).cast("string").alias("item"),
        F.col(weight_col).cast("long").alias("w"),
    )

    def partials(batches):
        cnt: dict = {}
        dec = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.dropna()
            if (pdf["w"] < 0).any():
                raise ValueError(
                    "topk_weighted_sketch: negative weights break "
                    "the Misra-Gries lower-bound invariant"
                )
            ws = pdf.groupby("item")["w"].sum()
            for item, w in ws.items():
                cnt[item] = cnt.get(item, 0) + int(w)
            if len(cnt) > 4 * capacity:
                dec += _mg_prune(cnt, capacity)
        dec += _mg_prune(cnt, capacity)
        yield pd.DataFrame(
            {
                "item": list(cnt.keys()) + [None],
                "est": list(cnt.values()) + [0],
                "dec": [0] * len(cnt) + [dec],
            }
        )

    pt = src.mapInPandas(partials, "item string, est long, dec long")
    merged = (
        pt.where(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").alias("est_w"))
    )
    total_dec = pt.agg(
        F.coalesce(F.sum("dec"), F.lit(0)).alias("err")
    )
    return (
        merged.crossJoin(total_dec)  # 1-row global error bound
        .orderBy(F.desc("est_w"), F.asc("item"))
        .limit(k)
        .select("item", "est_w", "err")
    )
