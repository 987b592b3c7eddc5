"""Skew-mitigation utilities.

AQE's skew-join splitting handles joins; for aggregations over heavily
skewed keys the classic fix is two-phase salted aggregation: shuffle 1
distributes each hot key over ``salt_buckets`` partitions (partial
aggs), shuffle 2 merges the per-salt partials. Net effect: no single
reducer owns a hot key's whole row set.

For algebraic aggregates Spark's own partial aggregation already gives
this benefit; the salted form matters for holistic aggregates
(collect_list/percentile) or when partial agg is defeated (e.g. high
cardinality of distinct values per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """count + sum(value) per key via two-phase salted aggregation.
    Output equals a plain groupBy (the oracle checks exactly that)."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(key_col, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__s"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("__n").alias("n"),
        F.round(F.sum("__s"), 2).alias("total"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with manual salt replication — the classic fix
    when one join key dominates the BIG side and the SMALL side is too
    large to broadcast: each big-side row gets a deterministic salt in
    [0, salt_buckets), the small side replicates once per salt value,
    and the join key becomes (key, salt) — a hot key's rows now spread
    over ``salt_buckets`` reducers instead of one.

    The salt derives from xxhash64 of the big side's whole row (via
    monotonically increasing id would break determinism; hashing the
    key alone would put every hot-key row in ONE salt and change
    nothing — so callers MUST pass a frame whose rows are
    distinguishable, and the salt hashes all columns). Fully
    duplicate rows hash to one salt and cannot spread; the rewrite
    that removes the degeneracy is to pre-aggregate duplicates with
    count weights BEFORE the join — implemented at the Spearman call
    site (catalog/analytics._spearman_from_rows, r13: the pair frame
    arrives distinct on its key tuple, so every row hashes
    differently by construction). Result set is EXACTLY the plain
    join's (the oracle checks that): salting redistributes work,
    never rows.

    AQE's skew-join split (on by default in session.py) handles most
    cases at runtime; the manual form matters when AQE can't see the
    skew (e.g. skew introduced by an upstream expansion in the same
    stage) or off-AQE engines. Cost: small side duplicated
    ``salt_buckets`` x — size it so replicated-small still fits a
    shuffle partition.
    """
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
               F.lit(salt_buckets)),
    )
    salts = big.sparkSession.range(salt_buckets).select(
        F.col("id").cast("long").alias("__salt")
    )
    replicated_small = small.crossJoin(F.broadcast(salts))
    return salted_big.join(
        replicated_small, [key_col, "__salt"]
    ).drop("__salt")
