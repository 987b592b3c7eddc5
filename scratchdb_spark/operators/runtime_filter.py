"""Bloom-filter runtime join pruning.

The big-side rows that cannot possibly match the join's small side are
dropped BEFORE the join's shuffle: one narrow pass over the small side
builds per-partition bloom bitmaps of its hashed keys (np.bitwise_or
scatter, same mergeable-bitmap pattern as curation.bloom_decontaminate);
the OR-merged bitmap (512 KB at defaults, constant in key cardinality)
broadcasts into a probe kernel over the fact side. Bloom filters have
NO false negatives, so the pruned join returns exactly the plain
join's rows — the catalog query's oracle IS the plain join.

This is the technique behind Spark's own runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.*) implemented as an explicit,
inspectable operator: at 100 TB the win is shuffle bytes — a fact table
joining a 1%-selective dimension ships ~1% of its rows to the exchange
instead of all of them, for the price of two narrow scans and a
half-megabyte broadcast. False positives only cost wasted shuffle rows
(the join itself re-verifies), never wrong results.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _bloom_positions, build_bloom_bitmap
from .dedup import _splitmix_salts

_SEED = 0xF117E4


def bloom_of_keys(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> bytes:
    """OR-merged bloom bitmap of ``xxhash64(key_col)`` over ``dim``.
    Per-partition build, driver merge by bitwise OR (associative ->
    partition-invariant); no shuffle touches the dimension."""
    mul, add = _splitmix_salts(num_hashes, seed=_SEED)
    keys = dim.select(F.xxhash64(F.col(key_col)).alias("h"))
    final = build_bloom_bitmap(
        keys, lambda pdf: pdf["h"].values, num_bits, mul, add
    )
    return final.tobytes()


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bitmap: bytes,
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> DataFrame:
    """Keep only fact rows whose key MAY be in the bloom (no false
    negatives -> joining the result equals joining the full fact).
    One narrow kernel pass; columns pass through unchanged."""
    mul, add = _splitmix_salts(num_hashes, seed=_SEED)
    bc = fact.sparkSession.sparkContext.broadcast(bitmap)
    tagged = fact.withColumn("__kh", F.xxhash64(F.col(key_col)))
    schema = tagged.schema

    def probe(batches):
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf["__kh"].values.astype(np.uint64)
            pos = _bloom_positions(h, mul, add, num_bits)
            hit = (
                bits[pos >> np.uint64(6)]
                >> (pos & np.uint64(63)) & np.uint64(1)
            ).astype(bool).all(axis=1)
            yield pdf[hit]

    return tagged.mapInPandas(probe, schema).drop("__kh")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> DataFrame:
    """Inner equi-join with the fact side bloom-pruned first. Result
    rows are IDENTICAL to ``fact.join(dim, ...)`` — the bloom only
    sheds definite non-matches before the shuffle/broadcast."""
    bm = bloom_of_keys(dim, dim_key, num_bits, num_hashes)
    pruned = bloom_prune(fact, fact_key, bm, num_bits, num_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
