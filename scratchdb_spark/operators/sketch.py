"""Mergeable frequency sketches: count-min over token streams.

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

    parts = toks.mapInPandas(build, "cms binary").collect()
    merged = np.zeros((depth, width), dtype=np.int64)
    for r in parts:
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
