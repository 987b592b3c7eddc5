"""Distributed PCA over an embedding column — the dimensionality-
reduction step of a training-data pipeline (compact vectors before ANN
indexing / clustering; OPQ-style rotations train the same way).

The reference (scratchdata/ScratchDB) has no vector surface at all —
its query path is SQL pass-through (pkg/api/data.go:58-72) — this is a
driver north-star extension (BASELINE.json: similarity search over an
embedding column at 100 TB).

Scale shape: PCA on n x d embeddings with small d (64-4096) never
needs a distributed eigensolve — the d x d Gram matrix is KB-MB sized.
The distributed work is ONE pass accumulating per-partition partial
sums (sum_x, sum_xx^T), shuffled as at most `partitions x d(d+1)/2`
tiny rows; the eigendecomposition of the d x d covariance runs on the
driver (the same split FAISS uses for its PCAMatrix training, public
design). Projection is a second map-only pass — no shuffle at all.

Determinism across partitionings is load-bearing (golden-fixture
oracle): float partial sums reorder under repartitioning, so the
kernel quantizes components to SCALED INTEGERS (1e6) and accumulates
int64 matmuls per Arrow batch, Python bigints across batches, then
merges partials under an exact decimal(38,0) aggregate — integer
addition is associative, so the covariance matrix (and therefore the
eigenbasis) is bit-identical for ANY partitioning. Eigenvector sign is
fixed by making each component's largest-|.|, smallest-index entry
positive.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project"]

_SCALE = 10**6


def pca_fit(
    corpus: DataFrame,
    n_components: int = 4,
    vec_col: str = "embedding",
):
    """One distributed pass -> (mean, components, explained_var_ratio).

    Returns numpy arrays: mean (d,), components (n_components, d) as
    rows sorted by descending eigenvalue (ties impossible up to exact
    degeneracy; order then fixed by eigenvalue index), and the
    explained-variance ratios. Driver state is O(d^2) — KBs for any
    realistic embedding width, independent of corpus size.
    """
    if n_components < 1:
        raise ValueError("n_components must be >= 1")
    src = corpus.select(F.col(vec_col).alias("v"))

    def partials(batches):
        d = None
        sx = None  # Python-int vector
        sxx = None  # Python-int matrix (upper triangle kept exact)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            if np.abs(V).max() > 16:
                # fixed-point headroom: |q| <= 1.6e7 keeps a 10k-row
                # Arrow batch's int64 product sums under 2^63/3
                raise ValueError(
                    "pca_fit expects roughly unit-scale embeddings "
                    "(|component| <= 16); rescale the column first"
                )
            Q = np.rint(V * _SCALE).astype(np.int64)
            if d is None:
                d = Q.shape[1]
                sx = [0] * d
                sxx = [[0] * d for _ in range(d)]
            # int64 matmul: |q| <= ~2^30 per cell (unit-ish inputs
            # times 1e6), so a 10k-row batch's products stay far
            # under 2^63; cross-batch sums go through Python bigints
            G = Q.T @ Q
            s = Q.sum(axis=0)
            for i in range(d):
                sx[i] += int(s[i])
                row = G[i]
                ri = sxx[i]
                for j in range(d):
                    ri[j] += int(row[j])
            n += len(Q)
        if n:
            yield pd.DataFrame(
                [
                    (i, j, Decimal(sxx[i][j]), Decimal(sx[i]), n)
                    for i in range(d)
                    for j in range(d)
                ],
                columns=["i", "j", "sxx", "sx", "n"],
            )

    pt = (
        src.mapInPandas(
            partials,
            "i int, j int, sxx decimal(28,0), sx decimal(28,0), n long",
        )
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("sxx").cast("decimal(38,0)")).alias("sxx"),
            F.sum(F.col("sx").cast("decimal(38,0)")).alias("sx"),
            F.sum("n").alias("n"),
        )
    )
    rows = pt.collect()
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    d = max(r["i"] for r in rows) + 1
    SXX = np.zeros((d, d))
    SX = np.zeros(d)
    n_total = 0
    for r in rows:
        SXX[r["i"], r["j"]] = float(r["sxx"])
        if r["j"] == 0:
            SX[r["i"]] = float(r["sx"])
            if r["i"] == 0:
                n_total = int(r["n"])
    if n_total < 2:
        raise ValueError("pca_fit: need >= 2 vectors")
    mean_s = SX / n_total  # scaled-int units
    cov = (SXX / n_total - np.outer(mean_s, mean_s)) / (_SCALE**2)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    # deterministic sign: largest-|.| (smallest index on ties) entry
    # of each component made positive
    for c in comps:
        idx = int(np.argmax(np.abs(np.round(c, 12))))
        if c[idx] < 0:
            c *= -1.0
    total_var = float(np.trace(cov))
    evr = (
        evals[order] / total_var
        if total_var > 0
        else np.zeros(len(order))
    )
    return mean_s / _SCALE, comps, evr


def pca_project(
    corpus: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Map-only projection onto the fitted basis: one output column
    per principal component (pc1..pcp, `round_dp`-rounded doubles —
    scalar cells hash-compare cleanly). Zero shuffle; the d x p basis
    rides the closure (KBs)."""
    mu = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64).T  # d x p
    p = W.shape[1]
    cols = [f"pc{i + 1}" for i in range(p)]

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            P = np.round((V - mu) @ W, round_dp)
            out = pd.DataFrame({"vec_id": pdf["vid"].values})
            for i, c in enumerate(cols):
                out[c] = P[:, i]
            yield out

    src = corpus.select(
        F.col(id_col).cast("long").alias("vid"),
        F.col(vec_col).alias("v"),
    )
    schema = "vec_id long, " + ", ".join(f"{c} double" for c in cols)
    return src.mapInPandas(project, schema)
