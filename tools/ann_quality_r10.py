"""ANN adaptive-overfetch rehearsal (round 10, verdict item #5).

The r9 curve (ann_quality_r9.json) showed recall FALLING as nprobe
grows at a fixed k*overfetch re-rank budget: newly probed cells add
impostors that crowd true neighbors out of the fixed global top under
the APPROXIMATE ADC order, so the exact refine never sees them. The
r10 fix (`adaptive_overfetch=True`) keeps k*overfetch candidates per
(query, probed cell): probe lists are prefix-nested and each cell's
top is independent of the others, so the candidate set grows
monotonically with nprobe and exact-refined recall is provably
monotone non-decreasing (see similarity._adc_candidates).

This tool records recall-vs-nprobe for BOTH quantizers
(smallest_id / kmeans) x BOTH budget modes (fixed / adaptive) on BOTH
fixtures:

- "clustered": 16 seeded gaussian clusters x 250 (dim 32), ids
  sequential per cluster — the r9 fixture where crowding was measured;
- "uniform": 4000 vectors near-uniform on the sphere — the synthetic-
  testdata regime (no cluster structure; raw encoding's home turf).

It asserts the adaptive curves are monotone non-decreasing in nprobe
at equal k and that fixed-vs-adaptive agree at nprobe=1 (one probed
cell: per-cell and global budgets coincide). Ground truth =
brute_force_topk (quadratic — fine at 4k).

Usage: python tools/ann_quality_r10.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scratchdb_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivfpq_topk,
)
from scratchdb_spark.session import get_spark  # noqa: E402

K = 10
DIM = 32
N_CENTROIDS = 16
OVERFETCH = 4  # small on purpose: crowding must be visible
NPROBES = (1, 2, 4, 8, 16)


def make_clustered(rng):
    centers = rng.normal(size=(16, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci in range(16):
        P = centers[ci] + 0.12 * rng.normal(size=(250, DIM))
        for j in range(250):
            rows.append((ci * 250 + j, [float(x) for x in P[j]]))
    return rows


def make_uniform(rng):
    V = rng.normal(size=(4000, DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return [(i, [float(x) for x in V[i]]) for i in range(4000)]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        "ann-quality-r10", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    fixtures = {
        "clustered": make_clustered(rng),
        "uniform": make_uniform(rng),
    }
    report = {"k": K, "overfetch": OVERFETCH,
              "n_centroids": N_CENTROIDS, "fixtures": {}}
    for fname, rows in fixtures.items():
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).persist()
        n = emb.count()
        q = emb.filter(F.col("vec_id") % 250 == 99)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, q, k=K).collect()
        }
        curves: dict = {}
        for quant in ("smallest_id", "kmeans"):
            for mode, adaptive in (("fixed", False), ("adaptive", True)):
                curve = []
                for nprobe in NPROBES:
                    t0 = time.time()
                    got = {
                        (r["query_id"], r["neighbor_id"])
                        for r in ivfpq_topk(
                            emb, q, k=K, overfetch=OVERFETCH,
                            n_centroids=N_CENTROIDS, nprobe=nprobe,
                            quantizer=quant,
                            adaptive_overfetch=adaptive,
                        ).collect()
                    }
                    curve.append(
                        {
                            "nprobe": nprobe,
                            "recall": round(len(got & exact) / len(exact), 4),
                            "wall_s": round(time.time() - t0, 2),
                        }
                    )
                curves[f"{quant}_{mode}"] = curve
                print(
                    f"{fname} {quant} {mode}: "
                    + " ".join(
                        f"np{c['nprobe']}={c['recall']}" for c in curve
                    ),
                    flush=True,
                )
        # contract checks
        for quant in ("smallest_id", "kmeans"):
            ad = [c["recall"] for c in curves[f"{quant}_adaptive"]]
            fx = [c["recall"] for c in curves[f"{quant}_fixed"]]
            assert all(
                b >= a - 1e-9 for a, b in zip(ad, ad[1:])
            ), f"{fname}/{quant}: adaptive curve not monotone: {ad}"
            assert abs(ad[0] - fx[0]) < 1e-9, (
                f"{fname}/{quant}: nprobe=1 fixed {fx[0]} != "
                f"adaptive {ad[0]}"
            )
        # overfetch sweep at nprobe=1 (kmeans): when the quantizer
        # aligns cells with clusters, every true neighbor is in the
        # FIRST probed cell and recall is bounded by ADC ranking
        # within it — nprobe adds nothing (the flat adaptive curve);
        # the per-cell budget k*OVERFETCH is the knob that raises
        # that ceiling. Record the curve so the trade is measured,
        # not asserted.
        of_curve = []
        for of in (2, 4, 8, 16, 32):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivfpq_topk(
                    emb, q, k=K, overfetch=of,
                    n_centroids=N_CENTROIDS, nprobe=1,
                    quantizer="kmeans", adaptive_overfetch=True,
                ).collect()
            }
            of_curve.append(
                {
                    "overfetch": of,
                    "recall": round(len(got & exact) / len(exact), 4),
                }
            )
        print(
            f"{fname} kmeans np1 overfetch sweep: "
            + " ".join(
                f"of{c['overfetch']}={c['recall']}" for c in of_curve
            ),
            flush=True,
        )
        rec_of = [c["recall"] for c in of_curve]
        assert all(
            b >= a - 1e-9 for a, b in zip(rec_of, rec_of[1:])
        ), f"{fname}: overfetch curve not monotone: {rec_of}"
        report["fixtures"][fname] = {
            "n": n,
            "curves": curves,
            "kmeans_np1_overfetch_sweep": of_curve,
        }
        emb.unpersist()

    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    print("OK: adaptive curves monotone on both fixtures", flush=True)


if __name__ == "__main__":
    main()
