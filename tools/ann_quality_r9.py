"""ANN quantizer rehearsal (round-9): smallest-id vs k-means coarse
quantizer recall at equal (nprobe, overfetch) on a CLUSTERED corpus
with sequential ids — the regime the r8 recall curve flagged (nothing
balances cells on clustered corpora when the smallest ids bunch into
one cluster, the common case for ingest-ordered corpora).

Fixture: 16 seeded gaussian clusters x 250 vectors (dim 32), ids
sequential per cluster, so all 16 smallest-id centroids land in
cluster 0. Ground truth = brute_force_topk (quadratic, fine at 4k).
For each nprobe we report per-quantizer: probe CELL COVERAGE (the
recall ceiling the quantizer alone imposes) and end recall@10 for the
in-memory pipeline and the persisted index (built with the same
quantizer= knob; must match the pipeline exactly — equality is
pytest-pinned separately, this records the curve).

Usage: python tools/ann_quality_r9.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.operators import ann_index as ai  # noqa: E402
from scratchdb_spark.operators.similarity import (  # noqa: E402
    _coarse_centroids,
    _safe_norms,
    brute_force_topk,
    ivfpq_topk,
)
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402

K = 10
N_CLUSTERS = 16
PER_CLUSTER = 250
DIM = 32
N_CENTROIDS = 16
OVERFETCH = 16


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        "ann-quality-r9", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for ci in range(N_CLUSTERS):
        P = centers[ci] + 0.12 * rng.normal(size=(PER_CLUSTER, DIM))
        for j in range(PER_CLUSTER):
            rows.append(
                (ci * PER_CLUSTER + j, [float(x) for x in P[j]])
            )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()
    n = emb.count()
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % PER_CLUSTER == 99)  # 1/cluster
    print(f"corpus {n}, {q.count()} queries, k={K}", flush=True)

    exact_rows = brute_force_topk(emb, q, k=K).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_by_q: dict = {}
    for r in exact_rows:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows])
    Vn = V / _safe_norms(V)
    idlist = ids.tolist()

    indexes = {}
    for quant in ("smallest_id", "kmeans"):
        wh = Warehouse(spark, tempfile.mkdtemp(prefix=f"wh_{quant}_"))
        snap.append_versioned(wh, "db", "emb", emb)
        t0 = time.time()
        ai.build_ann_index(
            wh, "db", "emb", "emb_idx",
            n_centroids=N_CENTROIDS, quantizer=quant,
        )
        indexes[quant] = (wh, round(time.time() - t0, 2))

    out_rows = []
    for nprobe in (1, 2, 4):
        rec: dict = {"nprobe": nprobe, "overfetch": OVERFETCH}
        for quant in ("smallest_id", "kmeans"):
            cent_ids, C = _coarse_centroids(
                emb, N_CENTROIDS, "vec_id", "embedding",
                quantizer=quant,
            )
            cell = dict(zip(idlist, cent_ids[np.argmax(
                np.round(Vn @ C.T, 6), axis=1)].tolist()))
            cov = tot = 0
            for qid, nbrs in exact_by_q.items():
                qi = idlist.index(qid)
                order = np.argsort(
                    -np.round(Vn[qi] @ C.T, 6), kind="stable"
                )[:nprobe]
                probed = set(cent_ids[order].tolist())
                for nid in nbrs:
                    tot += 1
                    cov += cell[nid] in probed
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivfpq_topk(
                    emb, q, k=K, overfetch=OVERFETCH,
                    n_centroids=N_CENTROIDS, nprobe=nprobe,
                    quantizer=quant,
                ).collect()
            }
            wh, build_s = indexes[quant]
            got_idx = {
                (r["query_id"], r["neighbor_id"])
                for r in ai.query_ann_index(
                    wh, "db", "emb_idx", q, k=K,
                    nprobe=nprobe, overfetch=OVERFETCH,
                ).collect()
            }
            rec[f"coverage_{quant}"] = round(cov / tot, 4)
            rec[f"recall_{quant}"] = round(
                len(got & exact) / len(exact), 4
            )
            rec[f"recall_index_{quant}"] = round(
                len(got_idx & exact) / len(exact), 4
            )
            rec[f"build_s_{quant}"] = build_s
        out_rows.append(rec)
        print(json.dumps(rec), flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "n": n,
                    "k": K,
                    "n_centroids": N_CENTROIDS,
                    "fixture": "16 seeded clusters x 250, "
                               "sequential ids (smallest ids all in "
                               "cluster 0)",
                    "rows": out_rows,
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
