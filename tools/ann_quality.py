"""ANN quality rehearsal (round-8): recall@k vs the EXACT twin for
the IVFADC pipeline (ivfpq_topk) and the persisted index
(ann_index.query_ann_index) at the sf1-style corpus (20k embeddings:
the 10-copy orthogonal-rotation replication of sf0.1 from
tools/scale_rehearsal.py — rotation preserves intra-copy geometry, so
neighbor structure replicates instead of diluting), swept over
nprobe in {1, 2, 4, 8}.

This is the recall-vs-cost curve a user actually tunes: nprobe
controls what fraction of the code table each query scans
(~nprobe/n_centroids), overfetch the exact re-rank budget. Exact
ground truth = brute_force_topk over the same corpus (quadratic,
fine at 20k; guarded at scale). The persisted index must match the
in-memory pipeline at equal settings — same quantizer rule, same
frozen-codebook encode — so a gap there is a bug, not a tuning
artifact (pytest pins equality separately).

Also reported per nprobe: CELL COVERAGE — the fraction of true
top-k neighbors living in a probed cell, i.e. the recall ceiling
probing alone imposes. On this corpus coverage is ~0.98 at nprobe=1
(corpus-drawn queries share their neighbors' cells), so final recall
is governed by ADC-noise displacement within the fixed re-rank
budget — which is why recall can FALL as nprobe grows at small
overfetch (more probed candidates = more chances for PQ-lucky
impostors to crowd the budget) and why overfetch, not nprobe, is the
recall lever here. On clustered corpora whose neighbors straddle
cells, nprobe buys coverage first — see the clustered-corpus pytest.

Usage: python tools/ann_quality.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_rehearsal import build  # noqa: E402  (sibling tool)

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.operators import ann_index as ai  # noqa: E402
from scratchdb_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivfpq_topk,
)
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse, table  # noqa: E402

K = 10
N_QUERIES = 50
N_CENTROIDS = 64


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        "ann-quality", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf1 = tempfile.mkdtemp(prefix="sf1_annq_")
    build(sf1)
    from pyspark.sql import functions as F

    emb = table(spark, sf1, "embeddings").persist()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    print(f"corpus {n} vectors, {q.count()} queries, k={K}", flush=True)

    exact_rows = brute_force_topk(emb, q, k=K).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_by_q: dict = {}
    for r in exact_rows:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_annq_"))
    snap.append_versioned(wh, "db", "emb", emb)
    ai.build_ann_index(
        wh, "db", "emb", "emb_idx", n_centroids=N_CENTROIDS
    )

    # cell coverage: assignment of every vector + per-query probe
    # order under the SAME deterministic quantizer as the pipeline
    import numpy as np

    from scratchdb_spark.operators.similarity import (
        _coarse_centroids,
        _safe_norms,
    )

    cent_ids, C = _coarse_centroids(
        emb, N_CENTROIDS, "vec_id", "embedding"
    )
    vrows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in vrows])
    V = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in vrows]
    )
    V = V / _safe_norms(V)
    cell = dict(
        zip(ids.tolist(), cent_ids[np.argmax(
            np.round(V @ C.T, 6), axis=1)].tolist())
    )
    qrows = sorted((r["vec_id"], r["embedding"]) for r in q.collect())
    Q = np.array([np.asarray(v, dtype=np.float64) for _, v in qrows])
    Q = Q / _safe_norms(Q)
    order = np.argsort(-np.round(Q @ C.T, 6), axis=1, kind="stable")

    def coverage(nprobe: int) -> float:
        cov = tot = 0
        for qi, (qid, _) in enumerate(qrows):
            probed = set(cent_ids[order[qi, :nprobe]].tolist())
            for nid in exact_by_q[qid]:
                tot += 1
                cov += cell[nid] in probed
        return cov / tot

    rows = []
    for nprobe in (1, 2, 4, 8):
        rec = {
            "nprobe": nprobe,
            "scan_frac": round(nprobe / N_CENTROIDS, 4),
            "cell_coverage": round(coverage(nprobe), 4),
        }
        for ov in (4, 16):
            t0 = time.time()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivfpq_topk(
                    emb, q, k=K, overfetch=ov,
                    n_centroids=N_CENTROIDS, nprobe=nprobe,
                ).collect()
            }
            t_mem = time.time() - t0
            t0 = time.time()
            got_idx = {
                (r["query_id"], r["neighbor_id"])
                for r in ai.query_ann_index(
                    wh, "db", "emb_idx", q, k=K,
                    nprobe=nprobe, overfetch=ov,
                ).collect()
            }
            t_idx = time.time() - t0
            rec[f"recall_ivfpq_ov{ov}"] = round(
                len(got & exact) / len(exact), 4
            )
            rec[f"recall_index_ov{ov}"] = round(
                len(got_idx & exact) / len(exact), 4
            )
            rec[f"wall_ivfpq_ov{ov}_s"] = round(t_mem, 2)
            rec[f"wall_index_ov{ov}_s"] = round(t_idx, 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"n": n, "k": K, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
