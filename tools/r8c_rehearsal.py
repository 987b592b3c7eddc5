#!/usr/bin/env python
"""10x scale rehearsal for the round-8 third-session operators
(triangle counting, positional phrase search, distributed PCA, EWMA
fold, weighted topK, MMR re-rank, KMV sketch-state maintenance):
generate a ~sf1 dataset from sf0.1 that scales exactly the structures
these operators touch, run each at both scales, and record wall clock
and shuffle bytes — the same order-of-magnitude check
tools/scale_rehearsal.py gave the dedup/ANN families.

Scaling recipe (deterministic, workload-preserving):
- events: 10 copies with user_id/event_id shifted AND the props item
  key shifted (k + j*1000). The first recipe (users shifted, items
  shared) was a measured mistake kept for the record: shared
  (item, day) cells got 10x denser, the quadratic-per-cell pair
  expansion produced a ~100x edge count and a 9,400x wedge shuffle
  (25 GB, 517 s vs 3.4 s — r8c_rehearsal_v1 in PERF.md). Shifting
  the item space keeps every cell at its sf0.1 density, so edges
  and triangles scale ~10x — the workload-preserving form. Per-user
  EWMA sequences are preserved exactly either way.
- lineitem: 10 l_orderkey-shifted copies with l_partkey SHARED —
  weighted-topK totals scale 10x at unchanged item NDV.
- documents: 10 id-shifted UNROTATED copies — phrase occurrences and
  posting-list sizes scale exactly 10x (scale_rehearsal's Caesar
  rotation would translate the probe phrase out of 9 copies).
- embeddings: 10 id-shifted copies under copy-specific orthogonal
  rotations (same recipe as scale_rehearsal) — PCA sees 10x rows at
  the same dimension; MMR candidate pools stay per-query-bounded.

Usage: python tools/r8c_rehearsal.py [out_dir] [--build-only|--run-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
KEY_SHIFT = 10_000_000

QUERIES = [
    "graph_triangle_counts",
    "text_phrase_search",
    "emb_pca_project",
    "ts_ewma_user_value",
    "sketch_topk_weighted",
    "ann_mmr_rerank",
]


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    ev = pq.read_table(f"{SRC}/events.parquet")
    props_pd = ev["props"].to_pandas()
    parts = []
    for j in range(COPIES):
        cols = {}
        for name in ev.schema.names:
            col = ev[name]
            if name in ("user_id", "event_id") and j > 0:
                col = pa.chunked_array(
                    [pc.add(c, j * KEY_SHIFT) for c in col.chunks]
                )
            elif name == "props" and j > 0:
                # shift the item key space so per-(item, day) cells
                # keep their sf0.1 density (see module docstring)
                shifted = props_pd.str.replace(
                    r'"k": (\d+)',
                    lambda m, _j=j: f'"k": {int(m.group(1)) + _j * 1000}',
                    regex=True,
                )
                col = pa.chunked_array([pa.array(shifted)])
            cols[name] = col
        parts.append(pa.table(cols, schema=ev.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    parts = []
    for j in range(COPIES):
        cols = {}
        for name in li.schema.names:
            col = li[name]
            if name == "l_orderkey" and j > 0:
                col = pa.chunked_array(
                    [pc.add(c, j * KEY_SHIFT) for c in col.chunks]
                )
            cols[name] = col
        parts.append(pa.table(cols, schema=li.schema))
    pq.write_table(
        pa.concat_tables(parts), f"{out_dir}/lineitem.parquet"
    )

    docs = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for j in range(COPIES):
        cols = {
            name: (
                pa.chunked_array(
                    [
                        pc.add(c, j * KEY_SHIFT)
                        for c in docs[name].chunks
                    ]
                )
                if name == "doc_id" and j > 0
                else docs[name]
            )
            for name in docs.schema.names
        }
        parts.append(pa.table(cols, schema=docs.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    V = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
    dim = V.shape[1]
    rng = np.random.default_rng(20260815)
    parts = []
    for j in range(COPIES):
        if j > 0:
            R, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            W = (V @ R.astype(np.float32)).astype(np.float32)
        else:
            W = V
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + j * KEY_SHIFT),
                    "embedding": pa.array(
                        list(W), type=pa.list_(pa.float32())
                    ),
                    "label": emb["label"],
                },
                schema=emb.schema,
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")

    # dims the catalog may register but these queries don't scale on
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")


def run(out_dir: str) -> None:
    from bench import _stage_totals
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.session import get_spark

    spark = get_spark(
        "r8c-rehearsal",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1", out_dir)):
        for name in QUERIES:
            spec = reg[name]
            spec.spark_fn(spark, sf_dir).count()  # warm-up
            spark.catalog.clearCache()
            before = _stage_totals(spark)
            t0 = time.perf_counter()
            n = spec.spark_fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            after = _stage_totals(spark)
            spark.catalog.clearCache()
            results.setdefault(name, {})[sf_label] = {
                "wall": round(wall, 2),
                "rows": n,
                "shuffle_mb": round((after[0] - before[0]) / 1e6, 2)
                if before and after
                else None,
            }
            print(
                f"{sf_label:6s} {name:28s} {wall:7.2f}s rows={n} "
                f"shuffle={results[name][sf_label]['shuffle_mb']}MB",
                flush=True,
            )
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "r8c_rehearsal.json",
        ),
        "w",
    ) as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


def main() -> None:
    args = sys.argv[1:]
    out_dir = next(
        (a for a in args if not a.startswith("--")),
        "/root/repo/.r8c_sf1",
    )
    if "--run-only" not in args:
        t0 = time.perf_counter()
        build(out_dir)
        print(f"built {out_dir} in {time.perf_counter() - t0:.1f}s")
    if "--build-only" not in args:
        run(out_dir)


if __name__ == "__main__":
    main()
