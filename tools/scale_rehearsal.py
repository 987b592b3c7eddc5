#!/usr/bin/env python
"""10x scale rehearsal (VERDICT r6 item #6): generate a ~sf1 dataset
from sf0.1 and run the slowest catalog queries at both scales,
recording wall clock and shuffle bytes — one order-of-magnitude
datapoint that either validates the linear-scaling claims
(shuffle_bytes ~10x, wall sub-linear on 32 cores) or surfaces a
super-linear pathology while it is cheap. Results go into PERF.md.

Scaling recipe (deterministic, workload-preserving):
- lineitem / orders: 10 key-shifted copies — group sizes and join
  fan-outs scale 10x, the graph's edge count scales 10x.
- documents: 10 id-shifted copies, each under a copy-specific Caesar
  rotation of the letters. Rotation preserves intra-copy shingle
  structure EXACTLY (every near-dup pair appears once per copy) while
  making cross-copy shingles disjoint — so near-dup pair counts scale
  10x, not the ~100x a verbatim replication would produce (every doc
  would near-dup its own 9 clones).
- embeddings: 10 id-shifted copies under copy-specific random
  ORTHOGONAL rotations (QR of seeded gaussians). A rotation applied
  to both vectors of a pair preserves cosine exactly (intra-copy
  geometry identical), while cross-copy cosines become random
  projections ~N(0, 1/dim) — far below any near-dup threshold — so
  pair counts scale 10x. (Coordinate sign-flips were tried first and
  left ~10x TOO MANY cross-copy pairs: the synthetic clusters have
  axis-aligned structure a diagonal +-1 transform preserves.)
- region/nation/customer/supplier/part/events: copied as-is (dims).

Usage: python tools/scale_rehearsal.py [out_dir] [--build-only|--run-only]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
KEY_SHIFT = 10_000_000

# the 10 slowest sf-dependent benchable queries of BENCH_r06
# (warehouse_changes_feed is excluded: it builds its own fixed tiny
# warehouse, so sf_dir does not scale it)
SLOWEST = [
    "graph_pagerank_custsupp",
    "agg_robust_price_stats",
    "dedup_prefix_filter_pairs",
    "dedup_cc_clusters",
    "dedup_cross_corpus_near_dups",
    "dedup_ngram_span_coverage",
    "dedup_minhash_near_pairs",
    "emb_near_dup_pairs",
    "dedup_simhash_near_pairs",
    "ann_kmeans_centroids",
]

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part", "events"]


def _caesar(text_col: pa.ChunkedArray, shift: int) -> pa.Array:
    """Per-copy letter rotation: a->a+shift (mod 26), case-preserving,
    non-letters untouched. Vectorized via numpy over the utf-8 bytes
    of each string (documents are ASCII-ish synthetic text)."""
    out = []
    for chunk in text_col.chunks:
        pdf = chunk.to_pandas()
        rotated = []
        for s in pdf:
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).copy()
            lower = (b >= 97) & (b <= 122)
            upper = (b >= 65) & (b <= 90)
            b[lower] = 97 + (b[lower] - 97 + shift) % 26
            b[upper] = 65 + (b[upper] - 65 + shift) % 26
            rotated.append(b.tobytes().decode("utf-8", "ignore"))
        out.append(pa.array(rotated, type=pa.string()))
    return pa.chunked_array(out)


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    for t, keys in (
        ("lineitem", ["l_orderkey"]),
        ("orders", ["o_orderkey"]),
    ):
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for j in range(COPIES):
            cols = {}
            for name in tbl.schema.names:
                col = tbl[name]
                if name in keys and j > 0:
                    col = pa.chunked_array(
                        [
                            pa.compute.add(c, j * KEY_SHIFT)
                            for c in col.chunks
                        ]
                    )
                cols[name] = col
            parts.append(pa.table(cols, schema=tbl.schema))
        pq.write_table(
            pa.concat_tables(parts), f"{out_dir}/{t}.parquet"
        )

    docs = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for j in range(COPIES):
        cols = {
            "doc_id": pa.chunked_array(
                [pa.compute.add(c, j * KEY_SHIFT) for c in docs["doc_id"].chunks]
            )
            if j > 0
            else docs["doc_id"],
            "text": _caesar(docs["text"], j) if j > 0 else docs["text"],
            "lang": docs["lang"],
            "source": docs["source"],
            "n_chars": docs["n_chars"],
        }
        parts.append(pa.table(cols, schema=docs.schema))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    V = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
    labels = emb["label"]
    dim = V.shape[1]
    rng = np.random.default_rng(20240814)
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
                        list(W),
                        type=pa.list_(pa.float32()),
                    ),
                    "label": labels,
                },
                schema=emb.schema,
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/embeddings.parquet")


def run(out_dir: str) -> None:
    from scratchdb_spark import queries as catalog
    from scratchdb_spark.session import get_spark

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _stage_totals  # reuse the REST stage-diff probe

    spark = get_spark(
        "scale-rehearsal",
        **{
            # UI on: the REST status API provides per-query shuffle
            # bytes (same probe bench.py uses)
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1", out_dir)):
        for name in SLOWEST:
            spec = reg[name]
            # warm-up pass (plan + caches), then the timed pass: the
            # comparison should see steady-state compute, not the
            # first-job fixed costs bench.py's repeat-median absorbs
            spec.spark_fn(spark, sf_dir).count()
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
                "shuffle_mb": round(
                    (after[0] - before[0]) / 1e6, 1
                )
                if before and after
                else None,
            }
            print(
                f"{sf_label:6s} {name:32s} {wall:7.2f}s "
                f"rows={n} shuffle={results[name][sf_label]['shuffle_mb']}MB",
                flush=True,
            )
    print(json.dumps(results, indent=1))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_dir = next(
        (a for a in args if not a.startswith("--")),
        "/root/repo/.sf1_rehearsal",
    )
    if "--run-only" not in args:
        t0 = time.perf_counter()
        build(out_dir)
        print(f"built {out_dir} in {time.perf_counter() - t0:.1f}s")
    if "--build-only" not in args:
        run(out_dir)


if __name__ == "__main__":
    main()
