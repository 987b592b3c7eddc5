#!/usr/bin/env python
"""Ingest-path throughput measurement (reproducible; numbers quoted in
PERF.md).

Times the two halves of the reference's ingest pipeline separately:
- API half (pure Python, per-request): parse -> flatten -> stamp
  __row_id -> buffer (api/data.go:74-153 equivalent)
- worker half (Spark): whole-batch type vote -> create/evolve ->
  aligned distributed append (workers/workers.go:64-116 equivalent)

Usage: python tools/ingest_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark.ingest.pipeline import IngestPipeline  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402


def synth_doc(i: int) -> dict:
    return {
        "user": {"id": i, "name": f"user-{i}", "plan": "pro" if i % 3 else "free"},
        "event": "click" if i % 2 else "view",
        "value": i * 0.25,
        "tags_0": "a",
        "meta": {"ua": "curl/8", "geo": {"country": "US", "zip": str(10000 + i % 90000)}},
        "active": bool(i % 5),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        pipe = IngestPipeline(spark, Warehouse(spark, root))

        bodies = [
            json.dumps([synth_doc(i + j) for j in range(100)])
            for i in range(0, n, 100)
        ]
        t0 = time.perf_counter()
        rows = sum(pipe.insert("db", "t", b) for b in bodies)
        t_api = time.perf_counter() - t0

        t0 = time.perf_counter()
        pipe.flush()
        t_worker = time.perf_counter() - t0

        count = spark.read.parquet(os.path.join(root, "db", "t")).count()
        assert count == rows == n, (count, rows, n)

        # distributed worker half (append_ndjson_file -> append_lines_df),
        # measured COLD (first Spark Python-UDF job of the path: worker
        # pool spin-up + broadcast + codegen) and WARM (steady state —
        # the rate a continuously-ingesting stream actually sustains,
        # since the worker pool and codegen cache persist across
        # micro-batches). The cold/warm gap is per-SESSION fixed cost,
        # not per-batch.
        ndjson = os.path.join(root, "batch.ndjson")
        with open(ndjson, "w", encoding="utf-8") as fh:
            for i in range(n):
                fh.write(json.dumps(synth_doc(i)) + "\n")
        t0 = time.perf_counter()
        pipe.append_ndjson_file("db", "t2", ndjson)
        t_dist_cold = time.perf_counter() - t0
        assert spark.read.parquet(os.path.join(root, "db", "t2")).count() == n
        t0 = time.perf_counter()
        pipe.append_ndjson_file("db", "t3", ndjson)
        t_dist_warm = time.perf_counter() - t0
        assert spark.read.parquet(os.path.join(root, "db", "t3")).count() == n

        print(json.dumps({
            "rows": n,
            "api_half_rows_per_sec": round(n / t_api),
            "worker_half_driver_rows_per_sec": round(n / t_worker),
            "worker_half_distributed_cold_rows_per_sec": round(n / t_dist_cold),
            "worker_half_distributed_warm_rows_per_sec": round(n / t_dist_warm),
            "end_to_end_rows_per_sec": round(n / (t_api + t_worker)),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
