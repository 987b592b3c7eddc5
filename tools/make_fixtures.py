#!/usr/bin/env python
"""Generate golden-fixture oracles for the deterministic-but-not-
SQL-portable catalog queries (engine-specific hashes, sketches,
mapInPandas kernels — see queries._fixture_oracle).

For each fixture query and each driver-checked sf dir:
  1. run the Spark implementation TWICE and assert the outputs are
     identical (run-to-run determinism gate — a fixture snapshotted
     from a nondeterministic query would be a flaky oracle);
  2. tag the rows with that sf's `events` row count (`sf_tag`), the
     discriminator the static oracle SQL recovers via
     `(SELECT count(*) FROM events)`;
  3. concatenate all sfs into fixtures/<name>.parquet (single file,
     written with pyarrow so Spark's exact Arrow types are preserved).

Usage: python tools/make_fixtures.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402

FIXTURE_NAMES = [
    "approx_distinct_quantiles",
    "dedup_simhash_clusters",
    "dedup_simhash_near_pairs",
    "ann_lsh_topk",
    "multimodal_fake_features",
    "approx_hll_sketch_union",
    "ann_kmeans_centroids",
    "curate_bloom_decontaminate",
    "rollup_incremental_distinct",
    "text_cms_token_freq",
    "approx_kmv_segment_overlap",
    "ann_pq_topk",
    "ann_pq_refine_topk",
    "ann_ivfpq_topk",
    "ann_index_incremental",
    "ann_ivfpq_residual_topk",
    "emb_pca_project",
    "ann_mmr_rerank",
    "ann_ivfpq_kmeans_topk",
    "ann_ivfpq_adaptive_topk",
    "ts_lttb_downsample",
]

DEFAULT_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def _canon(tbl: pa.Table) -> list[tuple]:
    rows = [tuple(r.values()) for r in tbl.to_pylist()]
    return sorted(rows, key=repr)


def main() -> None:
    args = sys.argv[1:]
    only = [a.split("=", 1)[1] for a in args if a.startswith("--only=")]
    sf_dirs = [a for a in args if not a.startswith("--only=")] or DEFAULT_SF_DIRS
    names = [n for n in FIXTURE_NAMES if not only or n in only]
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    spark = get_spark("make-fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    reg = catalog.registry()

    for name in names:
        parts: list[pa.Table] = []
        for sf_dir in sf_dirs:
            from scratchdb_spark.tables import table

            sf_tag = table(spark, sf_dir, "events").count()
            t1 = reg[name].spark_fn(spark, sf_dir).toArrow()
            spark.catalog.clearCache()
            t2 = reg[name].spark_fn(spark, sf_dir).toArrow()
            spark.catalog.clearCache()
            if _canon(t1) != _canon(t2):
                raise SystemExit(
                    f"{name} @ {sf_dir}: NOT deterministic run-to-run; "
                    "refusing to snapshot a flaky oracle"
                )
            tagged = t1.append_column(
                "sf_tag", pa.array([sf_tag] * t1.num_rows, pa.int64())
            )
            parts.append(tagged)
            print(f"{name} @ {sf_dir}: {t1.num_rows} rows (sf_tag={sf_tag})")
        out = pa.concat_tables(parts)
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        pq.write_table(out, path)
        print(f"  -> {path} ({out.num_rows} rows total)")


if __name__ == "__main__":
    main()
