#!/usr/bin/env python
"""Interleaved same-session A/B for the r14 second-pass optimizations.

The r14 methodology note (OPTIMIZATION_r14.md §Methodology) showed
back-to-back solo runs on this host disagree by multi-x factors, so
every accept/reject decision runs OLD and NEW interleaved in ONE warm
session, repeat-N, and also verifies the two result frames are
IDENTICAL (sorted collect compare) — the parity half of the evidence.

"OLD" is the pre-change implementation copied verbatim into this
harness (the package keeps only the new form); "NEW" calls the
package operator.

Usage:
    python tools/r14b_ab.py [embpairs|lsh|udtf|semdedup ...] \
        [--repeat 5] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.pandas.functions import pandas_udf  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import table  # noqa: E402


def _canon(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(repr(v) for v in r) for r in rows)


def _ab(spark, name, build_a, build_b, repeat):
    """Interleave A and B executions; verify result parity once."""
    pa, pb = _canon(build_a()), _canon(build_b())
    identical = pa == pb
    ta, tb = [], []
    # warm both shapes once (codegen/broadcast first-read costs)
    build_a().count()
    build_b().count()
    spark.catalog.clearCache()
    for _ in range(repeat):
        t0 = time.perf_counter()
        build_a().count()
        ta.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build_b().count()
        tb.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    res = {
        "identical": identical,
        "rows": len(pa),
        "old_median_s": round(statistics.median(ta), 3),
        "new_median_s": round(statistics.median(tb), 3),
        "old_samples": [round(x, 3) for x in ta],
        "new_samples": [round(x, 3) for x in tb],
    }
    print(f"{name}: {json.dumps(res)}", flush=True)
    return res


# ---------------------------------------------------------------- embpairs


def _old_cosine_pairs_above(df, threshold, id_col="vec_id",
                            vec_col="embedding", block_size=2048,
                            max_rows=1_000_000):
    """Pre-change form: fixed 2048 block + AQE-coalescible
    repartition(cols) — copied verbatim from similarity.py @ af20264."""
    from scratchdb_spark.operators.guards import refuse_quadratic
    from scratchdb_spark.operators.similarity import _norm

    base = df
    refuse_quadratic(base, max_rows, "cosine_pairs_above", "lsh")
    n = _norm(F.col(vec_col))
    normed = base.select(
        F.col(id_col).cast("long").alias("pid"),
        F.transform(vec_col, lambda x: x.cast("double") / n).alias("v"),
    )
    blocks = (
        normed.withColumn(
            "blk", F.floor(F.col("pid") / F.lit(block_size)).cast("long")
        )
        .groupBy("blk")
        .agg(F.sort_array(F.collect_list(F.struct("pid", "v"))).alias("items"))
        .select(
            "blk",
            F.transform("items", lambda s: s["pid"]).alias("ids"),
            F.transform("items", lambda s: s["v"]).alias("vecs"),
        )
    )
    a = blocks.select(
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    tasks = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(
        "blk_a", "blk_b"
    )
    eps = 1e-7

    def kernel(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.array([np.asarray(v) for v in row.vecs_a])
                B = np.array([np.asarray(v) for v in row.vecs_b])
                S = A @ B.T
                if row.blk_a == row.blk_b:
                    iu, ju = np.triu_indices(len(ids_a), k=1)
                    keep = S[iu, ju] >= threshold - eps
                    iu, ju = iu[keep], ju[keep]
                else:
                    iu, ju = np.nonzero(S >= threshold - eps)
                yield pd.DataFrame(
                    {
                        "id_a": ids_a[iu],
                        "id_b": ids_b[ju],
                        "raw_cos": S[iu, ju],
                    }
                )

    out = tasks.mapInPandas(kernel, "id_a long, id_b long, raw_cos double")
    return out.select(
        "id_a", "id_b", F.round("raw_cos", 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def ab_embpairs(spark, sf_dir, repeat):
    from scratchdb_spark.operators.similarity import cosine_pairs_above

    emb = table(spark, sf_dir, "embeddings")
    return _ab(
        spark, "embpairs",
        lambda: _old_cosine_pairs_above(emb, 0.4),
        lambda: cosine_pairs_above(emb, 0.4),
        repeat,
    )


# ---------------------------------------------------------------- lsh


def _old_lsh_topk(corpus, queries, k=5, num_planes=4, num_tables=8,
                  id_col="vec_id", vec_col="embedding", dim=64):
    """Pre-change form: candidates dedup carries q_vec/c_vec — copied
    verbatim from similarity.py @ af20264."""
    from scratchdb_spark.operators.dedup import widen
    from scratchdb_spark.operators.similarity import (
        _dot, _hyperplanes, _norm,
    )

    P = np.array(_hyperplanes(num_planes * num_tables, dim))

    @pandas_udf("array<long>")
    def table_keys(v: pd.Series) -> pd.Series:
        V = np.array([np.asarray(x, dtype=np.float64) for x in v])
        if len(V) == 0:
            return pd.Series([], dtype=object)
        bits = (V @ P.T >= 0).astype(np.int64)
        keys = np.zeros((len(v), num_tables), dtype=np.int64)
        for t in range(num_tables):
            for b in range(num_planes):
                keys[:, t] |= bits[:, t * num_planes + b] << b
        return pd.Series(list(keys))

    n = _norm(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(vec_col, lambda x: x.cast("double") / n).alias("q_vec"),
    )
    c = widen(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(vec_col, lambda x: x.cast("double") / n).alias("c_vec"),
    )
    qb = q.select(
        "query_id", "q_vec",
        F.posexplode(table_keys("q_vec")).alias("tbl", "bucket"),
    )
    cb = c.select(
        "neighbor_id", "c_vec",
        F.posexplode(table_keys("c_vec")).alias("tbl", "bucket"),
    )
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ab_lsh(spark, sf_dir, repeat):
    from scratchdb_spark.operators.similarity import lsh_topk

    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    return _ab(
        spark, "lsh",
        lambda: _old_lsh_topk(emb, qs, k=5),
        lambda: lsh_topk(emb, qs, k=5),
        repeat,
    )


# ---------------------------------------------------------------- udtf


def ab_udtf(spark, sf_dir, repeat):
    from pyspark.sql.functions import udtf

    from scratchdb_spark.catalog import lakehouse_misc  # noqa: F401
    from scratchdb_spark.tables import register_testdata

    @udtf(
        returnType="chunk_idx int, chunk_text string, n_tokens int",
        useArrow=True,
    )
    class ChunkTokens:
        def eval(self, text: str):
            toks = " ".join((text or "").lower().split()).split(" ")
            for i, s in enumerate(range(0, max(len(toks), 1), 15)):
                w = toks[s : s + 20]
                yield i, " ".join(w), len(w)

    spark.udtf.register("chunk_tokens_ab", ChunkTokens)
    register_testdata(spark, sf_dir)

    def old():
        return spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
            FROM documents d, LATERAL chunk_tokens_ab(d.text) c
            WHERE d.doc_id < 200
            """
        )

    def new():
        return spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
            FROM (SELECT doc_id, text FROM documents
                  WHERE doc_id < 200) d,
                 LATERAL chunk_tokens_ab(d.text) c
            """
        )

    return _ab(spark, "udtf", old, new, repeat)


# ---------------------------------------------------------------- main


def main():
    args = sys.argv[1:]
    repeat = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = ["embpairs", "lsh", "udtf"]

    spark = get_spark("r14b-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from scratchdb_spark.tables import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    fns = {"embpairs": ab_embpairs, "lsh": ab_lsh, "udtf": ab_udtf}
    results = {}
    for n in names:
        results[n] = fns[n](spark, sf_dir, repeat)
    ok = all(r["identical"] for r in results.values())
    print(json.dumps({"all_identical": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
