#!/usr/bin/env python
"""Prefix-bucket running-sum rehearsal: the r10 verdict's weak item,
measured at the scale that exposed it.

The claim to verify: a running sum over a grouped-by-value frame is
bounded by the metric's DISTINCT CARDINALITY, and a continuous metric
makes that frame data-sized — `sum(v) OVER (ORDER BY x)` then plans
ONE SinglePartition sort task carrying the whole frame, invisible on
a low-cardinality fixture (11/491 distinct at sf0.1, which is exactly
why the bench could not exonerate it) and a serialization cliff at
100 TB. The r11 construction (operators/prefix_sum.py) must (a) stay
bit-identical to the partitionless form, (b) run the cumulative in
PARTITIONED windows only, and (c) hold a flat-ish wall as distinct
cardinality grows 100x while the one-task form degrades.

Measures, for distinct-value counts [20k, 200k, 2M] over a 20M-row
synthetic metric (hash-spread values — the continuous-metric shape):
  - old_wall_s: the partitionless `sum OVER (ORDER BY x)` + the
    `sum OVER ()` total (the exact pre-r11 query shape)
  - new_wall_s: bucketed_running_sum (includes its two bounded
    driver collects)
  - identical: full-result comparison of the two cum columns
  - new plan: no SinglePartition; every Window keyed by the bucket

Writes prefix_sum_rehearsal_r11.json at the repo root.

Usage: python tools/prefix_sum_rehearsal.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from scratchdb_spark.operators.prefix_sum import (  # noqa: E402
    bucketed_running_sum,
)
from scratchdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("prefix-sum-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": n_rows, "cases": []}

    for n_distinct in (20_000, 2_000_000, 20_000_000):
        # hash-spread values over a wide range: the continuous-metric
        # shape (every value distinct-ish, no friendly clustering)
        g = (
            spark.range(n_rows)
            .select(
                # Knuth-hash spread over exactly n_distinct residues,
                # then stretched x1000 so values are non-contiguous
                # (the continuous-metric shape, no friendly ranges)
                (
                    ((F.col("id") * 2654435761) % n_distinct) * 1000
                ).alias("x"),
                (F.col("id") % 97 + 1).alias("v"),
            )
            .groupBy("x")
            .agg(F.sum("v").alias("v"))
            .persist()
        )
        nd = g.count()  # materialize once; both forms read the cache

        t0 = time.perf_counter()
        w_cum = Window.orderBy("x").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        old = g.select(
            "x", "v", F.sum("v").over(w_cum).alias("cum")
        )
        old_chk = old.agg(
            F.sum(
                F.crc32(F.concat_ws(",", "x", "cum"))
            ).alias("chk"),
            F.max("cum").alias("total"),
        ).collect()[0]
        old_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        new, total = bucketed_running_sum(g, "x", "v", "cum")
        new_chk = new.agg(
            F.sum(
                F.crc32(F.concat_ws(",", "x", "cum"))
            ).alias("chk"),
            F.max("cum").alias("total"),
        ).collect()[0]
        new_wall = time.perf_counter() - t0

        plan = new._jdf.queryExecution().executedPlan().toString()
        case = {
            "n_distinct": nd,
            "old_wall_s": round(old_wall, 2),
            "new_wall_s": round(new_wall, 2),
            "identical": (
                old_chk["chk"] == new_chk["chk"]
                and old_chk["total"] == new_chk["total"] == total
            ),
            "new_plan_single_partition": "SinglePartition" in plan,
            "new_windows_bucket_keyed": all(
                "__psb" in b.split("\n")[0]
                for b in plan.split("Window")[1:]
            ),
        }
        g.unpersist()
        out["cases"].append(case)
        print(json.dumps(case), flush=True)

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "prefix_sum_rehearsal_r11.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
