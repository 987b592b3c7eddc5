#!/usr/bin/env python
"""Prefix-bucket re-split rehearsal: the r11 verdict's weak item,
measured at the scale and SHAPE that exposed it.

r11's rehearsal used hash-spread values, which fill the value range
uniformly — exactly the shape that cannot expose the range-skew
loophole: `floor((x - min) / width)` buckets equalize VALUE RANGE,
so ONE extreme outlier (long-tail latency, token counts — the common
100 TB metric shapes) stretches the span until nearly every row lands
in bucket 0 and the pass-2 partitioned window degenerates back to a
single data-sized sort task. This rehearsal builds that shape on
purpose: n_distinct values packed into <1/256 of the span plus one
outlier at 1e12.

Measured per case, all on the same persisted grouped frame:
  - old_wall_s: the partitionless `sum OVER (ORDER BY x)` + the
    `sum OVER ()` total (the pre-r11 query shape — the collapse)
  - r11_wall_s: bucketed_running_sum with max_depth=0 — the r11 form
    WITHOUT the re-split: detects nothing, one hot bucket carries
    ~all rows, structurally the same one-task window as old
  - new_wall_s: bucketed_running_sum under r12 DEFAULTS (hot-bucket
    re-split on the observed sub-range, depth-capped)
  - identical: crc32-checksum equality across all three forms
  - diag: split levels taken / final bucket count (from pass 1)
  - plan pins: no SinglePartition, every window keyed on the bucket

Shapes: single outlier at [2M, 20M] distinct, and a NESTED outlier
(an outlier inside the hot bucket) at 2M distinct. A hash-spread
control case shows the balanced frame still pays ZERO split levels
(no regression vs r11 cost shape).

Writes prefix_sum_rehearsal_r12.json at the repo root.

Usage: python tools/prefix_sum_rehearsal_r12.py [n_rows]
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


def _chk(df):
    r = df.agg(
        F.sum(F.crc32(F.concat_ws(",", "x", "cum"))).alias("chk"),
        F.max("cum").alias("total"),
    ).collect()[0]
    return (r["chk"], r["total"])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("prefix-sum-rehearsal-r12")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": n_rows, "cases": []}

    shapes = [
        # (label, n_distinct, value expr builder)
        ("outlier_2m", 2_000_000),
        ("outlier_20m", 20_000_000),
        ("nested_outlier_2m", 2_000_000),
        ("hash_spread_control_2m", 2_000_000),
    ]
    for label, n_distinct in shapes:
        if label.startswith("hash_spread"):
            x = (((F.col("id") * 2654435761) % n_distinct) * 1000).alias(
                "x"
            )
        else:
            # n_distinct values packed into [0, n_distinct) — then the
            # outlier at 1e12 stretches the span ~500000x, so the r11
            # bucket function maps ALL of them to bucket 0
            x = (
                F.when(F.col("id") == 0, F.lit(10**12))
                .when(
                    F.lit(label.startswith("nested"))
                    & (F.col("id") == 1),
                    F.lit(10**9),
                )
                .otherwise(F.col("id") % n_distinct)
                .alias("x")
            )
        g = (
            spark.range(n_rows)
            .select(x, (F.col("id") % 97 + 1).alias("v"))
            .groupBy("x")
            .agg(F.sum("v").alias("v"))
            .persist()
        )
        nd = g.count()  # materialize once; every form reads the cache

        t0 = time.perf_counter()
        w_cum = Window.orderBy("x").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        old_chk = _chk(
            g.select("x", "v", F.sum("v").over(w_cum).alias("cum"))
        )
        old_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        r11_df, r11_total = bucketed_running_sum(
            g, "x", "v", "cum", max_depth=0
        )
        r11_chk = _chk(r11_df)
        r11_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        diag: dict = {}
        new_df, total = bucketed_running_sum(
            g, "x", "v", "cum", diag=diag
        )
        new_chk = _chk(new_df)
        new_wall = time.perf_counter() - t0

        plan = new_df._jdf.queryExecution().executedPlan().toString()
        case = {
            "shape": label,
            "n_distinct": nd,
            "old_wall_s": round(old_wall, 2),
            "r11_nosplit_wall_s": round(r11_wall, 2),
            "new_wall_s": round(new_wall, 2),
            "identical": (
                old_chk == r11_chk == new_chk
                and old_chk[1] == total == r11_total
            ),
            "split_levels": diag["levels"],
            "n_final_buckets": diag["n_final_buckets"],
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
        "prefix_sum_rehearsal_r12.json",
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
