#!/usr/bin/env python
"""Phase-level wall profile of the commit machinery (VERDICT r14 item
3: ~1.3 s fixed cost per commit; warehouse_changes_feed ~4.9 s over 3
tiny commits).

Reproduces warehouse_changes_feed's exact sequence (2 tiny appends +
one COW delete + read_changes) and times each sub-phase so the fixed
cost is attributable: batch construction, append_aligned's write job,
the rename fan-out, commit_snapshot's listings + manifest PUT, the
delete's tag/filter/rewrite, and the CDC diff read.

Usage: python tools/r15_commit_profile.py [--repeat 3]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scratchdb_spark import snapshots as snap  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import Warehouse  # noqa: E402


class T:
    def __init__(self):
        self.rows = []

    def __call__(self, label):
        self.label = label
        return self

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        self.rows.append((self.label, time.perf_counter() - self.t0))


def one_run(spark, t: T):
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_prof_"))
    with t("append_v1_total"):
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(1, 10), (2, 20)], "__row_id long, amount long"
            ),
        )
    with t("append_v2_total"):
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(3, 60), (4, 80)], "__row_id long, amount long"
            ),
        )
    with t("delete_where_total"):
        snap.delete_where(wh, "db", "t", F.col("__row_id") == 2)
    with t("read_changes_build"):
        ch = snap.read_changes(wh, "db", "t", from_version=1)
    with t("read_changes_count"):
        ch.count()

    # Sub-phase breakdown of one tiny append on a fresh table.
    wh2 = Warehouse(spark, tempfile.mkdtemp(prefix="wh_prof2_"))
    with t("sub_createDataFrame"):
        b = spark.createDataFrame(
            [(1, 10), (2, 20)], "__row_id long, amount long"
        )
    with t("sub_append_aligned"):
        landed = wh2.append_aligned("db", "t", b)
    with t("sub_commit_snapshot"):
        snap.commit_snapshot(wh2, "db", "t")
    with t("sub_append_aligned_2"):
        wh2.append_aligned("db", "t", b)
    with t("sub_commit_snapshot_2"):
        snap.commit_snapshot(wh2, "db", "t")
    _ = landed


def main():
    repeat = 3
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    spark = get_spark("r15-commit-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session (worker pools, codegen)
    spark.range(32).mapInPandas(lambda it: it, "id long").count()
    t = T()
    one_run(spark, t)  # warm-up pass, discarded
    t = T()
    for _ in range(repeat):
        one_run(spark, t)
    agg: dict[str, list[float]] = {}
    for label, sec in t.rows:
        agg.setdefault(label, []).append(sec)
    import statistics
    for label, xs in agg.items():
        print(f"{label:24s} median={statistics.median(xs):7.3f}s "
              f"samples={[round(x, 3) for x in xs]}")


if __name__ == "__main__":
    main()
