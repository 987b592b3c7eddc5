#!/usr/bin/env python
"""Headline-query benchmark. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Runs every catalog query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per-query time is
the full plan+execute wall clock, materialized via a count-style
collect of the result.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("scratchdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up (untimed): touch every table's parquet footer and start
    # the Arrow/Python UDF workers, so the first timed query measures
    # itself rather than session/codegen/worker init.
    from scratchdb_spark.tables import TESTDATA_TABLES, table

    for t in TESTDATA_TABLES:
        try:
            table(spark, sf_dir, t).count()
        except Exception:
            pass
    spark.range(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    times: dict[str, float] = {}
    for name, spec in sorted(catalog.registry().items()):
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 4)
        _ = n
        # Operators that persist() intermediates (minhash, simhash, CC)
        # would otherwise accumulate cached blocks across 90+ queries;
        # evict between queries (untimed) so memory stays flat.
        spark.catalog.clearCache()

    total = round(sum(times.values()), 4)
    print(json.dumps({
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
