#!/usr/bin/env python
"""Simulate the per-round driver correctness gate as strictly as we
can: for every catalog query, run the Spark implementation AND its
DuckDB oracle at the given sf dir, sort columns by name and rows by
value, and compare cell-by-cell with EXACT equality (repr-level for
floats — the driver hashes serialized values, so a last-ulp double
difference fails there even though the 6-dp pytest mirror passes).

Reports PASS / ROWS / COLS / VALUE / ERROR per query and exits
nonzero on any failure. Usage:

    python tools/driver_sim.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import TESTDATA_TABLES  # noqa: E402


def _cell(v):
    """Canonical serialization of one cell (what a value-hash sees)."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return repr(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    failures = 0
    for spec in catalog.registry().values():
        if name_filter and not any(
            part in spec.name for part in name_filter.split(",")
        ):
            continue
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            # The real driver canonicalizes with pandas sort_values,
            # which throws on list cells — an array/map/struct output
            # column is a guaranteed driver FAIL even when values are
            # right (round-3 agg_exact_percentiles). Refuse it here.
            bad = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                raise TypeError(
                    "driver-incompatible non-scalar output column(s): "
                    + ", ".join(bad)
                )
            s_rows = [tuple(r) for r in sdf.collect()]
            spark.catalog.clearCache()
            if spec.oracle is None:
                print(f"NO_ORACLE {spec.name} ({len(s_rows)} rows)")
                continue
            res = con.execute(spec.oracle)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:
            print(f"ERROR     {spec.name}: {str(exc).splitlines()[0][:160]}")
            failures += 1
            continue

        if sorted(s_cols) != sorted(o_cols):
            print(f"COLS      {spec.name}: {sorted(s_cols)} vs {sorted(o_cols)}")
            failures += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"ROWS      {spec.name}: {len(s_rows)} vs {len(o_rows)}")
            failures += 1
            continue
        cs, co = _canon(s_cols, s_rows), _canon(o_cols, o_rows)
        diffs = [(a, b) for a, b in zip(cs, co) if a != b]
        if diffs:
            print(
                f"VALUE     {spec.name}: {len(diffs)}/{len(cs)} rows differ; "
                f"first: {diffs[0][0][:120]} vs {diffs[0][1][:120]}"
            )
            failures += 1
        else:
            print(f"PASS      {spec.name} ({len(s_rows)} rows)")

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
