"""Mirror of the driver's correctness gate: run every catalog query in
Spark AND its DuckDB oracle over the same parquet, compare results
order-insensitively with float tolerance.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from scratchdb_spark import queries as catalog
from scratchdb_spark.tables import TESTDATA_TABLES

from conftest import SF_DIR


def _duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    # sort columns by name (driver convention), then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


SPECS = [s for s in catalog.registry().values() if s.oracle is not None]
NO_ORACLE = [s for s in catalog.registry().values() if s.oracle is None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_matches_duckdb_oracle(spark, spec):
    sdf = spec.spark_fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_conn(SF_DIR)
    res = con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{spec.name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{spec.name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_cols, spark_rows), _norm_rows(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, (
        f"{spec.name}: {len(mismatches)} row mismatches; first: "
        f"{mismatches[0]}"
    )


def test_rows_only(spark):
    """Weaker rows-only check for oracle-less queries. The registry
    invariant (test below) keeps this set EMPTY today — every query
    declares an oracle — so this loop is the documented fallback
    surface, not a skip (r12: the suite's last skip removed)."""
    for spec in NO_ORACLE:
        sdf = spec.spark_fn(spark, SF_DIR)
        assert sdf.count() >= 0
        assert len(sdf.schema.fields) > 0


def test_driver_window_rotation_invariants():
    """The external check covers the first 50 queries() entries, so the
    emitted order must put less-verified names strictly before
    more-verified ones (ties by registration), and every query must
    declare an oracle under the same name."""
    from scratchdb_spark.queries import _green_counts, oracle_sql, queries

    names = list(queries())
    assert list(oracle_sql()) == names
    greens = _green_counts()
    counts = [greens.get(n, 0) for n in names]
    assert counts == sorted(counts), (
        "queries() must be ordered by ascending green-row count"
    )
