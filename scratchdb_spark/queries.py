"""Query catalog — public facade.

Through round 4 this was a single 5,900-line module; it now lives in
scratchdb_spark/catalog/* split by family and is re-exported here IN
THE ORIGINAL REGISTRATION ORDER (the driver correctness window covers
the first 50 entries of queries(), whose rotation tie-breaks on
registry order — so the import sequence below is load-bearing; see
catalog/core._ordered_specs). Everything previously importable from
scratchdb_spark.queries still is: every query function, QuerySpec,
register/registry, queries()/oracle_sql().

The reference's query surface is SQL pass-through to its backend
(api/data.go:58-72 -> clickhouse/query.go:11 / duckdb/query.go:56), so
the capability contract is the backend's analytic SELECT dialect. Each
catalog entry exercises one category of that contract with idiomatic
DataFrame code (Catalyst plans it), and carries an ANSI-SQL oracle that
DuckDB runs over the same parquet for the driver's hash-compare.
Column-name discipline: every computed column is aliased identically in
the Spark code and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

from .catalog.core import (  # noqa: F401
    _REGISTRY,
    _DUCK_SHINGLES,
    _DUCK_TOKENS,
    QuerySpec,
    _fixture_oracle,
    _green_counts,
    _ordered_specs,
    _sql,
    oracle_sql,
    queries,
    register,
    registry,
)
from .tables import epoch_us, register_testdata, table  # noqa: F401

from .catalog.tpch_joins import *  # noqa: F401,F403,E402
from .catalog.relational import *  # noqa: F401,F403,E402
from .catalog.functions import *  # noqa: F401,F403,E402
from .catalog.llm_text import *  # noqa: F401,F403,E402
from .catalog.tpch_breadth import *  # noqa: F401,F403,E402
from .catalog.analytics import *  # noqa: F401,F403,E402

# Register the ingest round-trip queries at the same registry position
# they held in the single-module catalog (they import `register` from
# this module, which is already bound above).
from . import ingest_queries as _ingest_queries  # noqa: E402,F401

from .catalog.curation_queries import *  # noqa: F401,F403,E402
from .catalog.lakehouse_misc import *  # noqa: F401,F403,E402
