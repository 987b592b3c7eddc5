"""scratchdb_spark — a PySpark-native analytics engine with the
capabilities of scratchdata/ScratchDB.

The reference (https://github.com/scratchdata/scratchdata) is a thin
HTTP analytics service around pluggable OLAP backends: JSON ingest with
flattening + dynamic schema, and raw-SQL query pass-through. Here the
execution engine is Spark SQL itself; the ingest semantics (flatteners,
type vote, schema evolution, row ids) are re-implemented natively, and
the query surface is answered by Catalyst over Parquet-managed tables.

Layout:
  session.py   SparkSession construction (AQE, shuffle sizing)
  tables.py    table catalog: load test data, managed-table lifecycle
  query.py     query endpoint semantics (trim/guard/execute/serialize)
  ingest/      flatten, type inference, row ids, buffered writer
  operators/   dedup, similarity search, text analysis, as-of join,
               multimodal column plumbing
  streaming/   Structured Streaming ingest (foreachBatch)
  api/         HTTP surface (insert/query/share/tables/columns/health)
"""

__version__ = "0.1.0"
