"""Per-family query-catalog modules; import order (and therefore
registration order) is owned by scratchdb_spark.queries."""
