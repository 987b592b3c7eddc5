"""End-to-end ingest pipeline: the reference's insert handler + worker
collapsed into one testable object.

Reference trace (SURVEY.md §3.1): POST body -> flatten -> __row_id
stamp -> NDJSON buffer -> [rotate -> upload -> queue -> worker] ->
CreateEmptyTable -> CreateColumns (type vote over the whole file) ->
InsertFromNDJsonFile. Here the bracketed hop is a direct callback
(writer.on_closed) and the final insert is a Spark aligned append.

Scale note: the per-batch type-vote scan runs driver-side over one
rotated file, exactly like the reference's single worker thread per
file (workers/workers.go:64-116) — bounded by the rotation thresholds,
not by table size. The Spark-side read uses an explicit schema (no
inference job) so each micro-batch costs one distributed read + one
parquet append.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..tables import Warehouse, spark_type_for_tag
from .flatten import flatten_item
from .ids import next_row_id
from .infer import infer_types


class PartialInsertError(Exception):
    """Some items failed; valid ones were stored (api/data.go:140-150
    returns 500 'Partially inserted data')."""

    def __init__(self, errors: list[tuple[int, str]]):
        self.errors = errors
        super().__init__(f"partially inserted data ({len(errors)} item(s) failed)")


class IngestPipeline:
    def __init__(self, spark: SparkSession, warehouse: Warehouse, writer=None):
        self.spark = spark
        self.warehouse = warehouse
        self.writer = writer  # BufferedWriter or None for direct mode
        self._direct_buffer: dict[tuple[str, str], list[str]] = {}

    # -- API-layer half: flatten + stamp + buffer -------------------------

    def insert(
        self,
        database: str,
        table: str,
        body: str | bytes | dict | list,
        flatten: str = "horizontal",
    ) -> int:
        """Handle one insert request body (object OR array of objects,
        api/data.go:101-106). Returns rows buffered. Per-item failures
        are isolated; raises PartialInsertError at the end if any."""
        if isinstance(body, (str, bytes)):
            try:
                parsed = json.loads(body)
            except json.JSONDecodeError as e:
                raise ValueError(f"invalid JSON body: {e}") from e
        else:
            parsed = body
        items = parsed if isinstance(parsed, list) else [parsed]

        rows_written = 0
        errors: list[tuple[int, str]] = []
        for i, item in enumerate(items):
            try:
                rows = flatten_item(item, flatten)
                for row in rows:
                    if "__row_id" not in row or row["__row_id"] is None:
                        row["__row_id"] = next_row_id()  # data.go:123-129
                    self._emit(database, table, row)
                    rows_written += 1
            except Exception as e:  # per-item isolation (data.go:110-121)
                errors.append((i, str(e)))
        if errors:
            raise PartialInsertError(errors)
        return rows_written

    def _emit(self, database: str, table: str, row: dict[str, Any]) -> None:
        line = json.dumps(row, ensure_ascii=False, separators=(",", ":"))
        if self.writer is not None:
            self.writer.write_data(database, table, line)
        else:
            self._direct_buffer.setdefault((database, table), []).append(line)

    def flush(self) -> None:
        """Synchronous flush: push every buffered row into the tables."""
        if self.writer is not None:
            self.writer.flush_all()
            return
        buf, self._direct_buffer = self._direct_buffer, {}
        for (db, tbl), lines in buf.items():
            self.append_ndjson_lines(db, tbl, lines)

    # -- worker half: infer -> create/evolve -> aligned append ------------

    def append_ndjson_file(self, database: str, table: str, path: str) -> None:
        with open(path, encoding="utf-8") as fh:
            self.append_ndjson_lines(
                database, table, [l for l in fh if l.strip()]
            )

    def append_ndjson_lines(
        self, database: str, table: str, lines: Iterable[str]
    ) -> None:
        lines = list(lines)
        if not lines:
            return
        rows = [json.loads(l) for l in lines]
        voted = infer_types(rows)  # N3: whole-batch vote

        # Read schema: table type wins for existing columns (first-batch-
        # wins, §1.3); voted type for new ones.
        self.warehouse.create_empty_table(database, table)
        existing = {
            f.name: f.dataType
            for f in self.warehouse.schema(database, table).fields
        }
        fields = [
            T.StructField(col, existing.get(col, spark_type_for_tag(tag)))
            for col, tag in voted.items()
        ]
        schema = T.StructType(fields)

        # Distributed JSON parse with explicit schema (PERMISSIVE: non-
        # coercible values -> NULL, our documented cast-else-null).
        batch = self.spark.read.schema(schema).json(
            self.spark.sparkContext.parallelize(lines)
        )
        self.warehouse.append_aligned(database, table, batch)
