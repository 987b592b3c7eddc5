"""End-to-end ingest pipeline: the reference's insert handler + worker
collapsed into one testable object.

Reference trace (SURVEY.md §3.1): POST body -> flatten -> __row_id
stamp -> NDJSON buffer -> [rotate -> upload -> queue -> worker] ->
CreateEmptyTable -> CreateColumns (type vote over the whole file) ->
InsertFromNDJsonFile. Here the bracketed hop is a direct callback
(writer.on_closed) and the final insert is a Spark aligned append.

Scale note — two worker-half paths with identical semantics:
- ``append_ndjson_lines``: the vote scans driver-side over one rotated
  file, like the reference's worker thread per file
  (workers/workers.go:64-116) — fine while batches are bounded by the
  rotation thresholds.
- ``append_lines_df``: the scale path. The vote's per-value tagging
  (the same ``json_value_tag``) runs inside Arrow-batched Python
  workers over a distributed lines DataFrame; only the tiny
  (column, tag) -> count table reaches the driver, and the data read
  is a JVM-side ``from_json`` with the voted schema. Nothing row-level
  ever touches the driver, so one micro-batch can be arbitrarily
  large. ``append_ndjson_file`` and the streaming ingest use this.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import Warehouse, spark_type_for_tag
from .flatten import flatten_item
from .ids import next_row_id
from .infer import infer_types, json_value_tag, vote


#: auto-switch bounds for append_ndjson_lines: at or below these the
#: whole-batch vote runs driver-side (one rotated file's worth — the
#: reference's worker-thread shape); above either bound the batch is
#: parallelized once and handed to the distributed append_lines_df
#: path, so a caller (or a misconfigured writer rotation) can never
#: funnel a huge batch's parse+vote CPU through the driver. The
#: rotation defaults (ingest/writer.py) keep normal batches far below
#: both bounds.
DISTRIBUTED_ROWS_THRESHOLD = 50_000
DISTRIBUTED_BYTES_THRESHOLD = 64 << 20


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
        # distributed read of the rotated file — the file never passes
        # through the driver
        self.append_lines_df(database, table, self.spark.read.text(path))

    def append_ndjson_lines(
        self, database: str, table: str, lines: Iterable[str]
    ) -> None:
        lines = list(lines)
        if not lines:
            return
        if (
            len(lines) > DISTRIBUTED_ROWS_THRESHOLD
            or sum(len(l) for l in lines) > DISTRIBUTED_BYTES_THRESHOLD
        ):
            # identical semantics, distributed execution: the batch is
            # already driver-resident (it arrived through the insert
            # buffer), but the per-line parse + type-vote CPU must not
            # run single-threaded — ship the lines out once and run
            # the same vote/read pipeline in Arrow workers
            n_slices = max(1, min(len(lines) // 100_000 + 1, 32))
            self.append_lines_df(
                database,
                table,
                self.spark.createDataFrame(
                    self.spark.sparkContext.parallelize(
                        lines, n_slices
                    ).map(lambda l: (l,)),
                    "value string",
                ),
            )
            return
        rows = [json.loads(l) for l in lines]
        voted = infer_types(rows)  # N3: whole-batch vote
        schema = self._voted_read_schema(database, table, voted)

        # Distributed JSON parse with explicit schema (PERMISSIVE: non-
        # coercible values -> NULL, our documented cast-else-null).
        # Slice count is bounded by batch size (~100k rows/slice), not
        # default parallelism: one rotated micro-batch must land as
        # O(1) parquet files, or the table directory grows ~32 tiny
        # files per append and every later directory listing pays for
        # it (the small-files problem, self-inflicted at ingest time).
        n_slices = max(1, min(len(lines) // 100_000 + 1, 32))
        batch = self.spark.read.schema(schema).json(
            self.spark.sparkContext.parallelize(lines, n_slices)
        )
        self._gated_append(database, table, batch)

    def _gated_append(
        self, database: str, table: str, batch: DataFrame,
        file_prefix: str = "b",
    ) -> list[str]:
        """append_aligned behind the table's write-time constraints
        (snapshots.set_constraints): the SAME quality gate the
        batch snapshot path enforces also guards NDJSON ingest —
        including the streaming insert executor, whose foreachBatch
        funnels here — so DLT-style expectations hold at every entry
        point. Tables without constraints (or not snapshot-managed)
        pay one manifest read, nothing else. Returns the landed file
        names (the exactly-once stream commits them explicitly)."""
        from .. import snapshots as snap

        batch, quarantined, _viol = snap._enforce_constraints(
            self.warehouse, database, table, batch
        )
        if quarantined is not None:
            self.warehouse.append_aligned(
                database, f"{table}__quarantine", quarantined
            )
        return self.warehouse.append_aligned(
            database, table, batch, file_prefix=file_prefix
        )

    def _voted_read_schema(
        self, database: str, table: str, voted: dict[str, str]
    ) -> T.StructType:
        """Read schema for a batch: table type wins for existing columns
        (first-batch-wins, §1.3); voted type for new ones."""
        self.warehouse.create_empty_table(database, table)
        existing = {
            f.name: f.dataType
            for f in self.warehouse.schema(database, table).fields
        }
        return T.StructType(
            [
                T.StructField(col, existing.get(col, spark_type_for_tag(tag)))
                for col, tag in voted.items()
            ]
        )

    def append_lines_df(
        self, database: str, table: str, lines_df: DataFrame,
        file_prefix: str = "b",
    ) -> list[str]:
        """Worker half over a DISTRIBUTED batch of NDJSON lines (one
        string column). Same N3 vote semantics as the driver path: the
        identical ``json_value_tag`` runs per value inside Arrow-batched
        Python workers; the driver only ever sees (column, tag) counts.
        Unparseable lines contribute no votes (they surface as all-NULL
        rows from the PERMISSIVE data read, our cast-else-null policy).
        """
        col0 = lines_df.columns[0]
        lines = lines_df.select(F.col(col0).alias("value")).filter(
            F.length(F.trim("value")) > 0
        )

        def tag_partitions(batches):
            import collections

            import pandas as pd

            counts: collections.Counter = collections.Counter()
            for pdf in batches:
                for line in pdf["value"]:
                    try:
                        row = json.loads(line)
                    except (ValueError, TypeError):
                        continue
                    if not isinstance(row, dict):
                        continue
                    for k, v in row.items():
                        counts[(k, json_value_tag(v))] += 1
            yield pd.DataFrame(
                [(k, t, n) for (k, t), n in counts.items()],
                columns=["key", "tag", "n"],
            ).astype({"key": "string", "tag": "string", "n": "int64"})

        tag_counts = (
            lines.mapInPandas(
                tag_partitions, "key string, tag string, n long"
            )
            .groupBy("key", "tag")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        if not tag_counts:
            return []
        per_key: dict[str, dict[str, int]] = {}
        for r in tag_counts:
            per_key.setdefault(r["key"], {})[r["tag"]] = r["n"]
        # sorted for a deterministic new-column order (the driver path
        # inherits first-seen order; distributed counts are unordered)
        voted = {k: vote(c) for k, c in sorted(per_key.items())}

        schema = self._voted_read_schema(database, table, voted)
        batch = lines.select(
            F.from_json("value", schema).alias("r")
        ).select("r.*")
        return self._gated_append(
            database, table, batch, file_prefix=file_prefix
        )
