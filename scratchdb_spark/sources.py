"""Source / sink helpers (SURVEY §2.2 scans & sinks rows).

The reference's source surface is NDJSON ingest plus whatever its
backends read (DuckDB boots the json/aws/httpfs extensions —
destinations/duckdb/duckdb.go:71-89 — giving `read_ndjson_auto` and
S3 paths). The Spark equivalents are the DataFrameReader formats; this
module pins the engine's conventions (permissive JSON, header CSV,
explicit-schema fast path) and the result-export sinks.

Object stores: pass s3a:// / gs:// paths — the hadoop connectors pick
credentials up from the standard env/instance-profile chain; no code
here needs to change between local disk and a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """NDJSON scan (≡ DuckDB read_ndjson_auto). With an explicit schema
    the scan is single-pass; without one Spark runs an inference pass —
    fine interactively, avoid in pipelines (and note the ingest path
    never uses Spark inference: the type-vote lattice differs)."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_result(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """Export a query result (the file-sink counterpart of the HTTP
    JSON/CSV streams). ``single_file`` coalesces to one partition —
    only for small results; large exports keep their parallelism."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


# --- custom Python DataSource: the reference's NDJSON semantics as a
# --- first-class spark.read format -----------------------------------

def _list_ndjson_files(path: str) -> list[str]:
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith(".")
        )
    return [path]


def _coerce(value, dt):
    """Cast-else-NULL, mirroring the ingest pipeline's PERMISSIVE read
    (reference: non-coercible values store NULL)."""
    import json as _json

    if value is None:
        return None
    if isinstance(dt, T.StringType):
        if isinstance(value, str):
            return value
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, (dict, list)):
            return _json.dumps(value, separators=(",", ":"))
        return str(value)
    if isinstance(dt, T.BooleanType):
        return value if isinstance(value, bool) else None
    if isinstance(dt, T.LongType):
        if isinstance(value, bool) or not isinstance(value, int):
            return None
        return value if -(2**63) <= value < 2**63 else None
    if isinstance(dt, T.DoubleType):
        if isinstance(value, bool):
            return None
        return float(value) if isinstance(value, (int, float)) else None
    return None


try:  # Spark 4 Python DataSource API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class ScratchNdjsonDataSource(DataSource):
        """``spark.read.format("scratch_ndjson")`` — NDJSON with the
        reference's ingest semantics (N1 horizontal flatten + N3
        whole-batch type vote + cast-else-null) as a native Spark
        source, instead of a pre-ingest step.

        Options: ``path`` (file or directory). Schema inference
        samples up to ``sampleLines`` lines (default 1000) per file on
        the driver — local paths only; pass an explicit ``.schema()``
        for object stores or to skip the sample pass.

        Scale shape: one InputPartition per file (the reference's
        rotated-file layout produces many bounded files, so file
        granularity IS the parallelism); rows flatten and coerce
        inside Python workers, never on the driver. For peak
        throughput at 100 TB prefer the JVM path
        (``ingest/pipeline.append_lines_df``: mapInPandas vote +
        from_json read); this source trades some speed for making the
        vote semantics composable with any DataFrame program.
        (Reference parity: pkg/api flatten + types.go vote.)
        """

        @classmethod
        def name(cls) -> str:
            return "scratch_ndjson"

        def schema(self):
            import json as _json

            from .ingest.flatten import flatten_horizontal
            from .ingest.infer import infer_types
            from .tables import spark_type_for_tag

            limit = int(self.options.get("sampleLines", 1000))
            rows = []
            for f in _list_ndjson_files(self.options["path"]):
                with open(f) as fh:
                    for i, line in enumerate(fh):
                        if i >= limit:
                            break
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            doc = _json.loads(line)
                        except ValueError:
                            continue
                        if isinstance(doc, dict):
                            rows.extend(flatten_horizontal(doc))
            voted = infer_types(rows)
            return T.StructType(
                [
                    T.StructField(col, spark_type_for_tag(tag))
                    for col, tag in sorted(voted.items())
                ]
            )

        def reader(self, schema):
            return _ScratchNdjsonReader(self.options, schema)

        def simpleStreamReader(self, schema):
            return _ScratchNdjsonStreamReader(self.options, schema)

    class _ScratchNdjsonStreamReader(SimpleDataSourceStreamReader):
        """Streaming half of the scratch_ndjson source: tails a
        rotated-file landing directory. Offset = the lexicographically
        greatest processed filename — rotation names
        (``{millis}_{counter}.ndjson``, ingest/writer.py) are
        monotonic and files are immutable once closed, so a filename
        totally orders the stream and replay between offsets is exact
        (the at-least-once queue contract, reference
        datasink/filesystem semantics, made exactly-once by Spark's
        offset log).

        The *simple* stream API parses on the driver — right for
        bounded micro-batches (the writer rotates at size/row/age
        bounds); the peak-throughput path remains the checkpointed
        JVM file-source stream in streaming/ingest_stream.py.
        """

        def __init__(self, options, schema):
            self.path = options["path"]
            self.fields = [(f.name, f.dataType) for f in schema.fields]

        def initialOffset(self):
            return {"last": ""}

        def _rows_for(self, names):
            import json as _json
            import os

            from .ingest.flatten import flatten_horizontal

            out = []
            for name in names:
                with open(os.path.join(self.path, name)) as fh:
                    for line in fh:
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            doc = _json.loads(line)
                        except ValueError:
                            continue
                        if not isinstance(doc, dict):
                            continue
                        for flat in flatten_horizontal(doc):
                            out.append(tuple(
                                _coerce(flat.get(n), dt)
                                for n, dt in self.fields
                            ))
            return out

        def _names_after(self, last):
            import os

            return sorted(
                os.path.basename(f)
                for f in _list_ndjson_files(self.path)
                if os.path.basename(f) > last
            )

        def read(self, start):
            names = self._names_after(start["last"])
            if not names:
                return iter([]), start
            return iter(self._rows_for(names)), {"last": names[-1]}

        def readBetweenOffsets(self, start, end):
            names = [
                n for n in self._names_after(start["last"])
                if n <= end["last"]
            ]
            return iter(self._rows_for(names))

        def commit(self, end):
            pass

    class _ScratchNdjsonReader(DataSourceReader):
        def __init__(self, options, schema):
            self.path = options["path"]
            self.fields = [(f.name, f.dataType) for f in schema.fields]

        def partitions(self):
            return [
                InputPartition(f) for f in _list_ndjson_files(self.path)
            ]

        def read(self, partition):
            import json as _json

            from .ingest.flatten import flatten_horizontal

            with open(partition.value) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        doc = _json.loads(line)
                    except ValueError:
                        continue
                    if not isinstance(doc, dict):
                        continue
                    for flat in flatten_horizontal(doc):
                        yield tuple(
                            _coerce(flat.get(name), dt)
                            for name, dt in self.fields
                        )


    # --- CDC streaming source over the snapshot layer ------------------

    def _cdc_base(options) -> str:
        root = options["path"]
        for prefix in ("file://", "file:"):
            if root.startswith(prefix):
                root = root[len(prefix):]
                break
        return f"{root.rstrip('/')}/{options['database']}/{options['table']}"

    def _cdc_versions(base: str) -> list[int]:
        import os
        import re as _re

        d = os.path.join(base, "_snapshots")
        if not os.path.isdir(d):
            return []
        out = []
        for n in os.listdir(d):
            m = _re.fullmatch(r"v(\d{12})\.json", n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _cdc_manifest(base: str, v: int) -> dict:
        import json as _json
        import os

        with open(os.path.join(base, "_snapshots", f"v{v:012d}.json")) as f:
            return _json.load(f)

    def _cdc_rows(base: str, names, fields) -> list[tuple]:
        """Rows of the named parquet files as schema-ordered tuples
        (missing columns -> None: the evolved-reader alignment)."""
        import os

        import pyarrow.parquet as pq

        out = []
        for name in sorted(names):
            table = pq.read_table(os.path.join(base, name))
            for rec in table.to_pylist():
                out.append(tuple(rec.get(n) for n, _ in fields))
        return out

    def _cdc_diff(base: str, from_v: int, to_v: int, fields):
        """Bag-semantics change rows between two versions: the manifest
        file diff with identical rows cancelled (read_changes'
        exceptAll contract, evaluated driver-side)."""
        from collections import Counter

        old_files: set = set()
        old_retained: set = set()
        if from_v:
            old_m = _cdc_manifest(base, from_v)
            old_files = set(old_m["files"])
        new_m = _cdc_manifest(base, to_v)
        new_files = set(new_m["files"])
        added = Counter(_cdc_rows(base, new_files - old_files, fields))
        removed = Counter(_cdc_rows(base, old_files - new_files, fields))
        inserts = added - removed
        deletes = removed - added
        for row, n in sorted(inserts.items(), key=lambda kv: repr(kv[0])):
            for _ in range(n):
                yield row + ("insert",)
        for row, n in sorted(deletes.items(), key=lambda kv: repr(kv[0])):
            for _ in range(n):
                yield row + ("delete",)

    class ScratchCdcDataSource(DataSource):
        """``spark.readStream.format("scratch_cdc")`` — consume a
        snapshot-managed warehouse table's change feed as a structured
        stream (the Delta/Iceberg streaming-source idea over
        snapshots.py; public design, the reference has no streams).

        Options: ``path`` (warehouse root), ``database``, ``table``.
        Offsets are SNAPSHOT VERSION NUMBERS — monotonic even across
        maintenance (the watermark survives history truncation), so
        replay between offsets is exact while both versions stay in
        retention, and a cursor below the retention window errs
        loudly (missing-manifest read), never silently.

        Version 0 -> latest bootstraps the current table state as
        inserts (diff against the empty set); each later micro-batch
        is the manifest file-diff between consecutive offsets with
        identical rows cancelled (bag semantics — a COW rewrite's
        carried survivors produce no change rows), so batch size is
        churn-sized, never a rescan. The *simple* stream API
        evaluates driver-side (pyarrow) over local-filesystem
        warehouse roots — right for bounded churn; the cluster-scale
        consumer is the batch ``snapshots.read_changes`` +
        ``incremental.maintain_sum_mv`` pair.
        """

        @classmethod
        def name(cls) -> str:
            return "scratch_cdc"

        def schema(self):
            import json as _json

            base = _cdc_base(self.options)
            vs = _cdc_versions(base)
            if not vs:
                raise ValueError(
                    f"{base} has no snapshots; commit one first"
                )
            m = _cdc_manifest(base, vs[-1])
            fields = T.StructType.fromJson(_json.loads(m["schema"]))
            return T.StructType(
                list(fields.fields)
                + [T.StructField("_change_type", T.StringType())]
            )

        def simpleStreamReader(self, schema):
            return _ScratchCdcStreamReader(self.options, schema)

    class _ScratchCdcStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options, schema):
            self.base = _cdc_base(options)
            # _change_type is produced by the diff, not read from files
            self.fields = [
                (f.name, f.dataType)
                for f in schema.fields
                if f.name != "_change_type"
            ]

        def initialOffset(self):
            return {"v": 0}

        def read(self, start):
            import json as _json

            vs = _cdc_versions(self.base)
            cur = int(start["v"])
            if not vs or vs[-1] <= cur:
                return iter([]), start
            latest = vs[-1]
            try:
                rows = list(_cdc_diff(self.base, cur, latest, self.fields))
            except (_json.JSONDecodeError, FileNotFoundError):
                # a commit is mid-PUT on a store without atomic rename
                # (the engine's own PUTs are temp+rename, so this is
                # the defensive path): treat the version as not yet
                # visible and pick it up on the next poll
                return iter([]), start
            return iter(rows), {"v": latest}

        def readBetweenOffsets(self, start, end):
            return iter(
                list(
                    _cdc_diff(
                        self.base, int(start["v"]), int(end["v"]),
                        self.fields,
                    )
                )
            )

        def commit(self, end):
            pass

except ImportError:  # pragma: no cover - pre-4.0 PySpark
    ScratchNdjsonDataSource = None  # type: ignore[assignment]
    ScratchCdcDataSource = None  # type: ignore[assignment]
