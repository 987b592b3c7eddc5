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
        DataSourceStreamReader,
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
    #
    # All CDC IO (version listing, manifest/shard JSON, executor
    # parquet opens) goes through pyarrow.fs, so the stream source
    # works on the same non-file:// warehouses the rest of the engine
    # does (the ingest writer / snapshot layer use the Hadoop
    # FileSystem API; that API needs the driver JVM, which executor
    # Python workers don't have — pyarrow.fs is the process-local
    # equivalent that covers local, s3://, gs://, hdfs:// and mounted
    # schemes, and its FileSystem objects PICKLE, so the reader
    # resolved once on the driver ships to every executor task).

    def cdc_filesystem_option(fs) -> str:
        """Serialize a pyarrow FileSystem for the ``filesystemPickle``
        reader option: ``.option("filesystemPickle",
        cdc_filesystem_option(my_fs))``. For filesystems pyarrow's
        from_uri can't resolve (custom mounts, fsspec adapters via
        PyFileSystem, test doubles); ``path`` is then a path WITHIN
        that filesystem. base64 because DataSource options are
        strings and cross a Python-worker process boundary.

        TRUST BOUNDARY: the option is pickle.loads'd inside Spark's
        Python worker/executor processes, so setting it is CODE-
        EQUIVALENT there — anyone who can pass reader options can run
        arbitrary code in the workers. That is the same trust level
        as submitting the Spark job itself (reader options come from
        the job author, same user, same processes), but do NOT
        forward this option from untrusted external input. The
        resolver fails fast on payloads that don't unpickle to a
        pyarrow FileSystem."""
        import base64
        import pickle

        return base64.b64encode(pickle.dumps(fs)).decode("ascii")

    def _cdc_resolve(options) -> tuple:
        """(pyarrow FileSystem, table base path) for the warehouse
        root in ``options``. Bare paths and file:/file:// map to the
        local FS; other URI schemes resolve via
        pyarrow.fs.FileSystem.from_uri (s3/gs/hdfs/...); an explicit
        ``filesystemPickle`` option overrides resolution entirely.
        Resolution happens wherever Spark instantiates the source (a
        Python worker process — there is no driver JVM to lean on,
        which is exactly why this layer is pyarrow.fs, not the
        Hadoop FileSystem API the rest of the engine uses)."""
        import base64
        import pickle

        from pyarrow import fs as pafs

        root = options["path"]
        pickled = options.get("filesystemPickle") or options.get(
            "filesystempickle"  # DataFrameReader options lowercase keys
        )
        if pickled:
            fs = pickle.loads(base64.b64decode(pickled))
            if not isinstance(fs, pafs.FileSystem):
                # fail fast on garbage (see cdc_filesystem_option's
                # trust-boundary note): a payload that unpickles to
                # anything else would surface as opaque attribute
                # errors deep in executor reads
                raise TypeError(
                    "filesystemPickle must deserialize to a "
                    f"pyarrow.fs.FileSystem, got {type(fs).__name__}"
                )
            base = root.split("://", 1)[1] if "://" in root else root
        elif "://" in root and not root.startswith("file://"):
            fs, base = pafs.FileSystem.from_uri(root)
        else:
            for prefix in ("file://", "file:"):
                if root.startswith(prefix):
                    root = root[len(prefix):]
                    break
            fs, base = pafs.LocalFileSystem(), root
        return fs, (
            f"{base.rstrip('/')}/{options['database']}/{options['table']}"
        )

    def _cdc_read_json(fs, path: str) -> dict:
        import json as _json

        with fs.open_input_stream(path) as f:
            return _json.loads(f.read().decode("utf-8"))

    def _cdc_versions(fs, base: str) -> list[int]:
        import re as _re

        from pyarrow import fs as pafs

        sel = pafs.FileSelector(
            f"{base}/_snapshots", allow_not_found=True
        )
        out = []
        for info in fs.get_file_info(sel):
            m = _re.fullmatch(r"v(\d{12})\.json", info.base_name)
            if m and info.is_file:
                out.append(int(m.group(1)))
        return sorted(out)

    def _cdc_manifest(fs, base: str, v: int) -> dict:
        return _cdc_read_json(fs, f"{base}/_snapshots/v{v:012d}.json")

    def _cdc_manifest_files(fs, base: str, m: dict) -> list[str]:
        """A manifest's data-file names, resolving shard references
        (snapshots._SHARDS_DIR) for large tables."""
        if "shards" not in m:
            return sorted(m["files"])
        out: list[str] = []
        for rec in m["shards"]:
            out += _cdc_read_json(
                fs, f"{base}/_snapshots/shards/{rec['name']}"
            )["files"]
        return sorted(out)

    def _cdc_file_diff(
        fs, base: str, prev_m: dict, m: dict
    ) -> tuple[set, set]:
        """(removed, added) file names between consecutive manifests.
        Shards shared by reference cancel without being opened, so
        append-transition planning cost is O(churn shards) even on a
        10^6-file table. The one transition where BOTH sides are not
        sharded the same way — the commit that crosses the
        _SHARD_THRESHOLD (inline -> sharded) or re-inlines after
        maintenance — falls back to diffing full file lists: a
        one-time O(table-files) planning cost per table per crossing,
        bounded by the threshold itself on the inline side."""
        if "shards" in prev_m and "shards" in m:
            prev_recs = {r["name"] for r in prev_m["shards"]}
            new_recs = {r["name"] for r in m["shards"]}
            prev_only: set = set()
            for r in prev_m["shards"]:
                if r["name"] not in new_recs:
                    prev_only |= set(
                        _cdc_manifest_files(
                            fs, base, {"shards": [r], "n_files": r["n"]}
                        )
                    )
            new_only: set = set()
            for r in m["shards"]:
                if r["name"] not in prev_recs:
                    new_only |= set(
                        _cdc_manifest_files(
                            fs, base, {"shards": [r], "n_files": r["n"]}
                        )
                    )
            return prev_only - new_only, new_only - prev_only
        prev_files = set(_cdc_manifest_files(fs, base, prev_m))
        files = set(_cdc_manifest_files(fs, base, m))
        return prev_files - files, files - prev_files

    class CdcRetentionError(Exception):
        """The stream's cursor references a snapshot version outside
        the table's retention window (history truncated by
        maintenance). Raised at partition-PLANNING time, so the feed
        fails loudly instead of silently going stale."""

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
        inserts; each later micro-batch replays the commits in the
        offset window from their manifests: a pure APPEND's added
        data files stream as inserts, and a COW DELETE/MERGE/rollback
        streams the explicit CHANGE FILES it persisted at commit time
        (snapshots._write_changes — Delta CDF's public design), so
        batch size is churn-sized, never a rescan.

        Scale shape: the DRIVER only plans (file, role) splits from
        manifest metadata — like Iceberg's planFiles — while row reads
        run as one EXECUTOR task per file (partition-based
        DataSourceStreamReader). No change row ever passes through
        the driver, so a busy feed on a 100 TB table scales with the
        cluster, not one process.
        """

        @classmethod
        def name(cls) -> str:
            return "scratch_cdc"

        def schema(self):
            import json as _json

            fs, base = _cdc_resolve(self.options)
            vs = _cdc_versions(fs, base)
            if not vs:
                raise ValueError(
                    f"{base} has no snapshots; commit one first"
                )
            m = _cdc_manifest(fs, base, vs[-1])
            fields = T.StructType.fromJson(_json.loads(m["schema"]))
            return T.StructType(
                list(fields.fields)
                + [T.StructField("_change_type", T.StringType())]
            )

        def streamReader(self, schema):
            return _ScratchCdcStreamReader(self.options, schema)

    class _CdcPartition(InputPartition):
        def __init__(self, path: str, role: str, dv_rels=()):
            self.path = path
            self.role = role  # 'insert' (data file) | 'change' (CDF file)
            # merge-on-read tombstones for THIS file (bootstrap only:
            # the end version's standing deletion vectors must not
            # re-emit deleted rows as inserts). Shipped as the
            # deletion-vector SIDECAR PATHS, not materialized rids —
            # the r10 advisory: embedding per-file rid tuples put the
            # whole vector in driver memory and tens of MB into every
            # pickled partition near the reader threshold. The
            # EXECUTOR reads its own file's tombstones from the
            # sidecars (a small column-pruned parquet read per task);
            # partitions whose file no vector names carry an empty
            # tuple and skip the read entirely.
            self.dv_rels = tuple(dv_rels)

    class _ScratchCdcStreamReader(DataSourceStreamReader):
        """Partition-planning CDC reader. Per version transition in
        (start, end]:

        - manifest carries ``changes`` (COW DELETE/MERGE/rollback
          wrote explicit change files; maintenance records an empty
          set): one partition per change file — the commit's exact
          delete/insert rows.
        - no ``changes`` key (pure append): one partition per ADDED
          data file, emitted as inserts.
        - files removed with no change record (out-of-band mutation /
          pre-CDF writer): loud planning error, never a guess.

        A start offset below the retention window raises
        CdcRetentionError at planning time — the documented 'errs
        loudly, never silently' contract. A missing/half-written
        LATEST manifest is the opposite case: latestOffset only
        advances to versions whose manifest parses, so a mid-PUT
        commit is simply not yet an offset."""

        def __init__(self, options, schema):
            # resolved ONCE on the driver; the pyarrow FileSystem
            # pickles with the reader into every executor task
            self._fs, self.base = _cdc_resolve(options)
            # _change_type is synthesized per-partition, not read
            # from data files
            self.fields = [
                (f.name, f.dataType)
                for f in schema.fields
                if f.name != "_change_type"
            ]
            # micro-batch rate limit: at most N snapshot versions per
            # trigger (the maxOffsetsPerTrigger analogue) — a consumer
            # catching up on a long backlog advances in bounded,
            # checkpointable steps instead of one giant batch. Planner
            # state only (the Python API exposes no start offset to
            # latestOffset), so the cap applies from the second
            # trigger of a reader's lifetime: the bootstrap batch and
            # the first batch after a restart are uncapped.
            self.max_versions = int(
                options.get("maxVersionsPerTrigger", 0)
            )  # 0 = unbounded
            self._floor = 0  # latest offset this reader has declared
            # Delta's startingVersion analogue: begin the feed AT a
            # known version instead of bootstrapping the whole table
            # as inserts — the consumer that already holds a snapshot
            # (e.g. an MV built from read_snapshot at v) resumes from
            # exactly there. Applies only to a FRESH checkpoint; a
            # restart replays from the checkpointed offset as usual.
            self.starting_version = int(options.get("startingVersion", 0))
            # a declared starting version is also the rate-limit
            # floor, so maxVersionsPerTrigger caps the very first
            # catch-up batch of a startingVersion consumer
            self._floor = self.starting_version

        def initialOffset(self):
            return {"v": self.starting_version}

        def latestOffset(self):
            vs = _cdc_versions(self._fs, self.base)
            for v in reversed(vs):
                try:
                    _cdc_manifest(self._fs, self.base, v)
                except (ValueError, OSError):
                    # commit mid-PUT on a store without atomic rename
                    # (the engine's own PUTs are temp+rename, so this
                    # is the defensive path): not yet declarable
                    continue
                if self.max_versions > 0 and self._floor > 0:
                    # advance at most max_versions retained versions
                    # past the last declared offset (monotonic: the
                    # capped pick is itself a retained version)
                    ahead = [u for u in vs if u > self._floor]
                    if ahead:
                        v = min(v, ahead[: self.max_versions][-1])
                self._floor = max(self._floor, v)
                return {"v": v}
            return {"v": 0}

        def partitions(self, start, end):
            start_v, end_v = int(start["v"]), int(end["v"])
            if start_v >= end_v:
                return []
            vs = _cdc_versions(self._fs, self.base)
            if (start_v > 0 and start_v not in vs) or end_v not in vs:
                gone = start_v if start_v not in vs else end_v
                raise CdcRetentionError(
                    f"CDC cursor v{gone} of {self.base} is below the "
                    f"retention window (retained: {vs}): maintenance "
                    "truncated history past this stream's offset. "
                    "Re-bootstrap the consumer (fresh checkpoint from "
                    "offset 0, or reconcile against "
                    "snapshots.read_snapshot)."
                )
            if start_v == 0:
                # bootstrap: the end version's full state as inserts
                # (diff against the empty set needs no cancellation).
                # Standing deletion vectors mask per file — EXECUTOR-
                # side (each task reads its own file's tombstones from
                # the sidecars, see _CdcPartition). The driver only
                # needs WHICH files the vectors name: the manifest's
                # dv_files when present; for legacy manifests one
                # column-pruned read of the sidecars' `file` column
                # (distinct file names — bounded by affected files,
                # never the rid payload).
                m = _cdc_manifest(self._fs, self.base, end_v)
                dvs = tuple(m.get("dvs", []))
                named: set = set()
                if dvs:
                    if "dv_files" in m:
                        named = set(m["dv_files"])
                    else:
                        import pyarrow.parquet as _pq

                        for rel in dvs:
                            t = _pq.read_table(
                                self._fs.open_input_file(
                                    f"{self.base}/_snapshots/{rel}"
                                ),
                                columns=["file"],
                            )
                            named |= set(
                                t.column("file").to_pylist()
                            )
                return [
                    _CdcPartition(
                        f"{self.base}/{n}",
                        "insert",
                        dv_rels=dvs if n in named else (),
                    )
                    for n in _cdc_manifest_files(self._fs, self.base, m)
                ]
            parts = []
            prev_m = _cdc_manifest(self._fs, self.base, start_v)
            for v in [u for u in vs if start_v < u <= end_v]:
                m = _cdc_manifest(self._fs, self.base, v)
                if "changes" in m:
                    parts += [
                        _CdcPartition(
                            f"{self.base}/_snapshots/{rel}", "change"
                        )
                        for rel in m["changes"]
                    ]
                else:
                    removed, added = _cdc_file_diff(self._fs, self.base, prev_m, m)
                    if removed:
                        raise ValueError(
                            f"version v{v} of {self.base} removed "
                            f"{len(removed)} file(s) but recorded no "
                            "change files (out-of-band mutation or a "
                            "pre-CDF writer); use batch "
                            "snapshots.read_changes for this window"
                        )
                    parts += [
                        _CdcPartition(f"{self.base}/{n}", "insert")
                        for n in sorted(added)
                    ]
                prev_m = m
            return parts

        def read(self, partition):
            # EXECUTOR-side: one parquet file per task, emitted as
            # Arrow RecordBatches (vectorized end-to-end — no
            # per-row Python objects). Schema evolution aligns by
            # name: a column the file predates reads as typed NULLs,
            # a type-widened column casts to the stream schema.
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import to_arrow_type

            is_change = partition.role == "change"
            # bootstrap under standing deletion vectors: THIS task
            # resolves its own file's tombstones from the sidecars —
            # a small (file, rid) parquet read per task, filtered to
            # the task's file basename (parquet row-group stats on
            # `file` prune sidecars that don't mention it)
            dv_rids: set = set()
            dv_rels = getattr(partition, "dv_rels", ()) or ()
            if dv_rels:
                my_file = partition.path.rsplit("/", 1)[-1]
                for rel in dv_rels:
                    t = pq.read_table(
                        self._fs.open_input_file(
                            f"{self.base}/_snapshots/{rel}"
                        )
                    )
                    import pyarrow.compute as pc

                    mask = pc.equal(t.column("file"), my_file)
                    dv_rids |= set(
                        t.filter(mask).column("rid").to_pylist()
                    )
            want = [(n, to_arrow_type(dt)) for n, dt in self.fields]
            pf = pq.ParquetFile(self._fs.open_input_file(partition.path))
            for batch in pf.iter_batches():
                if dv_rids and "__row_id" in batch.schema.names:
                    # bootstrap under standing deletion vectors: drop
                    # this file's tombstoned rows (vectorized mask)
                    import pyarrow.compute as pc

                    batch = batch.filter(
                        pc.invert(
                            pc.is_in(
                                batch.column("__row_id"),
                                value_set=pa.array(
                                    sorted(dv_rids), type=pa.int64()
                                ),
                            )
                        )
                    )
                    if batch.num_rows == 0:
                        continue
                n_rows = batch.num_rows
                cols, names = [], []
                for name, atype in want:
                    if name in batch.schema.names:
                        col = batch.column(name)
                        if col.type != atype:
                            col = col.cast(atype)
                    else:
                        col = pa.nulls(n_rows, type=atype)
                    cols.append(col)
                    names.append(name)
                if is_change:
                    cols.append(batch.column("_change_type"))
                else:
                    cols.append(
                        pa.array(["insert"] * n_rows, type=pa.string())
                    )
                names.append("_change_type")
                yield pa.RecordBatch.from_arrays(cols, names=names)

        def commit(self, end):
            pass

except ImportError:  # pragma: no cover - pre-4.0 PySpark
    ScratchNdjsonDataSource = None  # type: ignore[assignment]
    ScratchCdcDataSource = None  # type: ignore[assignment]
