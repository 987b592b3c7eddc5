from __future__ import annotations

import json
import os

from scratchdb_spark import sources


def test_read_ndjson_roundtrip(spark, tmp_path):
    p = str(tmp_path / "d.ndjson")
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"i": i, "s": f"row{i}"}) + "\n")
    df = sources.read_ndjson(spark, p)
    assert df.count() == 5
    assert {r["s"] for r in df.collect()} == {f"row{i}" for i in range(5)}


def test_read_csv_header_and_schema(spark, tmp_path):
    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = sources.read_csv(spark, p)
    assert df.columns == ["a", "b"]
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_write_result_formats(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "n")
    for fmt in ("parquet", "json", "csv"):
        out = str(tmp_path / fmt)
        sources.write_result(df, out, fmt=fmt, single_file=True)
        files = [f for f in os.listdir(out) if not f.startswith(("_", "."))]
        assert len(files) == 1, fmt
    back = sources.read_parquet(spark, str(tmp_path / "parquet"))
    assert sorted(r["n"] for r in back.collect()) == list(range(10))


def test_scratch_ndjson_datasource_vote_and_flatten(spark, tmp_path):
    """Custom DataSource: whole-batch vote (int+string -> string,
    int+float -> double), horizontal flatten, cast-else-null, and
    per-file partitioning."""
    from scratchdb_spark.sources import ScratchNdjsonDataSource

    spark.dataSource.register(ScratchNdjsonDataSource)
    (tmp_path / "a.ndjson").write_text(
        '{"user": {"id": 7}, "score": 1}\n'
        'not json at all\n'
        '{"user": {"id": "x"}, "score": 2.5}\n'
    )
    (tmp_path / "b.ndjson").write_text('{"score": 3}\n')
    df = (
        spark.read.format("scratch_ndjson")
        .option("path", str(tmp_path))
        .load()
    )
    assert dict(df.dtypes) == {"score": "double", "user_id": "string"}
    rows = sorted(df.collect(), key=lambda r: (r.score is None, r.score))
    assert [(r.score, r.user_id) for r in rows] == [
        (1.0, "7"), (2.5, "x"), (3.0, None),
    ]
    # explicit schema skips the sample pass and coerces cast-else-null
    from pyspark.sql import types as T
    explicit = T.StructType([T.StructField("score", T.LongType())])
    df2 = (
        spark.read.format("scratch_ndjson")
        .schema(explicit)
        .option("path", str(tmp_path))
        .load()
    )
    # 2.5 is not an int -> NULL under cast-else-null
    assert sorted(r.score for r in df2.collect() if r.score is not None) == [1, 3]


def test_scratch_ndjson_stream_tails_rotated_files(spark, tmp_path):
    """Streaming half: new rotated files picked up incrementally;
    filename offsets give exactly-once across micro-batches."""
    from pyspark.sql import types as T

    from scratchdb_spark.sources import ScratchNdjsonDataSource

    spark.dataSource.register(ScratchNdjsonDataSource)
    land = tmp_path / "landing"
    land.mkdir()
    (land / "1000_0.ndjson").write_text('{"k": 1}\n{"k": 2}\n')
    schema = T.StructType([T.StructField("k", T.LongType())])
    q = (
        spark.readStream.format("scratch_ndjson")
        .schema(schema)
        .option("path", str(land))
        .load()
        .writeStream.format("memory")
        .queryName("ndjson_tail")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.k for r in spark.sql("SELECT * FROM ndjson_tail").collect()}
        assert got == {1, 2}
        (land / "1001_1.ndjson").write_text('{"k": 3}\n')
        q.processAllAvailable()
        got = {r.k for r in spark.sql("SELECT * FROM ndjson_tail").collect()}
        assert got == {1, 2, 3}
    finally:
        q.stop()


def test_scratch_cdc_stream_follows_snapshot_versions(spark, tmp_path):
    """CDC streaming source: bootstrap emits the current state as
    inserts; later micro-batches carry only the churn (appends as
    inserts, COW deletes as deletes, carried survivors cancel);
    version-number offsets make replay exact."""
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, 10), (2, 20)], "__row_id long, amount long"
        ),
    )
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(3, 30)], "__row_id long, amount long"),
    )
    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.format("memory")
        .queryName("cdc_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_feed").collect()
        }
        # bootstrap: current state as inserts
        assert got == {(1, 10, "insert"), (2, 20, "insert"),
                       (3, 30, "insert")}

        # churn: one COW delete + one append -> only the delta arrives
        snap.delete_where(wh, "db", "t", F.col("__row_id") == 2)
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame([(4, 40)], "__row_id long, amount long"),
        )
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_feed").collect()
        }
        assert got == {
            (1, 10, "insert"), (2, 20, "insert"), (3, 30, "insert"),
            (2, 20, "delete"), (4, 40, "insert"),
        }
    finally:
        q.stop()


def test_cdc_stream_drives_incremental_mv(spark, tmp_path):
    """End-to-end incremental pipeline: snapshot DML -> scratch_cdc
    stream -> foreachBatch maintain_sum_mv — the MV advances at churn
    cost per micro-batch and always equals the full recompute."""
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators.incremental import (
        maintain_sum_mv,
        sum_mv_of,
    )
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "__row_id long, k string, amount long"
        ),
    )

    mv_state = {"mv": spark.createDataFrame(
        [], "k string, value_sum long, n_rows long"
    )}

    def advance(batch_df, _batch_id):
        # the CDC batch IS a change feed: apply the delta rule
        mv = maintain_sum_mv(
            mv_state["mv"], batch_df, ["k"], "amount"
        )
        # pin the tiny MV so the next batch doesn't replan history
        mv_state["mv"] = spark.createDataFrame(
            mv.collect(), "k string, value_sum long, n_rows long"
        )

    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.foreachBatch(advance)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(3, "a", 5)], "__row_id long, k string, amount long"
            ),
        )
        snap.delete_where(wh, "db", "t", F.col("__row_id") == 2)
        q.processAllAvailable()
    finally:
        q.stop()
    want = sorted(
        map(tuple, sum_mv_of(
            snap.read_snapshot(wh, "db", "t"), ["k"], "amount"
        ).collect())
    )
    got = sorted(map(tuple, mv_state["mv"].collect()))
    assert got == want == [("a", 15, 2)]


def test_cdc_partition_planning_executor_reads(spark, tmp_path):
    """Partition-planning CDC reader (the scale path): the driver
    plans one split per file from manifest METADATA only; row reads
    happen in read(partition) — the method Spark invokes inside
    executor tasks. Bootstrap plans one partition per data file; a
    DML transition plans the commit's persisted change files; an
    append transition plans only the added files."""
    import pytest
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import (
        CdcRetentionError,
        ScratchCdcDataSource,
    )
    from scratchdb_spark.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, 10), (2, 20)], "__row_id long, amount long"
        ).repartition(2),
    )
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(3, 30)], "__row_id long, amount long"),
    )
    opts = {"path": str(tmp_path / "wh"), "database": "db", "table": "t"}
    ds = ScratchCdcDataSource(opts)
    reader = ds.streamReader(ds.schema())
    assert reader.latestOffset() == {"v": 2}

    def rows_of(parts):
        # read() yields Arrow RecordBatches (the vectorized executor
        # path); flatten to schema-ordered tuples for assertions
        out = []
        for p in parts:
            for b in reader.read(p):
                out += [tuple(d.values()) for d in b.to_pylist()]
        return sorted(out)

    # bootstrap: >1 partition (one per data file), all inserts
    boot = reader.partitions({"v": 0}, {"v": 2})
    assert len(boot) >= 3 and all(p.role == "insert" for p in boot)
    assert rows_of(boot) == [
        (1, 10, "insert"), (2, 20, "insert"), (3, 30, "insert")
    ]

    # COW delete: the transition plans CHANGE FILES, and reading the
    # partition yields exactly the deleted row — no manifest diff, no
    # driver-side row materialization
    snap.delete_where(wh, "db", "t", F.col("__row_id") == 1)
    dml = reader.partitions({"v": 2}, {"v": 3})
    assert dml and all(p.role == "change" for p in dml)
    assert rows_of(dml) == [(1, 10, "delete")]

    # append transition: only the added file is planned
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(4, 40)], "__row_id long, amount long"),
    )
    app = reader.partitions({"v": 3}, {"v": 4})
    assert rows_of(app) == [(4, 40, "insert")]

    # retention contract: maintenance truncates history; a cursor
    # below the window fails AT PLANNING TIME with the explicit
    # retention error — never a silent empty batch
    snap.maintain_table(wh, "db", "t")
    latest = reader.latestOffset()["v"]
    with pytest.raises(CdcRetentionError, match="retention"):
        reader.partitions({"v": 3}, {"v": latest})


def test_cdc_stream_errs_loudly_below_retention(spark, tmp_path):
    """ADVICE r5 (medium): an open stream whose checkpointed offset
    was expired by maintain_table must FAIL its next poll with the
    retention error, not return empty batches forever (a silent stall
    would leave downstream MVs stale with no signal)."""
    import pytest

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(1, 10)], "__row_id long, amount long"),
    )

    def start():
        # foreachBatch sink: supports restart-from-checkpoint (the
        # memory sink does not)
        return (
            spark.readStream.format("scratch_cdc")
            .option("path", str(tmp_path / "wh"))
            .option("database", "db")
            .option("table", "t")
            .load()
            .writeStream.foreachBatch(lambda df, _bid: df.count())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()  # checkpoint offset is now v1
    finally:
        q.stop()

    # maintenance truncates history past the stream's offset, then
    # the table keeps moving
    snap.maintain_table(wh, "db", "t")
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(2, 20)], "__row_id long, amount long"),
    )

    q = start()  # resumes from the checkpointed (now-expired) offset
    try:
        with pytest.raises(Exception, match="retention"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_cdc_stream_reads_align_evolved_schema(spark, tmp_path):
    """Executor reads align by NAME to the stream schema: files
    written before a column add yield typed NULLs for it (the Arrow
    nulls path), newer files carry their values."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(1, 10)], "__row_id long, amount long"),
    )
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(2, 20, "x")], "__row_id long, amount long, note string"
        ),
    )
    ds = ScratchCdcDataSource(
        {"path": str(tmp_path / "wh"), "database": "db", "table": "t"}
    )
    reader = ds.streamReader(ds.schema())
    rows = sorted(
        tuple(d.values())
        for p in reader.partitions({"v": 0}, {"v": 2})
        for b in reader.read(p)
        for d in b.to_pylist()
    )
    assert rows == [
        (1, 10, None, "insert"),
        (2, 20, "x", "insert"),
    ]


def test_cdc_stream_max_versions_per_trigger(spark, tmp_path):
    """maxVersionsPerTrigger=1 (the maxOffsetsPerTrigger analogue):
    a backlog of commits drains one version per micro-batch — bounded,
    checkpointable steps instead of one giant catch-up batch."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(1, 10)], "__row_id long, amount long"),
    )
    batches: list = []

    def sink(df, _bid):
        rows = sorted(
            (r["__row_id"], r["_change_type"]) for r in df.collect()
        )
        if rows:
            batches.append(rows)

    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert batches == [[(1, "insert")]]  # bootstrap
        for rid in (2, 3):
            snap.append_versioned(
                wh, "db", "t",
                spark.createDataFrame(
                    [(rid, rid * 10)], "__row_id long, amount long"
                ),
            )
        q.processAllAvailable()
    finally:
        q.stop()
    # the two-commit backlog drained as TWO single-version batches
    assert batches == [
        [(1, "insert")],
        [(2, "insert")],
        [(3, "insert")],
    ]


def test_cdc_stream_starting_version(spark, tmp_path):
    """startingVersion (Delta's analogue): a fresh stream begins AT a
    known version — no bootstrap of the pre-existing state — so a
    consumer that already holds read_snapshot(v) resumes exactly
    there."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(1, 10)], "__row_id long, amount long"),
    )
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(2, 20)], "__row_id long, amount long"),
    )
    rows: list = []
    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .option("startingVersion", str(v1))
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: rows.extend(
                (r["__row_id"], r["_change_type"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # only the post-v1 append arrives; row 1 (pre-existing state at
    # the starting version) is NOT replayed
    assert sorted(rows) == [(2, "insert")]


def test_cdc_stream_on_non_file_scheme(spark, tmp_path):
    """The CDC source's planner and executor reads go through
    pyarrow.fs, so a warehouse on a non-local filesystem streams the
    same as local disk. A pickled SubTreeFileSystem (a real alternate
    pyarrow FileSystem with its own path namespace, mounted on local
    disk so no external service is needed) passed via the
    filesystemPickle option exercises the same resolution + open
    seams an s3:// or hdfs:// deployment hits — including the
    FileSystem crossing into the source's Python worker process and
    pickling into executor tasks, which a driver-JVM Hadoop FS could
    never do."""
    from pyarrow import fs as pafs
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark import sources as src
    from scratchdb_spark.tables import Warehouse

    mount = str(tmp_path / "mnt")
    os.makedirs(mount)
    # warehouse physically at <mount>/wh; the CDC source sees it only
    # through the subtree filesystem as path "wh"
    wh = Warehouse(spark, f"{mount}/wh")
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, 10), (2, 20)], "__row_id long, amount long"
        ),
    )

    fs_opt = src.cdc_filesystem_option(
        pafs.SubTreeFileSystem(mount, pafs.LocalFileSystem())
    )
    spark.dataSource.register(src.ScratchCdcDataSource)
    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", "wh")
        .option("filesystemPickle", fs_opt)
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.format("memory")
        .queryName("cdc_subtree")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_subtree").collect()
        }
        assert got == {(1, 10, "insert"), (2, 20, "insert")}
        # churn through the filesystem too: COW delete streams its
        # change file, append streams the added file
        snap.delete_where(wh, "db", "t", F.col("__row_id") == 1)
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(3, 30)], "__row_id long, amount long"
            ),
        )
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_subtree").collect()
        }
        assert got == {
            (1, 10, "insert"), (2, 20, "insert"),
            (1, 10, "delete"), (3, 30, "insert"),
        }
    finally:
        q.stop()


def test_cdc_planning_across_shard_threshold_crossing(
    spark, tmp_path, monkeypatch
):
    """The commit that crosses _SHARD_THRESHOLD (inline manifest ->
    sharded manifest-list) is the one transition where shard-reference
    cancellation can't apply — the planner falls back to diffing full
    file lists (documented one-time O(table-files) planning cost).
    The batch it plans must still be EXACT: only the appended files,
    as inserts, with no rows lost or duplicated at the boundary."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    monkeypatch.setattr(snap, "_SHARD_THRESHOLD", 6)
    monkeypatch.setattr(snap, "_SHARD_SIZE", 4)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    # v1: 4 files — just under the (monkeypatched) threshold: inline
    v1 = snap.append_versioned(
        wh, "db", "t",
        spark.range(0, 40)
        .selectExpr("id AS __row_id", "id AS k")
        .repartitionByRange(4, "k"),
    )
    m1 = snap._manifest(wh, "db", "t", v1)
    assert "files" in m1 and "shards" not in m1

    # v2: append 4 more files — crosses the threshold: sharded
    v2 = snap.append_versioned(
        wh, "db", "t",
        spark.range(1000, 1040)
        .selectExpr("id AS __row_id", "id AS k")
        .repartitionByRange(4, "k"),
    )
    m2 = snap._manifest(wh, "db", "t", v2)
    assert "shards" in m2 and "files" not in m2

    ds = ScratchCdcDataSource(
        {"path": str(tmp_path / "wh"), "database": "db", "table": "t"}
    )
    reader = ds.streamReader(ds.schema())
    # the inline->sharded transition plans EXACTLY the added files
    parts = reader.partitions({"v": v1}, {"v": v2})
    assert len(parts) == 4 and all(p.role == "insert" for p in parts)
    rows = []
    for p in parts:
        for b in reader.read(p):
            rows += [tuple(d.values()) for d in b.to_pylist()]
    assert sorted(rows) == [
        (i, i, "insert") for i in range(1000, 1040)
    ]

    # and the next sharded->sharded append goes back to O(churn)
    # shard-reference planning
    v3 = snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(2000, 2000)], "__row_id long, k long"
        ).coalesce(1),
    )
    parts3 = reader.partitions({"v": v2}, {"v": v3})
    assert len(parts3) == 1 and parts3[0].role == "insert"


def test_cdc_filesystem_pickle_rejects_non_filesystem():
    """filesystemPickle is code-equivalent by design (documented
    trust boundary); a payload that unpickles to anything but a
    pyarrow FileSystem must fail fast with a clear TypeError, not
    surface as opaque attribute errors deep in executor reads."""
    import base64
    import pickle

    import pytest

    from scratchdb_spark import sources as src

    bogus = base64.b64encode(pickle.dumps({"not": "a fs"})).decode()
    with pytest.raises(TypeError, match="pyarrow.fs.FileSystem"):
        src._cdc_resolve(
            {"path": "/tmp/x", "database": "db", "table": "t",
             "filesystemPickle": bogus}
        )
    # the happy path still resolves
    import pyarrow.fs as pafs

    good = src.cdc_filesystem_option(pafs.LocalFileSystem())
    fs, base = src._cdc_resolve(
        {"path": "/tmp/x", "database": "db", "table": "t",
         "filesystemPickle": good}
    )
    assert isinstance(fs, pafs.FileSystem) and base == "/tmp/x/db/t"


def test_cdc_stream_errs_loudly_on_cdc_false_overwrite(spark, tmp_path):
    """overwrite_versioned(cdc=False) (derived tables, new r8) writes
    no change files while removing every previous file — a streaming
    cursor crossing that version must get the documented loud
    removed-files-without-change-files error, never a silently wrong
    feed (batch read_changes remains exact via the manifest diff;
    that path is pinned in test_ingest_pipeline)."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame([(1, 10)], "__row_id long, amount long"),
    )

    def start():
        return (
            spark.readStream.format("scratch_cdc")
            .option("path", str(tmp_path / "wh"))
            .option("database", "db")
            .option("table", "t")
            .load()
            .writeStream.foreachBatch(lambda df, _bid: df.count())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()  # cursor now at v1
    finally:
        q.stop()

    snap.overwrite_versioned(
        wh, "db", "t",
        spark.createDataFrame([(9, 90)], "__row_id long, amount long"),
        cdc=False,
    )
    q = start()
    try:
        with _pytest.raises(
            StreamingQueryException, match="change files"
        ):
            q.processAllAvailable()
    finally:
        q.stop()

    # the cdc=True default DOES stream the transition: delete+insert
    snap.overwrite_versioned(
        wh, "db", "t",
        spark.createDataFrame([(7, 70)], "__row_id long, amount long"),
    )
    seen = []
    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: seen.extend(
                (r["__row_id"], r["_change_type"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # fresh checkpoint: bootstrap of the current state (one insert)
    assert sorted(seen) == [(7, "insert")]


def test_cdc_stream_drives_minmax_and_distinct_mvs(spark, tmp_path):
    """The CDC stream also drives the NON-distributive MV shapes
    (new r8): foreachBatch maintain_minmax_mv (boundary deletes
    trigger the bounded rescan against the batch-end snapshot) and
    maintain_distinct_support (pure algebra, never rescans) — both
    equal to full recomputes after a history with a duplicate-
    boundary delete. Base/feed alignment: the rescan reads the
    snapshot the feed has advanced to (here, batches are drained
    between DML rounds, so latest == feed end — the contract the
    operator docstring states)."""
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators.incremental import (
        distinct_counts_of,
        distinct_support_of,
        maintain_distinct_support,
        maintain_minmax_mv,
        minmax_mv_of,
    )
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, "a", 5), (2, "a", 5), (3, "a", 9), (4, "b", 1)],
            "__row_id long, k string, amount long",
        ),
    )

    state = {
        "mv": spark.createDataFrame(
            [], "k string, value_min long, value_max long, n_rows long"
        ),
        "sup": spark.createDataFrame(
            [], "k string, amount long, mult long"
        ),
    }

    def advance(batch_df, _batch_id):
        base = snap.read_snapshot(wh, "db", "t")
        mv = maintain_minmax_mv(
            state["mv"], batch_df, base, ["k"], "amount"
        )
        state["mv"] = spark.createDataFrame(
            mv.collect(),
            "k string, value_min long, value_max long, n_rows long",
        )
        sup = maintain_distinct_support(
            state["sup"], batch_df, ["k"], "amount"
        )
        state["sup"] = spark.createDataFrame(
            sup.collect(), "k string, amount long, mult long"
        )

    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.foreachBatch(advance)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate-boundary delete: one of the two (a,5) rows via a
        # keys-frame delete -> minmax must RESCAN group a, distinct
        # support must KEEP value 5
        snap.delete_keys(
            wh, "db", "t",
            spark.createDataFrame([(1,)], "__row_id long"),
            key_col="__row_id",
        )
        q.processAllAvailable()
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                [(5, "b", 7)], "__row_id long, k string, amount long"
            ),
        )
        q.processAllAvailable()
    finally:
        q.stop()

    base = snap.read_snapshot(wh, "db", "t")
    assert sorted(map(tuple, state["mv"].collect())) == sorted(
        map(tuple, minmax_mv_of(base, ["k"], "amount").collect())
    ) == [("a", 5, 9, 2), ("b", 1, 7, 2)]
    assert sorted(map(tuple, state["sup"].collect())) == sorted(
        map(tuple, distinct_support_of(base, ["k"], "amount").collect())
    )
    assert sorted(
        map(tuple, distinct_counts_of(state["sup"], ["k"]).collect())
    ) == [("a", 2), ("b", 2)]


def test_cdc_stream_drives_kmv_sketch_mv(spark, tmp_path):
    """The CDC stream drives the sketch-STATE MV (AggregatingMergeTree
    -State/-Merge pattern, new r8): foreachBatch merges each batch's
    KMV delta states into the stored state; after insert-only history
    the state equals a from-scratch rebuild byte-for-byte, and after
    a delete (ignored via allow_delete_rows — the documented
    distinct-EVER semantics) the state still equals the rebuild over
    everything ever inserted."""
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators.incremental import (
        kmv_state_of,
        maintain_kmv_state,
    )
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    k = 8
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(i, "ab"[i % 2], i * 7 % 23) for i in range(20)],
            "__row_id long, k string, v long",
        ),
    )
    state = {
        "st": spark.createDataFrame(
            [], "k string, kmv array<long>, n_mins long"
        )
    }

    def advance(batch_df, _batch_id):
        st = maintain_kmv_state(
            state["st"], batch_df, ["k"], "v", k,
            allow_delete_rows=True,
        )
        state["st"] = spark.createDataFrame(
            st.collect(), "k string, kmv array<long>, n_mins long"
        )

    q = (
        spark.readStream.format("scratch_cdc")
        .option("path", str(tmp_path / "wh"))
        .option("database", "db")
        .option("table", "t")
        .load()
        .writeStream.foreachBatch(advance)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    ever = [(i, "ab"[i % 2], i * 7 % 23) for i in range(20)]
    try:
        q.processAllAvailable()
        more = [(100 + i, "abc"[i % 3], i * 5 % 31) for i in range(15)]
        ever += more
        snap.append_versioned(
            wh, "db", "t",
            spark.createDataFrame(
                more, "__row_id long, k string, v long"
            ),
        )
        q.processAllAvailable()
        got_mid = {
            r["k"]: tuple(r["kmv"]) for r in state["st"].collect()
        }
        want_mid = {
            r["k"]: tuple(r["kmv"])
            for r in kmv_state_of(
                snap.read_snapshot(wh, "db", "t"), ["k"], "v", k
            ).collect()
        }
        assert got_mid == want_mid
        # delete flows through the feed; sketch state ignores it and
        # keeps distinct-EVER semantics
        snap.delete_where(wh, "db", "t", F.col("k") == "a")
        q.processAllAvailable()
    finally:
        q.stop()

    ever_df = spark.createDataFrame(
        ever, "__row_id long, k string, v long"
    )
    want = {
        r["k"]: tuple(r["kmv"])
        for r in kmv_state_of(ever_df, ["k"], "v", k).collect()
    }
    got = {r["k"]: tuple(r["kmv"]) for r in state["st"].collect()}
    assert got == want


def test_stream_txn_sink_exactly_once_across_restart(spark, tmp_path):
    """Exactly-once streaming sink: foreachBatch commits with
    txn=(query_name, batch_id); a crash AFTER the snapshot commit but
    BEFORE the checkpoint records the batch makes Spark REPLAY that
    batch on restart — without txn that double-appends (the
    documented at-least-once posture), with txn the replay no-ops
    and the table equals the source exactly."""
    import json as _json
    import os

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.tables import Warehouse

    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    for i in range(2):
        with open(src_dir / f"f{i}.json", "w") as f:
            for j in range(5):
                rid = i * 5 + j
                f.write(_json.dumps({"__row_id": rid, "v": rid * 10}) + "\n")

    wh = Warehouse(spark, str(tmp_path / "wh"))
    crashed = {"done": False}

    def sink(batch_df, batch_id):
        snap.append_versioned(
            wh, "db", "sink",
            batch_df, txn=("q1", int(batch_id)),
        )
        if not crashed["done"]:
            crashed["done"] = True
            # die between the snapshot commit and the checkpoint's
            # batch commit -> Spark will replay this batch_id
            raise RuntimeError("injected post-commit crash")

    def start():
        return (
            spark.readStream.schema("__row_id long, v long")
            .json(str(src_dir))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    try:
        q.awaitTermination()
    except Exception:
        pass  # the injected crash surfaces here
    q2 = start()  # restart from the checkpoint: replays the batch
    q2.awaitTermination()

    got = sorted(
        (r["__row_id"], r["v"])
        for r in snap.read_snapshot(wh, "db", "sink").collect()
    )
    assert got == [(i, i * 10) for i in range(10)]  # no duplicates


def test_scratch_cdc_stream_mor_delete_and_masked_bootstrap(
    spark, tmp_path
):
    """Merge-on-read deletes and the CDC stream: (a) a live cursor
    receives the MoR commit's explicit delete rows (no file changed,
    but change files carry the exact preimages); (b) a FRESH consumer
    bootstrapping from offset 0 under the standing vector must NOT
    receive tombstoned rows as inserts (each bootstrap partition
    carries its file's tombstone ids; the arrow read drops them)."""
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "__row_id long, amount long"
        ),
    )

    def feed(name: str, ckpt: str):
        return (
            spark.readStream.format("scratch_cdc")
            .option("path", str(tmp_path / "wh"))
            .option("database", "db")
            .option("table", "t")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )

    q = feed("cdc_live", "ckpt_live")
    try:
        q.processAllAvailable()
        # (a) live cursor sees the MoR delete as explicit delete rows
        snap.delete_where_mor(wh, "db", "t", F.col("__row_id") == 2)
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_live").collect()
        }
        assert got == {
            (1, "insert"), (2, "insert"), (3, "insert"),
            (2, "delete"),
        }
    finally:
        q.stop()

    # (b) fresh bootstrap under the standing vector: no ghost inserts
    q2 = feed("cdc_boot", "ckpt_boot")
    try:
        q2.processAllAvailable()
        got = {
            (r["__row_id"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_boot").collect()
        }
        assert got == {(1, "insert"), (3, "insert")}
    finally:
        q2.stop()


def test_scratch_cdc_stream_mor_update_and_merge(spark, tmp_path):
    """The r11 MoR DML family through the LIVE CDC stream: an
    update_where_mor commit delivers its preimage-delete +
    postimage-insert pair, a merge_upsert_mor commit delivers the
    replaced key's pair plus the fresh insert, and a FRESH consumer
    bootstrapping under the standing vectors receives exactly the
    VISIBLE state — old copies masked executor-side (dv_rels), the
    appended postimage files as plain inserts."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.tables import Warehouse

    spark.dataSource.register(ScratchCdcDataSource)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    snap.append_versioned(
        wh, "db", "t",
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "__row_id long, amount long"
        ),
    )

    def feed(name: str, ckpt: str):
        return (
            spark.readStream.format("scratch_cdc")
            .option("path", str(tmp_path / "wh"))
            .option("database", "db")
            .option("table", "t")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )

    q = feed("cdc_dml_live", "ckpt_dml_live")
    try:
        q.processAllAvailable()
        snap.update_where_mor(
            wh, "db", "t", "__row_id = 2", {"amount": "amount + 1"}
        )
        snap.merge_upsert_mor(
            wh, "db", "t",
            spark.createDataFrame(
                [(3, 99), (4, 40)], "__row_id long, amount long"
            ),
            "__row_id",
        )
        q.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_dml_live").collect()
        }
        assert got == {
            (1, 10, "insert"), (2, 20, "insert"), (3, 30, "insert"),
            (2, 20, "delete"), (2, 21, "insert"),     # the MoR update
            (3, 30, "delete"), (3, 99, "insert"),     # the MoR merge
            (4, 40, "insert"),
        }
    finally:
        q.stop()

    # fresh bootstrap under BOTH standing vectors: exactly the
    # visible rows, old physical copies masked
    q2 = feed("cdc_dml_boot", "ckpt_dml_boot")
    try:
        q2.processAllAvailable()
        got = {
            (r["__row_id"], r["amount"], r["_change_type"])
            for r in spark.sql("SELECT * FROM cdc_dml_boot").collect()
        }
        assert got == {
            (1, 10, "insert"), (2, 21, "insert"),
            (3, 99, "insert"), (4, 40, "insert"),
        }
    finally:
        q2.stop()
