"""Streaming ingest + event-time operator tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from scratchdb_spark.streaming.ingest_stream import (
    start_ingest_stream,
    streaming_dedup,
    windowed_event_counts,
)
from scratchdb_spark.tables import Warehouse, table


def test_streaming_ingest_available_now(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    src = os.path.join(landing, "db1", "t")
    os.makedirs(src)
    with open(os.path.join(src, "batch1.ndjson"), "w") as f:
        for i in range(5):
            f.write(json.dumps({"__row_id": i, "x": i * 10}) + "\n")
    with open(os.path.join(src, "batch2.ndjson"), "w") as f:
        f.write(json.dumps({"__row_id": 5, "x": 50, "extra": "e"}) + "\n")

    q = start_ingest_stream(
        spark, wh, landing, "db1", "t",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    # under a loaded box (full suite) 120s can expire mid-batch; make
    # the wait generous and assert it actually finished so a timeout
    # fails loudly instead of as a confusing row-count mismatch
    assert q.awaitTermination(600), "ingest stream did not finish in 600s"
    rows = {r["__row_id"]: r for r in wh.read("db1", "t").collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    assert rows[3]["x"] == 30
    assert rows[5]["extra"] == "e"
    assert rows[0]["extra"] is None  # schema evolved, old rows NULL

    # restart with same checkpoint: no reprocessing (at-least-once, no dup)
    q2 = start_ingest_stream(
        spark, wh, landing, "db1", "t",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    assert q2.awaitTermination(600), "restarted stream did not finish"
    assert wh.read("db1", "t").count() == 6


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    out = windowed_event_counts(ev, "6 hours", "1 hour")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["n"] for r in rows) == ev.count()


def test_session_window_counts(spark, sf_dir):
    from scratchdb_spark.streaming.ingest_stream import session_window_counts

    ev = table(spark, sf_dir, "events")
    out = session_window_counts(ev, gap="30 minutes")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    # sessions are per-user, non-overlapping, end > start
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_streaming_dedup_batch_shape(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    dup = ev.unionByName(ev.limit(10))
    # dropDuplicatesWithinWatermark needs a streaming frame; on a batch
    # frame Spark executes plain dropDuplicates semantics
    out = streaming_dedup(dup)
    assert out.count() == ev.count()


def test_stateful_running_totals_across_microbatches(spark, tmp_path):
    from scratchdb_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # two files -> two micro-batches (maxFilesPerTrigger=1); u1 appears
    # in both, so cross-batch state must accumulate
    with open(os.path.join(src, "a.ndjson"), "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 1.5}) + "\n")
        f.write(json.dumps({"user_id": 1, "value": 2.5}) + "\n")
        f.write(json.dumps({"user_id": 2, "value": 10.0}) + "\n")
    with open(os.path.join(src, "b.ndjson"), "w") as f:
        f.write(json.dumps({"user_id": 1, "value": 4.0}) + "\n")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM totals").collect()
    # u1 updated once per batch it appeared in; the final (max) total
    # reflects BOTH batches -> state survived the micro-batch boundary
    u1 = [r for r in rows if r["user_id"] == 1]
    assert len(u1) == 2
    assert max(r["n_events"] for r in u1) == 3
    assert abs(max(r["value_sum"] for r in u1) - 8.0) < 1e-9
    u2 = [r for r in rows if r["user_id"] == 2]
    assert max(r["n_events"] for r in u2) == 1


def test_stateful_inactivity_session_emits_on_timeout(spark, tmp_path):
    import time

    from scratchdb_spark.streaming.stateful import inactivity_sessions

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    with open(os.path.join(src, "a.ndjson"), "w") as f:
        f.write(json.dumps({"user_id": 7, "ts": "2024-01-01T00:00:00", "value": 1.0}) + "\n")
        f.write(json.dumps({"user_id": 7, "ts": "2024-01-01T00:05:00", "value": 2.0}) + "\n")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        inactivity_sessions(stream, gap_ms=1)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    # NB: do NOT processAllAvailable() here — with a pending
    # processing-time timeout the engine runs state-cleanup
    # micro-batches continuously and processAllAvailable never
    # unblocks. Poll the sink with a deadline instead.
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(q.exception())
            rows = spark.sql("SELECT * FROM sessions").collect()
            if rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = {r["user_id"]: r for r in rows}
    assert 7 in rows, "timed-out session was not emitted"
    s = rows[7]
    assert s["n_events"] == 2
    assert abs(s["value_sum"] - 3.0) < 1e-9
    assert s["end_us"] - s["start_us"] == 5 * 60 * 1_000_000


def test_full_pipeline_writer_landing_stream(spark, tmp_path):
    """End-to-end N13->N14->N15 chain, reference shape: API buffers
    locally (BufferedWriter) -> rotation uploads to the landing zone
    through the Hadoop FS API (HadoopLanding) -> the checkpointed
    file-source stream ingests into the warehouse."""
    from scratchdb_spark.fs import HadoopLanding
    from scratchdb_spark.ingest.pipeline import IngestPipeline
    from scratchdb_spark.ingest.writer import BufferedWriter

    landing_root = str(tmp_path / "landing")
    writer = BufferedWriter(
        str(tmp_path / "buf"), max_rows=4, max_age_seconds=0,
        landing=HadoopLanding(spark, landing_root),
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    pipe = IngestPipeline(spark, wh, writer=writer)
    for i in range(10):
        pipe.insert("db1", "t", json.dumps({"i": i, "even": i % 2 == 0}))
    writer.flush_all()

    q = start_ingest_stream(
        spark, wh, f"{landing_root}/closed", "db1", "t",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    assert q.awaitTermination(600), "pipeline stream did not finish"
    rows = {r["i"]: r for r in wh.read("db1", "t").collect()}
    assert sorted(rows) == list(range(10))
    assert rows[2]["even"] is True and rows[3]["even"] is False
    assert all(r["__row_id"] is not None for r in rows.values())


def test_versioned_streaming_ingest_commits_snapshots(spark, tmp_path):
    """versioned=True: each micro-batch commits a manifest — snapshot
    readers see batch-atomic versions of the streamed table."""
    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.tables import Warehouse

    land = tmp_path / "landing"
    (land / "db" / "t").mkdir(parents=True)
    (land / "db" / "t" / "a.ndjson").write_text(
        '{"x": 1}\n{"x": 2}\n'
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = start_ingest_stream(
        spark, wh, str(land), "db", "t",
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True, versioned=True,
    )
    q.awaitTermination(120)
    vs = snap.versions(wh, "db", "t")
    assert len(vs) >= 1
    latest = snap.read_snapshot(wh, "db", "t")
    assert latest.count() == 2
    assert sorted(r["x"] for r in latest.collect()) == [1, 2]


def test_hopping_window_counts_batch_parity(spark, sf_dir):
    from scratchdb_spark.streaming.ingest_stream import (
        hopping_window_counts,
    )

    ev = table(spark, sf_dir, "events")
    out = hopping_window_counts(ev, "6 hours", "2 hours")
    rows = out.collect()
    # every event lands in exactly window/hop = 3 windows
    assert sum(r["n"] for r in rows) == ev.count() * 3
    # all window starts are hop-aligned (epoch-us multiple of 2h)
    starts = {r["window_start"] for r in rows}
    for s in starts:
        us = int(s.timestamp() * 1_000_000)
        assert us % (2 * 3600 * 1_000_000) == 0


def test_interval_join_streaming_matches_batch(spark, tmp_path, sf_dir):
    """Drive interval_join through a real two-stream micro-batch run
    (file sources, availableNow, memory sink) and assert the result
    set equals the identical join on the batch frames."""
    from scratchdb_spark.streaming.ingest_stream import interval_join

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    csrc = str(tmp_path / "clicks_src")
    psrc = str(tmp_path / "purch_src")
    ev.filter(F.col("event_type") == "click").coalesce(2).write.json(csrc)
    ev.filter(F.col("event_type") == "purchase").coalesce(2).write.json(psrc)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def sides(reader):
        c = reader(csrc).select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        p = reader(psrc).select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return interval_join(
            c, p, ("c_user", "p_user"), "c_ts", "p_ts", "30 minutes"
        ).select("c_id", "p_id")

    batch_pairs = {
        (r["c_id"], r["p_id"])
        for r in sides(lambda d: spark.read.schema(schema).json(d)).collect()
    }

    q = (
        sides(
            lambda d: spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(d)
        )
        .writeStream.format("memory")
        .queryName("ij_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "interval-join stream did not finish"
    stream_pairs = {
        (r["c_id"], r["p_id"])
        for r in spark.sql("SELECT * FROM ij_pairs").collect()
    }
    assert stream_pairs == batch_pairs
    assert len(batch_pairs) > 0


def test_landing_and_warehouse_on_viewfs_scheme(spark, tmp_path):
    """Run the rotate->upload->stream->append chain with BOTH the
    landing zone AND the warehouse on a non-file:// URI scheme.

    viewfs:// is Hadoop's client-side mount table: a real alternate
    FileSystem implementation that exercises scheme resolution, URI
    authority handling, and cross-scheme moveFromLocalFile — the same
    seams an s3a:// or hdfs:// deployment hits — while mounting onto
    local disk, so no external service is needed. The docstring claim
    'blob store is a URI scheme choice, not a code path' (fs.py) is
    tested here, not asserted."""
    from scratchdb_spark import fs as hfs
    from scratchdb_spark.fs import HadoopLanding
    from scratchdb_spark.ingest.pipeline import IngestPipeline
    from scratchdb_spark.ingest.writer import BufferedWriter

    conf = spark._jsc.hadoopConfiguration()
    for link, sub in (("landing", "vfs_landing"), ("wh", "vfs_wh"),
                      ("ckpt", "vfs_ckpt")):
        os.makedirs(str(tmp_path / sub))
        conf.set(
            f"fs.viewfs.mounttable.tcluster.link./{link}",
            f"file://{tmp_path / sub}",
        )

    landing_root = "viewfs://tcluster/landing"
    writer = BufferedWriter(
        str(tmp_path / "buf"), max_rows=4, max_age_seconds=0,
        landing=HadoopLanding(spark, landing_root),
    )
    wh = Warehouse(spark, "viewfs://tcluster/wh")
    pipe = IngestPipeline(spark, wh, writer=writer)
    for i in range(10):
        pipe.insert("db1", "t", json.dumps({"i": i}))
    writer.flush_all()

    # rotated files really landed under the viewfs scheme
    closed = f"{landing_root}/closed/db1/t"
    names = hfs.list_names(spark, closed)
    assert names, "no rotated files reached the viewfs landing zone"
    assert all(n.endswith(".ndjson") for n in names)

    q = start_ingest_stream(
        spark, wh, f"{landing_root}/closed", "db1", "t",
        checkpoint_dir="viewfs://tcluster/ckpt/s1", available_now=True,
    )
    assert q.awaitTermination(600), "viewfs stream did not finish"
    assert sorted(r["i"] for r in wh.read("db1", "t").collect()) == list(
        range(10)
    )
    # schema sidecar was written through the scheme too
    assert hfs.exists(spark, "viewfs://tcluster/wh/db1/t/_schema.json")


def test_stream_static_enrich_matches_batch(spark, tmp_path, sf_dir):
    """enrich_with_dim on a real micro-batch stream produces the same
    enriched rows as on the batch frame (stream-static joins are
    stateless per micro-batch)."""
    from scratchdb_spark.streaming.ingest_stream import enrich_with_dim

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    src = str(tmp_path / "enrich_src")
    ev.coalesce(3).write.json(src)

    batch = {
        (r["event_id"], r["c_mktsegment"])
        for r in enrich_with_dim(
            spark.read.schema(
                "event_id long, user_id long, value double"
            ).json(src),
            dim,
        ).collect()
    }

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        enrich_with_dim(stream, dim)
        .select("event_id", "c_mktsegment")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "enrich stream did not finish"
    streamed = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert streamed == batch
    assert len(batch) == ev.count()  # left join preserves every event


def test_streaming_ingest_exactly_once(spark, tmp_path):
    """exactly_once=True: each micro-batch is one idempotent txn
    commit. A FULL replay (checkpoint deleted, same landing files ->
    same batch ids) no-ops on the watermark and the table is
    byte-identical; snapshot readers see one version per real batch;
    exactly_once without versioned raises."""
    import pytest as _pytest

    from scratchdb_spark import snapshots as snap

    wh = Warehouse(spark, str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    src = os.path.join(landing, "db1", "t")
    os.makedirs(src)
    with open(os.path.join(src, "b1.ndjson"), "w") as f:
        for i in range(6):
            f.write(json.dumps({"__row_id": i, "x": i * 10}) + "\n")

    with _pytest.raises(ValueError, match="versioned"):
        start_ingest_stream(
            spark, wh, landing, "db1", "t",
            checkpoint_dir=str(tmp_path / "c0"), exactly_once=True,
        )

    q = start_ingest_stream(
        spark, wh, landing, "db1", "t",
        checkpoint_dir=str(tmp_path / "c1"), available_now=True,
        versioned=True, exactly_once=True,
    )
    assert q.awaitTermination(600)
    v1 = snap.versions(wh, "db1", "t")
    got1 = sorted(
        map(tuple, snap.read_snapshot(wh, "db1", "t").collect())
    )
    assert len(got1) == 6

    # checkpoint LOSS (stronger than a restart): the replay re-reads
    # the same files as the same batch ids; watermarks no-op them
    q2 = start_ingest_stream(
        spark, wh, landing, "db1", "t",
        checkpoint_dir=str(tmp_path / "c2"), available_now=True,
        versioned=True, exactly_once=True,
    )
    assert q2.awaitTermination(600)
    assert snap.versions(wh, "db1", "t") == v1  # no new commits
    assert sorted(
        map(tuple, snap.read_snapshot(wh, "db1", "t").collect())
    ) == got1

    # new data still flows (next batch id > watermark)
    with open(os.path.join(src, "b2.ndjson"), "w") as f:
        f.write(json.dumps({"__row_id": 6, "x": 60}) + "\n")
    q3 = start_ingest_stream(
        spark, wh, landing, "db1", "t",
        checkpoint_dir=str(tmp_path / "c1"), available_now=True,
        versioned=True, exactly_once=True,
    )
    assert q3.awaitTermination(600)
    assert snap.read_snapshot(wh, "db1", "t").count() == 7


def test_interval_join_left_outer_streaming(spark, tmp_path, sf_dir):
    """LEFT OUTER interval join on two live streams: matched pairs
    equal the batch run, and unmatched left rows EMIT with NULL right
    side once the watermark proves no in-window match can arrive —
    forced deterministically by a far-future sentinel row on both
    sources that pushes the final watermark past all real data."""
    import datetime

    from scratchdb_spark.streaming.ingest_stream import interval_join

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 120)
        .select("event_id", "ts", "user_id", "event_type")
    )
    far = datetime.datetime(2030, 1, 1)
    sentinel_c = spark.createDataFrame(
        [(10**9, far, 10**9, "click")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    sentinel_p = spark.createDataFrame(
        [(10**9 + 1, far, 10**9, "purchase")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    csrc = str(tmp_path / "c_src")
    psrc = str(tmp_path / "p_src")
    ev.filter(F.col("event_type") == "click").unionByName(
        sentinel_c
    ).coalesce(2).write.json(csrc)
    ev.filter(F.col("event_type") == "purchase").unionByName(
        sentinel_p
    ).coalesce(2).write.json(psrc)

    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def sides(reader):
        c = reader(csrc).select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        p = reader(psrc).select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return interval_join(
            c, p, ("c_user", "p_user"), "c_ts", "p_ts",
            "30 minutes", watermark="10 minutes", how="left_outer",
        ).select("c_id", "p_id")

    batch = {
        (r["c_id"], r["p_id"])
        for r in sides(
            lambda d: spark.read.schema(schema).json(d)
        ).collect()
        if r["c_id"] < 10**9
    }
    assert any(p is None for _, p in batch)  # outer rows exist

    q = (
        sides(
            lambda d: spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(d)
        )
        .writeStream.format("memory")
        .queryName("oij_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_oij"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "outer stream join did not finish"
    stream = {
        (r["c_id"], r["p_id"])
        for r in spark.sql("SELECT * FROM oij_pairs").collect()
        if r["c_id"] < 10**9
    }
    assert stream == batch


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """streaming_funnel_levels (r9): the funnel fold's accumulator
    persists across micro-batches (a chain STARTED in batch 1
    completes in batch 2), strict_deduplication interrupts across the
    boundary too, and the final per-user level equals the BATCH
    operator run over the concatenated stream — the exactness
    contract under in-order per-user delivery."""
    from pyspark.sql import functions as F

    from scratchdb_spark.operators.funnel import window_funnel_levels
    from scratchdb_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    src = str(tmp_path / "funnel_src")
    os.makedirs(src)

    def ev(u, minute, et):
        return json.dumps(
            {
                "user_id": u,
                "ts": f"2024-01-01T00:{minute:02d}:00.000Z",
                "event_type": et,
            }
        )

    # batch 1: u1 view+click; u2 view; u3 view+click
    with open(os.path.join(src, "a.ndjson"), "w") as f:
        for line in (
            ev(1, 0, "view"), ev(1, 5, "click"),
            ev(2, 0, "view"),
            ev(3, 0, "view"), ev(3, 1, "click"),
        ):
            f.write(line + "\n")
    # batch 2: u1 purchase (completes the cross-batch chain);
    # u2 click 50 min later (outside the 30-min window);
    # u3 duplicate click then purchase (dedup interrupt at 2)
    with open(os.path.join(src, "b.ndjson"), "w") as f:
        for line in (
            ev(1, 10, "purchase"),
            ev(2, 50, "click"),
            ev(3, 2, "click"), ev(3, 3, "purchase"),
        ):
            f.write(line + "\n")
    # the file source orders micro-batches by MTIME; same-second
    # writes tie-break arbitrarily, which would feed batch b first
    # and violate the operator's in-order delivery contract
    import time as _time

    now = _time.time()
    os.utime(os.path.join(src, "a.ndjson"), (now - 10, now - 10))
    os.utime(os.path.join(src, "b.ndjson"), (now, now))

    conds = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    W = 30 * 60 * 1_000_000
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_funnel_levels(
            stream, "user_id", "ts", conds, W,
            modes=("strict_deduplication",),
        )
        .writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM funnel_stream").collect()
    # final level per user = the LATEST emission, selected by the
    # operator's strictly-increasing n_seen counter (memory-sink row
    # order is not emission order; max(level) is unsafe for >= 4
    # stages under strict_deduplication — see
    # test_streaming_funnel_four_stage_interrupt_undercuts_max)
    latest: dict = {}
    for r in rows:
        prev = latest.get(r["user_id"])
        if prev is None or r["n_seen"] > prev[0]:
            latest[r["user_id"]] = (r["n_seen"], r["level"])
    final = {u: lv for u, (_, lv) in latest.items()}
    batch = {
        r["user_id"]: r["level"]
        for r in window_funnel_levels(
            spark.read.schema(
                "user_id long, ts timestamp, event_type string"
            ).json(src),
            "user_id", "ts", conds, W,
            modes=("strict_deduplication",),
        ).collect()
    }
    assert final == batch == {1: 3, 2: 1, 3: 2}
    # u1's chain really did cross the micro-batch boundary
    u1_levels = [r["level"] for r in rows if r["user_id"] == 1]
    assert 2 in u1_levels and 3 in u1_levels
    # n_seen is strictly increasing across a user's emissions — the
    # property the latest-row reduction relies on
    for u in (1, 2, 3):
        seen = sorted(r["n_seen"] for r in rows if r["user_id"] == u)
        assert len(set(seen)) == len(seen)


def test_streaming_funnel_four_stage_interrupt_undercuts_max(
    spark, tmp_path
):
    """The r10 ADVICE case: 4-stage funnel under strict_deduplication
    where batch 1 reaches level 3 and batch 2's stage-2 repeat
    interrupts with result 2 — the CORRECT final level (matches the
    batch operator) is LOWER than a previously emitted one, so a
    max(level) sink reduction reports a stale 3 while the n_seen
    latest-row reduction reports 2."""
    from pyspark.sql import functions as F

    from scratchdb_spark.operators.funnel import window_funnel_levels
    from scratchdb_spark.streaming.stateful import (
        streaming_funnel_levels,
    )

    src = str(tmp_path / "funnel4_src")
    os.makedirs(src)

    def ev(u, minute, et):
        return json.dumps(
            {
                "user_id": u,
                "ts": f"2024-01-01T00:{minute:02d}:00.000Z",
                "event_type": et,
            }
        )

    with open(os.path.join(src, "a.ndjson"), "w") as f:
        for line in (
            ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
        ):
            f.write(line + "\n")
    with open(os.path.join(src, "b.ndjson"), "w") as f:
        f.write(ev(1, 3, "click") + "\n")  # stage-2 repeat: rs = 2
    import time as _time

    now = _time.time()
    os.utime(os.path.join(src, "a.ndjson"), (now - 10, now - 10))
    os.utime(os.path.join(src, "b.ndjson"), (now, now))

    conds = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
        F.col("event_type") == "signup",
    ]
    W = 30 * 60 * 1_000_000
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        streaming_funnel_levels(
            stream, "user_id", "ts", conds, W,
            modes=("strict_deduplication",),
        )
        .writeStream.format("memory")
        .queryName("funnel4_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel4"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM funnel4_stream").collect()
    u1 = [r for r in rows if r["user_id"] == 1]
    latest = max(u1, key=lambda r: r["n_seen"])["level"]
    stale_max = max(r["level"] for r in u1)
    batch = window_funnel_levels(
        spark.read.schema(
            "user_id long, ts timestamp, event_type string"
        ).json(src),
        "user_id", "ts", conds, W,
        modes=("strict_deduplication",),
    ).collect()[0]["level"]
    assert batch == 2
    assert latest == 2  # the n_seen reduction agrees with batch
    assert stale_max == 3  # ...and max(level) demonstrably does not


def test_streaming_ingest_dedup_gated(spark, tmp_path):
    """start_ingest_stream(dedup_index=...) — r10 verdict item: the
    foreachBatch runs the append_deduped gate, so a later micro-batch
    that RESUBMITS earlier content under FRESH ids appends nothing
    (content-idempotence, stronger than the txn watermark's same-
    batch-replay guard), and the CDC-refreshed index equals a fresh
    rebuild. Also pins the wrong-source-table guard."""
    import pytest

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators import dedup_index as di

    wh = Warehouse(spark, str(tmp_path / "wh"))
    corpus = spark.createDataFrame(
        [
            (
                i,
                f"corpus document number {i} with several more "
                f"words about topic {i % 3} now",
            )
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    snap.append_versioned(wh, "db", "docs", corpus)
    di.build_dedup_index(wh, "db", "docs", "docs_lsh")

    landing = str(tmp_path / "landing")
    src = os.path.join(landing, "db", "docs")
    os.makedirs(src)
    t_fresh = (
        "a completely fresh streaming document about volcanoes "
        "and weather patterns"
    )
    t_dup = (
        "corpus document number 7 with several more words about "
        "topic 1 now"
    )  # byte-identical to corpus doc 7
    with open(os.path.join(src, "b1.ndjson"), "w") as f:
        f.write(json.dumps({"doc_id": 500, "text": t_fresh}) + "\n")
        f.write(json.dumps({"doc_id": 501, "text": t_dup}) + "\n")
    q = start_ingest_stream(
        spark, wh, landing, "db", "docs",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        versioned=True, dedup_index="docs_lsh",
    )
    assert q.awaitTermination(600), "gated stream b1 did not finish"
    cur = snap.read_snapshot(wh, "db", "docs")
    assert cur.count() == 21  # corpus 20 + fresh; dup dropped
    assert cur.filter("doc_id = 500").count() == 1
    assert cur.filter("doc_id = 501").count() == 0

    # batch 2: SAME texts, fresh ids -> the gate appends nothing
    with open(os.path.join(src, "b2.ndjson"), "w") as f:
        f.write(json.dumps({"doc_id": 600, "text": t_fresh}) + "\n")
        f.write(json.dumps({"doc_id": 601, "text": t_dup}) + "\n")
    q2 = start_ingest_stream(
        spark, wh, landing, "db", "docs",
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        versioned=True, dedup_index="docs_lsh",
    )
    assert q2.awaitTermination(600), "gated stream b2 did not finish"
    assert snap.read_snapshot(wh, "db", "docs").count() == 21

    # the refreshed index equals a rebuild, row for row
    di.build_dedup_index(wh, "db", "docs", "docs_lsh_rb")
    a = snap.read_snapshot(wh, "db", "docs_lsh")
    b = snap.read_snapshot(wh, "db", "docs_lsh_rb")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    with pytest.raises(ValueError, match="source table"):
        start_ingest_stream(
            spark, wh, landing, "db", "other",
            checkpoint_dir=str(tmp_path / "ckpt2"),
            available_now=True, dedup_index="docs_lsh",
        )
    with pytest.raises(ValueError, match="mutually exclusive"):
        start_ingest_stream(
            spark, wh, landing, "db", "docs",
            checkpoint_dir=str(tmp_path / "ckpt3"),
            available_now=True, versioned=True,
            dedup_index="docs_lsh", exactly_once=True,
        )


def test_streaming_funnel_bootstrap_matches_full_stream(
    spark, tmp_path
):
    """write_funnel_bootstrap + streaming_funnel_levels(bootstrap_dir)
    — the 'JVM fold for history, stream from cutover' path as code
    (r10 verdict item): history folds once batch-side into a
    partition-aligned state seed; the stream carries ONLY post-cutover
    events; (history levels table overlaid by the stream's max-n_seen
    changelog) == the batch fold over history+live. Pins a chain that
    SPANS the cutover, a history-only user, a live-only user, and the
    seed-mismatch guard."""
    from pyspark.sql import functions as F

    from scratchdb_spark.operators.funnel import window_funnel_levels
    from scratchdb_spark.streaming.stateful import (
        streaming_funnel_levels,
        write_funnel_bootstrap,
    )

    def ev(u, minute, et):
        return json.dumps(
            {
                "user_id": u,
                "ts": f"2024-01-01T00:{minute:02d}:00.000Z",
                "event_type": et,
            }
        )

    hist_dir = str(tmp_path / "hist")
    live_dir = str(tmp_path / "live")
    os.makedirs(hist_dir)
    os.makedirs(live_dir)
    with open(os.path.join(hist_dir, "h.ndjson"), "w") as f:
        for line in (
            ev(1, 0, "view"), ev(1, 5, "click"),      # spans cutover
            ev(2, 0, "view"), ev(2, 1, "click"), ev(2, 2, "purchase"),
            ev(4, 0, "view"),                          # history-only
        ):
            f.write(line + "\n")
    with open(os.path.join(live_dir, "l.ndjson"), "w") as f:
        for line in (
            ev(1, 10, "purchase"),                     # completes u1
            ev(3, 20, "view"), ev(3, 21, "click"),
            ev(3, 22, "purchase"),                     # live-only
        ):
            f.write(line + "\n")

    schema = "user_id long, ts timestamp, event_type string"
    conds = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    W = 30 * 60 * 1_000_000
    seed_dir = str(tmp_path / "seed")
    hist_levels = write_funnel_bootstrap(
        spark.read.schema(schema).json(hist_dir),
        "user_id", "ts", conds, W, seed_dir,
    )
    base = {r["user_id"]: r["level"] for r in hist_levels.collect()}
    assert base == {1: 2, 2: 3, 4: 1}

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(live_dir)
    )
    q = (
        streaming_funnel_levels(
            stream, "user_id", "ts", conds, W,
            bootstrap_dir=seed_dir,
        )
        .writeStream.format("memory")
        .queryName("funnel_boot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_boot"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM funnel_boot").collect()
    latest: dict = {}
    for r in rows:
        prev = latest.get(r["user_id"])
        if prev is None or r["n_seen"] > prev[0]:
            latest[r["user_id"]] = (r["n_seen"], r["level"])
    combined = dict(base)
    combined.update({u: lv for u, (_, lv) in latest.items()})

    full = {
        r["user_id"]: r["level"]
        for r in window_funnel_levels(
            spark.read.schema(schema).json(hist_dir).unionByName(
                spark.read.schema(schema).json(live_dir)
            ),
            "user_id", "ts", conds, W,
        ).collect()
    }
    assert combined == full == {1: 3, 2: 3, 3: 3, 4: 1}
    # u1's seeded accumulator really carried across the cut: one live
    # event lifted it 2 -> 3, and n_seen continued from the seed (2+1)
    assert latest[1] == (3, 3)
    # history-only users never emit on the stream
    assert 2 not in latest and 4 not in latest

    # seed-mismatch guard: a seed written for a different partition
    # count must refuse (state-store layout is fixed at query start)
    seed16 = str(tmp_path / "seed16")
    write_funnel_bootstrap(
        spark.read.schema(schema).json(hist_dir),
        "user_id", "ts", conds, W, seed16, num_partitions=16,
    )
    import pytest

    with pytest.raises(ValueError, match="regenerate the seed"):
        streaming_funnel_levels(
            stream, "user_id", "ts", conds, W,
            bootstrap_dir=seed16,
        )
