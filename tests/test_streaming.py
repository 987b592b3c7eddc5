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
