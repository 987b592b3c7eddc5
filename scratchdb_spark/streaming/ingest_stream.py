"""Streaming ingest + event-time operators.

``start_ingest_stream`` replaces the reference's ticker/queue/worker
pipeline (datasink/filesystem + workers/workers.go): the closed-NDJSON
landing dir becomes a file-source stream; each micro-batch runs the
same infer -> evolve -> aligned-append path as the batch pipeline via
``foreachBatch``. Checkpointing makes delivery at-least-once across
restarts — the property the reference got from its DB queue with
``FOR UPDATE SKIP LOCKED`` (storage/database/gorm/queue.go:29-63) —
and ``exactly_once=True`` upgrades the versioned sink to idempotent
per-batch commits (snapshots txn watermarks), which the reference's
queue could not offer at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fs as hfs
from ..ingest.pipeline import IngestPipeline
from ..tables import Warehouse


def start_ingest_stream(
    spark: SparkSession,
    warehouse: Warehouse,
    landing_dir: str,
    database: str,
    table: str,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
    available_now: bool = False,
    versioned: bool = False,
    max_files_per_trigger: int = 16,
    exactly_once: bool = False,
    dedup_index: str | None = None,
    dedup_threshold: float = 0.8,
):
    """Stream NDJSON files from ``landing_dir/{database}/{table}`` into
    the managed table. Returns the StreamingQuery.

    ``dedup_index=<index_table>`` turns every micro-batch into a
    DEDUP-GATED append (operators/dedup_index.py::append_deduped —
    the per-batch operation a training-data pipeline actually runs):
    the batch's NDJSON parses against the index's (id, text) contract,
    rows that near-dup a smaller-id batch row or the indexed corpus
    are dropped, only survivors land in the index's SOURCE table
    (which must be this stream's ``table``), and the index CDC-
    refreshes so the NEXT micro-batch sees them. Delivery stays
    at-least-once (checkpoint), but the gate makes replays and
    cross-batch resubmissions CONTENT-idempotent: a batch whose text
    already landed — under the same ids or fresh ones — appends
    nothing, which is a stronger property than exactly_once's
    batch-id watermark (that only catches the same batch replayed).
    The gated mode parses with the fixed ``<id> long, <text> string``
    schema (the gate's contract) instead of the type-vote pipeline,
    and is mutually exclusive with ``exactly_once`` (different sink
    path); ``versioned`` is implied (append_deduped commits
    snapshots).

    Scale notes: ``max_files_per_trigger`` bounds micro-batch size the
    way the reference's rotation thresholds bounded file size; the text
    is read as whole lines (schema applied inside foreachBatch so the
    type-vote semantics stay identical to the batch path). The trigger
    size is the latency/throughput dial: each micro-batch pays one
    vote+append (+ optional commit), so larger triggers amortize that
    fixed cost toward the batch path's rate while stretching
    commit-to-visibility latency — measured in PERF.md round 8
    (16-file triggers: ~33k rows/s; the batch path: ~195k rows/s).
    """
    # Hadoop FS path handling: the landing dir is a URI on a cluster
    # (s3a://bucket/landing/closed) and a plain local dir in tests —
    # same code path either way (see fs.HadoopLanding.closed_dir).
    if exactly_once and not versioned:
        raise ValueError(
            "exactly_once requires versioned=True (the idempotence "
            "watermark lives in the snapshot manifest)"
        )
    if dedup_index is not None:
        if exactly_once:
            raise ValueError(
                "dedup_index and exactly_once are mutually exclusive: "
                "the gate already makes replays content-idempotent, "
                "and the gated append commits through append_deduped, "
                "not the txn-watermark sink"
            )
        from ..operators.dedup_index import _load_dedup_meta

        meta = _load_dedup_meta(warehouse, database, dedup_index)
        if meta["src_table"] != table:
            raise ValueError(
                f"dedup index {dedup_index!r} gates source table "
                f"{meta['src_table']!r}, not {table!r} — point the "
                "stream at the index's source table"
            )
    src_dir = f"{str(landing_dir).rstrip('/')}/{database}/{table}"
    hfs.mkdirs(spark, src_dir)
    pipe = IngestPipeline(spark, warehouse)

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", str(int(max_files_per_trigger)))
        .load(src_dir)
    )

    txn_app = f"ingest:{database}.{table}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # fully distributed worker half: vote tagging runs in Arrow
        # workers, data read is JVM-side from_json — no collect(), so
        # a micro-batch can be arbitrarily large
        if dedup_index is not None:
            # dedup-gated append: parse against the gate's (id, text)
            # contract and hand the batch to append_deduped — probe +
            # gate + append + index refresh, all batch/candidate/
            # churn-sized (never a corpus re-minhash)
            from ..operators.dedup_index import append_deduped

            id_c, text_c = meta["id_col"], meta["text_col"]
            parsed = (
                batch_df.select(
                    F.from_json(
                        F.col("value"),
                        f"{id_c} long, {text_c} string",
                    ).alias("j")
                )
                .select("j.*")
                .filter(
                    F.col(id_c).isNotNull()
                    & F.col(text_c).isNotNull()
                )
            )
            if parsed.limit(1).count() == 0:
                return
            append_deduped(
                warehouse, database, dedup_index, parsed,
                threshold=dedup_threshold,
                id_col=id_c, text_col=text_c,
            )
            return
        if exactly_once:
            # idempotent per-batch commit (snapshots.append_versioned
            # txn semantics): the batch lands under the txnappend-
            # COW-class prefix (a crash between landing and manifest
            # PUT leaves non-adoptable debris) and one manifest PUT
            # commits the files AND the per-app batch-id watermark —
            # a checkpoint-replayed batch no-ops at zero writes
            from .. import snapshots as snap

            vs = snap.versions(warehouse, database, table)
            if vs:
                prev = snap._manifest(warehouse, database, table, vs[-1])
                if prev.get("txns", {}).get(
                    txn_app, -(10**18)
                ) >= int(batch_id):
                    return
            landed = pipe.append_lines_df(
                database, table, batch_df, file_prefix="txnappend-"
            )
            snap._txn_commit(
                warehouse, database, table, landed,
                (txn_app, int(batch_id)),
            )
            return
        pipe.append_lines_df(database, table, batch_df)
        if versioned:
            # one snapshot per micro-batch: the manifest PUT makes the
            # batch's (possibly many) files visible atomically, and
            # snapshot readers get a consistent view between batches —
            # foreachBatch + checkpoint give at-least-once process()
            # calls, and a replayed batch simply commits another
            # version over the same file set (snapshots.py)
            from .. import snapshots as snap

            snap.commit_snapshot(warehouse, database, table)

    writer = raw.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time tumbling-window counts with late-data handling —
    works on a streaming OR batch events DataFrame (same code path).
    Tumbling IS the hop == window special case of hopping windows, so
    this delegates (one agg/select body to maintain)."""
    return hopping_window_counts(
        events, window_duration, window_duration, watermark
    )


def hopping_window_counts(
    events: DataFrame,
    window_duration: str = "6 hours",
    hop: str = "2 hours",
    watermark: str = "2 hours",
):
    """Event-time hopping (sliding) window counts: each event lands in
    ``window/hop`` overlapping windows, all epoch-aligned to the hop.
    Same code path for streaming and batch frames — the parity catalog
    query (stream_hopping_window_counts) pins the batch semantics with
    a SQL oracle, and the streaming test drives the identical plan
    through a micro-batch source.

    Scale: the explode factor is window/hop (3x here) applied map-side
    before the partial aggregation, so the shuffle carries partial
    sums per (window, type), not the multiplied event stream.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration, hop), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: tuple[str, str],
    left_time: str,
    right_time: str,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch-batch) interval join: pairs rows
    with equal keys where ``left_time <= right_time < left_time +
    max_gap``. Column names must be disjoint across the two sides.

    ``how='left_outer'`` keeps unmatched left rows with NULL right
    columns — in streaming mode Spark emits them once the watermark
    guarantees no in-window right row can still arrive (watermark +
    max_gap), which is exactly why the outer form REQUIRES both the
    watermarks and the explicit time bound this function always sets
    (an unbounded outer stream join could never declare a row
    unmatched). Batch mode runs the same plan eagerly, giving the
    streaming semantics an exact SQL oracle.

    This is the idiomatic Structured Streaming form — both sides get
    event-time watermarks and the join condition carries an explicit
    time bound, which is exactly what lets Spark expire join state:
    a buffered left row can only match right rows within ``max_gap``,
    so state older than watermark + max_gap is dropped, keeping the
    join's memory bounded no matter how long the streams run. The
    batch path runs the SAME condition (the range condition becomes a
    post-join filter on the equi-join), so the parity catalog query
    gives the streaming semantics an exact SQL oracle.

    For large BATCH inputs prefer operators/rangejoin.py, which
    quantizes time into buckets and equi-joins on (key, bucket) to
    keep the matcher's per-task working set bounded; this function is
    the streaming code path where Spark's state store plays that role.
    """
    lk, rk = on
    l = (
        left.withWatermark(left_time, watermark)
        if left.isStreaming
        else left
    )
    r = (
        right.withWatermark(right_time, watermark)
        if right.isStreaming
        else right
    )
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_time) >= F.col(left_time))
        & (
            F.col(right_time)
            < F.col(left_time) + F.expr(f"INTERVAL {max_gap}")
        )
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"how must be 'inner' or 'left_outer', got {how!r}"
        )
    return l.join(r, cond, how)


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
):
    """Per-user session windows (gap-based) — event-time sessionization
    for both streaming and batch frames."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    dim_key: str = "user_id",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment: LEFT join a (possibly streaming)
    event frame to a static dimension — every event survives, with
    NULL-extended dim columns when the key has no match. The static
    side is re-read per micro-batch by Structured Streaming (so a dim
    refresh lands without a restart) — the standard streaming-ETL
    enrichment shape. Stream-static equi-joins (inner and this
    stream-side LEFT) are STATELESS: no watermark, each micro-batch
    joins independently. Same code path runs on batch frames, giving
    the parity query its SQL oracle.

    ``broadcast=True`` (default) pins a broadcast join — right for
    dimension tables that fit in executor memory. Pass False for a
    dimension at data scale and let the planner shuffle it."""
    cond = events[on] == dim[dim_key]
    rhs = F.broadcast(dim) if broadcast else dim
    return events.join(rhs, cond, "left").drop(dim[dim_key])


def streaming_dedup(events: DataFrame, watermark: str = "2 hours"):
    """Stateful streaming dedup on event_id within the watermark — the
    streaming analogue of exact dedup (bounded state). On a batch frame
    (same code path reused for backfills) this degrades to plain
    dropDuplicates, since watermark-scoped dedup state is stream-only."""
    if events.isStreaming:
        return events.withWatermark(
            "ts", watermark
        ).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])
