"""End-to-end pipeline rate (round-8): ONE sustained run of the full
loop the reference's contract is about (clickhouse_test.go drives
insert -> query end-to-end; here the loop is longer because the
engine is a lakehouse):

  NDJSON landing -> ingest stream (foreachBatch: vote/evolve/append)
    -> per-micro-batch snapshot COMMIT
    -> scratch_cdc streaming source (executor-side change reads)
    -> foreachBatch maintain_sum_mv (algebraic MV delta)

Reported: steady-state ingest rows/s (producer keeps the landing dir
ahead of the stream, so the stream is the bottleneck), per-stage
breakdown, and commit-to-feed latency — the time from a version's
manifest PUT (its ``committed_at`` stamp) to the moment the CDC
consumer finishes applying that version's rows to the MV. Separately:
refresh_ann_index steady-state churn cost (build once on the
replicated 20k-vector corpus, then per-refresh wall at ~1% churn).

Every stage is benched alone elsewhere (BENCH.json, PERF.md); this is
the integration number — queues between stages, commit cadence, and
checkpointing included. Single host, local[32]; host variance ~±3x.

Usage: python tools/pipeline_rate.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_FILES = 40
ROWS_PER_FILE = 10_000


def main() -> None:
    args = sys.argv[1:]
    # --exactly-once: run the ingest loop with idempotent per-batch
    # txn commits (snapshots txn watermarks) to measure the
    # exactly-once tax on the same end-to-end pipeline
    exactly_once = "--exactly-once" in args
    args = [a for a in args if not a.startswith("--")]
    out_path = args[0] if args else None
    from pyspark.sql import functions as F

    from scratchdb_spark import snapshots as snap
    from scratchdb_spark.operators.incremental import (
        maintain_sum_mv,
        sum_mv_of,
    )
    from scratchdb_spark.session import get_spark
    from scratchdb_spark.sources import ScratchCdcDataSource
    from scratchdb_spark.streaming.ingest_stream import start_ingest_stream
    from scratchdb_spark.tables import Warehouse

    spark = get_spark(
        "pipeline-rate", **{"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(ScratchCdcDataSource)

    root = tempfile.mkdtemp(prefix="pipe_rate_")
    wh = Warehouse(spark, f"{root}/wh")
    landing = f"{root}/landing"
    os.makedirs(f"{landing}/db/ev", exist_ok=True)

    # ---- produce the NDJSON backlog up front (producer never the
    # bottleneck: the stream's maxFilesPerTrigger=16 paces intake)
    def write_file(fi: int) -> None:
        with open(f"{landing}/db/ev/batch-{fi:05d}.ndjson", "w") as f:
            base = fi * ROWS_PER_FILE
            f.write(
                "\n".join(
                    '{"k":"g%d","amount":%d,"seq":%d}'
                    % (i % 50, i % 1000, base + i)
                    for i in range(ROWS_PER_FILE)
                )
            )

    total_rows = N_FILES * ROWS_PER_FILE

    # ---- stage 1+2: ingest stream with per-micro-batch commits.
    # Priming pass on file 0 alone: the scratch_cdc source resolves
    # its schema from the table's latest manifest, so the table needs
    # one committed version carrying the full ingested schema before
    # the CDC consumer starts (its bootstrap then emits v1's state as
    # inserts and FOLLOWS the remaining 39 files' commits live — the
    # steady-state the latency numbers are about).
    t0 = time.time()
    for fi in range(N_FILES):
        write_file(fi)
    t_produce = time.time() - t0
    # hide file 1..39 from the priming pass, reveal after
    hidden = f"{root}/pending"
    os.makedirs(hidden, exist_ok=True)
    for fi in range(1, N_FILES):
        os.rename(
            f"{landing}/db/ev/batch-{fi:05d}.ndjson",
            f"{hidden}/batch-{fi:05d}.ndjson",
        )
    t_ingest0 = time.time()
    start_ingest_stream(
        spark, wh, landing, "db", "ev",
        checkpoint_dir=f"{root}/ckpt_ingest",
        available_now=True, versioned=True, exactly_once=exactly_once,
    ).awaitTermination()
    for fi in range(1, N_FILES):
        os.rename(
            f"{hidden}/batch-{fi:05d}.ndjson",
            f"{landing}/db/ev/batch-{fi:05d}.ndjson",
        )
    q_ingest = start_ingest_stream(
        spark, wh, landing, "db", "ev",
        checkpoint_dir=f"{root}/ckpt_ingest",
        available_now=True, versioned=True, exactly_once=exactly_once,
    )

    # ---- stage 3+4: CDC consumer maintaining the (k -> sum, n) MV
    mv_state = {"mv": None, "rows_applied": 0, "lat": []}

    def apply_mv(batch_df, batch_id):
        rows = batch_df.count()
        if rows == 0:
            return
        prev = mv_state["mv"]
        if prev is None:
            prev = (
                batch_df.sparkSession.createDataFrame(
                    [], "k string, value_sum bigint, n_rows bigint"
                )
            )
        nxt = maintain_sum_mv(
            prev, batch_df, ["k"], "amount"
        ).persist()
        nxt.count()  # materialize now: latency stamp below is honest
        if mv_state["mv"] is not None:
            mv_state["mv"].unpersist()
        mv_state["mv"] = nxt
        mv_state["rows_applied"] += rows
        mv_state["lat"].append(time.time())

    q_cdc = (
        spark.readStream.format("scratch_cdc")
        .option("path", f"{root}/wh")
        .option("database", "db")
        .option("table", "ev")
        .load()
        .writeStream.foreachBatch(apply_mv)
        .option("checkpointLocation", f"{root}/ckpt_cdc")
        .trigger(processingTime="1 seconds")
        .start()
    )

    q_ingest.awaitTermination()
    t_ingest = time.time() - t_ingest0

    # drain the CDC side until the MV saw every ingested row
    t_drain0 = time.time()
    while mv_state["rows_applied"] < total_rows:
        if time.time() - t_drain0 > 600:
            raise TimeoutError(
                f"CDC drain stalled at {mv_state['rows_applied']}"
                f"/{total_rows}"
            )
        time.sleep(0.5)
    t_loop_total = time.time() - t_ingest0
    q_cdc.stop()

    # commit-to-feed latency: per retained version, manifest
    # committed_at -> the first MV-apply stamp at/after it. The LAST
    # apply stamp bounds every version (availableNow ingest finished
    # before the drain), so use each version's next-apply delta.
    commit_ts = sorted(
        m["committed_at"]
        for v in snap.versions(wh, "db", "ev")
        if "committed_at" in (m := snap._manifest(wh, "db", "ev", v))
    )
    applies = sorted(mv_state["lat"])
    lats = []
    for ct in commit_ts:
        nxt = next((a for a in applies if a >= ct), None)
        if nxt is not None:
            lats.append(nxt - ct)
    lats.sort()

    # ---- correctness gate: MV == full recompute over the table
    final_mv = {
        (r["k"]): (r["value_sum"], r["n_rows"])
        for r in mv_state["mv"].collect()
    }
    want = {
        (r["k"]): (r["value_sum"], r["n_rows"])
        for r in sum_mv_of(
            snap.read_snapshot(wh, "db", "ev"), ["k"], "amount"
        ).collect()
    }
    assert final_mv == want, "MV diverged from full recompute"

    n_versions = len(snap.versions(wh, "db", "ev"))
    result = {
        "total_rows": total_rows,
        "n_commits": n_versions,
        "produce_s": round(t_produce, 1),
        "ingest_commit_s": round(t_ingest, 1),
        "ingest_rows_per_s": int(total_rows / t_ingest),
        "loop_total_s": round(t_loop_total, 1),
        "loop_rows_per_s": int(total_rows / t_loop_total),
        "commit_to_feed_p50_s": round(lats[len(lats) // 2], 2),
        "commit_to_feed_p95_s": round(lats[int(len(lats) * 0.95)], 2),
        "mv_correct": True,
    }
    print(json.dumps(result), flush=True)

    # ---- steady-state ANN refresh at ~1% churn (separate loop leg)
    from scratchdb_spark.operators import ann_index as ai
    from scratchdb_spark.tables import table as read_table

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_rehearsal import build

    sf1 = tempfile.mkdtemp(prefix="sf1_pipe_")
    build(sf1)
    emb = read_table(spark, sf1, "embeddings")
    wh2 = Warehouse(spark, f"{root}/wh2")
    snap.append_versioned(wh2, "db", "emb", emb)
    t0 = time.time()
    ai.build_ann_index(wh2, "db", "emb", "emb_idx", n_centroids=64)
    t_build = time.time() - t0
    refresh_walls = []
    n_corpus = emb.count()
    for i in range(3):
        snap.delete_where(
            wh2, "db", "emb",
            (F.col("vec_id") % 97 == i) & (F.col("vec_id") < 10**9),
        )
        snap.append_versioned(
            wh2, "db", "emb",
            emb.filter(F.col("vec_id") % 101 == i).select(
                (F.col("vec_id") + (i + 1) * 10**9).alias("vec_id"),
                "embedding", "label",
            ),
        )
        t0 = time.time()
        st = ai.refresh_ann_index(wh2, "db", "emb_idx")
        refresh_walls.append(round(time.time() - t0, 2))
        churn = st["n_deleted"] + st["n_upserted"]
    result["ann"] = {
        "corpus": n_corpus,
        "build_s": round(t_build, 1),
        "refresh_walls_s": refresh_walls,
        "last_refresh_churn_rows": churn,
        "churn_pct": round(100.0 * churn / n_corpus, 2),
    }
    print(json.dumps(result["ann"]), flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
