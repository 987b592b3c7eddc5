"""Persistent IVFADC index as a snapshot-managed warehouse table, with
CDC-driven incremental maintenance.

ivfpq_topk (operators/similarity.py) rebuilds its code table on every
call — right for one-shot retrieval, wrong for a serving corpus that
changes by a fraction of a percent per day. This module persists the
(vec_id, cid, code) table as an ordinary snapshot table so:

- BUILD is one fused assign+encode pass over the source snapshot,
  range-clustered by cell id with zone-map stats on ``cid`` — the
  manifest then FILE-SKIPS unprobed cells at query time (an inverted
  file realized as data layout + manifest pruning, the same mechanism
  Iceberg/Delta use for partition-ish pruning);
- REFRESH reads the source table's CDC feed (snapshots.read_changes)
  between the index's recorded source version and the current one and
  applies churn-sized DML to the index: COW deletes for removed ids,
  a keyed MERGE for inserted/updated ids re-encoded under the FROZEN
  codebooks — cost proportional to source churn, never corpus size
  (re-training/re-clustering is a rebuild, as in FAISS practice);
- QUERY plans the probed cells through ``prune_eq=('cid', [cells])``
  (IN-list manifest pruning), ADC-scores only the surviving files'
  rows, and exact-refines against the source embeddings.

Codebooks/centroids live in a ``_ann_index.json`` sidecar next to the
index table (atomic PUT, same visibility contract as the schema
sidecar). Frozen quantizers are what make incremental refresh sound:
codes written in different refreshes are comparable because they
quantize against the same geometry.

Reference parity: the reference has no vector indexes; this extends
SURVEY §2's similarity-search family to the serving shape a training-
data pipeline needs (build once over 100 TB, keep fresh by CDC,
query by reading ~nprobe/n_centroids of the code table).
"""

from __future__ import annotations

import json

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fs as hfs
from .. import snapshots as snap
from ..tables import Warehouse
from .similarity import (
    _adc_candidates,
    _assign_encode_df,
    _coarse_centroids,
    _exact_refine,
    _query_probe_tables,
    pq_train_codebooks,
)

_META = "_ann_index.json"


def _meta_path(wh: Warehouse, database: str, index_table: str) -> str:
    return f"{wh._path(database, index_table)}/{_META}"


def _load_meta(wh: Warehouse, database: str, index_table: str) -> dict:
    meta = json.loads(
        hfs.read_text(wh.spark, _meta_path(wh, database, index_table))
    )
    meta["books"] = np.array(meta["books"], dtype=np.float64)
    meta["cent_ids"] = np.array(meta["cent_ids"], dtype=np.int64)
    meta["centroids"] = np.array(meta["centroids"], dtype=np.float64)
    return meta


def build_ann_index(
    wh: Warehouse,
    database: str,
    src_table: str,
    index_table: str,
    n_centroids: int = 16,
    m: int = 4,
    codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_files: int | None = None,
) -> int:
    """Build (or rebuild) the IVFADC index table from the CURRENT
    snapshot of ``src_table``. Returns the index table's committed
    version. The index layout is range-clustered on ``cid`` with
    zone-map stats, so each cell's codes land in few files and query
    planning file-skips the rest; the sidecar records the frozen
    quantizers plus the exact source version the index reflects."""
    src_version = snap.versions(wh, database, src_table)[-1]
    src = snap.read_snapshot(wh, database, src_table, version=src_version)
    books = pq_train_codebooks(
        src, m=m, codes=codes, id_col=id_col, vec_col=vec_col
    )
    cent_ids, C = _coarse_centroids(src, n_centroids, id_col, vec_col)
    index_df = _assign_encode_df(src, books, cent_ids, C, id_col, vec_col)
    nf = n_files if n_files is not None else max(1, min(n_centroids, 32))
    # a rebuild replaces the previous index wholesale: COW-delete the
    # old rows first so the commit below is the complete new index
    if snap.versions(wh, database, index_table):
        snap.delete_where(wh, database, index_table, F.lit(True))
    v = snap.append_versioned(
        wh,
        database,
        index_table,
        index_df.withColumnRenamed("vec_id", "__row_id")
        .repartitionByRange(nf, "cid")
        .sortWithinPartitions("cid", "__row_id"),
        stat_cols=["cid"],
    )
    meta = {
        "kind": "ivfpq",
        "m": m,
        "codes": codes,
        "n_centroids": n_centroids,
        "books": books.tolist(),
        "cent_ids": cent_ids.tolist(),
        "centroids": C.tolist(),
        "src_table": src_table,
        "src_version": src_version,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    hfs.put_text_atomic(
        wh.spark,
        _meta_path(wh, database, index_table),
        json.dumps(meta, separators=(",", ":")),
    )
    return v


def refresh_ann_index(
    wh: Warehouse, database: str, index_table: str
) -> dict:
    """Advance the index to the source table's current version by
    replaying the CDC feed between the recorded and current source
    versions — churn-proportional, never a corpus rescan:

    - ids whose NET effect over the window is a delete -> COW delete
      from the index (the id list is churn-bounded; it rides a
      delete_where isin predicate, so parquet row-group stats on the
      sorted-on-write id prune untouched index files);
    - ids inserted or updated -> re-encoded under the FROZEN sidecar
      quantizers (one fused pass over only those rows) and MERGEd on
      the id (merge_upsert: update-in-place semantics).

    Returns {n_deleted, n_upserted, src_version}. No-op (and no new
    index version) when the source hasn't moved. Quantizers are never
    retrained here — drift in the data distribution degrades recall
    gracefully until the next build_ann_index, exactly the FAISS
    operational model."""
    meta = _load_meta(wh, database, index_table)
    src_table = meta["src_table"]
    cur = snap.versions(wh, database, src_table)[-1]
    old = meta["src_version"]
    if cur == old:
        return {"n_deleted": 0, "n_upserted": 0, "src_version": cur}
    ch = snap.read_changes(wh, database, src_table, old, cur)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    # NET per-id effect over the window: an id present among inserts
    # is live at ``cur`` (read_changes cancels unchanged rows, and a
    # delete+reinsert nets to its final state); an id appearing ONLY
    # as a delete is gone
    ins = ch.filter(F.col("_change_type") == "insert")
    dels = (
        ch.filter(F.col("_change_type") == "delete")
        .select(F.col(id_col).cast("long").alias("vec_id"))
        .subtract(
            ins.select(F.col(id_col).cast("long").alias("vec_id"))
        )
    )
    del_ids = [r["vec_id"] for r in dels.collect()]  # churn-bounded
    n_deleted = 0
    if del_ids:
        _v, n_deleted = snap.delete_where(
            wh, database, index_table, F.col("__row_id").isin(del_ids)
        )
    upserts = _assign_encode_df(
        ins, meta["books"], meta["cent_ids"], meta["centroids"],
        id_col, vec_col,
    ).withColumnRenamed("vec_id", "__row_id")
    n_upserted = 0
    if upserts.limit(1).count():
        _v, n_up, n_in = snap.merge_upsert(
            wh, database, index_table, upserts, "__row_id"
        )
        n_upserted = n_up + n_in
    meta_out = dict(meta)
    meta_out["books"] = meta["books"].tolist()
    meta_out["cent_ids"] = meta["cent_ids"].tolist()
    meta_out["centroids"] = meta["centroids"].tolist()
    meta_out["src_version"] = cur
    hfs.put_text_atomic(
        wh.spark,
        _meta_path(wh, database, index_table),
        json.dumps(meta_out, separators=(",", ":")),
    )
    return {
        "n_deleted": n_deleted,
        "n_upserted": n_upserted,
        "src_version": cur,
    }


def query_ann_index(
    wh: Warehouse,
    database: str,
    index_table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    overfetch: int = 4,
) -> DataFrame:
    """Top-k through the persisted index: probe cells from the sidecar
    quantizers, plan ONLY the probed cells' index files via IN-list
    manifest pruning (``prune_eq=('cid', cells)`` — unprobed cells'
    files are skipped before any scan), ADC-score the candidates, and
    exact-refine against the source table's current snapshot. Output
    matches ivfpq_topk: (query_id, neighbor_id, cos_sim, rank)."""
    meta = _load_meta(wh, database, index_table)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    qids, tables, probes = _query_probe_tables(
        queries, meta["books"], meta["cent_ids"], meta["centroids"],
        nprobe, id_col, vec_col,
    )
    cells = sorted({c for _qid, cs in probes for c in cs})
    index = snap.read_snapshot(
        wh, database, index_table, prune_eq=("cid", cells)
    ).select(F.col("__row_id").alias("vec_id"), "cid", "code")
    cand_ids = _adc_candidates(
        index, probes, qids, tables, int(meta["m"]),
        k * overfetch, wh.spark,
    )
    src = snap.read_snapshot(wh, database, meta["src_table"])
    return _exact_refine(cand_ids, src, queries, k, id_col, vec_col)
