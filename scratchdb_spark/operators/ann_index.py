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
  Iceberg/Delta use for partition-ish pruning). A REBUILD is ONE
  atomic overwrite commit (snapshots.overwrite_versioned): a
  concurrent query sees the old complete index or the new one, never
  an empty table and never new codes decoded against old codebooks;
- REFRESH reads the source table's CDC feed (snapshots.read_changes)
  between the index's recorded source version and the current one and
  applies churn-sized DML to the index: a KEYS-FRAME COW delete for
  removed ids (snapshots.delete_keys — the id set stays a DataFrame
  end-to-end, so a 10^6-id takedown plans as an anti-join, never a
  driver IN-list literal), and a keyed MERGE for inserted/updated ids
  re-encoded under the FROZEN codebooks — cost proportional to source
  churn, never corpus size (re-training/re-clustering is a rebuild,
  as in FAISS practice);
- QUERY plans the probed cells through ``prune_eq=('cid', [cells])``
  (IN-list manifest pruning), ADC-scores only the surviving files'
  rows, and exact-refines against the source embeddings;
- MAINTAIN (maintain_ann_index) re-clusters the index on ``cid``
  after refresh churn: repeated MERGEs write files OUTSIDE the
  original cid-range clustering, eroding the file-skipping that makes
  queries cheap — periodic maintenance restores fresh-build pruning
  (pytest pins files-planned after N refresh cycles == a fresh
  build). Run it on the same cadence you'd run OPTIMIZE on a
  clustered lakehouse table.

Quantizer visibility contract: codebooks/centroids live in a
content-addressed sidecar (``_ann_meta-<id>.json``) written BEFORE
the commit that references it; each build/refresh/maintain commit
records its sidecar name in the manifest SUMMARY. A reader resolves
the manifest FIRST and then loads exactly the sidecar that manifest's
chain names, so quantizers and codes can never disagree — the manifest
PUT is the single visibility point for both. Frozen quantizers are
what make incremental refresh sound: codes written in different
refreshes are comparable because they quantize against the same
geometry.

Reference parity: the reference has no vector indexes; this extends
SURVEY §2's similarity-search family to the serving shape a training-
data pipeline needs (build once over 100 TB, keep fresh by CDC,
query by reading ~nprobe/n_centroids of the code table).
"""

from __future__ import annotations

import json
import uuid

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

_META_PREFIX = "_ann_meta-"


def _put_meta(wh: Warehouse, database: str, index_table: str,
              meta: dict) -> str:
    """Write a content-addressed quantizer sidecar. Unreferenced until
    some commit's summary names it — writing it first is what makes
    the later manifest PUT the single atomic visibility point for
    data AND quantizers."""
    name = f"{_META_PREFIX}{uuid.uuid4().hex[:16]}.json"
    hfs.put_text_atomic(
        wh.spark,
        f"{wh._path(database, index_table)}/{name}",
        json.dumps(meta, separators=(",", ":")),
    )
    return name


def _load_meta(
    wh: Warehouse, database: str, index_table: str,
    version: int | None = None,
) -> dict:
    """Resolve the quantizer sidecar AS OF an index version: walk the
    manifest chain from ``version`` (latest when None) back to the
    newest commit whose summary names a sidecar, and load exactly
    that file. Every build/refresh/maintain stamps its final commit,
    so the walk is O(1-2) manifest reads in steady state (bounded by
    commits since the last stamped one)."""
    vs = snap.versions(wh, database, index_table)
    if not vs:
        raise ValueError(
            f"{database}.{index_table} has no snapshots — "
            "build_ann_index first"
        )
    v = vs[-1] if version is None else version
    name = None
    for u in reversed([x for x in vs if x <= v]):
        summ = snap._manifest(wh, database, index_table, u).get(
            "summary", {}
        )
        if "ann_meta_file" in summ:
            name = summ["ann_meta_file"]
            break
    if name is None:
        raise ValueError(
            f"{database}.{index_table} has no ANN sidecar commit in "
            f"its retained history (versions {vs}) — not an ANN index "
            "table, or its build commit was expired without a "
            "maintain_ann_index re-stamp"
        )
    meta = json.loads(
        hfs.read_text(
            wh.spark, f"{wh._path(database, index_table)}/{name}"
        )
    )
    meta["books"] = np.array(meta["books"], dtype=np.float64)
    meta["cent_ids"] = np.array(meta["cent_ids"], dtype=np.int64)
    meta["centroids"] = np.array(meta["centroids"], dtype=np.float64)
    meta["meta_file"] = name
    return meta


def _gc_meta_files(wh: Warehouse, database: str, index_table: str) -> int:
    """Delete sidecars no RETAINED manifest references (rebuilds and
    maintenance truncations strand the old ones). Runs only inside
    the single maintenance writer (build/maintain), after its commit
    — a sidecar referenced by any retained manifest survives, so
    readers of retained versions never lose their quantizers."""
    base = wh._path(database, index_table)
    referenced = set()
    for v in snap.versions(wh, database, index_table):
        summ = snap._manifest(wh, database, index_table, v).get(
            "summary", {}
        )
        if "ann_meta_file" in summ:
            referenced.add(summ["ann_meta_file"])
    n = 0
    for name in hfs.list_names(wh.spark, base):
        if name.startswith(_META_PREFIX) and name not in referenced:
            hfs.delete(wh.spark, f"{base}/{name}", recursive=False)
            n += 1
    return n


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
    quantizer: str = "smallest_id",
    kmeans_iters: int = 3,
) -> int:
    """Build (or REBUILD) the IVFADC index table from the CURRENT
    snapshot of ``src_table``. Returns the index table's committed
    version. The index layout is range-clustered on ``cid`` with
    zone-map stats, so each cell's codes land in few files and query
    planning file-skips the rest.

    A rebuild is ONE atomic commit: the sidecar (frozen quantizers +
    the exact source version the index reflects) is written first
    under a fresh content-addressed name — invisible, since nothing
    references it — then overwrite_versioned swaps the complete new
    file set AND the sidecar pointer in a single manifest PUT. A
    concurrent query_ann_index resolves either the old manifest (old
    files + old sidecar, both still on disk) or the new one — never
    an empty index, never new codes against old codebooks. A crash
    before the PUT leaves the old index fully live plus one orphan
    sidecar, reclaimed by the next successful build's GC."""
    src_version = snap.versions(wh, database, src_table)[-1]
    src = snap.read_snapshot(wh, database, src_table, version=src_version)
    books = pq_train_codebooks(
        src, m=m, codes=codes, id_col=id_col, vec_col=vec_col
    )
    # quantizer choice is BUILD-time only: the sidecar freezes the
    # centroid matrix, so refresh/maintain/query are agnostic to how
    # it was trained ('kmeans' balances cells on clustered corpora at
    # equal nprobe; 'smallest_id' stays the oracle-stable default)
    cent_ids, C = _coarse_centroids(
        src, n_centroids, id_col, vec_col,
        quantizer=quantizer, kmeans_iters=kmeans_iters,
    )
    index_df = _assign_encode_df(src, books, cent_ids, C, id_col, vec_col)
    nf = n_files if n_files is not None else max(1, min(n_centroids, 32))
    meta = {
        "kind": "ivfpq",
        "m": m,
        "codes": codes,
        "n_centroids": n_centroids,
        "quantizer": quantizer,
        "books": books.tolist(),
        "cent_ids": cent_ids.tolist(),
        "centroids": C.tolist(),
        "src_table": src_table,
        "src_version": src_version,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    # a brand-new index table: create the directory FIRST —
    # create_empty_table initializes a fresh table dir with
    # mode("overwrite"), which would wipe a sidecar written before it
    wh.create_empty_table(database, index_table)
    meta_name = _put_meta(wh, database, index_table, meta)
    v = snap.overwrite_versioned(
        wh,
        database,
        index_table,
        index_df.withColumnRenamed("vec_id", "__row_id")
        .repartitionByRange(nf, "cid")
        .sortWithinPartitions("cid", "__row_id"),
        stat_cols=["cid"],
        summary={"operation": "ann-build", "ann_meta_file": meta_name},
        # derived table, no CDC consumers: skip table-sized change
        # files; batch read_changes still diffs from the manifests
        cdc=False,
    )
    _gc_meta_files(wh, database, index_table)
    return v


def refresh_ann_index(
    wh: Warehouse, database: str, index_table: str
) -> dict:
    """Advance the index to the source table's current version by
    replaying the CDC feed between the recorded and current source
    versions — churn-proportional, never a corpus rescan:

    - ids whose NET effect over the window is a delete -> keys-frame
      COW delete (snapshots.delete_keys): the id set stays a
      DataFrame end-to-end, deleted via anti-join — a mass takedown
      (10^6+ opt-outs) plans like any join instead of a Catalyst
      IN-list literal; parquet row-group stats on the sorted-on-write
      id still prune untouched index files;
    - ids inserted or updated -> re-encoded under the FROZEN sidecar
      quantizers (one fused pass over only those rows) and MERGEd on
      the id (merge_upsert: update-in-place semantics).

    Commit protocol (crash-safe, stamp-with-final-DML): a new sidecar
    (same frozen quantizers, advanced src_version) is written first —
    unreferenced, hence invisible; the scoped delete commits; the
    append commits WITH the sidecar stamp in the same atomic manifest
    PUT, under an exactly-once txn watermark (append_versioned
    ``txn=``). A crash before the append leaves the recorded
    src_version at the OLD value and the replay re-applies the window
    exactly once: the delete is idempotent (already-absent ids affect
    no files) and the append either never landed (re-lands) or landed
    invisibly as txnappend- orphans that no listing-based commit
    adopts. There is no state in which appended rows are visible but
    the window is unrecorded — the shape that made a replay
    double-append under the first r13 cut of this decomposition. A
    reader between the delete and the append sees consistent
    quantizers (refresh never changes them) and at worst misses the
    newest upserts — eventual freshness, never wrong scores.

    Returns {n_deleted, n_upserted, src_version}. No-op (and no new
    index version) when the source hasn't moved. Quantizers are never
    retrained here — drift in the data distribution degrades recall
    gracefully until the next build_ann_index, exactly the FAISS
    operational model.

    CONTRACT (r14, replaces the merge_upsert full-tag-scan): source
    ids are unique and an id is only ever re-introduced through a
    delete + insert (the CDC window then carries the delete preimage,
    so the scoped delete runs first). A writer that PLAIN-APPENDS an
    existing id to the source outside that discipline (e.g. outside
    the dedup gate) makes the insert-side append land a DUPLICATE
    __row_id row where the old merge silently upserted. The violation
    is cheaply detectable at maintenance time —
    ``read_snapshot(index).groupBy("__row_id").count() > 1`` — and is
    pytest-pinned (test_ann_refresh_plain_reappend_is_detectable);
    enforcing it per refresh would cost a full index scan (no
    __row_id zone maps), the exact scan class this decomposition
    deleted."""
    meta = _load_meta(wh, database, index_table)
    src_table = meta["src_table"]
    cur = snap.versions(wh, database, src_table)[-1]
    old = meta["src_version"]
    if cur == old:
        return {"n_deleted": 0, "n_upserted": 0, "src_version": cur}
    ch = snap.read_changes(wh, database, src_table, old, cur)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    # NET per-id effect over the window (read_changes cancels
    # unchanged rows; an UPDATE is its delete preimage + insert
    # postimage). r13 decomposition — mirror of the dedup refresh:
    # every id with a DELETE preimage drops its old index rows
    # (keys-frame COW delete), every insert-side id re-encodes and
    # APPENDS. Source ids are unique (the index key is the id), so an
    # insert without a delete preimage is NEW to the index and a
    # plain append is exact — the old merge_upsert path paid a full
    # index tag scan to discover that, and delete_keys ran
    # unconditionally (another full tag scan on append-only windows,
    # the shape every streaming refresh cadence produces).
    ins = ch.filter(F.col("_change_type") == "insert")
    stale = (
        ch.filter(F.col("_change_type") == "delete")
        .select(F.col(id_col).cast("long").alias("__row_id"))
        .distinct()
    )
    new_meta = {
        k: (v.tolist() if isinstance(v, np.ndarray) else v)
        for k, v in meta.items()
        if k != "meta_file"
    }
    new_meta["src_version"] = cur
    meta_name = _put_meta(wh, database, index_table, new_meta)
    n_deleted = 0
    if stale.limit(1).count():  # churn-sized probe, not an index scan
        _v, n_deleted = snap.delete_keys(
            wh, database, index_table, stale, "__row_id",
            summary={"operation": "ann-refresh-delete"},
        )
    upserts = _assign_encode_df(
        ins, meta["books"], meta["cent_ids"], meta["centroids"],
        id_col, vec_col,
    ).withColumnRenamed("vec_id", "__row_id")
    n_upserted = 0
    # stamp rides the FINAL commit atomically. The r13 decomposition's
    # first cut stamped in a separate trailing commit, which opened a
    # real crash window: append landed, stamp didn't -> the replay
    # re-read the same CDC window and APPENDED the insert-side rows a
    # second time (a merge is replay-idempotent; a plain append is
    # not — caught by a count-vs-distinct probe this round). Folding
    # the stamp into the append commit closes the window, and the
    # txn= form (exactly-once watermark + txnappend- file prefix)
    # covers the remaining crack: a crash BETWEEN file landing and
    # the manifest PUT leaves orphans a listing-based commit would
    # adopt — txn files are committed by explicit name only, so the
    # replay re-lands and the orphans stay invisible maintenance
    # debris. Source versions are monotone and refresh is the single
    # sequential maintenance writer per index, the txn contract.
    stamp = {"ann_meta_file": meta_name, "src_version": cur}
    # Persist before probing (r14): the upserts plan (CDC window read
    # + the assign/encode kernel) previously executed THREE times —
    # the empty probe, the count, and the append's write job each
    # re-ran it. One materialization serves all three.
    upserts = upserts.persist()
    try:
        n_upserted = upserts.count()
        if n_upserted:
            snap.append_versioned(
                wh, database, index_table, upserts,
                summary={"operation": "ann-refresh", **stamp},
                txn=(f"ann-refresh:{database}.{index_table}", cur),
            )
        else:
            # delete-only (or net-empty) window: nothing to append, so
            # the stamp is its own metadata commit — the replay of a
            # crash here is a no-op delete + re-stamp, idempotent
            snap.commit_snapshot(
                wh, database, index_table,
                summary={"operation": "ann-refresh", **stamp},
            )
    finally:
        upserts.unpersist()
    return {
        "n_deleted": n_deleted,
        "n_upserted": n_upserted,
        "src_version": cur,
    }


def maintain_ann_index(
    wh: Warehouse,
    database: str,
    index_table: str,
    target_file_bytes: int | None = None,
) -> dict:
    """Re-cluster the index on ``cid`` and truncate its history.
    Refresh MERGEs rewrite affected files and append upsert files
    with NO cid locality — after enough churn a probed cell's codes
    are smeared across most files and prune_eq stops skipping
    anything. This restores the fresh-build layout (range-cluster on
    cid, zone-map stats recomputed), so files-planned-per-probe drops
    back to ~nprobe/n_centroids of the file count; pytest pins
    post-maintenance planning == a fresh build's.

    Recluster cadence contract: run when refresh volume since the
    last build/maintenance approaches the index size (the point where
    smear saturates), or on the same schedule as table OPTIMIZE jobs.
    maintain_table truncates history to ONE version, which would drop
    the commit carrying the sidecar pointer — so the pointer is
    re-stamped on the maintenance commit itself (summary=), keeping
    _load_meta resolvable across the truncation. Quantizers are
    untouched: maintenance is layout-only, content-identical."""
    meta = _load_meta(wh, database, index_table)
    stats = snap.maintain_table(
        wh,
        database,
        index_table,
        sort_col="cid",
        target_file_bytes=target_file_bytes,
        summary={
            "operation": "ann-maintain",
            "ann_meta_file": meta["meta_file"],
            "src_version": meta["src_version"],
        },
    )
    _gc_meta_files(wh, database, index_table)
    return stats


def query_ann_index(
    wh: Warehouse,
    database: str,
    index_table: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    overfetch: int = 4,
    exclude_self: bool = True,
    adaptive_overfetch: bool = True,
) -> DataFrame:
    """Top-k through the persisted index: resolve ONE index version,
    load exactly the sidecar that version's chain names (quantizers
    consistent with the codes by construction — see module
    docstring), probe cells, plan ONLY the probed cells' index files
    via IN-list manifest pruning (``prune_eq=('cid', cells)`` —
    unprobed cells' files are skipped before any scan), ADC-score the
    candidates, and exact-refine against the source table's current
    snapshot. Output matches ivfpq_topk: (query_id, neighbor_id,
    cos_sim, rank).

    ``exclude_self`` (default True, the corpus-drawn-query family
    convention) drops candidates whose vec_id equals the query id.
    External queries use their OWN id space — pass False when those
    ids may coincide with corpus vec_ids, or results silently lose
    the colliding neighbor.

    ``adaptive_overfetch`` (DEFAULT since r11, matching ivfpq_topk's
    flip) keeps k*overfetch ADC candidates per (query, probed cell)
    instead of per query — recall monotone non-decreasing in nprobe
    (see similarity._adc_candidates); ``False`` keeps the fixed
    budget reachable for the quality-comparison tooling. Fixtures
    regenerated at the flip."""
    v = snap.versions(wh, database, index_table)[-1]
    meta = _load_meta(wh, database, index_table, version=v)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    qids, tables, probes = _query_probe_tables(
        queries, meta["books"], meta["cent_ids"], meta["centroids"],
        nprobe, id_col, vec_col,
    )
    cells = sorted({c for _qid, cs in probes for c in cs})
    index = snap.read_snapshot(
        wh, database, index_table, version=v, prune_eq=("cid", cells)
    ).select(F.col("__row_id").alias("vec_id"), "cid", "code")
    cand_ids = _adc_candidates(
        index, probes, qids, tables, int(meta["m"]),
        k * overfetch, wh.spark, exclude_self=exclude_self,
        per_cell=adaptive_overfetch,
    ).persist()
    try:
        # r13: the exact-refine join is candidate-bounded in CPU but
        # used to SCAN the whole source's (wide) embedding column to
        # serve it — the same corpus-IO term closed in
        # dedup_index.query_dedup_index this round. The candidate id
        # set is probe-bounded (collect bound: <= queries x probed
        # cells x k x overfetch), so it prunes the source read;
        # superset-safe without id stats, integral-gated like every
        # long-cast probe (snapshots.integral_col).
        nids = [
            r["neighbor_id"]
            for r in cand_ids.select("neighbor_id")
            .distinct()
            .collect()
        ]
        if not nids:
            return wh.spark.createDataFrame(
                [],
                "query_id long, neighbor_id long, "
                "cos_sim double, rank integer",
            )
        src = snap.read_snapshot(wh, database, meta["src_table"])
        if snap.integral_col(src.schema, id_col):
            src = snap.read_snapshot(
                wh, database, meta["src_table"],
                prune_eq=(id_col, nids),
            )
        return _exact_refine(
            cand_ids, src, queries, k, id_col, vec_col
        )
    finally:
        cand_ids.unpersist()
