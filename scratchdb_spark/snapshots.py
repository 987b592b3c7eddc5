"""Manifest-based snapshot versioning for warehouse tables — the
lakehouse layer (Iceberg/Delta's core idea, reimplemented minimally
over the existing Hadoop-FS warehouse; public design, no reference
code — the reference has no snapshot concept at all, its readers see
whatever files exist).

What it buys at 100 TB:

- **Atomic visibility**: an append becomes visible exactly when its
  one-file manifest commits, however many parquet files the batch
  wrote. Directory-listing readers instead see partial multi-file
  appends.
- **Pinned readers / time travel**: ``read_snapshot(..., version=N)``
  plans over the EXACT file list recorded at version N — concurrent
  appends don't shift results mid-query, and yesterday's version
  stays queryable until expired.
- **O(1) planning**: the manifest read replaces the directory listing
  (the listing cost that motivated bounded-file appends, PERF.md).

Format: ``_snapshots/v{N:012d}.json`` per version holding the data
file names; versions are monotonically numbered, the latest version
is max(N). JSON file lists are fine to ~10^6 files; beyond that real
systems shard manifests (Iceberg manifest lists) — noted, not built.

Maintenance: ``maintain_table`` compacts AS a copy-on-write commit —
the compacted layout lands under fresh names, the manifest PUT is the
single commit point, and only afterwards are old manifests expired
and old/COW-retired files physically deleted (so a valid manifest
exists at every instant, and deleted rows can never compact back into
the live data). History truncates — the same contract as Delta's
VACUUM — with version numbering kept monotonic, so pinned readers and
stale CDC cursors err loudly, never silently. Do NOT hand-roll an
expire -> compact_path -> commit sequence against a snapshot table.

Commits are optimistically concurrent: the manifest PUT is a
create-if-absent CAS; commit_snapshot retries with a recomputed
manifest, COW DML surfaces the conflict. Manifests also carry
optional per-file min/max zone maps and small value dictionaries
(``stat_cols``), plus per-file bloom filters (``bloom_cols``) for
high-cardinality equality skipping, all consumed by
``read_snapshot(prune=/prune_eq=)`` for plan-time file skipping.
Tables can also carry write-time quality constraints
(``set_constraints``: Delta CHECK + DLT expectations) enforced by
the append/overwrite paths before any data lands.
"""

from __future__ import annotations

import json
import re
import threading
import time

from pyspark.sql import DataFrame

from . import fs as hfs
from .tables import Warehouse

_SNAP_DIR = "_snapshots"
_SNAP_RE = re.compile(r"^v(\d{12})\.json$")
#: change-file storage under _snapshots/ (Delta CDF's public design:
#: non-append commits persist their exact change rows at commit time,
#: so change feeds replay from files instead of re-diffing data)
_CHANGES_DIR = "changes"
#: deletion-vector storage under _snapshots/ (Delta deletion vectors /
#: Iceberg position deletes, public designs): a merge-on-read DELETE
#: commits a small parquet of (file, __row_id) tombstones instead of
#: rewriting data files; readers anti-join, maintenance applies
_DV_DIR = "dv"
#: below this many tombstones the reader anti-join broadcasts (a DV
#: row is ~50 bytes, so the threshold sizes the explicit-hint
#: broadcast at ~10 MB — the autoBroadcastJoinThreshold default; the
#: hint bypasses that setting, so the cap must respect its budget
#: rather than force a ~100 MB broadcast onto constrained executors,
#: the r10 advisory's point); past it the join shuffles — the
#: documented signal to run apply_deletion_vectors (dv_fold_due)
_DV_BROADCAST_ROWS = 200_000


def _snap_dir(wh: Warehouse, database: str, table: str) -> str:
    return f"{wh._path(database, table)}/{_SNAP_DIR}"


def _data_files(wh: Warehouse, database: str, table: str) -> list[str]:
    """Current committed parquet data files (names, not paths)."""
    return sorted(
        n
        for n in hfs.list_names(wh.spark, wh._path(database, table))
        if n.endswith(".parquet")
    )


def versions(wh: Warehouse, database: str, table: str) -> list[int]:
    d = _snap_dir(wh, database, table)
    if not hfs.is_dir(wh.spark, d):
        return []
    out = []
    for n in hfs.list_names(wh.spark, d):
        m = _SNAP_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _watermark_path(wh: Warehouse, database: str, table: str) -> str:
    return f"{_snap_dir(wh, database, table)}/_last.json"


def _next_version(
    wh: Warehouse, database: str, table: str,
    vs: list[int] | None = None,
) -> int:
    """Monotonic version numbering: max(manifests on disk, persisted
    high-watermark) + 1. The watermark survives expire_snapshots and
    maintenance, so version numbers are NEVER reused — a CDC consumer
    holding a from_version that history truncation removed gets an
    explicit 'version not in snapshots' error instead of a silently
    wrong diff against an unrelated reused number.

    OCC REQUIREMENT (r9, caught by the concurrent-writer rehearsal):
    commit paths MUST pass the ``vs`` listing they derived ``prev``
    from. With a second, fresher listing here, a racer landing
    between the two claims an intermediate number, this writer PUTs
    at racer+1 UNCONTESTED with a manifest built from the stale prev
    — a silent lost update (measured: 4 widened-window writers lost
    7/16 batches with ZERO CAS conflicts). Numbering from the same
    snapshot makes both writers claim the same number, so the CAS
    rejects the loser and its retry re-reads — concurrent appends
    linearize instead of losing one."""
    occ = vs is not None
    if vs is None:
        vs = versions(wh, database, table)
    hi = vs[-1] if vs else 0
    wm = _watermark_path(wh, database, table)
    if hfs.exists(wh.spark, wm):
        try:
            wm_last = int(
                json.loads(hfs.read_text(wh.spark, wm))["last"]
            )
        except (ValueError, KeyError):
            wm_last = hi
        if occ and wm_last > hi:
            # the watermark is bumped right AFTER each manifest PUT,
            # so being ahead of the caller's listing means a racer
            # committed since (its manifest is live — expiry always
            # keeps the latest). Numbering past it would claim an
            # UNCONTESTED number with a stale prev — the second half
            # of the silent-lost-update hole (measured before this
            # check: widened-window writers leapfrogged via the
            # fresh watermark read with zero CAS conflicts). Fail
            # the commit loudly; the caller's retry re-reads.
            if hfs.exists(
                wh.spark,
                f"{_snap_dir(wh, database, table)}/v{wm_last:012d}.json",
            ):
                raise CommitConflictError(
                    f"{database}.{table} advanced to v{wm_last} "
                    f"past this writer's snapshot v{hi} "
                    "(concurrent commit)"
                )
        hi = max(hi, wm_last)
    return hi + 1


def integral_col(schema, col: str) -> bool:
    """True when ``col`` is an integral type — the safety gate for
    pruning a read with LONG-cast key values (probing a string
    column's stat dict with longs would wrongly skip files; the
    superset contract only holds when probe and stat types compare
    like-for-like). Shared by the dedup/ANN index probe paths (r13).
    """
    return schema[col].dataType.typeName() in (
        "long", "integer", "short", "byte"
    )


class ConstraintViolationError(ValueError):
    """A batch violated a table constraint whose on_violation mode is
    'fail' — nothing was written (the check runs BEFORE any data
    lands, so a rejected batch leaves no debris to reclaim)."""


class ConcurrentTxnError(RuntimeError):
    """Two writers committed the same (txn app, version) — the
    idempotent-append contract is SEQUENTIAL per app id (one logical
    writer per app, replays only after the predecessor finished, the
    Delta txnAppId/txnVersion posture). Raised instead of silently
    skipping because by the time the collision is visible both
    writers may have landed data files."""


_CAS_ATTEMPTS = 10


def _cas_backoff(attempt: int) -> None:
    """Exponentially growing, jittered pause before a CAS retry
    (r12, widened r13): without it every loser of a commit race
    re-lists and re-PUTs immediately, so N racers keep colliding on
    the same next version — observed once as a 4-thread commit storm
    exhausting the old 5-attempt budget under host load. Early
    attempts stagger 20-60 ms (invisible next to a real commit);
    late attempts back off up to ~2 s, which is what lets a SLOW
    writer survive a commit burst: an op whose recompute takes
    seconds conflicts with every commit that lands inside that
    window, and only a pause comparable to the burst gives its next
    window a chance to close cleanly (measured in
    mor_concurrent_churn_r13 — under a deliberately hot 4-writer +
    compactor race, the linear 100 ms cap starved one merge past the
    whole budget). The jitter source is control-flow-only (never
    touches data or plans), so determinism contracts are unaffected.
    """
    import random
    import time

    time.sleep(random.uniform(0.01, 0.03) * (2 ** min(attempt, 6)))


class CommitConflictError(RuntimeError):
    """A concurrent writer committed this snapshot version first."""


def _put_manifest(
    wh: Warehouse,
    database: str,
    table: str,
    manifest: dict,
    overwrite: bool = False,
) -> None:
    """Manifest PUT + watermark update (the PUT is the atomic commit
    point; the watermark write after it only ever raises the floor).

    The PUT is create-if-absent (optimistic concurrency): two writers
    racing to the same version number cannot silently last-write-win —
    the loser gets CommitConflictError. commit_snapshot retries with a
    fresh version (its manifest is recomputed from the directory, so
    the retry adopts the winner's files too); copy-on-write DML
    (delete_where / delete_keys / merge_upsert / overwrite_versioned)
    retries via _retry_dml with a FULL recompute against the fresh
    snapshot — its manifest is derived from a specific parent
    version, so only a from-scratch attempt is serializable after
    the winner. ``overwrite``
    is reserved for same-version metadata rewrites that are not
    commits (maintain_table's retired-set drain)."""
    v = manifest["version"]
    # commit wall-clock for timestamp time travel (read_snapshot
    # as_of_timestamp; informational — version numbers remain the
    # ordering authority, the stamp is monotonic only as far as the
    # committing hosts' clocks are)
    manifest.setdefault("committed_at", time.time())
    body = json.dumps(manifest, separators=(",", ":"))
    path = f"{_snap_dir(wh, database, table)}/v{v:012d}.json"
    # write-to-temp + rename: the manifest NAME only ever appears with
    # its full content, so concurrent version listers can never parse
    # a half-written commit (caught live by the CDC stream source test)
    #
    # The put itself passes through the per-table commit gate
    # (_dml_lock, r13): a millisecond hold for ordinary commits, but
    # while an ESCALATED DML retry holds the gate across its whole
    # attempt, no other in-process commit can land inside its
    # listing->recompute->put window — the progress guarantee pure
    # OCC lacks when recomputes take seconds (re-entrant, so the
    # holder's own put passes; cross-process racers still hit the
    # create-if-absent CAS below).
    with _dml_lock(wh._path(database, table)):
        if overwrite:
            hfs.put_text_atomic(wh.spark, path, body)
        elif not hfs.create_text(wh.spark, path, body):
            raise CommitConflictError(
                f"snapshot v{v} of {database}.{table} was committed "
                "by a concurrent writer"
            )
        hfs.write_text(
            wh.spark,
            _watermark_path(wh, database, table),
            json.dumps({"last": v}),
        )


#: max distinct values recorded per (file, column) dictionary; above
#: this the dict is omitted and equality pruning falls back to the
#: min/max range. Keeps manifest growth bounded: <= 64 scalars per
#: file/col on top of the 2 min/max entries.
_DICT_CAP = 64


_BLOOM_M = 4096  # bits per file-level bloom bitmap (512 B raw)
_BLOOM_K = 3  # probe positions per value (sha256-derived words)
_BLOOM_POS_CAP = 3072  # distinct positions above which the bloom is
#                        recorded as null: "computed but saturated" —
#                        distinct from a missing key ("never computed",
#                        which forces a backfill scan on stat widening)


def _bloom_positions(v, m: int = _BLOOM_M, k: int = _BLOOM_K) -> list[int]:
    """Probe positions for one value: the first k 32-bit words of
    sha256(str(v)) mod m. MUST stay byte-identical to the Spark-side
    expression in _file_stats (sha2(cast(col as string), 256) hex →
    conv(substring, 16, 10) % m): Python str() and Spark's
    cast-to-string agree for string and integral types, which is why
    bloom columns are restricted to exactly those."""
    import hashlib

    h = hashlib.sha256(str(v).encode("utf-8")).hexdigest()
    return [int(h[8 * i : 8 * i + 8], 16) % m for i in range(k)]


def _bloom_test(bl: dict, vals) -> bool:
    """True iff SOME value in ``vals`` may be present per the bloom
    record ({"m","k","b"(base64)}). All-k-bits-set semantics: false
    positives possible (file scanned needlessly), false negatives
    impossible (pruning never drops rows)."""
    import base64

    bits = base64.b64decode(bl["b"])
    return any(
        all(
            (bits[p >> 3] >> (p & 7)) & 1
            for p in _bloom_positions(v, bl["m"], bl["k"])
        )
        for v in vals
    )


def _bloom_merge(bls: list[dict]) -> dict | None:
    """OR-union of member blooms (set-union membership, so shard-level
    skipping keeps the no-false-negative guarantee); None when any
    member is saturated (null) or parameters disagree."""
    import base64

    if any(b is None for b in bls):
        return None
    m, k = bls[0]["m"], bls[0]["k"]
    if any(b["m"] != m or b["k"] != k for b in bls):
        return None
    acc = bytearray(m // 8)
    for b in bls:
        for i, byte in enumerate(base64.b64decode(b["b"])):
            acc[i] |= byte
    return {"m": m, "k": k, "b": base64.b64encode(bytes(acc)).decode()}


_BLOOMABLE_TYPES = ("bigint", "int", "smallint", "tinyint", "string")

#: batch size above which bloom-less local-FS stats take the
#: executor-side pyarrow fast path (see _file_stats_arrow); below it
#: the Spark-agg path's fixed job cost is negligible and stays primary
_ARROW_STATS_MIN_FILES = 512

#: token-bloom variant (ClickHouse tokenbf_v1 skip index, public
#: design, lifted to manifest level): a ``bloom_cols`` entry
#: ``"<col>:tokens"`` records a per-file bloom over the column's
#: DISTINCT TOKENS instead of its values, enabling plan-time file
#: skipping for full-word search ("which files can contain token X")
#: on free-text columns where neither ranges, dictionaries, nor
#: value blooms help. Tokens are lowercased ASCII [a-z0-9] runs —
#: byte-identical between the Spark write side and the Python probe
#: side by construction (non-ASCII characters are separators on
#: both). Sized larger than value blooms (token sets run to
#: thousands per file): 128 Ki bits = 16 KB bitmap per file/col,
#: ~1% false-positive rate at 7k distinct tokens, recorded null
#: (must-scan) above ~50% bit density.
_TOKEN_MARKER = ":tokens"
_TOK_M = 131072
_TOK_K = 4

#: NDV-sketch variant: a ``bloom_cols`` entry ``"<col>:ndv"`` records
#: a per-file HLL SKETCH of the column (Apache DataSketches binary,
#: Spark's hll_sketch_agg — public design; Iceberg ships the same
#: idea as puffin theta/HLL blobs). Sketches are union-mergeable, so
#: stats_agg_ndv answers "approximately how many distinct values"
#: for a 100 TB table from manifest metadata alone — the ANALYZE-
#: style NDV a planner or a data profiler wants, at ~1.5 KB per
#: file/col and zero data reads at query time. Stored as a base64
#: STRING under the same ``<entry>__bloom`` key the other auxiliary
#: filters use (coverage/widening checks come for free); shard
#: rollups store None for it (covered-but-not-merged — merging is a
#: sketch union, done at read in one tiny Spark job over the
#: per-file sketches).
_NDV_MARKER = ":ndv"


def _tokenize(s: str) -> list[str]:
    """Lowercased ASCII alnum runs — the probe-side twin of the
    Spark-side ``split(lower(col), '[^a-z0-9]+')`` in _file_stats.
    MUST stay byte-identical to it."""
    return re.findall("[a-z0-9]+", s.lower())


def _tok_survives(
    rec: dict, col: str, tokens: list[str], resolver=None
) -> bool:
    """True iff the file (or shard rollup) may contain EVERY probed
    token — AND semantics, because a conjunctive text search needs
    all of them in the same file for a row to match. Missing or
    saturated (null) bloom -> must scan; a definite miss on any
    token proves no row in the file can match (no false negatives).
    Externalized bitmaps ({"sc","k"} references, r9) resolve lazily
    through ``resolver``; with no resolver they are must-scan."""
    bl = rec.get(f"{col}{_TOKEN_MARKER}__bloom", "absent")
    if bl == "absent" or bl is None:
        return True
    if isinstance(bl, dict) and "sc" in bl:
        if resolver is None:
            return True
        bl = resolver(bl)
        if bl is None:
            return True
    return all(_bloom_test(bl, [t]) for t in tokens)


def _file_stats_arrow(
    wh: Warehouse, base: str, names: list[str], schema,
    stat_cols: list[str],
) -> dict:
    """Per-file stats via executor-side pyarrow (see dispatch site in
    _file_stats): one row per file crosses back as a JSON record —
    identical shape and JSON-level value fidelity to the Spark-agg
    path (pinned by test_file_stats_arrow_fast_path_parity). String
    order matches (Arrow/Spark compare UTF-8 bytes; Python sorts by
    code point — the same total order), numeric min/max are exact
    under any grouping. Local-FS batches only; the kernel reads
    ``base`` directly on the executor (same shared-FS contract as
    the landing zone)."""
    local_base = hfs._local_path(base)
    cols = list(stat_cols)
    cap = _DICT_CAP

    def kernel(batches):
        import json as _json
        import os as _os

        import pandas as _pd
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_f, out_rec = [], []
            for n in pdf["f"]:
                # a file may LACK a stat column (adopted/legacy files
                # written before stat-col widening — a supported flow):
                # the Spark path reads with the TABLE schema and yields
                # nulls there, so this path intersects with the file's
                # actual schema and emits the same null-fill record
                # ([None,None] range, all-rows null count, empty dict)
                pf = _pq.ParquetFile(_os.path.join(local_base, n))
                nrows = pf.metadata.num_rows
                names_in = set(pf.schema_arrow.names)
                present = [c for c in cols if c in names_in]
                t = pf.read(columns=present) if present else None
                rec: dict = {"__rows": nrows}
                for c in cols:
                    if c not in names_in:
                        rec[c] = [None, None]
                        rec[f"{c}__nulls"] = nrows
                        rec[f"{c}__dict"] = []
                        continue
                    col = t[c]
                    if nrows:
                        mm = _pc.min_max(col)
                        rec[c] = [
                            mm["min"].as_py(), mm["max"].as_py()
                        ]
                    else:
                        rec[c] = [None, None]
                    rec[f"{c}__nulls"] = col.null_count
                    uniq = _pc.unique(
                        col.combine_chunks().drop_null()
                    ).to_pylist()
                    if len(uniq) <= cap:
                        rec[f"{c}__dict"] = sorted(uniq)
                out_f.append(n)
                out_rec.append(_json.dumps(rec))
            yield _pd.DataFrame({"f": out_f, "rec": out_rec})

    import pandas as _pd

    spark = wh.spark
    par = max(spark.sparkContext.defaultParallelism, 1)
    # Arrow-backed transfer of the name list (a row-by-row
    # createDataFrame costs seconds of py4j at 80k names)
    ndf = spark.createDataFrame(
        _pd.DataFrame({"f": names})
    ).repartition(min(max(len(names) // 64, 1), par * 2))
    rows = ndf.mapInPandas(kernel, "f string, rec string").collect()
    out = {r["f"]: json.loads(r["rec"]) for r in rows}
    for n in names:  # parity with the Spark path's empty-file shape
        out.setdefault(
            n,
            {
                "__rows": 0,
                **{c: [None, None] for c in cols},
                **{f"{c}__nulls": 0 for c in cols},
                **{f"{c}__dict": [] for c in cols},
            },
        )
    return out


def _file_stats(
    wh: Warehouse, base: str, names: list[str], schema,
    stat_cols: list[str], bloom_cols: list[str] = (),
) -> dict:
    """Per-file min/max for ``stat_cols`` over exactly ``names`` — the
    zone-map half of the manifest (Iceberg data-file stats / Delta
    file skipping, public designs). ONE aggregation job over only the
    named files (commit path passes just the new batch's files, so
    stats cost is proportional to churn, not table size); map-side
    combine makes the shuffle k-rows-per-file.

    ``bloom_cols`` additionally records a per-file BLOOM FILTER
    (``col__bloom``) for equality skipping on HIGH-cardinality
    columns, where the capped dictionary saturates and min/max ranges
    are useless unless the table happens to be clustered on the
    column (Parquet column-index bloom filters / ClickHouse
    bloom_filter skip indexes, public designs, lifted to manifest
    level so the DRIVER skips whole files without opening footers).
    The k probe positions are sha256-derived JVM-side and replayed in
    pure Python at plan time — see _bloom_positions. A file whose
    distinct-position count exceeds _BLOOM_POS_CAP records null
    (saturated: must-scan, but still "covered" for stat widening)."""
    if not names or not (stat_cols or bloom_cols):
        return {}
    import base64

    from pyspark.sql import functions as F

    for c in stat_cols:
        f = next((f for f in schema.fields if f.name == c), None)
        if f is None:
            raise ValueError(f"stat column {c!r} not in table schema")
        kind = f.dataType.simpleString()
        if kind not in (
            "bigint", "int", "smallint", "tinyint", "double", "float",
            "string", "boolean",
        ):
            raise ValueError(
                f"stat column {c!r} has non-JSON-portable type {kind}; "
                "use a numeric/string column"
            )
    tok_blooms = [c for c in bloom_cols if c.endswith(_TOKEN_MARKER)]
    ndv_cols = [c for c in bloom_cols if c.endswith(_NDV_MARKER)]
    val_blooms = [
        c for c in bloom_cols if c not in tok_blooms and c not in ndv_cols
    ]
    for c in ndv_cols:
        src = c[: -len(_NDV_MARKER)]
        f = next((f for f in schema.fields if f.name == src), None)
        if f is None:
            raise ValueError(
                f"ndv sketch column {src!r} not in table schema"
            )
        if f.dataType.simpleString() not in _BLOOMABLE_TYPES:
            raise ValueError(
                f"ndv sketch column {src!r} has type "
                f"{f.dataType.simpleString()}; HLL sketches need a "
                "string or integral column"
            )
    for c in val_blooms:
        f = next((f for f in schema.fields if f.name == c), None)
        if f is None:
            raise ValueError(f"bloom column {c!r} not in table schema")
        kind = f.dataType.simpleString()
        if kind not in _BLOOMABLE_TYPES:
            raise ValueError(
                f"bloom column {c!r} has type {kind}; bloom skipping "
                "needs a string or integral column (str()/cast-to-"
                "string must agree across engines)"
            )
    for c in tok_blooms:
        src = c[: -len(_TOKEN_MARKER)]
        f = next((f for f in schema.fields if f.name == src), None)
        if f is None:
            raise ValueError(
                f"token bloom column {src!r} not in table schema"
            )
        if f.dataType.simpleString() != "string":
            raise ValueError(
                f"token bloom column {src!r} must be string, is "
                f"{f.dataType.simpleString()}"
            )
    if (
        not bloom_cols
        and len(names) >= _ARROW_STATS_MIN_FILES
        and hfs._local_path(base) is not None
    ):
        # Large-batch fast path (r9): the Spark-scan route pays a
        # distributed path-LISTING job plus per-file FileSourceScan
        # machinery that dominates at bulk-adopt scale (measured:
        # 45 s of a 48 s commit at 80k tiny files). Per-file pyarrow
        # reads of ONLY the stat columns, fanned out over executor
        # PROCESSES via mapInPandas (driver threads are GIL-bound at
        # ~1 ms/file; 32 processes cut it to ~wall/32), produce
        # byte-identical records: values round-trip through JSON,
        # which is exactly the fidelity the manifest itself has.
        # Blooms/NDV stay on the Spark path (their kernels are Spark
        # expressions: sha2 probe positions, DataSketches HLL).
        return _file_stats_arrow(wh, base, names, schema, stat_cols)
    df = wh.spark.read.schema(schema).parquet(
        *[f"{base}/{n}" for n in names]
    )
    # row count and per-column null counts ride the same per-file
    # aggregation for free — they are what lets stats_agg answer
    # COUNT(*)/COUNT(c)/MIN/MAX from the manifest alone (Iceberg
    # record_count / null_value_counts, public design), with zero
    # data-file IO at query time
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nc_{c}"),
            # low-cardinality dictionary: the distinct value set when
            # it is small (<= _DICT_CAP) — slice() bounds what crosses
            # the wire to CAP+1 values per file/col; a full set of
            # exactly CAP+1 means "over cap" and records no dict.
            # Enables EQUALITY file skipping where min/max ranges are
            # useless (categorical columns clustered across files) —
            # the parquet dictionary-page idea lifted to manifest level
            F.slice(
                F.sort_array(F.collect_set(F.col(c))), 1, _DICT_CAP + 1
            ).alias(f"dc_{c}"),
        ]
    for c in val_blooms:
        digest = F.sha2(F.col(c).cast("string"), 256)
        for i in range(_BLOOM_K):
            pos = F.pmod(
                F.conv(
                    F.substring(digest, 1 + 8 * i, 8), 16, 10
                ).cast("long"),
                F.lit(_BLOOM_M),
            )
            # slice() caps what crosses the wire at CAP+1 positions
            # per file/word — a set that large means the bloom is
            # saturated and gets recorded as null anyway
            aggs.append(
                F.slice(
                    F.sort_array(F.collect_set(pos)),
                    1, _BLOOM_POS_CAP + 1,
                ).alias(f"bp{i}_{c}")
            )
    for c in ndv_cols:
        src = c[: -len(_NDV_MARKER)]
        aggs.append(
            F.base64(F.hll_sketch_agg(F.col(src))).alias(f"hs_{c}")
        )
    rows = (
        df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    )
    out = {}
    for r in rows:
        rec = {"__rows": r["__rows"]}
        for c in ndv_cols:
            # base64 DataSketches HLL binary; "" = no non-null values
            rec[f"{c}__bloom"] = r[f"hs_{c}"] or ""
        for c in stat_cols:
            rec[c] = [r[f"mn_{c}"], r[f"mx_{c}"]]
            rec[f"{c}__nulls"] = r[f"nc_{c}"]
            vals = r[f"dc_{c}"]
            if vals is not None and len(vals) <= _DICT_CAP:
                rec[f"{c}__dict"] = list(vals)
        for c in val_blooms:
            sets = [r[f"bp{i}_{c}"] or [] for i in range(_BLOOM_K)]
            if any(len(s) > _BLOOM_POS_CAP for s in sets):
                rec[f"{c}__bloom"] = None  # saturated: must-scan
            else:
                bits = bytearray(_BLOOM_M // 8)
                for s in sets:
                    for p in s:
                        bits[p >> 3] |= 1 << (p & 7)
                rec[f"{c}__bloom"] = {
                    "m": _BLOOM_M,
                    "k": _BLOOM_K,
                    "b": base64.b64encode(bytes(bits)).decode(),
                }
        out[r["__f"].rsplit("/", 1)[-1]] = rec
    # token blooms need token granularity (explode), so they ride a
    # second aggregation per column over ONLY the text column + file
    # name of the same fresh files — still O(churn). The bitmap is
    # built JVM-side as per-(file, 64-bit-word) bit_or masks (at most
    # m/64 = 2048 words/file cross the wire, NOT one position per
    # distinct token), and assembled into bytes on the driver.
    for c in tok_blooms:
        src = c[: -len(_TOKEN_MARKER)]
        toks = (
            df.select(
                F.input_file_name().alias("__f"),
                F.explode(
                    F.split(F.lower(F.col(src)), "[^a-z0-9]+")
                ).alias("t"),
            )
            .filter(F.col("t") != "")
        )
        digest = F.sha2(F.col("t"), 256)
        pos = [
            F.pmod(
                F.conv(
                    F.substring(digest, 1 + 8 * i, 8), 16, 10
                ).cast("long"),
                F.lit(_TOK_M),
            )
            for i in range(_TOK_K)
        ]
        words = (
            toks.select("__f", F.explode(F.array(*pos)).alias("p"))
            .groupBy(
                "__f", F.expr("CAST(p DIV 64 AS INT)").alias("w")
            )
            .agg(
                F.expr(
                    "bit_or(shiftleft(1L, CAST(p % 64 AS INT)))"
                ).alias("bits")
            )
            .collect()
        )
        maps: dict = {}
        for r in words:
            n = r["__f"].rsplit("/", 1)[-1]
            bm = maps.setdefault(n, bytearray(_TOK_M // 8))
            bits = r["bits"] & 0xFFFFFFFFFFFFFFFF
            base_i = 8 * r["w"]
            for j in range(8):
                bm[base_i + j] |= (bits >> (8 * j)) & 0xFF
        for n, rec in out.items():
            bm = maps.get(n)
            if bm is None:
                # no tokens in the file: all-zero bloom, every probe
                # misses -> file skipped, which is correct
                bm = bytearray(_TOK_M // 8)
            dens = sum(bin(b).count("1") for b in bm) / _TOK_M
            rec[f"{c}__bloom"] = (
                None  # saturated: must-scan (false-positive floor)
                if dens > 0.5
                else {
                    "m": _TOK_M,
                    "k": _TOK_K,
                    "b": base64.b64encode(bytes(bm)).decode(),
                }
            )
    # a file with no rows produces no aggregation row: record it as
    # [None, None] (distinct from "no stats recorded") so range
    # pruning can skip it — same as an all-null file, no value in it
    # can ever satisfy a range predicate
    for n in names:
        out.setdefault(
            n,
            {
                "__rows": 0,
                **{c: [None, None] for c in stat_cols},
                **{f"{c}__nulls": 0 for c in stat_cols},
                **{f"{c}__dict": [] for c in stat_cols},
                # all-zero bloom: every probe misses -> file skipped,
                # correct for a file with no (non-null) values
                **{
                    f"{c}__bloom": (
                        # NDV: empty sketch sentinel (contributes no
                        # distinct values to the union)
                        ""
                        if c.endswith(_NDV_MARKER)
                        else {
                            "m": (
                                _TOK_M
                                if c.endswith(_TOKEN_MARKER)
                                else _BLOOM_M
                            ),
                            "k": (
                                _TOK_K
                                if c.endswith(_TOKEN_MARKER)
                                else _BLOOM_K
                            ),
                            "b": base64.b64encode(
                                bytes(
                                    (
                                        _TOK_M
                                        if c.endswith(_TOKEN_MARKER)
                                        else _BLOOM_M
                                    )
                                    // 8
                                )
                            ).decode(),
                        }
                    )
                    for c in bloom_cols
                },
            },
        )
    return out


# --- manifest sharding (Iceberg's manifest-list idea, public design) --
#
# Above _SHARD_THRESHOLD files a manifest stops inlining its file list
# and instead references immutable SHARD files
# (``_snapshots/shards/s-<uuid>.json``), each holding <= _SHARD_SIZE
# file names plus their per-file stats. The commit manifest stays a
# small JSON (one record per shard: name, count, lexical name range,
# rolled-up stats), so:
#   - a COMMIT rewrites only the shards whose name range covers a
#     removed file and writes one new shard per ~_SHARD_SIZE of churn —
#     O(churn), never O(table files);
#   - PRUNED reads (read_snapshot prune=/prune_eq=) drop whole shards
#     by the rolled-up [min,max]/dict before opening them, so the
#     driver parses stats only for shards the predicate can live in;
#   - unchanged shards are shared across versions by reference (the
#     audit-trail versions cost no extra metadata).
# The remaining driver-side O(n) is the surviving file-NAME list, which
# any Spark planner needs to build the scan anyway. Shards of expired
# versions are reclaimed by maintain_table.

_SHARD_THRESHOLD = 2048  # files; manifests shard above this
_SHARD_SIZE = 1024  # files per shard
_SHARDS_DIR = "shards"

# --- oversized-filter sidecars (r9) ----------------------------------
#
# Token blooms are 16 KB base64 per file/col (measured 22 KB/file of
# snapshot JSON at 1000 files, tokbloom_rehearsal_r8.json — ~2.2 GB of
# driver-parsed metadata extrapolated to 100k files). Any per-file
# auxiliary filter whose encoded payload exceeds _INLINE_BLOOM_CAP is
# therefore EXTERNALIZED at commit time: the batch's oversized bitmaps
# land in ONE content-addressed sidecar JSON under
# ``_snapshots/blooms/``, and the inline stat record keeps a ~60 B
# reference ``{"sc": <sidecar>, "k": "<file>|<entry>"}``. Planning
# stays correct and lazy: manifest/shard parsing never touches the
# bitmaps; only a probe that actually uses them (prune_tokens) opens
# the sidecars — and only for files that survived range/eq pruning
# first. Sidecars are immutable and shared across versions like
# shards; maintenance reclaims the unreferenced ones.
_BLOOMS_DIR = "blooms"
_INLINE_BLOOM_CAP = 2048  # bytes of encoded payload; knob


def _bloom_sidecar_path(
    wh: Warehouse, database: str, table: str, name: str
) -> str:
    return f"{_snap_dir(wh, database, table)}/{_BLOOMS_DIR}/{name}"


def _externalize_big_blooms(
    wh: Warehouse, database: str, table: str, fresh_stats: dict
) -> tuple[dict, str | None]:
    """Move oversized ``*__bloom`` payloads out of the fresh per-file
    stat records into one sidecar file for the batch; returns
    (records-with-references, sidecar name or None when nothing was
    oversized; input untouched then). Written BEFORE the manifest
    PUT — unreferenced until the PUT names the stats, so a lost CAS
    leaves only debris that maintain_table reclaims."""
    import uuid as _uuid

    body: dict = {}
    out: dict = {}
    sc_name = f"tb-{_uuid.uuid4().hex}.json"
    for fname, rec in fresh_stats.items():
        moved = None
        for key, val in rec.items():
            if (
                key.endswith("__bloom")
                and isinstance(val, dict)
                and "b" in val
                and len(val["b"]) > _INLINE_BLOOM_CAP
            ):
                k = f"{fname}|{key}"
                body[k] = val
                if moved is None:
                    moved = dict(rec)
                moved[key] = {"sc": sc_name, "k": k}
        out[fname] = moved if moved is not None else rec
    if not body:
        return fresh_stats, None
    hfs.put_text_atomic(
        wh.spark,
        _bloom_sidecar_path(wh, database, table, sc_name),
        json.dumps(body, separators=(",", ":")),
    )
    return out, sc_name


def _bloom_resolver(wh: Warehouse, database: str, table: str):
    """Plan-time lazy resolver for externalized filter references:
    caches whole sidecars (one read serves every file of the commit
    batch that wrote it). Unreadable/missing sidecar -> None, which
    every survive check treats as must-scan (pruning never drops
    rows on metadata trouble).

    ``resolve.prefetch(names)`` (r10) bulk-loads a set of sidecars
    into the cache CONCURRENTLY (bounded thread pool). Sidecars are
    per-commit-batch, so a table accreted over hundreds of commits
    spreads one probe's surviving files over many sidecars — fetched
    serially that is O(batches) x per-open latency (tens of seconds
    at ~50 ms object-store GETs); pooled it is ~ceil(batches/16)
    round trips. _plan_files prefetches exactly the sidecars its
    range/eq survivors reference before the token pass."""
    cache: dict = {}

    def _load(name: str) -> dict:
        try:
            return json.loads(
                hfs.read_text(
                    wh.spark,
                    _bloom_sidecar_path(wh, database, table, name),
                )
            )
        except Exception:
            return {}

    def resolve(ref: dict):
        name = ref.get("sc")
        if name not in cache:
            cache[name] = _load(name)
        return cache[name].get(ref.get("k"))

    def prefetch(names) -> None:
        todo = sorted(n for n in set(names) if n not in cache)
        if not todo:
            return
        if len(todo) == 1:
            cache[todo[0]] = _load(todo[0])
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(16, len(todo))) as pool:
            for name, body in zip(todo, pool.map(_load, todo)):
                cache[name] = body

    resolve.prefetch = prefetch
    return resolve


def _shard_path(wh: Warehouse, database: str, table: str, name: str) -> str:
    return f"{_snap_dir(wh, database, table)}/{_SHARDS_DIR}/{name}"


def _read_shard(wh: Warehouse, database: str, table: str, name: str) -> dict:
    return json.loads(
        hfs.read_text(wh.spark, _shard_path(wh, database, table, name))
    )


def _shard_agg(
    stats: dict, names: list[str], cols: list[str],
    blooms: list[str] = (),
) -> dict:
    """Rolled-up stats for a shard record: per-column [min,max] over
    the member files' zone maps and a capped union dictionary —
    exactly the per-file record shape, lifted one level, so the same
    _range_survives/_eq_survives decide WHOLE-SHARD skipping. A column
    any member lacks stats for is omitted (the shard must then always
    be opened: pruning never drops rows)."""
    rec: dict = {}
    # additive rollups (rows / null counts): summed when every member
    # carries them, omitted otherwise — lets stats_agg answer
    # COUNT(*) for a sharded table from the shard records alone,
    # without opening any shard file
    if all(
        n in stats and stats[n].get("__rows") is not None for n in names
    ):
        rec["__rows"] = sum(stats[n]["__rows"] for n in names)
    for c in cols:
        if any(n not in stats or c not in stats[n] for n in names):
            continue
        mns = [stats[n][c][0] for n in names if stats[n][c][0] is not None]
        mxs = [stats[n][c][1] for n in names if stats[n][c][1] is not None]
        rec[c] = [min(mns) if mns else None, max(mxs) if mxs else None]
        if all(
            stats[n].get(f"{c}__nulls") is not None for n in names
        ):
            rec[f"{c}__nulls"] = sum(
                stats[n][f"{c}__nulls"] for n in names
            )
        union: set = set()
        have_all = True
        for n in names:
            d = stats[n].get(f"{c}__dict")
            if d is None:
                have_all = False
                break
            union |= set(d)
        if have_all and len(union) <= _DICT_CAP:
            rec[f"{c}__dict"] = sorted(union)
    for c in blooms:
        # key present in the agg == every member was bloom-computed
        # (the stat-widening force-open proxy); value None == some
        # member saturated (or, for NDV sketches, merged only at
        # read), so the shard itself can't skip on it but its
        # members still resolve individually
        if any(f"{c}__bloom" not in stats.get(n, {}) for n in names):
            continue
        if c.endswith(_NDV_MARKER):
            rec[f"{c}__bloom"] = None  # covered; union happens at read
            continue
        members = [stats[n][f"{c}__bloom"] for n in names]
        if any(isinstance(b, dict) and "sc" in b for b in members):
            # externalized bitmaps (r9): covered-but-not-merged — the
            # shard can't skip on this filter itself (a 1000-file OR
            # union would be saturated anyway); members resolve
            # individually once the shard is opened
            rec[f"{c}__bloom"] = None
            continue
        rec[f"{c}__bloom"] = _bloom_merge(members)
    return rec


def _write_shard(
    wh: Warehouse,
    database: str,
    table: str,
    names: list[str],
    stats: dict,
    cols: list[str],
    blooms: list[str] = (),
) -> dict:
    """Write one immutable shard file and return its manifest record.
    uuid names never collide; visibility gates on the manifest PUT."""
    import uuid

    names = sorted(names)
    shard_name = f"s-{uuid.uuid4().hex}.json"
    body = {
        "files": names,
        "stats": {n: stats[n] for n in names if n in stats},
    }
    hfs.put_text_atomic(
        wh.spark,
        _shard_path(wh, database, table, shard_name),
        json.dumps(body, separators=(",", ":")),
    )
    rec = {
        "name": shard_name,
        "n": len(names),
        "first": names[0],
        "last": names[-1],
    }
    if cols or blooms:
        rec["agg"] = _shard_agg(body["stats"], names, cols, blooms)
    return rec


def _read_shards(
    wh: Warehouse, database: str, table: str, names: list[str]
) -> list[dict]:
    """Read several shard JSONs, overlapping the (pure IO) reads on a
    small thread pool — py4j serves each thread on its own gateway
    connection, so a full-file-list resolution over hundreds of
    shards costs ~max(latency) rather than sum(latency)."""
    if len(names) <= 2:
        return [_read_shard(wh, database, table, n) for n in names]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(names))) as ex:
        return list(
            ex.map(lambda n: _read_shard(wh, database, table, n), names)
        )


def _manifest_files(
    wh: Warehouse, database: str, table: str, m: dict
) -> list[str]:
    """A manifest's full data-file name list (inline or via shards)."""
    if "shards" not in m:
        return list(m["files"])
    out: list[str] = []
    for sh in _read_shards(
        wh, database, table, [rec["name"] for rec in m["shards"]]
    ):
        out += sh["files"]
    return sorted(out)


def _manifest_has(
    wh: Warehouse, database: str, table: str, m: dict, names: set
) -> set:
    """Which of ``names`` are LIVE data files of manifest ``m`` —
    membership only, never a full listing. Inline manifests answer
    from the file list; sharded ones open only shards whose lexical
    [first, last] range covers a queried name, so probing a handful
    of names against a 100k-file manifest costs a few pooled shard
    reads (the same range-pruning _manifest_stats uses)."""
    names = set(names)
    if not names:
        return set()
    if "shards" not in m:
        return names & set(m["files"])
    wanted = sorted(names)
    recs = [
        rec
        for rec in m["shards"]
        if any(rec["first"] <= n <= rec["last"] for n in wanted)
    ]
    out: set = set()
    for sh in _read_shards(
        wh, database, table, [r["name"] for r in recs]
    ):
        out |= names & set(sh["files"])
    return out


def _manifest_n_files(m: dict) -> int:
    return m["n_files"] if "shards" in m else len(m["files"])


def _manifest_stats(
    wh: Warehouse,
    database: str,
    table: str,
    m: dict,
    names: list[str] | None = None,
) -> dict:
    """Per-file stats lookup. For sharded manifests only shards whose
    lexical name range covers a requested name are opened."""
    if "shards" not in m:
        s = m.get("stats", {})
        if names is None:
            return dict(s)
        return {n: s[n] for n in names if n in s}
    out: dict = {}
    wanted = None if names is None else sorted(names)
    for rec in m["shards"]:
        if wanted is not None and not any(
            rec["first"] <= n <= rec["last"] for n in wanted
        ):
            continue
        out.update(
            _read_shard(wh, database, table, rec["name"]).get("stats", {})
        )
    if names is None:
        return out
    return {n: out[n] for n in names if n in out}


def _assemble_manifest_entry(
    wh: Warehouse,
    database: str,
    table: str,
    prev: dict | None,
    files: list[str],
    added: list[str],
    removed: set,
    fresh_stats: dict,
    cols: list[str],
    blooms: list[str] = (),
) -> dict:
    """The files/stats portion of a new manifest for ``files``:
    inline below _SHARD_THRESHOLD, sharded above. ``added`` are names
    new since ``prev`` (their stats, if any, are in ``fresh_stats``);
    ``removed`` are prev names no longer live — the set that decides
    which prev shards must rewrite. Kept shards carry their files AND
    stats by reference; only shards touched by removals are opened,
    so commit metadata cost is O(churn) in stats and shard IO.
    Oversized filter bitmaps in ``fresh_stats`` (token blooms at
    16 KB/file) are externalized to ONE sidecar here, bounding the
    inline per-file metadata to ~_INLINE_BLOOM_CAP; the manifest
    carries the referenced sidecar-name list (``bloom_sidecars``) so
    maintenance can GC unreferenced ones without opening shards (r9).
    The carried list collapses to just the fresh sidecar whenever
    every live file's stats are fresh (overwrite/maintenance), else
    it is prev's list + the fresh one — a conservative superset that
    over-retains at worst one maintenance cycle."""
    sidecars: list[str] = []
    if fresh_stats:
        fresh_stats, sc_name = _externalize_big_blooms(
            wh, database, table, fresh_stats
        )
        if sc_name is not None:
            sidecars.append(sc_name)
    if prev is not None and not all(n in fresh_stats for n in files):
        sidecars = sorted(
            set(sidecars) | set(prev.get("bloom_sidecars", []))
        )
    files = sorted(files)
    file_set = set(files)
    if len(files) <= _SHARD_THRESHOLD and not (
        prev and "shards" in prev and len(files) > _SHARD_THRESHOLD // 2
    ):
        # inline (small table, or a sharded table that shrank well
        # below the threshold — hysteresis avoids flapping)
        entry: dict = {
            "files": files,
            # per-commit file deltas (r14): O(churn) lists that let a
            # CAS-losing COW commit decide REBASE vs recompute by
            # reading only the intervening manifest JSONs — never
            # opening shards (see _rebase_parent)
            "added": sorted(set(added) & file_set),
            "removed": sorted(removed),
        }
        if cols or blooms:
            carried = (
                _manifest_stats(
                    wh, database, table, prev,
                    [n for n in files if n not in fresh_stats],
                )
                if prev
                else {}
            )
            if cols:
                entry["stat_cols"] = cols
            if blooms:
                entry["bloom_cols"] = list(blooms)
            entry["stats"] = {
                **carried,
                **{n: fresh_stats[n] for n in files if n in fresh_stats},
            }
        if sidecars:
            entry["bloom_sidecars"] = sidecars
        return entry

    kept: list[dict] = []
    remainder: list[str] = list(added)
    remainder_stats: dict = dict(fresh_stats)
    if prev is not None and "shards" in prev:
        for rec in prev["shards"]:
            touched = any(
                rec["first"] <= r <= rec["last"] for r in removed
            )
            # a shard is also force-opened when stats were newly
            # enabled (no rolled-up agg at all) OR when the requested
            # stat set GREW past what the shard's members carry —
            # _shard_agg omits a column any member lacks, so a missing
            # agg column is exactly "this shard needs backfill". The
            # commit that widens stat_cols computes fresh stats for
            # those files (a one-time O(table) scan, inherent: min/max
            # of a new column requires reading it); without this
            # force-open the freshly computed stats would be DISCARDED
            # for kept shards and the next commit's covering shortcut
            # would assume coverage that never happened.
            stale_stats = bool(cols or blooms) and (
                "agg" not in rec
                or any(c not in rec.get("agg", {}) for c in cols)
                or any(
                    f"{b}__bloom" not in rec.get("agg", {})
                    for b in blooms
                )
            )
            if touched or stale_stats:
                sh = _read_shard(wh, database, table, rec["name"])
                live = [n for n in sh["files"] if n in file_set]
                remainder += live
                for n in live:
                    s = sh.get("stats", {}).get(n)
                    if s is not None and n not in remainder_stats:
                        remainder_stats[n] = s
            else:
                kept.append(rec)
    elif prev is not None:
        # inline prev crossing the threshold: every file re-shards
        remainder = files
        carried = _manifest_stats(
            wh, database, table, prev,
            [n for n in files if n not in fresh_stats],
        )
        remainder_stats = {**carried, **fresh_stats}
    else:
        remainder = files

    remainder = sorted(set(remainder))
    shards = list(kept)
    for i in range(0, len(remainder), _SHARD_SIZE):
        chunk = remainder[i : i + _SHARD_SIZE]
        shards.append(
            _write_shard(
                wh, database, table, chunk, remainder_stats, cols,
                blooms,
            )
        )
    entry = {
        "shards": sorted(shards, key=lambda r: r["first"]),
        "n_files": len(files),
        # per-commit file deltas (r14) — same contract as the inline
        # path: conflict-detection metadata for _rebase_parent, O(churn)
        "added": sorted(set(added) & file_set),
        "removed": sorted(removed),
    }
    if cols:
        entry["stat_cols"] = cols
    if blooms:
        entry["bloom_cols"] = list(blooms)
    if sidecars:
        entry["bloom_sidecars"] = sidecars
    return entry


def _write_changes(
    wh: Warehouse, database: str, table: str, change_df: DataFrame
) -> list[str]:
    """Persist a commit's exact change rows (table columns +
    ``_change_type``) as parquet under ``_snapshots/changes/cd-<uuid>/``
    and return the ``_snapshots``-relative file paths for the manifest's
    ``changes`` key. The write is a distributed Spark job (cost
    proportional to the commit's churn) and is INVISIBLE until the
    manifest PUT records it — a CAS-losing commit leaves the directory
    as debris that maintain_table reclaims. This is what lets the
    streaming CDC source read change rows on EXECUTORS: the driver only
    ever plans (version, file) splits, never materializes rows."""
    import uuid

    rel_dir = f"{_CHANGES_DIR}/cd-{uuid.uuid4().hex}"
    out_dir = f"{_snap_dir(wh, database, table)}/{rel_dir}"
    change_df.write.mode("overwrite").parquet(out_dir)
    return sorted(
        f"{rel_dir}/{n}"
        for n in hfs.list_names(wh.spark, out_dir)
        if n.endswith(".parquet")
    )


def _write_dv(
    wh: Warehouse, database: str, table: str, dv_df: DataFrame
) -> list[str]:
    """Persist one commit's deletion-vector tombstones — columns
    (file string, rid long) — under ``_snapshots/dv/dvd-<uuid>/``,
    returning the _snapshots-relative parquet paths for the
    manifest's ``dvs`` key. Same visibility contract as
    _write_changes: invisible until the manifest PUT; a CAS loser's
    directory is debris inside maintain_table's reclaim grace."""
    import uuid

    from pyspark.sql import functions as F

    rel_dir = f"{_DV_DIR}/dvd-{uuid.uuid4().hex}"
    out_dir = f"{_snap_dir(wh, database, table)}/{rel_dir}"
    dv_df.select(
        F.col("file").cast("string"), F.col("rid").cast("long")
    ).coalesce(1).write.mode("overwrite").parquet(out_dir)
    return sorted(
        f"{rel_dir}/{n}"
        for n in hfs.list_names(wh.spark, out_dir)
        if n.endswith(".parquet")
    )


def _dv_frame(
    wh: Warehouse, database: str, table: str, dvs: list[str]
) -> DataFrame | None:
    """The union of the given deletion-vector files as a
    (file, rid) DataFrame; None when the list is empty."""
    if not dvs:
        return None
    snapd = _snap_dir(wh, database, table)
    return wh.spark.read.schema("file string, rid long").parquet(
        *[f"{snapd}/{rel}" for rel in dvs]
    )


def _dv_mask(
    wh: Warehouse,
    database: str,
    table: str,
    manifest: dict,
    df: DataFrame,
    dvs: list[str] | None = None,
) -> DataFrame:
    """Apply a manifest's deletion vectors to a row frame: anti-join
    on the (file basename, __row_id) PAIR — a tombstone binds to the
    physical row in the file it was deleted from, exactly Iceberg's
    position-delete contract. Pair binding (not a global id set) is
    what makes a later MERGE that re-inserts a row under a tombstoned
    id come back VISIBLE (its new physical row lives in a fresh file
    the tombstone does not name — caught live by the ghost-merge
    test, where a global-id mask resurrected the tombstone onto the
    new row), at the price of one invariant every rewrite path must
    keep: A REWRITE THAT MOVES ROWS BETWEEN FILES MUST READ THROUGH
    THIS MASK (compact_small_files, maintain_table, and the COW DML
    re-reads all do), so a tombstoned row is physically dropped at
    the move and its now-dead pair entry matches nothing.

    The row's file comes from the frame's ``__file`` column when
    present (already-tagged callers), else from input_file_name()
    bound HERE — callers must pass scan-lineage frames (raw reads /
    pre-exchange projections), since input_file_name() evaluates to
    '' after any exchange. The DV side broadcasts below
    _DV_BROADCAST_ROWS tombstones (manifest-recorded count, no
    scan); past that the anti-join shuffles — the signal to schedule
    apply_deletion_vectors. No-op when the manifest carries no DVs
    or the frame has no __row_id column (pre-stamp tables cannot
    take MoR deletes in the first place)."""
    from pyspark.sql import functions as F

    rels = manifest.get("dvs", []) if dvs is None else dvs
    if not rels or "__row_id" not in df.columns:
        return df
    dvf = _dv_frame(wh, database, table, rels)
    if manifest.get("dv_rows", 0) <= _DV_BROADCAST_ROWS:
        dvf = F.broadcast(dvf)
    has_file = "__file" in df.columns
    tagged = (
        df
        if has_file
        else df.withColumn("__dv_file", F.input_file_name())
    )
    fcol = F.col("__file") if has_file else F.col("__dv_file")
    out = tagged.join(
        dvf,
        (F.element_at(F.split(fcol, "/"), -1) == dvf["file"])
        & (tagged["__row_id"] == dvf["rid"]),
        "left_anti",
    )
    return out if has_file else out.drop("__dv_file")


def _read_current_tagged(wh: Warehouse, database: str, table: str):
    """The latest snapshot's VISIBLE rows with a ``__file`` column,
    for COW DML's affected-file tagging. input_file_name() must bind
    on the raw scan BEFORE the deletion-vector anti-join: after any
    exchange it evaluates to '' (Spark's documented behavior), and a
    non-broadcast DV join would silently un-tag every row — so this
    helper tags first, masks second. Returns (manifest, schema,
    tagged_df)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    vs = versions(wh, database, table)
    manifest = _manifest(wh, database, table, vs[-1])
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    base = wh._path(database, table)
    names = _manifest_files(wh, database, table, manifest)
    if not names:
        empty = wh.spark.createDataFrame([], schema).withColumn(
            "__file", F.lit(None).cast("string")
        )
        return manifest, schema, empty
    raw = wh.spark.read.schema(schema).parquet(
        *[f"{base}/{n}" for n in names]
    )
    tagged = raw.withColumn("__file", F.input_file_name())
    return manifest, schema, _dv_mask(wh, database, table, manifest, tagged)


def commit_snapshot(
    wh: Warehouse,
    database: str,
    table: str,
    stat_cols: list[str] | None = None,
    summary: dict | None = None,
    bloom_cols: list[str] | None = None,
    constraints: dict | None = None,
) -> int:
    """Record the table's CURRENT data-file set as the next version.
    Returns the committed version number. The commit is one small
    create-if-absent PUT — atomic on every Hadoop FS that matters —
    so readers either see the whole version or none of it, and a
    concurrent commit to the same number loses the CAS and RETRIES
    with a recomputed manifest (which, being a fresh directory
    listing, includes the winner's files — concurrent appends
    linearize instead of losing one batch)."""
    last_err: CommitConflictError | None = None
    for _attempt in range(_CAS_ATTEMPTS):
        if _attempt:
            _cas_backoff(_attempt)
        vs = versions(wh, database, table)
        try:
            next_v = _next_version(wh, database, table, vs=vs)
        except CommitConflictError as e:
            last_err = e  # racer landed since our listing: re-read
            continue
        # Copy-on-write DELETE/MERGE leave their replaced files on disk
        # (older versions still reference them — that's the audit
        # trail), recording them in the manifest's cumulative "retired"
        # set. A directory listing therefore over-counts: subtract the
        # retired set, or the first append after a takedown would
        # RESURRECT the deleted rows in the new snapshot (caught by the
        # read_changes CDC test).
        retired: set = set()
        if vs:
            prev = json.loads(
                hfs.read_text(
                    wh.spark,
                    f"{_snap_dir(wh, database, table)}/v{vs[-1]:012d}.json",
                )
            )
            retired = set(prev.get("retired", []))
        disk = _data_files(wh, database, table)
        # prune retired names whose files are physically gone
        # (maintenance deletes them) so the set stays bounded by live
        # dead files, and never grows for the lifetime of the table
        retired &= set(disk)
        schema = wh.schema(database, table)
        prev_files = (
            set(_manifest_files(wh, database, table, prev)) if vs else set()
        )
        # adoption guard (new r8, caught live by the DML-retry race
        # test): COW rewrites rename their survivor files into the
        # table dir BEFORE their own manifest PUT — if a concurrent
        # append's listing adopted those not-yet-committed files, the
        # survivors would double-count the moment the DML's CAS lost.
        # A cow/ow/pack/compact-prefixed file therefore only enters a
        # listing-derived manifest by CARRY-OVER from the previous
        # manifest (i.e. once its own commit won); uncommitted ones
        # stay invisible debris until maintenance reclaims them.
        files = sorted(
            f
            for f in disk
            if f not in retired
            and (f in prev_files or not f.startswith(_COW_PREFIXES))
        )
        added = [f for f in files if f not in prev_files]
        removed = prev_files - set(files)
        # file statistics: stat_cols=None inherits the table's existing
        # stat columns (once a table collects zone maps, every commit
        # keeps them current); stats are computed ONLY for files whose
        # stats aren't carried from the previous manifest/shards —
        # normally just the appended batch, so stats cost is O(churn)
        cols = (
            list(stat_cols)
            if stat_cols is not None
            else (prev.get("stat_cols", []) if vs else [])
        )
        blooms = (
            list(bloom_cols)
            if bloom_cols is not None
            else (prev.get("bloom_cols", []) if vs else [])
        )
        fresh = {}
        if cols or blooms:
            if (
                vs
                and "shards" in prev
                and set(prev.get("stat_cols", [])) >= set(cols)
                and set(prev.get("bloom_cols", [])) >= set(blooms)
            ):
                # sharded prev with covering stat columns: carried
                # stats STAY in their shards (never materialized on
                # the driver) — the every-commit-keeps-stats-current
                # invariant guarantees coverage; fresh = the new batch
                fresh_names = added
            elif vs:
                carried_ok = {
                    f
                    for f, rec in _manifest_stats(
                        wh, database, table, prev,
                        [f for f in files if f in prev_files],
                    ).items()
                    if set(rec) >= set(cols)
                    and all(f"{b}__bloom" in rec for b in blooms)
                }
                fresh_names = [f for f in files if f not in carried_ok]
            else:
                fresh_names = files
            fresh = _file_stats(
                wh, wh._path(database, table), fresh_names, schema,
                cols, blooms,
            )
        manifest = {
            "version": next_v,
            "retired": sorted(retired),
            "schema": schema.json(),
            **_assemble_manifest_entry(
                wh, database, table, prev if vs else None,
                files, added, removed, fresh, cols, blooms,
            ),
        }
        if summary:
            # commit provenance (Iceberg snapshot-summary's public
            # design): small operation metadata — e.g. the WAP staging
            # id — surfaced by history() for auditability
            manifest["summary"] = dict(summary)
        cons = (
            dict(constraints)
            if constraints is not None
            else (prev.get("constraints", {}) if vs else {})
        )
        if cons:
            manifest["constraints"] = cons
        # carry the idempotent-append watermarks: dropping them would
        # let a later stream replay re-apply an already-committed batch
        if vs and prev.get("txns"):
            manifest["txns"] = prev["txns"]
        if vs and prev.get("dvs"):
            # appends never resurrect MoR-deleted rows: tombstones
            # ride every commit until apply_deletion_vectors /
            # maintenance physically removes the rows
            manifest["dvs"] = prev["dvs"]
            manifest["dv_rows"] = prev.get("dv_rows", 0)
            if "dv_files" in prev:
                manifest["dv_files"] = prev["dv_files"]
        try:
            _put_manifest(wh, database, table, manifest)
            return next_v
        except CommitConflictError as e:
            last_err = e
            continue
    raise last_err  # type: ignore[misc]  # _CAS_ATTEMPTS consecutive conflicts


def append_versioned(
    wh: Warehouse,
    database: str,
    table: str,
    batch: DataFrame,
    stat_cols: list[str] | None = None,
    summary: dict | None = None,
    bloom_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """append_aligned + snapshot commit: the batch's files become
    visible to snapshot readers atomically, at the manifest PUT.
    ``stat_cols`` opts the table into per-file min/max zone maps
    (see commit_snapshot; later appends inherit them); ``bloom_cols``
    opts into per-file bloom filters for high-cardinality equality
    skipping (also inherited); ``summary`` records commit provenance
    surfaced by DESCRIBE HISTORY, same as every other commit path.

    Tables with ``set_constraints`` run their quality gate FIRST:
    a 'fail' violation raises before any file lands; 'drop'
    violations divert to ``<table>__quarantine`` and only the clean
    rows commit (per-constraint violation counts ride the summary).

    ``txn=(app_id, version)`` makes the append IDEMPOTENT (exactly-
    once sink semantics; Delta's txnAppId/txnVersion, public design):
    the manifest carries per-app high-watermarks, a replay whose
    version is <= the recorded watermark returns the current snapshot
    version WITHOUT writing anything, and — the crash-window half —
    txn batches land under a ``txnappend-`` COW-class prefix, so a
    batch whose process died BETWEEN data-file landing and manifest
    PUT is never adopted by a later listing-based commit: the replay
    re-lands and commits cleanly, the orphan is maintenance debris.
    (A plain append's crash leaves files the NEXT commit adopts —
    at-least-once, the right default for ad-hoc writers; streams
    replaying from checkpoints need this txn form.) Contract:
    versions are monotonically increasing per app and writers are
    sequential per app — a concurrent duplicate raises
    ConcurrentTxnError rather than double-applying."""
    if txn is not None:
        app, tv = txn
        vs0 = versions(wh, database, table)
        if vs0:
            prev0 = _manifest(wh, database, table, vs0[-1])
            if prev0.get("txns", {}).get(app, -(10**18)) >= tv:
                return vs0[-1]  # replay: already applied, zero writes
    batch, quarantined, viol = _enforce_constraints(
        wh, database, table, batch
    )
    if quarantined is not None:
        wh.append_aligned(database, f"{table}__quarantine", quarantined)
    if viol:
        summary = {**(summary or {}), "violations": viol}
    landed = wh.append_aligned(
        database, table, batch,
        file_prefix="txnappend-" if txn is not None else "b",
    )
    if txn is None:
        return commit_snapshot(
            wh, database, table, stat_cols=stat_cols, summary=summary,
            bloom_cols=bloom_cols,
        )
    return _txn_commit(
        wh, database, table, landed, txn,
        stat_cols=stat_cols, summary=summary, bloom_cols=bloom_cols,
    )


def _txn_commit(
    wh: Warehouse,
    database: str,
    table: str,
    landed: list[str],
    txn: tuple[str, int],
    stat_cols: list[str] | None = None,
    summary: dict | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Commit an idempotent append: previous manifest's files + THIS
    batch's explicitly-named files (never a directory listing — the
    txnappend- prefix keeps orphans invisible), with the per-app txn
    watermark advanced in the same atomic PUT. CAS retries re-commit
    the SAME landed files against the fresh snapshot; a watermark
    that advanced past us mid-retry means a concurrent same-app
    writer — loud ConcurrentTxnError, see the class docstring."""
    app, tv = txn
    last_err: CommitConflictError | None = None
    for _attempt in range(_CAS_ATTEMPTS):
        if _attempt:
            _cas_backoff(_attempt)
        vs = versions(wh, database, table)
        try:
            next_v = _next_version(wh, database, table, vs=vs)
        except CommitConflictError as e:
            last_err = e  # racer landed since our listing: re-read
            continue
        prev = _manifest(wh, database, table, vs[-1]) if vs else None
        carried_txns = dict(prev.get("txns", {})) if prev else {}
        if carried_txns.get(app, -(10**18)) >= tv:
            raise ConcurrentTxnError(
                f"txn ({app!r}, {tv}) was committed concurrently to "
                f"{database}.{table}; idempotent appends must be "
                "sequential per app id"
            )
        prev_files = (
            _manifest_files(wh, database, table, prev) if prev else []
        )
        files = sorted(set(prev_files) | set(landed))
        schema = wh.schema(database, table)
        cols = (
            list(stat_cols)
            if stat_cols is not None
            else (prev.get("stat_cols", []) if prev else [])
        )
        blooms = (
            list(bloom_cols)
            if bloom_cols is not None
            else (prev.get("bloom_cols", []) if prev else [])
        )
        fresh = (
            _file_stats(
                wh, wh._path(database, table), landed, schema,
                cols, blooms,
            )
            if (cols or blooms)
            else {}
        )
        manifest = {
            "version": next_v,
            "retired": sorted(prev.get("retired", [])) if prev else [],
            "schema": schema.json(),
            **_assemble_manifest_entry(
                wh, database, table, prev, files,
                added=sorted(landed), removed=set(),
                fresh_stats=fresh, cols=cols, blooms=blooms,
            ),
            "txns": {**carried_txns, app: tv},
        }
        if summary:
            manifest["summary"] = dict(summary)
        if prev and prev.get("constraints"):
            manifest["constraints"] = prev["constraints"]
        if prev and prev.get("dvs"):
            manifest["dvs"] = prev["dvs"]
            manifest["dv_rows"] = prev.get("dv_rows", 0)
            if "dv_files" in prev:
                manifest["dv_files"] = prev["dv_files"]
        try:
            _put_manifest(wh, database, table, manifest)
            return next_v
        except CommitConflictError as e:
            last_err = e
            continue
    raise last_err  # type: ignore[misc]


def set_constraints(
    wh: Warehouse,
    database: str,
    table: str,
    constraints: dict,
    summary: dict | None = None,
) -> int:
    """Persist table-level CHECK constraints / expectations (Delta
    CHECK constraints + Delta Live Tables expectations, public
    designs) as a new commit; every later ``append_versioned`` /
    ``overwrite_versioned`` enforces them BEFORE data lands.

    ``constraints`` maps name -> SQL boolean expression, or name ->
    {"expr": ..., "on_violation": "fail" | "drop"}:

    - ``fail`` (default, Delta CHECK): any violating row rejects the
      WHOLE batch with ConstraintViolationError; nothing is written.
    - ``drop`` (DLT expect_or_drop): violating rows divert to the
      plain table ``<table>__quarantine`` — original columns plus
      ``__violated`` (comma-joined names of the constraints the row
      failed) — and only clean rows commit. Per-constraint counts
      land in the commit summary for observability.

    NULL semantics follow SQL CHECK: a constraint is violated only
    when its expression is FALSE (NULL passes) — write
    ``x IS NOT NULL AND x > 0`` to reject NULLs explicitly.

    Expressions are validated against the CURRENT schema here (parse
    + resolve on an empty frame), so a typo fails at declaration, not
    on the next ingest. Constraints are table CONFIG: they inherit
    across every commit path, survive rollback (data un-does, the
    gate stays), and pass {} to clear. Scale: enforcement is one
    map-only aggregation over the incoming batch (violation counts),
    plus the quarantine/clean split writes — O(batch), never
    O(table)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if not versions(wh, database, table):
        raise ValueError(
            f"{database}.{table} has no snapshots — constraints "
            "attach to snapshot tables (append_versioned first)"
        )
    norm: dict = {}
    for name, spec in constraints.items():
        if isinstance(spec, str):
            spec = {"expr": spec}
        mode = spec.get("on_violation", "fail")
        if mode not in ("fail", "drop"):
            raise ValueError(
                f"constraint {name!r}: on_violation must be 'fail' or "
                f"'drop', got {mode!r}"
            )
        norm[name] = {"expr": spec["expr"], "on_violation": mode}
    # validate: every expression must parse AND resolve as boolean
    # against the table's current schema
    schema = T.StructType.fromJson(
        json.loads(
            _manifest(
                wh, database, table,
                versions(wh, database, table)[-1],
            )["schema"]
        )
    )
    probe = wh.spark.createDataFrame([], schema)
    for name, spec in norm.items():
        try:
            kind = probe.select(
                F.expr(spec["expr"]).cast("boolean").alias("x")
            ).schema[0].dataType.simpleString()
        except Exception as e:
            raise ValueError(
                f"constraint {name!r} does not resolve against "
                f"{database}.{table}'s schema: {e}"
            ) from e
        assert kind == "boolean"
    return commit_snapshot(
        wh, database, table, constraints=norm,
        summary={**(summary or {}), "operation": "set-constraints"},
    )


def table_constraints(wh: Warehouse, database: str, table: str) -> dict:
    """The table's active constraints (empty dict when none)."""
    vs = versions(wh, database, table)
    if not vs:
        return {}
    return _manifest(wh, database, table, vs[-1]).get("constraints", {})


def _enforce_constraints(
    wh: Warehouse, database: str, table: str, batch: DataFrame
):
    """Quality gate for the snapshot write paths: returns
    (clean_batch, quarantined_or_None, violation_counts). ONE
    map-only aggregation computes every constraint's violation count
    up front — 'fail' rejects before a single file is written; 'drop'
    then splits the batch (violators carry ``__violated``)."""
    from functools import reduce

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    vs = versions(wh, database, table)
    if not vs:
        return batch, None, {}
    m = _manifest(wh, database, table, vs[-1])
    cons = m.get("constraints", {})
    if not cons:
        return batch, None, {}
    # pad table-schema columns the batch lacks with typed NULLs so a
    # constraint on a column absent from THIS batch (schema-evolving
    # ingest) evaluates under the same semantics the table will read
    # it back with (NULL) instead of failing analysis — the padded
    # columns are real table columns, so downstream alignment treats
    # them exactly as it would have
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    missing = [
        f for f in schema.fields if f.name not in batch.columns
    ]
    if missing:
        batch = batch.select(
            "*",
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in missing
            ],
        )
    # SQL CHECK semantics: violated iff the expression is FALSE
    viol = {
        n: ~F.coalesce(
            F.expr(c["expr"]).cast("boolean"), F.lit(True)
        )
        for n, c in cons.items()
    }
    counts = batch.select(
        *[
            F.coalesce(F.sum(v.cast("long")), F.lit(0)).alias(n)
            for n, v in viol.items()
        ]
    ).first()
    violated = {n: counts[n] for n in cons if counts[n]}
    failed = sorted(
        n for n in violated if cons[n]["on_violation"] == "fail"
    )
    if failed:
        detail = ", ".join(
            f"{n} ({violated[n]} rows, expr: {cons[n]['expr']!r})"
            for n in failed
        )
        raise ConstraintViolationError(
            f"batch rejected by {database}.{table} constraints: "
            f"{detail}; nothing was written"
        )
    dropped = [
        n for n in violated if cons[n]["on_violation"] == "drop"
    ]
    if not dropped:
        return batch, None, {}
    pred = reduce(lambda a, b: a | b, [viol[n] for n in dropped])
    quarantined = batch.filter(pred).withColumn(
        "__violated",
        F.concat_ws(
            ",",
            *[
                F.when(viol[n], F.lit(n))
                for n in sorted(dropped)
            ],
        ),
    )
    return batch.filter(~pred), quarantined, violated


def _overwrite_versioned_once(
    wh: Warehouse,
    database: str,
    table: str,
    batch: DataFrame,
    stat_cols: list[str] | None = None,
    summary: dict | None = None,
    cdc: bool = True,
    bloom_cols: list[str] | None = None,
) -> int:
    """One optimistic attempt of overwrite_versioned (public wrapper
    below adds conflict retry). INSERT OVERWRITE as ONE atomic commit: ``batch`` replaces the
    table's ENTIRE content, and the single manifest PUT is the only
    visibility point — a concurrent reader sees the old complete
    snapshot or the new one, never an empty table and never a mix
    (the delete-everything-then-append sequence this replaces had
    both failure modes). A crash before the PUT leaves the old table
    intact plus reclaimable orphans. Returns the committed version.

    The batch keeps ITS OWN partitioning/ordering — callers cluster
    before the call (e.g. repartitionByRange on the layout key) and
    the written files inherit it, so zone-map stats stay selective.
    The batch aligns to the current table schema (try_cast, missing
    -> NULL; new columns refused — evolve via append first). On a
    table that is not yet snapshot-managed this is just the creating
    append, committed with the same summary.

    ``cdc=False`` skips writing change files (delete preimages of
    every old row + insert postimages of every new row — table-sized,
    like the overwrite itself) and OMITS the manifest's changes key.
    Use it ONLY for derived tables with no CDC consumers: batch
    read_changes still diffs correctly from the manifests alone, but
    a STREAMING cursor crossing the version gets the loud
    removed-files-without-change-files error instead of a silent
    wrong feed (pytest-pinned; recording an empty change list here
    would read as "content-preserving" and silently emit nothing)."""
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        wh.append_aligned(database, table, batch)
        return commit_snapshot(
            wh, database, table, stat_cols=stat_cols, summary=summary,
            bloom_cols=bloom_cols,
        )
    batch, quarantined, viol = _enforce_constraints(
        wh, database, table, batch
    )
    if quarantined is not None:
        wh.append_aligned(database, f"{table}__quarantine", quarantined)
    if viol:
        summary = {**(summary or {}), "violations": viol}
    base = wh._path(database, table)
    prev = _manifest(wh, database, table, vs[-1])
    schema = wh.schema(database, table)
    known = {f.name for f in schema.fields}
    extra = [c for c in batch.columns if c not in known]
    if extra:
        raise ValueError(
            f"overwrite cannot add columns {extra}; evolve the table "
            "with a regular append first"
        )
    aligned = batch.select(
        *[
            (
                F.col(f.name).try_cast(f.dataType)
                if f.name in batch.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in schema.fields
        ]
    )
    prev_files = _manifest_files(wh, database, table, prev)
    changes: list[str] | None
    if cdc:
        # DV-masked preimage: rows already MoR-deleted must not
        # re-emit deletes when the overwrite replaces their files
        old = (
            _dv_mask(
                wh, database, table, prev,
                wh.spark.read.schema(schema).parquet(
                    *[f"{base}/{n}" for n in prev_files]
                ),
            )
            if prev_files
            else wh.spark.createDataFrame([], schema)
        )
        changes = _write_changes(
            wh,
            database,
            table,
            old.withColumn("_change_type", F.lit("delete")).unionByName(
                aligned.withColumn("_change_type", F.lit("insert"))
            ),
        )
    else:
        # cdc=False: OMIT the changes key (None) rather than record []
        # — [] means "content-preserving, emit nothing" to the
        # streaming planner, which would silently swallow the
        # transition; an absent key makes a streaming cursor crossing
        # this version fail loudly instead (batch read_changes stays
        # exact either way: it diffs manifests, not change files)
        changes = None
    rewritten = _cow_rewrite(wh, base, aligned, prefix="ow")
    if stat_cols is not None and set(stat_cols) != set(
        prev.get("stat_cols", [])
    ):
        # stat-column change rides the overwrite: every file is fresh,
        # so recording the new columns costs nothing extra
        prev = dict(prev)
        prev["stat_cols"] = list(stat_cols)
    if bloom_cols is not None and set(bloom_cols) != set(
        prev.get("bloom_cols", [])
    ):
        prev = dict(prev)
        prev["bloom_cols"] = list(bloom_cols)
    next_v = _cow_commit(
        wh, database, table, prev, prev_files, rewritten, changes,
        summary=summary,
        # 'replace whatever is there' must re-derive its delete
        # preimages from the WINNER's state — an overwrite can never
        # rebase past a concurrent commit (r14; _retry_dml recomputes)
        rebase=False,
        # an overwrite replaces every old row: standing tombstones
        # have nothing left to mask and must not leak onto the new
        # rows' id space (snowflake ids never repeat, but carrying
        # dead vectors forever is planner noise)
        dvs_override=([], 0),
    )
    return next_v


def _range_survives(rng, lo, hi) -> bool:
    """File-skip decision for a range predicate [lo, hi] (either bound
    None = open) against a recorded [min, max]. Pure function — the
    completeness property (a skipped file can contain NO matching
    row) is property-tested without Spark."""
    if rng is None:
        return True  # no stats recorded -> must scan
    mn, mx = rng
    if mn is None and mx is None:
        # empty or all-null file: no value in it can satisfy a range
        # predicate (NULL never matches BETWEEN)
        return False
    if mn is None or mx is None:
        return True  # half-unknown -> keep, never drop rows
    if lo is not None and mx < lo:
        return False
    if hi is not None and mn > hi:
        return False
    return True


#: per-file bloom probing above this many probe values switches from
#: the early-exit Python loop to the VECTORIZED path (r14): probe
#: positions are sha256-hashed ONCE per plan (_EqValues.positions)
#: and each file's test is one numpy gather over its 512 B bitmap —
#: ~tens of µs/file at h=10^4, so a saturated-dict bloom column keeps
#: skipping at any realistic probe size instead of silently degrading
#: to the range check (the r13 advisory: above-cap probes on a
#: bloom-only column kept ~every file while the docstrings claimed
#: ~h). The loop stays primary below the cap because its early exit
#: wins on tiny probes.
_EQ_BLOOM_PROBE_CAP = 4096

#: above THIS many probe values even the vectorized bloom test is
#: skipped (range/dict checks carry the skip): per-file cost is
#: O(h·k) gathered bits, and at 10^6+ values x 10^6 files that is
#: driver-hours — a probe that large should go through a keys-frame
#: join (delete_keys posture), not an IN-list plan
_EQ_BLOOM_VEC_CAP = 262_144


class _EqValues:
    """IN-list probe normalized ONCE per plan (r13 — the fix for the
    r12 verdict's above-cap dedup-gate scan): ``vset`` gives O(1)
    membership / O(|file dict|) disjointness, ``svals`` (sorted, or
    None for un-orderable mixed types) gives an O(log n) bisect
    against a file's [min, max]. With this, per-file skip checks are
    O(|dict| + log n) for ANY probe size — a 100k-hash probe plans in
    one manifest pass at the same per-file cost as a 10-hash probe,
    which is why callers no longer need a full-scan fallback above an
    IN-list cap (the chunk-and-union alternative re-plans shared
    shards per chunk and re-reads files spanning chunks)."""

    __slots__ = ("vset", "svals", "_pos")

    def __init__(self, vals):
        self.vset = frozenset(vals)
        try:
            self.svals = sorted(self.vset)
        except TypeError:  # mixed un-orderable types: no bisect path
            self.svals = None
        self._pos: dict = {}

    def positions(self, m: int, k: int):
        """(h, k) int64 numpy matrix of bloom probe positions for the
        whole value set — hashed ONCE per plan and cached per (m, k)
        (r14): the per-plan cost is h sha256 calls (~0.1 s at 10^5
        values); every per-file bloom test thereafter is one
        vectorized gather against the file's bitmap instead of an
        O(h·k) Python loop. Value order is fixed (svals, or an
        arbitrary but stable list for un-orderable sets) — the test
        only needs row-wise all/any, never value identity."""
        key = (m, k)
        p = self._pos.get(key)
        if p is None:
            import numpy as np

            vals = (
                self.svals
                if self.svals is not None
                else list(self.vset)
            )
            p = np.array(
                [_bloom_positions(v, m, k) for v in vals],
                dtype=np.int64,
            ).reshape(-1, k)
            self._pos[key] = p
        return p


def _bloom_test_vec(bl: dict, eqv: "_EqValues") -> bool:
    """Vectorized _bloom_test for large probes (r14): True iff SOME
    probed value has all k bits set in the file's bitmap. One numpy
    gather over the decoded 512 B bitmap per file — identical
    semantics to the per-value loop (false positives possible, false
    negatives impossible), pinned against it by a property test."""
    import base64

    import numpy as np

    bits = np.frombuffer(base64.b64decode(bl["b"]), dtype=np.uint8)
    pos = eqv.positions(bl["m"], bl["k"])
    hit = (bits[pos >> 3] >> (pos & 7)) & 1
    return bool(hit.all(axis=1).any())


def _eq_survives(rec: dict, col: str, val) -> bool:
    """File-skip decision for an equality (or IN-list, when ``val``
    is a list/set/tuple — or a pre-normalized ``_EqValues``) predicate
    against a file's stat record: exact dictionary membership when a
    dict exists ([] = empty/all-null file -> skip), else min/max
    range check. IN-list semantics: the file survives if ANY value
    could live in it — one manifest pass plans a multi-point lookup
    (e.g. the ANN index probing several inverted cells) without
    re-reading stats per value or double-planning files shared by two
    values. Plan-level callers (``_plan_files``) pass ``_EqValues``
    so the per-file cost stays O(|dict| + log n) even for probe lists
    far beyond _EQ_BLOOM_PROBE_CAP."""
    if not isinstance(val, _EqValues):
        val = _EqValues(
            val if isinstance(val, (list, set, tuple, frozenset))
            else [val]
        )
    vals = rec.get(f"{col}__dict")
    if vals is not None:
        # file dict is a small list (<= _DICT_CAP); iterate IT against
        # the probe set, not the other way round
        return not val.vset.isdisjoint(vals)
    bl = rec.get(f"{col}__bloom")
    if isinstance(bl, dict) and "sc" in bl:
        bl = None  # externalized (r9): range check decides; never drop
    if bl is not None:
        h = len(val.vset)
        if h <= _EQ_BLOOM_PROBE_CAP:
            if not _bloom_test(bl, val.vset):
                return False  # definite miss; else fall to range
        elif h <= _EQ_BLOOM_VEC_CAP:
            # r14: above the loop cap the test VECTORIZES instead of
            # silently degrading to the range check — the plan-level
            # positions cache makes it one gather per file, so a
            # bloom-only column (saturated dict, wide unclustered
            # ranges) keeps ~h planned files at large probe sizes too
            if not _bloom_test_vec(bl, val):
                return False
    rng = rec.get(col)
    if rng is None:
        return True  # no stats recorded -> must scan
    mn, mx = rng
    if mn is None and mx is None:
        return False
    if mn is None or mx is None:
        return True
    if val.svals is not None:
        from bisect import bisect_left

        i = bisect_left(val.svals, mn)
        return i < len(val.svals) and val.svals[i] <= mx
    return any(mn <= v <= mx for v in val.vset)


def _file_survives(
    rec: dict, prune, prune_eq, prune_tokens=None, resolver=None
) -> bool:
    """Combined skip decision for one file's (or one shard's rolled-up)
    stat record against the optional range, equality, and token
    prunes. Token prunes run LAST so an externalized bitmap is only
    ever resolved for files the cheap inline stats could not skip."""
    if prune_eq is not None and not _eq_survives(rec, *prune_eq):
        return False
    if prune is not None:
        col, lo, hi = prune
        if not _range_survives(rec.get(col), lo, hi):
            return False
    if prune_tokens is not None and not _tok_survives(
        rec, *prune_tokens, resolver=resolver
    ):
        return False
    return True


def _plan_files(
    wh: Warehouse,
    database: str,
    table: str,
    m: dict,
    prune,
    prune_eq,
    prune_tokens=None,
) -> list[str]:
    """The version's surviving file names under the prunes. Sharded
    manifests prune WHOLE SHARDS by their rolled-up [min,max]/dict
    before opening them — the driver parses per-file stats only for
    shards the predicate can live in (Iceberg's manifest-list
    short-circuit), so a selective predicate over a 10^6-file table
    opens a handful of shard JSONs, not one monolithic manifest.

    IN-list ``prune_eq`` values normalize to ``_EqValues`` here, ONCE
    per plan, so every per-file/per-shard check below runs at
    O(|dict| + log n) regardless of probe size (r13)."""
    if prune_eq is not None and isinstance(
        prune_eq[1], (list, set, tuple, frozenset)
    ):
        prune_eq = (prune_eq[0], _EqValues(prune_eq[1]))
    resolver = (
        _bloom_resolver(wh, database, table)
        if prune_tokens is not None
        else None
    )

    def _token_pass(pairs: list) -> list:
        """(name, rec) pairs -> surviving names. Range/eq prune ran
        already; this is the token pass, preceded by ONE concurrent
        prefetch of every sidecar the survivors reference (r10 —
        sidecars are per-commit-batch, so without this a probe over a
        many-commit table resolves them serially, O(batches) opens)."""
        if prune_tokens is None:
            return [n for n, _rec in pairs]
        bkey = f"{prune_tokens[0]}{_TOKEN_MARKER}__bloom"
        resolver.prefetch(
            rec[bkey]["sc"]
            for _n, rec in pairs
            if isinstance(rec.get(bkey), dict) and "sc" in rec[bkey]
        )
        return [
            n
            for n, rec in pairs
            if _tok_survives(rec, *prune_tokens, resolver=resolver)
        ]

    if "shards" not in m:
        stats = m.get("stats", {})
        return _token_pass(
            [
                (n, stats.get(n, {}))
                for n in m["files"]
                if _file_survives(stats.get(n, {}), prune, prune_eq)
            ]
        )
    surviving = [
        rec
        for rec in m["shards"]
        if rec.get("agg") is None
        or _file_survives(
            rec["agg"], prune, prune_eq, prune_tokens, resolver
        )
    ]  # other shards are skipped UNOPENED
    names: list[str] = []
    for sh in _read_shards(
        wh, database, table, [rec["name"] for rec in surviving]
    ):
        stats = sh.get("stats", {})
        names += _token_pass(
            [
                (n, stats.get(n, {}))
                for n in sh["files"]
                if _file_survives(stats.get(n, {}), prune, prune_eq)
            ]
        )
    return sorted(names)


def version_as_of(
    wh: Warehouse, database: str, table: str, ts: float
) -> int:
    """TIMESTAMP AS OF resolution: the newest version whose
    ``committed_at`` is <= ts (Delta/Iceberg's timestamp time travel).
    Versions older than the retention window are expired, so a ts
    before the earliest retained commit errs loudly."""
    vs = versions(wh, database, table)
    best = None
    for v in vs:
        at = _manifest(wh, database, table, v).get("committed_at")
        if at is not None and at <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"no retained snapshot of {database}.{table} committed at "
            f"or before {ts} (earliest retained: {vs[:1]})"
        )
    return best


def rollback_table(
    wh: Warehouse, database: str, table: str, to_version: int
) -> int:
    """Roll the table back to ``to_version`` as a NEW commit whose
    file list is the old version's — zero data movement (the old
    files are still on disk: COW never deletes, only maintenance
    does), monotonic numbering, and CDC-CONSISTENT: downstream
    read_changes consumers see the rollback as ordinary
    delete/insert change rows, so incremental MVs recover without
    special-casing. The undo primitive for a bad batch or bad MERGE.

    Refuses (loudly) when any of the old version's files has been
    physically reclaimed by maintenance — rollback past a
    maintenance cycle needs a restore from backup, not a manifest
    swap."""
    vs = versions(wh, database, table)
    if to_version not in vs:
        raise ValueError(
            f"version {to_version} not in {database}.{table} "
            f"snapshots {vs}"
        )
    target = _manifest(wh, database, table, to_version)
    target_files = _manifest_files(wh, database, table, target)
    disk = set(_data_files(wh, database, table))
    gone = sorted(set(target_files) - disk)
    if gone:
        raise ValueError(
            f"cannot roll back {database}.{table} to v{to_version}: "
            f"{len(gone)} of its files were reclaimed by maintenance "
            f"(e.g. {gone[0]}); restore from backup instead"
        )
    latest = _manifest(wh, database, table, vs[-1])
    next_v = _next_version(wh, database, table, vs=vs)
    # files ADDED after to_version stay on disk as the newer versions'
    # audit trail; mark them retired so commit_snapshot can't re-adopt
    newer = (
        set(_manifest_files(wh, database, table, latest))
        | set(latest.get("retired", []))
    ) - set(target_files)
    manifest = {
        "version": next_v,
        "retired": sorted(newer & disk),
        "schema": target["schema"],
        # change-data-feed capture: the rollback's net effect as
        # explicit change rows (the exceptAll diff latest -> target,
        # a distributed churn-proportional job), so streaming CDC
        # consumers replay the rollback from parquet on executors —
        # the same delete/insert pairs batch read_changes derives
        "changes": _write_changes(
            wh,
            database,
            table,
            read_changes(wh, database, table, vs[-1], to_version),
        ),
    }
    # identical file list -> the target's files/stats entry (inline or
    # shard references — shards are immutable, sharing them is free)
    for k in (
        "files", "stats", "stat_cols", "bloom_cols", "shards",
        "n_files", "bloom_sidecars",
        # deletion vectors are DATA state (which rows are visible),
        # so rollback restores the TARGET's tombstone set — rows
        # MoR-deleted after to_version come back, and read_changes'
        # dv-delta handling emits them as the rollback's inserts
        "dvs", "dv_rows", "dv_files",
    ):
        if k in target:
            manifest[k] = target[k]
    # constraints are table CONFIG, not version content: a rollback
    # undoes data, not the quality gate added since
    if latest.get("constraints"):
        manifest["constraints"] = latest["constraints"]
    # per-app txn watermarks are config too: a rollback undoes data,
    # not the record of which stream batches were EVER applied — a
    # checkpoint replay after rollback must still no-op for batches
    # whose rows remain in the table (or were deliberately rolled
    # away; re-appending them silently would break exactly-once)
    if latest.get("txns"):
        manifest["txns"] = latest["txns"]
    _put_manifest(wh, database, table, manifest)
    return next_v


def read_snapshot(
    wh: Warehouse,
    database: str,
    table: str,
    version: int | None = None,
    prune: tuple | None = None,
    prune_eq: tuple | None = None,
    as_of_timestamp: float | None = None,
    prune_tokens: tuple | None = None,
    tag: str | None = None,
) -> DataFrame:
    """Plan over the exact file list of ``version`` (latest when
    None). The schema comes from the manifest — so a snapshot taken
    before a column existed reads WITHOUT that column, exactly what
    the table looked like then.

    ``prune=(col, lo, hi)`` applies manifest-level FILE SKIPPING: only
    files whose recorded [min, max] for ``col`` overlaps [lo, hi]
    (either bound may be None for open-ended) enter the plan — the
    zone-map scan-elimination move that makes a 100 TB range query
    touch only the files its predicate can live in, BEFORE parquet
    row-group stats get a say. Files without recorded stats are kept
    (pruning must never drop rows), and the returned frame is a file-
    level SUPERSET of the predicate — callers still apply their own
    ``.filter``, exactly like Iceberg's planFiles contract.

    ``prune_eq=(col, value)`` is the EQUALITY counterpart: a file is
    skipped when its recorded low-cardinality dictionary (<=
    ``_DICT_CAP`` distinct values; omitted above that) lacks the
    value, falling back to the min/max range when no dict exists —
    the move that makes point lookups on categorical/clustered
    columns touch only their files, where a range check alone is
    useless (every file spans the whole categorical 'range').
    For HIGH-cardinality columns (ids, keys) where the dict saturates
    AND the table isn't clustered on the column, a per-file BLOOM
    filter (opt in via ``bloom_cols=`` on the commit path) makes the
    same equality skip probabilistic-but-sound: a bloom miss proves
    the value absent (file skipped); a hit or a saturated/absent
    bloom falls through to the range check. ``prune_eq=(col, [v1,
    v2, ...])`` probes all values in one manifest pass."""
    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} has no snapshots — use "
            "append_versioned/commit_snapshot (plain reads: "
            "Warehouse.read)"
        )
    if tag is not None:
        if version is not None or as_of_timestamp is not None:
            raise ValueError(
                "pass exactly one of tag / version / as_of_timestamp"
            )
        tags = list_tags(wh, database, table)
        if tag not in tags:
            raise ValueError(
                f"no tag {tag!r} on {database}.{table} "
                f"(tags: {sorted(tags)})"
            )
        version = tags[tag]
    if as_of_timestamp is not None:
        if version is not None:
            raise ValueError(
                "pass either version or as_of_timestamp, not both"
            )
        version = version_as_of(wh, database, table, as_of_timestamp)
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not in {database}.{table} snapshots {vs}"
        )
    manifest = _manifest(wh, database, table, v)
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    base = wh._path(database, table)
    if prune_tokens is not None:
        tcol, q = prune_tokens
        toks = _tokenize(q) if isinstance(q, str) else [
            t for s_ in q for t in _tokenize(s_)
        ]
        prune_tokens = (tcol, toks) if toks else None
    names = _plan_files(
        wh, database, table, manifest, prune, prune_eq, prune_tokens
    )
    paths = [f"{base}/{name}" for name in names]
    if not paths:
        return wh.spark.createDataFrame([], schema)
    # merge-on-read deletion vectors: rows tombstoned by a MoR DELETE
    # mask out here (broadcast anti-join on __row_id while the vector
    # is small — see _dv_mask); the physical rewrite is deferred to
    # apply_deletion_vectors / maintenance. File-level pruning above
    # stays a SUPERSET (zone maps may still describe tombstoned
    # rows), which the prune contract already promises.
    #
    # FILE-SCOPED masking (r11 — the r10 verdict's 'first thing a
    # 100 TB operator would notice'): the manifest's ``dv_files``
    # names every file the vectors touch, so the plan splits into
    # (dv-named files -> masked scan) ∪ (all other files -> raw
    # scan). A standing 100-row takedown vector then taxes only its
    # own files; the other N-k files skip the per-row basename
    # projection and the anti-join probe entirely (measured 2.08×
    # full-scan overhead in mor_rehearsal_r10 before this split).
    # Legacy manifests with dvs but no dv_files keep the correct,
    # conservative mask-everything read.
    if manifest.get("dvs") and "dv_files" in manifest:
        named = set(manifest["dv_files"])
        affected = [n for n in names if n in named]
        rest = [n for n in names if n not in named]
        if not affected:
            return wh.spark.read.schema(schema).parquet(*paths)
        masked = _dv_mask(
            wh, database, table, manifest,
            wh.spark.read.schema(schema).parquet(
                *[f"{base}/{n}" for n in affected]
            ),
        )
        if not rest:
            return masked
        return (
            wh.spark.read.schema(schema)
            .parquet(*[f"{base}/{n}" for n in rest])
            .unionAll(masked)
        )
    return _dv_mask(
        wh, database, table, manifest,
        wh.spark.read.schema(schema).parquet(*paths),
    )


def stats_agg(
    wh: Warehouse,
    database: str,
    table: str,
    cols: list[str] | None = None,
    version: int | None = None,
    allow_scan: bool = True,
) -> DataFrame:
    """METADATA-ONLY aggregates: answer ``COUNT(*)`` plus per-column
    ``MIN``/``MAX``/``COUNT(c)``-via-null-counts from the manifest's
    per-file statistics, opening ZERO data files (Iceberg's
    record_count / value-counts manifest aggregation, Delta's
    metadata-only query path — public designs). At 100 TB this is
    the difference between a driver-side JSON fold and a full-table
    scan schedule: ``SELECT count(*), min(ts), max(ts)`` on a
    thousand-file table costs one manifest read, and on a SHARDED
    manifest the additive rollups (``__rows``/``__nulls`` summed
    into each shard record) answer it without opening any shard
    file either.

    ``cols`` must be a subset of the table's recorded ``stat_cols``
    (min/max of an untracked column genuinely requires reading it —
    use a real query for that); default = every stat column. The
    per-file stats are EXACT (computed from the data at commit
    time), so the result is exact, not approximate. Standing
    MERGE-ON-READ deletion vectors would break that promise (the
    recorded stats still describe tombstoned rows): files the
    vectors name are aggregated through the mask instead — one scan
    bounded by AFFECTED files — and ``allow_scan=False`` refuses
    loudly under vectors rather than answering wrong (mirroring
    Delta/Iceberg disabling metadata-only counts under DVs).

    Files committed before row/null counts were recorded (or whose
    stats predate a widening) are back-filled by ONE aggregation
    over just those files when ``allow_scan=True`` — churn-bounded,
    read-only, and never needed for tables whose every commit
    carried the current stat set. ``allow_scan=False`` raises
    instead, which is also the test hook proving the zero-IO claim:
    with data files physically gone, stats_agg still answers.

    Returns a ONE-ROW DataFrame: ``row_count`` plus
    ``min_<c>``/``max_<c>``/``null_count_<c>`` per column, typed by
    the table schema. NULL min/max means the column is all-NULL (or
    the table is empty) — SQL aggregate semantics."""
    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(f"{database}.{table} has no snapshots")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not in {database}.{table} snapshots {vs}"
        )
    m = _manifest(wh, database, table, v)
    stat_cols = m.get("stat_cols", [])
    cols = list(stat_cols) if cols is None else list(cols)
    missing_cols = [c for c in cols if c not in stat_cols]
    if missing_cols:
        raise ValueError(
            f"columns {missing_cols} are not stat columns "
            f"{stat_cols} of {database}.{table}; metadata-only "
            "min/max needs recorded zone maps — widen stat_cols on "
            "the next commit, or run a real query"
        )

    # standing deletion vectors make the per-file stats a SUPERSET:
    # row/null counts still include tombstoned rows and min/max may
    # come from a deleted row, while this function promises EXACT
    # results (Delta/Iceberg likewise disable metadata-only counts
    # under deletion vectors — the r10 advisory's point). Fix: files
    # the vectors name fall out of the metadata fold and contribute
    # through ONE masked aggregation instead — bounded by AFFECTED
    # files (manifest dv_files; a legacy manifest without the field
    # conservatively masks every file). allow_scan=False keeps its
    # zero-IO promise by refusing rather than answering wrong.
    dv_scan: set = set()
    if m.get("dvs") and m.get("dv_rows", 0) > 0:
        if not allow_scan:
            raise ValueError(
                f"{database}.{table} has standing deletion vectors "
                f"({m.get('dv_rows')} tombstones): metadata-only "
                "stats would count deleted rows. allow_scan=True "
                "masks the affected files with one bounded "
                "aggregation, or run apply_deletion_vectors first"
            )
        all_names = _manifest_files(wh, database, table, m)
        dvf_names = m.get("dv_files")
        dv_scan = (
            set(all_names) & set(dvf_names)
            if dvf_names is not None
            else set(all_names)
        )
    dv_sorted = sorted(dv_scan)

    def _complete(rec: dict) -> bool:
        return rec.get("__rows") is not None and all(
            c in rec and rec.get(f"{c}__nulls") is not None
            for c in cols
        )

    rows_total = 0
    mins: dict = {c: None for c in cols}
    maxs: dict = {c: None for c in cols}
    nulls: dict = {c: 0 for c in cols}

    def _fold(rec: dict) -> None:
        nonlocal rows_total
        rows_total += rec["__rows"]
        for c in cols:
            lo, hi = rec[c][0], rec[c][1]
            if lo is not None and (mins[c] is None or lo < mins[c]):
                mins[c] = lo
            if hi is not None and (maxs[c] is None or hi > maxs[c]):
                maxs[c] = hi
            nulls[c] += rec[f"{c}__nulls"]

    gaps: list[str] = []
    if "shards" in m:
        for rec in m["shards"]:
            agg = rec.get("agg", {})
            dv_touch = any(
                rec["first"] <= n <= rec["last"] for n in dv_sorted
            )
            if _complete(agg) and not dv_touch:
                _fold(agg)
            else:
                sh = _read_shard(wh, database, table, rec["name"])
                st = sh.get("stats", {})
                for n in sh["files"]:
                    if n in dv_scan:
                        continue  # contributes via the masked agg
                    r = st.get(n, {})
                    if _complete(r):
                        _fold(r)
                    else:
                        gaps.append(n)
    else:
        st = m.get("stats", {})
        for n in m["files"]:
            if n in dv_scan:
                continue  # contributes via the masked agg
            r = st.get(n, {})
            if _complete(r):
                _fold(r)
            else:
                gaps.append(n)
    if gaps:
        if not allow_scan:
            raise ValueError(
                f"{len(gaps)} file(s) lack row/null-count stats "
                "(committed before they were recorded); "
                "allow_scan=True back-fills them with one bounded "
                "aggregation"
            )
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(m["schema"]))
        fresh = _file_stats(
            wh, wh._path(database, table), gaps, schema, cols
        )
        for n in gaps:
            _fold(fresh[n])
    if dv_scan:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(m["schema"]))
        masked = _dv_mask(
            wh, database, table, m,
            wh.spark.read.schema(schema).parquet(
                *[
                    f"{wh._path(database, table)}/{n}"
                    for n in dv_sorted
                ]
            ),
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs += [
                F.min(c).alias(f"mn_{c}"),
                F.max(c).alias(f"mx_{c}"),
                F.sum(F.col(c).isNull().cast("long")).alias(f"nc_{c}"),
            ]
        r = masked.agg(*aggs).collect()[0]
        rec = {"__rows": r["__rows"]}
        for c in cols:
            rec[c] = [r[f"mn_{c}"], r[f"mx_{c}"]]
            rec[f"{c}__nulls"] = r[f"nc_{c}"] or 0
        _fold(rec)

    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(m["schema"]))
    by_name = {f.name: f.dataType for f in schema.fields}
    fields = [T.StructField("row_count", T.LongType(), False)]
    vals: list = [rows_total]
    for c in cols:
        fields += [
            T.StructField(f"min_{c}", by_name[c], True),
            T.StructField(f"max_{c}", by_name[c], True),
            T.StructField(f"null_count_{c}", T.LongType(), False),
        ]
        vals += [mins[c], maxs[c], nulls[c]]
    return wh.spark.createDataFrame([tuple(vals)], T.StructType(fields))


def stats_agg_ndv(
    wh: Warehouse,
    database: str,
    table: str,
    cols: list[str] | None = None,
    version: int | None = None,
    allow_scan: bool = True,
) -> DataFrame:
    """Approximate DISTINCT counts from METADATA: union-merge the
    per-file HLL sketches recorded by ``bloom_cols=["<col>:ndv"]``
    (DataSketches HLL via hll_sketch_agg; Iceberg's puffin-blob NDV,
    public designs) into one estimate per column — no data file is
    read, only manifests/shards, plus ONE tiny Spark job over the
    collected per-file sketches (KBs). The ANALYZE-style table
    profile at 100 TB: 'how many distinct users' costs a metadata
    fold, standard ~1-2% HLL error (lgK=12 default), and stays
    correct under appends because sketches union.

    ``cols`` are SOURCE column names (default: every ndv-sketched
    column). Files committed before the sketch was recorded back-fill
    with one bounded aggregation when ``allow_scan=True``; COW
    deletes rewrite their files' sketches at commit, so estimates
    track deletes too. Standing MERGE-ON-READ deletion vectors do
    NOT rewrite sketches (that's the point of MoR), so files the
    vectors name re-sketch through the mask — one scan bounded by
    affected files; ``allow_scan=False`` refuses under vectors (same
    contract as stats_agg). Returns one row: ``approx_ndv_<col>``
    per column."""
    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(f"{database}.{table} has no snapshots")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not in {database}.{table} snapshots {vs}"
        )
    m = _manifest(wh, database, table, v)
    entries = [
        e
        for e in m.get("bloom_cols", [])
        if e.endswith(_NDV_MARKER)
    ]
    have = [e[: -len(_NDV_MARKER)] for e in entries]
    cols = list(have) if cols is None else list(cols)
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(
            f"columns {missing} have no NDV sketches (sketched: "
            f"{have}); commit with bloom_cols=['<col>:ndv'] first"
        )
    names = _manifest_files(wh, database, table, m)
    stats = _manifest_stats(wh, database, table, m)
    from pyspark.sql import functions as F

    # deletion-vector handling mirrors stats_agg: dv-named files'
    # recorded sketches still count tombstoned rows, so they
    # re-sketch through the mask (ONE masked read covering all
    # requested columns), bounded by affected files
    dv_scan: set = set()
    if m.get("dvs") and m.get("dv_rows", 0) > 0:
        if not allow_scan:
            raise ValueError(
                f"{database}.{table} has standing deletion vectors: "
                "recorded NDV sketches include tombstoned rows. "
                "allow_scan=True re-sketches the affected files "
                "through the mask, or run apply_deletion_vectors"
            )
        dvf_names = m.get("dv_files")
        dv_scan = (
            set(names) & set(dvf_names)
            if dvf_names is not None
            else set(names)
        )
    dv_b64: dict = {}
    if dv_scan:
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(m["schema"]))
        masked = _dv_mask(
            wh, database, table, m,
            wh.spark.read.schema(schema).parquet(
                *[
                    f"{wh._path(database, table)}/{n}"
                    for n in sorted(dv_scan)
                ]
            ),
        )
        row = masked.agg(
            *[
                F.base64(F.hll_sketch_agg(F.col(c))).alias(f"hs_{c}")
                for c in cols
            ]
        ).collect()[0]
        dv_b64 = {c: row[f"hs_{c}"] for c in cols}

    out_vals: list = []
    for c in cols:
        key = f"{c}{_NDV_MARKER}__bloom"
        b64s, gaps = [], []
        if dv_b64.get(c):
            b64s.append(dv_b64[c])
        for n in names:
            if n in dv_scan:
                continue  # contributes via the masked sketch
            rec = stats.get(n, {})
            if key in rec:
                if rec[key]:
                    b64s.append(rec[key])
            else:
                gaps.append(n)
        if gaps:
            if not allow_scan:
                raise ValueError(
                    f"{len(gaps)} file(s) lack the {c!r} NDV sketch; "
                    "allow_scan=True back-fills with one bounded "
                    "aggregation"
                )
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(json.loads(m["schema"]))
            fresh = _file_stats(
                wh, wh._path(database, table), gaps, schema, [],
                [f"{c}{_NDV_MARKER}"],
            )
            b64s += [
                fresh[n][key] for n in gaps if fresh[n][key]
            ]
        if not b64s:
            out_vals.append(0)
            continue
        est = (
            wh.spark.createDataFrame(
                [(b,) for b in b64s], "s string"
            )
            .agg(
                F.hll_sketch_estimate(
                    F.hll_union_agg(F.unbase64(F.col("s")))
                ).alias("e")
            )
            .collect()[0]["e"]
        )
        out_vals.append(int(est))
    return wh.spark.createDataFrame(
        [tuple(out_vals)],
        ", ".join(f"approx_ndv_{c} long" for c in cols),
    )


def expire_snapshots(
    wh: Warehouse,
    database: str,
    table: str,
    keep_last: int = 2,
    older_than: float | None = None,
) -> list[int]:
    """Drop all but the newest ``keep_last`` manifests (metadata only
    — data files are shared across versions and are NOT deleted;
    orphan-file cleanup is compaction's job). Returns expired
    versions.

    ``older_than`` (epoch seconds) additionally RESTRICTS expiry to
    versions committed before that instant — the Delta/Iceberg
    retention-window form: ``expire_snapshots(wh, db, t, keep_last=1,
    older_than=time.time() - 7*86400)`` keeps the latest version plus
    everything from the last 7 days, which is how you state the
    time-travel window you promise readers. Commit stamps come from
    the committing hosts' clocks (manifest ``committed_at``);
    versions predating the stamp count as expirable. Expiry is a
    CONTIGUOUS PREFIX of history: the age filter stops at the first
    non-expirable version rather than filtering each independently —
    with clock skew across committing hosts, per-version filtering
    could expire a MIDDLE version while retaining its neighbors,
    and the streaming CDC planner would then merge the transition
    across the hole (an expired intermediate append whose successor
    carries a 'changes' key would silently never emit its inserts,
    instead of the loud retention error).

    ``keep_last=0`` drops EVERY manifest, which also forgets the
    cumulative ``retired`` set — the next commit_snapshot would
    re-adopt any COW-dead files still on disk. Only expire everything
    when those files are physically deleted in the same operation.
    Do NOT hand-roll that sequence against a live table:
    maintain_table is the safe form — it COMMITS the compacted
    layout first (the new manifest's retired set blocks re-adoption),
    then expires with ``keep_last=1`` and reclaims the dead files, so
    a valid manifest exists at every instant."""
    vs = versions(wh, database, table)
    import itertools

    expired = vs[:-keep_last] if keep_last > 0 else vs
    # TAGS are retention barriers (Iceberg tag retention, public
    # design): expiry stops at the FIRST tagged version — same
    # contiguous-prefix contract as older_than, so a protected middle
    # version can never become a hole the CDC planner would silently
    # merge across. Versions newer than a tag ride out retention with
    # it; delete the tag to release them.
    tagged = set(list_tags(wh, database, table).values())
    if tagged:
        expired = list(
            itertools.takewhile(lambda v: v not in tagged, expired)
        )
    if older_than is not None:
        expired = list(
            itertools.takewhile(
                lambda v: _manifest(wh, database, table, v).get(
                    "committed_at", 0.0
                )
                < older_than,
                expired,
            )
        )
    for v in expired:
        hfs.delete(
            wh.spark,
            f"{_snap_dir(wh, database, table)}/v{v:012d}.json",
            recursive=False,
        )
    return expired


_TAGS_DIR = "tags"
_TAG_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def tag_snapshot(
    wh: Warehouse,
    database: str,
    table: str,
    name: str,
    version: int | None = None,
    replace: bool = False,
) -> int:
    """Name a snapshot version (Iceberg tags, public design): a tag
    is a durable pointer (``_snapshots/tags/<name>.json``) that (a)
    resolves in ``read_snapshot(tag=...)`` — 'the q3-audit dataset'
    instead of a version number — and (b) acts as a RETENTION
    BARRIER: expire_snapshots and maintain_table never expire a
    tagged version or reclaim its data files, so a tagged snapshot
    of a 100 TB table stays readable (and rollback-able) across
    arbitrarily many maintenance cycles at zero copy cost — the tag
    pins file references, not file copies. Tags are immutable by
    default (``replace=True`` moves one); the PUT is atomic, so a
    tag never exists half-written. Returns the tagged version."""
    if not _TAG_RE.match(name):
        raise ValueError(
            f"invalid tag name {name!r} (want [A-Za-z0-9][A-Za-z0-9._-]*,"
            " max 64 chars)"
        )
    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(f"{database}.{table} has no snapshots to tag")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not in {database}.{table} snapshots {vs}"
        )
    path = f"{_snap_dir(wh, database, table)}/{_TAGS_DIR}/{name}.json"
    ok = hfs.put_text_atomic(
        wh.spark,
        path,
        json.dumps({"version": v, "created_at": time.time()}),
        overwrite=replace,
    )
    if not ok:
        raise ValueError(
            f"tag {name!r} already exists on {database}.{table} "
            "(replace=True to move it)"
        )
    return v


def list_tags(wh: Warehouse, database: str, table: str) -> dict:
    """name -> tagged version, empty when the table has no tags."""
    d = f"{_snap_dir(wh, database, table)}/{_TAGS_DIR}"
    try:
        names = hfs.list_names(wh.spark, d)
    except Exception:
        return {}
    out = {}
    for n in names:
        if n.endswith(".json"):
            out[n[:-5]] = json.loads(
                hfs.read_text(wh.spark, f"{d}/{n}")
            )["version"]
    return out


def delete_tag(
    wh: Warehouse, database: str, table: str, name: str
) -> bool:
    """Remove a tag (releasing its retention barrier — the next
    maintenance reclaims whatever only the tag kept alive). Returns
    False when the tag didn't exist."""
    return hfs.delete(
        wh.spark,
        f"{_snap_dir(wh, database, table)}/{_TAGS_DIR}/{name}.json",
        recursive=False,
    )


#: file-name prefixes used by COW rewrites (_cow_rewrite callers).
#: commit_snapshot refuses to ADOPT new files with these prefixes from
#: a directory listing — they become visible only through their own
#: DML commit's manifest (see the adoption guard in commit_snapshot).
_COW_PREFIXES = ("cow-", "ow-", "pack-", "compact-", "txnappend-")


def _cow_rewrite(wh: Warehouse, base: str, df: DataFrame,
                 prefix: str = "cow") -> list[str]:
    """COW rewrite helper shared by DELETE/MERGE/OVERWRITE/compaction:
    land ``df`` in a temp dir under ``_snapshots``, rename the parquet
    files into the table under fresh unique names (never colliding
    with live files), return the new names. The files are INVISIBLE
    to snapshot readers until a manifest PUT references them; a
    pre-commit failure leaves the live table untouched."""
    import uuid

    tmp = f"{base}/{_SNAP_DIR}/rw-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    # pooled renames (r10, fs.rename_many): a COW rewrite lands one
    # rename per output file — overlapped, not serialized. A failure
    # raises pre-commit: the live table is untouched (no manifest
    # references the partial rewrite), never a manifest naming a
    # missing file.
    names = [
        (n, f"{prefix}-{uuid.uuid4().hex}-{n}")
        for n in hfs.list_names(wh.spark, tmp)
        if n.endswith(".parquet")
    ]
    hfs.rename_many(
        wh.spark,
        [(f"{tmp}/{n}", f"{base}/{new}") for n, new in names],
    )
    hfs.delete(wh.spark, tmp)
    return [new for _n, new in names]


def _rebase_parent(
    wh: Warehouse,
    database: str,
    table: str,
    prev: dict,
    guard_files: set,
    allow_dv_growth: bool = False,
):
    """(latest manifest, winner-added file names, winner-added dv
    entries) iff every commit that landed since ``prev`` left this
    COW op's READ/REPLACED file set intact — the metadata half of
    logical conflict detection (rebase instead of recompute; the
    Delta/Iceberg commit-protocol answer to pure version-number OCC,
    public designs). Returns None whenever safety cannot be PROVEN —
    the caller then falls back to the full recompute, so a wrong
    rebase is never reachable; only a missed one.

    Checks, per intervening manifest (each a small JSON read — the
    ``added``/``removed`` delta lists are O(churn) and never require
    opening shards):

    - the manifest records its file deltas at all (pre-r14 manifests
      don't: recompute);
    - nothing this op read or replaced was removed/retired by a
      winner (``removed`` ∩ guard == ∅) — a winner that rewrote one
      of our files makes our preimages/rewrites stale;
    - globally: schema and stat/bloom config must be unchanged
      between prev and latest (this op's manifest was built under
      prev's stat config);
    - deletion-vector state must be unchanged — UNLESS the caller set
      ``allow_dv_growth`` (r15: MoR DML, whose commit re-assembles dv
      state from the parent), in which case vectors may have GROWN
      (prev's entries all still live, dv_rows monotonic). Shrinkage
      (apply_deletion_vectors / maintenance folded vectors) always
      refuses: the mask semantics moved backwards relative to what
      this op read. Winner-added dv entries are returned for the
      caller's row-level disjointness scan — a winner that tombstoned
      a row this op ALSO matched makes our postimages/changes stale.

    Winner-ADDED files are returned, not judged: whether new rows can
    conflict is op-specific (a compaction never cares; a DELETE must
    prove no added row matches its predicate to stay serializable) —
    _cow_commit's ``validate_added`` decides (Iceberg's
    validateNoConflictingData, public design)."""
    vs = versions(wh, database, table)
    newer = [v for v in vs if v > prev["version"]]
    if not newer:
        return None  # conflict without a visible commit: re-read
    try:
        latest = _manifest(wh, database, table, newer[-1])
    except Exception:
        return None  # expired/in-flux history: recompute path decides
    if latest.get("schema") != prev.get("schema"):
        return None
    if latest.get("stat_cols", []) != prev.get("stat_cols", []) or (
        latest.get("bloom_cols", []) != prev.get("bloom_cols", [])
    ):
        return None
    dv_added: list[str] = []
    if latest.get("dvs") != prev.get("dvs") or (
        latest.get("dv_rows", 0) != prev.get("dv_rows", 0)
    ):
        if not allow_dv_growth:
            return None
        prev_dvs = list(prev.get("dvs", []))
        latest_dvs = list(latest.get("dvs", []))
        if not set(prev_dvs) <= set(latest_dvs) or (
            latest.get("dv_rows", 0) < prev.get("dv_rows", 0)
        ):
            return None  # vectors folded/cleared: recompute
        seen = set(prev_dvs)
        dv_added = [d for d in latest_dvs if d not in seen]
    winner_added: list[str] = []
    for v in newer:
        try:
            m = (
                latest
                if v == newer[-1]
                else _manifest(wh, database, table, v)
            )
        except Exception:
            return None
        if "added" not in m or "removed" not in m:
            return None
        if guard_files & set(m["removed"]):
            return None
        winner_added += m["added"]
    return latest, winner_added, dv_added


def _added_scan_validator(wh: Warehouse, base: str, schema, probe):
    """``validate_added`` factory for _cow_commit: True iff NONE of
    the named winner-added files holds a row this op would have
    matched — ``probe`` is either a boolean Column (predicate DML) or
    a ``(keys_df, key_col)`` pair (key-set DML / MERGE, probed via
    semi-join). This is the churn-sized serializability validation
    scan (Iceberg's validateNoConflictingData, public design): it
    reads ONLY the winner's new files, and parquet row-group stats
    give the zone-map fast path for free — a predicate/key span
    outside a file's ranges costs a footer read, no row scan."""

    def _validate(names: list[str]) -> bool:
        df = wh.spark.read.schema(schema).parquet(
            *[f"{base}/{n}" for n in names]
        )
        if isinstance(probe, tuple):
            keys_df, key_col = probe
            hit = df.join(keys_df, key_col, "semi")
        else:
            hit = df.filter(probe)
        return hit.limit(1).count() == 0

    return _validate


def _cow_commit(
    wh: Warehouse,
    database: str,
    table: str,
    prev: dict,
    affected,
    rewritten: list[str],
    changes: list[str] | None,
    summary: dict | None = None,
    dvs_override: tuple | None = None,
    rebase: bool = True,
    read_files: set | None = None,
    validate_added=None,
    dvs_add: tuple | None = None,
) -> int:
    """Commit a COW file swap (``affected`` out, ``rewritten`` in) as
    the next version — the single atomic manifest PUT shared by
    DELETE/MERGE/OVERWRITE. Untouched files carry over with their
    stats; replaced files join the cumulative ``retired`` set so
    commit_snapshot never re-adopts them.

    ``changes`` semantics for the streaming CDC planner: a LIST (even
    empty) records "this commit's change rows are exactly these files"
    — [] is the compaction contract, content-preserving, emit
    nothing. ``None`` OMITS the key: "changes were not captured" —
    the planner then file-diffs, and a version that removed files
    raises its loud out-of-band error instead of silently emitting
    nothing (the cdc=False overwrite path; caught by
    test_cdc_stream_errs_loudly_on_cdc_false_overwrite, where the
    [] spelling produced a silent wrong feed).

    REBASE on version conflict (r14 — cross-process progress): when
    the PUT loses the CAS to a concurrent commit, the op's recompute
    is only STALE if the winner actually touched what this op read,
    replaced, or would have matched. ``_rebase_parent`` proves the
    file-set half from the intervening manifests' O(churn)
    file-delta lists; winner-ADDED files then pass through
    ``validate_added`` — Iceberg's validateNoConflictingData shape
    (public design): a churn-sized scan of ONLY the winner's new
    files proving none of their rows match this op's predicate/key
    set, which is what keeps the repo's pinned SERIALIZABLE DML
    semantics (a delete racing an append that inserts a matching row
    still recomputes and deletes it — the r8 pytest's contract)
    while letting every genuinely disjoint conflict commit without
    re-running the op. On proof, the SAME rewritten files re-commit
    against the winner's manifest — files/retired/txns/constraints
    from the LATEST snapshot, this op's swap applied on top — with
    ``rebased_from``/``rebased_onto`` provenance in the summary; the
    cost is one manifest read + (at most) one churn-sized scan + one
    PUT instead of a full re-tag + rewrite (the r13 starvation
    shape). Any unprovable case raises to the caller's _retry_dml
    recompute exactly as before.

    ``validate_added``: ``None`` = winner adds are never provably
    safe (rebase only past removed-only/metadata winners — the
    conservative default); ``"ignore"`` = adds cannot conflict by
    the op's nature (compaction and dv application are
    content-preserving over THEIR files; new rows are untouched
    either way); a ``callable(names) -> bool`` = True iff the named
    winner-added data files provably hold no conflicting row (the
    validators below read those files raw — safe even when a later
    winner tombstoned rows in an earlier winner's added file, because
    a raw read only sees MORE rows than the mask, so it can only turn
    a would-be rebase into the recompute, never the reverse).
    Validated names are cached across rebase attempts so a
    multi-winner storm scans each winner's files once.

    MoR-vs-MoR rebase (r15, the grow form): when this op supplies
    ``dvs_add``, the precondition relaxes from dv-equality to
    dv-GROWTH (_rebase_parent), and the winner's new dv entries must
    additionally prove row-level disjointness from ours — one
    churn-sized semi-join of the two (file, rid) sidecar sets. An
    intersection means both ops matched the same row; serializability
    demands the recompute (which reads the winner's postimage), so
    the rebase refuses. Disjoint concurrent MoR updates — the common
    multi-writer shape — commit without re-running the op.
    ``read_files``: files the op depends on staying live beyond
    ``affected`` (MoR tombstones bind to (file, row) — a winner
    rewriting a tombstoned file would strand the new dv entries);
    ``rebase=False`` opts out entirely (OVERWRITE: 'replace whatever
    is there' must recompute against the winner by definition)."""
    from pyspark.sql import types as T

    base = wh._path(database, table)
    schema = T.StructType.fromJson(json.loads(prev["schema"]))
    affected = set(affected)
    cols = prev.get("stat_cols", [])
    blooms = prev.get("bloom_cols", [])
    # rewritten-file stats are parent-independent: compute ONCE, both
    # the first attempt and any rebase re-commit reuse them
    fresh = (
        _file_stats(wh, base, rewritten, schema, cols, blooms)
        if (cols or blooms)
        else {}
    )

    def _attempt(parent: dict, rebase_note: dict | None) -> int:
        parent_files = _manifest_files(wh, database, table, parent)
        new_files = sorted(
            [f for f in parent_files if f not in affected] + rewritten
        )
        # number from the SAME snapshot `parent` came from (see
        # _next_version's OCC requirement): a racer past it makes this
        # PUT lose the CAS loudly instead of silently dropping files
        next_v = _next_version(
            wh, database, table, vs=[parent["version"]]
        )
        manifest = {
            "version": next_v,
            # replaced files stay on disk for older versions;
            # commit_snapshot must never re-adopt them
            "retired": sorted(
                set(parent.get("retired", [])) | affected
            ),
            "schema": parent["schema"],
            **_assemble_manifest_entry(
                wh, database, table, parent, new_files,
                added=rewritten, removed=affected,
                fresh_stats=fresh, cols=cols, blooms=blooms,
            ),
        }
        if changes is not None:
            manifest["changes"] = changes
        summ = dict(summary) if summary else {}
        if rebase_note:
            summ.update(rebase_note)
        if summ:
            manifest["summary"] = summ
        if parent.get("constraints"):
            manifest["constraints"] = parent["constraints"]
        if parent.get("txns"):
            # from the LATEST parent — an intervening txn append
            # advanced per-app watermarks; carrying prev's would
            # regress them and double-apply the next replay
            manifest["txns"] = parent["txns"]
        # deletion vectors: carried by default — safe because every
        # COW rewrite/pack reads through the mask (the
        # rewrite-must-mask invariant, _dv_mask), so tombstoned rows
        # are physically dropped at any move and carried entries are
        # live-or-dead, never wrong. dvs_add=(new entries, new rows,
        # touched files) is the GROW form (MoR DML, r15): this op's
        # OWN delta, assembled onto whatever parent the attempt
        # commits against — which is what lets a MoR update rebase
        # past a winner that also grew the vectors (the old prebuilt
        # override was exact only under prev, forcing dv-equality in
        # the rebase precondition). dvs_override=(list, rows[, files])
        # sets state verbatim — ([], 0) is the clear form for
        # overwrite (all old rows replaced) and apply_deletion_vectors
        # (tombstones physically applied); override callers keep the
        # dv-equality rebase precondition, so a prev-built override
        # stays exact on every attempt.
        if dvs_add is not None:
            new_dvs = list(parent.get("dvs", [])) + list(dvs_add[0])
            if new_dvs:
                manifest["dvs"] = new_dvs
                manifest["dv_rows"] = int(parent.get("dv_rows", 0)) + int(
                    dvs_add[1]
                )
                # file-scoped mask coverage stays recordable only when
                # the parent's own coverage is known (the legacy rule
                # MoR DML applied against prev, now per-attempt)
                if (
                    not parent.get("dvs") or "dv_files" in parent
                ) and dvs_add[2] is not None:
                    manifest["dv_files"] = sorted(
                        set(parent.get("dv_files", []))
                        | set(dvs_add[2])
                    )
        elif dvs_override is not None:
            if dvs_override[0]:
                manifest["dvs"] = list(dvs_override[0])
                manifest["dv_rows"] = int(dvs_override[1])
                if (
                    len(dvs_override) > 2
                    and dvs_override[2] is not None
                ):
                    manifest["dv_files"] = sorted(dvs_override[2])
        elif parent.get("dvs"):
            manifest["dvs"] = parent["dvs"]
            manifest["dv_rows"] = parent.get("dv_rows", 0)
            if "dv_files" in parent:
                # carried unchanged: a rewrite may retire a named
                # file (its entries go dead), but dv_files only needs
                # to stay a SUPERSET of live tombstoned files —
                # readers intersect it with the plan's file list
                manifest["dv_files"] = parent["dv_files"]
        _put_manifest(wh, database, table, manifest)
        return next_v

    try:
        return _attempt(prev, None)
    except CommitConflictError as e:
        if not rebase:
            raise
        last = e
    guard = affected | (set(read_files) if read_files else set())
    cleared: set = set()  # winner-added files already validated safe
    dv_cleared: set = set()  # winner dv entries already proven disjoint
    for _i in range(_CAS_ATTEMPTS):
        if _i:
            _cas_backoff(_i)
        found = _rebase_parent(
            wh, database, table, prev, guard,
            # only the grow-form caller knows how to re-assemble dv
            # state onto a moved parent; everyone else still needs
            # dv equality (their override/carry was built under prev)
            allow_dv_growth=dvs_add is not None,
        )
        if found is None:
            raise last  # unprovable: caller's _retry_dml recomputes
        parent, winner_added, dv_added = found
        suspect = [n for n in winner_added if n not in cleared]
        if suspect:
            if validate_added is None:
                raise last
            if validate_added != "ignore":
                try:
                    ok = bool(validate_added(suspect))
                except Exception:
                    ok = False  # unreadable/in-flux adds: recompute
                if not ok:
                    raise last  # a winner's row conflicts: recompute
            cleared.update(suspect)
        dv_suspect = [d for d in dv_added if d not in dv_cleared]
        if dv_suspect:
            # row-level disjointness (r15): the winner tombstoned rows
            # too — safe iff NONE of them is a row this op matched
            # (intersecting (file, rid) sets mean both ops touched the
            # same row: serializability demands our recompute see the
            # winner's postimage). One churn-sized semi-join over the
            # two sidecar sets; sizes are O(matched rows) by MoR's
            # contract.
            try:
                ours = _dv_frame(
                    wh, database, table, list(dvs_add[0])
                )
                theirs = _dv_frame(wh, database, table, dv_suspect)
                clash = (
                    ours is not None
                    and theirs is not None
                    and theirs.join(
                        ours, ["file", "rid"], "semi"
                    ).limit(1).count() > 0
                )
            except Exception:
                clash = True  # unreadable/in-flux vectors: recompute
            if clash:
                raise last  # same row tombstoned twice: recompute
            dv_cleared.update(dv_suspect)
        try:
            return _attempt(
                parent,
                {
                    "rebased_from": prev["version"],
                    "rebased_onto": parent["version"],
                },
            )
        except CommitConflictError as e:
            last = e  # another racer landed mid-rebase: re-prove
    raise last


def _delete_where_once(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of delete_where (public wrapper below
    adds conflict retry). Row-level DELETE via copy-on-write, the takedown primitive a
    training-data pipeline needs (opt-outs, contamination, PII): files
    containing matching rows are rewritten WITHOUT them; untouched
    files are carried into the new manifest as-is. Returns
    (new_version, rows_deleted).

    Shape: one filtered scan tags affected files via
    ``input_file_name()`` (file-level pruning — parquet min/max stats
    prune most files when the predicate correlates with the
    sort-on-write key); only affected files re-read and rewrite. Old
    versions still SEE the deleted rows (time travel is the audit
    trail); expire + compact to physically reclaim.

    Requires the table to be snapshot-managed (at least one version).
    """
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    # visible rows tagged with their file (DV-masked AFTER the tag —
    # see _read_current_tagged for why the order matters)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    # Delta DELETE semantics: a row is deleted iff the predicate is
    # TRUE; NULL evaluates to not-deleted. Normalizing once here makes
    # delete and keep EXACT complements (filter(p) / filter(~p) both
    # drop NULL rows — which would physically delete them while never
    # emitting them to the change files, silently diverging the CDC
    # feed from the table).
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred_true = F.coalesce(pred.cast("boolean"), F.lit(False))
    affected = sorted(
        r["__file"].rsplit("/", 1)[-1]
        for r in tagged.filter(pred_true)
        .select("__file")
        .distinct()
        .collect()
    )
    if not affected:
        return versions(wh, database, table)[-1], 0
    # change-data-feed capture (Delta CDF's public design): the exact
    # deleted rows are known right here — persist them as change files
    # so the streaming CDC source replays this commit from parquet on
    # EXECUTORS instead of re-diffing manifests on the driver. Cost:
    # one extra filtered scan of only the affected files (churn-
    # proportional); invisible until the manifest PUT below.
    # raw file re-reads must re-apply the standing deletion vectors:
    # a file can hold rows already MoR-deleted — without the mask the
    # change capture would re-emit their deletes to the CDC feed, and
    # the keep set would copy them into the rewritten file
    changes = _write_changes(
        wh,
        database,
        table,
        _dv_mask(
            wh, database, table, prev_m,
            wh.spark.read.schema(schema)
            .parquet(*[f"{base}/{n}" for n in affected]),
        )
        .filter(pred_true)
        .withColumn("_change_type", F.lit("delete")),
    )
    keep = _dv_mask(
        wh, database, table, prev_m,
        wh.spark.read.schema(schema)
        .parquet(*[f"{base}/{n}" for n in affected]),
    ).filter(~pred_true)
    # rewrite survivors into fresh files, then commit a manifest that
    # swaps affected -> rewritten; data-file writes before the
    # manifest PUT are invisible until the commit, so readers never
    # see a partial delete
    rewritten = _cow_rewrite(wh, base, keep)
    prev = _manifest(wh, database, table, vs[-1])
    next_v = _cow_commit(
        wh, database, table, prev, affected, rewritten, changes,
        summary=summary,
        # serializable rebase (r14): a conflicting winner's new files
        # must prove they hold no predicate-matching row, else the
        # delete recomputes and removes those rows too
        validate_added=_added_scan_validator(wh, base, schema, pred_true),
    )
    # deleted-row count from the change files' parquet FOOTERS (row
    # counts only, no data scan) — the old before/after counting cost
    # two FULL table scans per delete, table-size work for a
    # churn-size operation
    n_deleted = (
        wh.spark.read.parquet(
            *[
                f"{_snap_dir(wh, database, table)}/{rel}"
                for rel in changes
            ]
        ).count()
        if changes
        else 0
    )
    return next_v, n_deleted


def _delete_keys_once(
    wh: Warehouse,
    database: str,
    table: str,
    keys: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of delete_keys (public wrapper below
    adds conflict retry). Row-level DELETE by KEY SET via copy-on-write: every row whose
    ``key_col`` appears in ``keys`` is removed. Returns
    (new_version, rows_deleted).

    This is the mass-takedown form of delete_where: the key set stays
    a DataFrame END-TO-END — affected files tag via a semi-join,
    survivors via an anti-join (AQE broadcasts the key side when it
    is small, shuffles when it is not) — so a 10^6-row GDPR/opt-out
    delete plans like any join instead of becoming a 10^6-element
    Catalyst IN-list literal that stalls the analyzer and bloats the
    driver. Same visibility contract as delete_where: files
    containing matching rows are rewritten without them, the manifest
    PUT is the single atomic commit point, old versions still see the
    deleted rows, and the exact deleted rows land in the change feed.
    """
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    # visible rows tagged with their file (DV-masked AFTER the tag —
    # see _read_current_tagged for why the order matters)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    if key_col not in schema.names:
        raise ValueError(
            f"key column {key_col!r} not in {database}.{table} "
            f"columns {schema.names}"
        )
    # align the key frame to the table's key type so the joins below
    # are equi-joins on identical types (no implicit cross-type casts)
    key_type = schema[key_col].dataType
    keys_d = (
        keys.select(F.col(keys.columns[0]).alias(key_col))
        if len(keys.columns) == 1 and key_col not in keys.columns
        else keys.select(key_col)
    ).select(F.col(key_col).try_cast(key_type).alias(key_col)).distinct()

    affected = sorted(
        r["__file"].rsplit("/", 1)[-1]
        for r in tagged.join(keys_d, key_col, "semi")
        .select("__file")
        .distinct()
        .collect()
    )
    if not affected:
        return vs[-1], 0

    # standing deletion vectors re-apply on the raw re-read (same
    # reason as _delete_where_once: no re-emitted CDC deletes, no
    # tombstoned rows copied into the rewrite)
    affected_df = _dv_mask(
        wh, database, table, prev_m,
        wh.spark.read.schema(schema).parquet(
            *[f"{base}/{n}" for n in affected]
        ),
    )
    # change feed: the exact deleted rows (delete preimages), then
    # survivors rewritten — both churn-proportional (affected files
    # only); everything is invisible until the manifest PUT
    changes = _write_changes(
        wh,
        database,
        table,
        affected_df.join(keys_d, key_col, "semi").withColumn(
            "_change_type", F.lit("delete")
        ),
    )
    rewritten = _cow_rewrite(
        wh, base, affected_df.join(keys_d, key_col, "anti")
    )
    prev = _manifest(wh, database, table, vs[-1])
    next_v = _cow_commit(
        wh, database, table, prev, affected, rewritten, changes,
        summary=summary,
        # serializable rebase (r14): winner-added files must prove
        # they hold none of the takedown keys, else recompute
        validate_added=_added_scan_validator(
            wh, base, schema, (keys_d, key_col)
        ),
    )
    n_deleted = (
        wh.spark.read.parquet(
            *[
                f"{_snap_dir(wh, database, table)}/{rel}"
                for rel in changes
            ]
        ).count()
        if changes
        else 0
    )
    return next_v, n_deleted


def _merge_upsert_once(
    wh: Warehouse,
    database: str,
    table: str,
    updates: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int, int]:
    """One optimistic attempt of merge_upsert (public wrapper below
    adds conflict retry). MERGE (latest-wins upsert) via copy-on-write: rows whose
    ``key_col`` matches an update are REPLACED, unmatched update rows
    INSERT, files without any matching key carry over untouched.
    Returns (new_version, n_updated, n_inserted) — the dimension-table
    maintenance primitive the append-only reference lacks.

    Shape: one semi-join scan tags affected files (parquet min/max on
    the sort-on-write key prunes most); survivors = affected rows
    anti-joined on update keys; rewrite = survivors + ALL update rows
    (aligned to the table schema, try_cast semantics). Commit is the
    usual atomic manifest PUT; the pre-merge version stays readable.
    """
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    # visible rows tagged with their file (DV-masked AFTER the tag —
    # see _read_current_tagged for why the order matters)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    keys = updates.select(F.col(key_col)).distinct()

    affected = sorted(
        r["__file"].rsplit("/", 1)[-1]
        for r in tagged.join(keys, key_col, "semi")
        .select("__file")
        .distinct()
        .collect()
    )
    aligned_updates = updates.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            if f.name in updates.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    if affected:
        # standing deletion vectors re-apply on the raw re-reads
        # (same reason as _delete_where_once: tombstoned rows must
        # neither survive into the rewrite nor emit CDC preimages)
        survivors = _dv_mask(
            wh, database, table, prev_m,
            wh.spark.read.schema(schema)
            .parquet(*[f"{base}/{n}" for n in affected]),
        ).join(keys, key_col, "anti")
        rewrite = survivors.unionByName(aligned_updates)
        replaced = _dv_mask(
            wh, database, table, prev_m,
            wh.spark.read.schema(schema)
            .parquet(*[f"{base}/{n}" for n in affected]),
        ).join(keys, key_col, "semi")
    else:
        rewrite = aligned_updates
        replaced = wh.spark.createDataFrame([], schema)
    # update/insert counts from the AFFECTED files only — a matching
    # key can only live in an affected file (that is what made it
    # affected), so these counts are churn-proportional; the old
    # current-vs-keys joins cost two full table scans per merge
    n_updated = replaced.count()
    n_inserted = updates.join(
        replaced.select(key_col).distinct(), key_col, "anti"
    ).count()
    # change-data-feed capture: replaced rows as the delete preimages,
    # every update row as an insert postimage (Delta CDF semantics —
    # an update whose values happen to equal the existing row still
    # emits its delete/insert pair here, whereas the manifest-diff
    # batch read_changes cancels it; both are valid change feeds and
    # converge to the same applied state). Churn-proportional job;
    # invisible until the manifest PUT.
    changes = _write_changes(
        wh,
        database,
        table,
        replaced.withColumn("_change_type", F.lit("delete")).unionByName(
            aligned_updates.withColumn("_change_type", F.lit("insert"))
        ),
    )

    rewritten = _cow_rewrite(wh, base, rewrite)
    prev = _manifest(wh, database, table, vs[-1])
    next_v = _cow_commit(
        wh, database, table, prev, affected, rewritten, changes,
        summary=summary,
        # serializable rebase (r14): MERGE's result depends on which
        # keys EXIST — winner-added files must prove they hold none
        # of this merge's keys (else matched-vs-insert could flip)
        validate_added=_added_scan_validator(
            wh, base, schema, (keys, key_col)
        ),
    )
    return next_v, n_updated, n_inserted


def overwrite_versioned(
    wh: Warehouse,
    database: str,
    table: str,
    batch: DataFrame,
    stat_cols: list[str] | None = None,
    summary: dict | None = None,
    cdc: bool = True,
    bloom_cols: list[str] | None = None,
) -> int:
    """INSERT OVERWRITE as ONE atomic commit — see
    _overwrite_versioned_once for semantics (single-PUT visibility,
    CDC delete+insert capture, cdc=False for derived tables).
    Conflict-retries with full recompute (_retry_dml): INSERT
    OVERWRITE's contract is 'replace whatever is there', so a retry
    against the winner's state — including re-deriving the delete
    preimages from it — is exactly the right semantics."""
    return _retry_dml(
        lambda: _overwrite_versioned_once(
            wh, database, table, batch,
            stat_cols=stat_cols, summary=summary, cdc=cdc,
            bloom_cols=bloom_cols,
        ),
        lock_key=wh._path(database, table),
    )


#: per-table in-process DML retry locks (keyed by table path). OCC
#: with full-recompute retries has no PROGRESS guarantee when the
#: recompute window is long: an op whose tag/rewrite takes seconds
#: conflicts with EVERY commit landing inside that window, and under
#: sustained same-driver concurrency (N writer threads + a compaction
#: cadence) one writer can starve past any finite budget — measured
#: in mor_concurrent_churn_r13 before this. Retries therefore
#: ESCALATE to a per-table lock: first attempts stay lock-free (zero
#: cost in the uncontended case), retrying writers serialize with
#: each other, so each converges instead of re-racing. The lock is
#: in-PROCESS only — exactly the scope a Spark driver owns; CROSS-
#: process racers still serialize through the manifest CAS, same as
#: before (the posture of Delta's log-store mutual exclusion +
#: commit retries, public design).
#: key -> [RLock, refcount]; an entry exists ONLY while some thread
#: holds or waits on the gate (r14 — the r13 dict retained one RLock
#: per table path for the driver's lifetime, a leak for workloads
#: that build many short-lived temp warehouses). The refcount spans
#: registry-get .. release-done, so an entry is never evicted out
#: from under a holder or a waiter.
_DML_LOCKS: dict[str, list] = {}
_DML_LOCKS_GUARD = threading.Lock()


class _DmlGate:
    """Context manager for the per-table RE-ENTRANT commit gate. Held
    two ways: transiently by every manifest PUT (_put_manifest), and
    across a WHOLE retry attempt by an escalated DML (_retry_dml) —
    re-entrancy lets the holder's own PUT pass. While an escalated
    retry holds the gate no other in-process commit can LAND, so the
    holder's listing->recompute->put window closes cleanly and it
    commits on that attempt; everyone queued behind it proceeds (and
    at worst conflicts once, joining the queue as the next escalated
    retrier). In-process scope only — the Spark driver owns its
    writer threads; cross-process racers serialize through the
    manifest CAS (plus the r14 rebase path, which turns their
    disjoint-file conflicts into metadata-only re-commits).

    WORST-CASE HOLD (r13 advisory, documented contract): an escalated
    DML holds the gate across its entire attempt — the full Spark
    recompute PLUS the once-fn's internal commit CAS loop, whose
    backoffs reach ~2 s/attempt when CROSS-process racers keep
    winning. Other in-process commits block in _put_manifest for that
    whole window (tens of seconds at the pathological end) with no
    fairness bound beyond the lock queue. That is the intended trade:
    the gate exists precisely so one slow writer FINISHES instead of
    starving, and in-process contenders landing mid-recompute would
    conflict it right back to square one. Cross-process conflicts
    that used to extend this window now mostly rebase without
    recompute (_rebase_parent), which shortens the hold rather than
    lengthening it."""

    __slots__ = ("key", "_rec")

    def __init__(self, key: str):
        self.key = key

    def __enter__(self):
        with _DML_LOCKS_GUARD:
            rec = _DML_LOCKS.get(self.key)
            if rec is None:
                rec = [threading.RLock(), 0]
                _DML_LOCKS[self.key] = rec
            rec[1] += 1  # registered BEFORE blocking: no eviction
            self._rec = rec
        rec[0].acquire()
        return self

    def __exit__(self, *exc):
        rec = self._rec
        rec[0].release()
        with _DML_LOCKS_GUARD:
            rec[1] -= 1
            if rec[1] == 0 and _DML_LOCKS.get(self.key) is rec:
                del _DML_LOCKS[self.key]
        return False


def _dml_lock(key: str) -> _DmlGate:
    """The per-table commit gate for ``key`` (a table path) — see
    _DmlGate. Use as ``with _dml_lock(path):``; entries self-evict
    at refcount zero, so dropped/abandoned tables retain nothing."""
    return _DmlGate(key)


def _retry_dml(
    attempt, attempts: int = _CAS_ATTEMPTS, lock_key: str | None = None
):
    """Serializable-after-the-winner retry for copy-on-write DML (new
    r8): a CommitConflictError means a concurrent writer (typically
    the ingest stream's per-batch commit) took this commit's version
    number — the whole attempt RECOMPUTES against the fresh snapshot
    (re-tag affected files, re-rewrite, re-diff changes), so the
    retried DML applies to the winner's state exactly as if it had
    started after it. The failed attempt's rewrite/change files are
    unreferenced debris inside maintain_table's reclaim grace window,
    same as any CAS loser. ``_CAS_ATTEMPTS`` (10) consecutive
    conflicts — each retried after ``_cas_backoff``'s jittered,
    exponentially-growing sleep (r12/r13) — surface the last error
    to the caller as a genuine commit storm. With ``lock_key`` (every
    DML passes its table path), RETRY attempts additionally serialize
    through the per-table in-process lock (_DML_LOCKS above) so
    same-driver contenders converge instead of livelocking; the
    first attempt never takes the lock."""
    last: CommitConflictError | None = None
    for _attempt in range(attempts):
        if _attempt:
            _cas_backoff(_attempt)
        if lock_key is not None and _attempt:
            with _dml_lock(lock_key):
                try:
                    return attempt()
                except CommitConflictError as e:
                    last = e
                    continue
        try:
            return attempt()
        except CommitConflictError as e:
            last = e
    raise last  # type: ignore[misc]


def delete_where(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Row-level DELETE via copy-on-write — see _delete_where_once
    for semantics (Delta DELETE NULL handling, CDC preimages,
    time-travel audit trail). This wrapper retries on commit
    conflicts with a FULL recompute against the fresh snapshot
    (_retry_dml), so a takedown racing the ingest stream's appends
    lands serializably after them instead of erroring out."""
    return _retry_dml(
        lambda: _delete_where_once(
            wh, database, table, predicate, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def delete_keys(
    wh: Warehouse,
    database: str,
    table: str,
    keys: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Row-level DELETE by KEY SET via copy-on-write — see
    _delete_keys_once for semantics (keys-frame anti-join, never a
    driver IN-list). Conflict-retries with full recompute
    (_retry_dml): the mass-takedown case is exactly the one that
    runs concurrently with live ingest."""
    return _retry_dml(
        lambda: _delete_keys_once(
            wh, database, table, keys, key_col, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def _normalize_set_exprs(schema, set_exprs: dict) -> dict:
    """Validate an UPDATE's SET map against the table schema: every
    target must be an existing column (UPDATE never evolves schema —
    append does that), ``__row_id`` is immutable (it IS the row's
    identity; changing it is a delete+insert, which is what you
    should write), and every value expression casts to the column's
    EXISTING type — Delta UPDATE's implicit-cast semantics, so the
    rewritten files keep the manifest schema byte-compatible."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    by_name = {f.name: f.dataType for f in schema.fields}
    out: dict = {}
    for name, expr in set_exprs.items():
        if name == "__row_id":
            raise ValueError(
                "__row_id is the immutable row identity; UPDATE "
                "cannot reassign it — delete + insert instead"
            )
        if name not in by_name:
            raise ValueError(
                f"SET target {name!r} is not a column of the table "
                f"(columns: {sorted(by_name)}); UPDATE never adds "
                "columns — evolve with an append first"
            )
        col = expr if isinstance(expr, Column) else F.expr(str(expr))
        out[name] = col.cast(by_name[name])
    if not out:
        raise ValueError("UPDATE needs at least one SET column")
    return out


def _update_where_once(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    set_exprs: dict,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of update_where (public wrapper below
    adds conflict retry). Row-level UPDATE via copy-on-write — the
    ``UPDATE t SET c = expr WHERE pred`` DML Delta/Iceberg ship and
    this warehouse lacked (merge_upsert covers keyed upserts; this is
    the predicate form): files containing matching rows rewrite with
    the SET applied to exactly those rows; untouched files carry
    over. Returns (new_version, rows_updated).

    Same NULL semantics as delete_where: a row updates iff the
    predicate is TRUE (NULL = untouched), normalized once so the
    updated and kept sets are exact complements. CDC captures the
    update as preimage DELETE + postimage INSERT rows in one change
    set — the two-type contract every consumer of this feed already
    speaks (read_changes derives the same pairs for file diffs;
    Delta's four-type CDF is the documented divergence). Raw file
    re-reads apply the standing deletion-vector mask, so a
    MoR-deleted row is neither updated, re-emitted, nor copied into
    the rewritten file.
    """
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    sets = _normalize_set_exprs(schema, set_exprs)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred_true = F.coalesce(pred.cast("boolean"), F.lit(False))
    affected = sorted(
        r["__file"].rsplit("/", 1)[-1]
        for r in tagged.filter(pred_true)
        .select("__file")
        .distinct()
        .collect()
    )
    if not affected:
        return vs[-1], 0

    def read_affected():
        return _dv_mask(
            wh, database, table, prev_m,
            wh.spark.read.schema(schema)
            .parquet(*[f"{base}/{n}" for n in affected]),
        )

    def apply_sets(df):
        return df.select(
            *[
                (
                    F.when(pred_true, sets[f.name])
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                    if f.name in sets
                    else F.col(f.name)
                )
                for f in schema.fields
            ]
        )

    pre = (
        read_affected()
        .filter(pred_true)
        .withColumn("_change_type", F.lit("delete"))
    )
    post = (
        apply_sets(read_affected().filter(pred_true))
        .withColumn("_change_type", F.lit("insert"))
    )
    changes = _write_changes(wh, database, table, pre.unionAll(post))
    rewritten = _cow_rewrite(wh, base, apply_sets(read_affected()))
    prev = _manifest(wh, database, table, vs[-1])
    next_v = _cow_commit(
        wh, database, table, prev, affected, rewritten, changes,
        summary=summary,
        # serializable rebase (r14): same contract as delete_where —
        # a winner-added predicate-matching row forces the recompute
        # that updates it too
        validate_added=_added_scan_validator(wh, base, schema, pred_true),
    )
    n_changed = (
        wh.spark.read.parquet(
            *[
                f"{_snap_dir(wh, database, table)}/{rel}"
                for rel in changes
            ]
        ).count()
        if changes
        else 0
    )
    return next_v, n_changed // 2  # pre + post pairs


def update_where(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    set_exprs: dict,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Row-level UPDATE via copy-on-write — see _update_where_once
    for semantics (Delta UPDATE NULL handling and implicit casts,
    preimage+postimage CDC, time-travel audit trail).
    Conflict-retries with full recompute (_retry_dml)."""
    return _retry_dml(
        lambda: _update_where_once(
            wh, database, table, predicate, set_exprs, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def _update_where_mor_once(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    set_exprs: dict,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of update_where_mor (wrapper below adds
    conflict retry). Row-level UPDATE via MERGE-ON-READ: tombstone
    the matched rows with a deletion vector and append their updated
    copies as a NEW data file, in ONE commit — Iceberg's MoR UPDATE
    shape (position deletes + new data files, public design). Cost is
    O(matched rows) like delete_where_mor: a 3-row correction on a
    1 GB file writes a KB sidecar plus a KB data file instead of
    rewriting the gigabyte.

    The updated copies keep their ``__row_id``: tombstones bind to
    the (file, row) PAIR, so the new file's rows are visible through
    the mask (the ghost-merge precedent — pair binding is what makes
    re-inserting under a tombstoned id work). CDC emits the same
    preimage-delete + postimage-insert pairs as the COW form at THIS
    commit; readers see the update immediately through the standard
    mask; apply_deletion_vectors / maintenance later drops the stale
    physical copies. Requires the __row_id stamp (same contract as
    delete_where_mor). Returns (new_version, rows_updated)."""
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    if "__row_id" not in schema.names:
        raise ValueError(
            "merge-on-read update needs the __row_id stamp "
            f"({database}.{table} lacks it); use update_where (COW)"
        )
    sets = _normalize_set_exprs(schema, set_exprs)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred_true = F.coalesce(pred.cast("boolean"), F.lit(False))
    matched = tagged.filter(pred_true).persist()
    try:
        n_updated = matched.count()
        if n_updated == 0:
            return vs[-1], 0
        dv_rel = _write_dv(
            wh,
            database,
            table,
            matched.select(
                F.element_at(F.split("__file", "/"), -1).alias("file"),
                F.col("__row_id").alias("rid"),
            ),
        )
        touched = sorted(
            r["f"]
            for r in matched.select(
                F.element_at(F.split("__file", "/"), -1).alias("f")
            )
            .distinct()
            .collect()
        )
        pre = matched.drop("__file").withColumn(
            "_change_type", F.lit("delete")
        )
        post = matched.drop("__file").select(
            *[
                (sets[f.name] if f.name in sets else F.col(f.name)).alias(
                    f.name
                )
                for f in schema.fields
            ]
        )
        # the postimage batch is O(matched rows) — bound its file
        # count (~1M rows/file) instead of fanning a 3-row correction
        # into one near-empty file per upstream partition
        landed = _cow_rewrite(
            wh, base,
            post.coalesce(max(1, -(-n_updated // 1_000_000))),
            prefix="morupd",
        )
        changes = _write_changes(
            wh,
            database,
            table,
            pre.unionAll(
                post.withColumn("_change_type", F.lit("insert"))
            ),
        )
    finally:
        matched.unpersist()
    next_v = _cow_commit(
        wh, database, table, prev_m, set(), landed, changes,
        summary=summary,
        # MoR tombstones bind to (file, row): the touched files must
        # stay live across any rebase or the new dv entries strand
        read_files=set(touched),
        # serializable rebase (r14): same contract as the COW UPDATE
        validate_added=_added_scan_validator(wh, base, schema, pred_true),
        # grow form (r15): OUR dv delta only — _cow_commit assembles
        # it onto whatever parent each attempt commits against, which
        # is what lets a MoR update REBASE past a concurrent MoR
        # update on disjoint rows (the r14 prebuilt override forced
        # dv-equality, so every MoR-vs-MoR conflict recomputed); the
        # dv_files legacy rule is applied per-attempt inside
        dvs_add=(dv_rel, n_updated, set(touched)),
    )
    return next_v, n_updated


def update_where_mor(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    set_exprs: dict,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Row-level UPDATE via merge-on-read deletion vectors + appended
    postimages — see _update_where_mor_once for semantics and the
    O(matched rows) cost contract. Conflict-retries with full
    recompute (_retry_dml)."""
    return _retry_dml(
        lambda: _update_where_mor_once(
            wh, database, table, predicate, set_exprs, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def _delete_where_mor_once(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of delete_where_mor (wrapper below adds
    conflict retry). Row-level DELETE via MERGE-ON-READ deletion
    vectors (Delta DVs / Iceberg position deletes, public designs):
    instead of rewriting every affected file (copy-on-write — O(bytes
    of affected files)), commit a small (file, __row_id) tombstone
    parquet and leave the data files untouched — O(matched rows).
    At 100 TB this is the difference between a 3-row takedown
    rewriting a 1 GB file and writing a few-KB sidecar.

    Readers (read_snapshot) mask tombstoned rows with a broadcast
    anti-join on the (file, __row_id) pair while the vector is small
    (_DV_BROADCAST_ROWS); COW DML, compaction and appends all carry
    the vector, and every rewrite reads through the mask so a moved
    row is physically dropped and its entry goes dead (the
    rewrite-must-mask invariant, _dv_mask).
    The CDC feed gets the exact deleted rows at THIS commit (explicit
    change files, same as COW delete). Physical reclaim is
    apply_deletion_vectors (below) or any maintain_table. Time travel
    to older versions still shows the rows — same audit-trail
    contract as COW.

    Same NULL semantics as delete_where: a row deletes iff the
    predicate is TRUE. Requires the __row_id stamp (every
    ingest-created table has it); tables without it must use the COW
    path. Returns (new_version, rows_deleted)."""
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    if "__row_id" not in schema.names:
        raise ValueError(
            "merge-on-read delete needs the __row_id stamp "
            f"({database}.{table} lacks it); use delete_where (COW)"
        )
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred_true = F.coalesce(pred.cast("boolean"), F.lit(False))
    # matched feeds three jobs (empty probe, tombstone write, change
    # write) — persist once, release before returning (the cache
    # discipline the r9 advisory pinned on dedup_index)
    matched = tagged.filter(pred_true).persist()
    try:
        if matched.limit(1).count() == 0:
            return vs[-1], 0
        dv_files = _write_dv(
            wh,
            database,
            table,
            matched.select(
                F.element_at(F.split("__file", "/"), -1).alias("file"),
                F.col("__row_id").alias("rid"),
            ),
        )
        # the AFFECTED data-file names (bounded by files-with-matches,
        # the quantity MoR is O() of anyway) ride the manifest as
        # ``dv_files`` so readers can plan file-scoped masking:
        # unaffected files skip the per-row basename projection and
        # anti-join entirely (read_snapshot), and CDC bootstrap knows
        # which partitions need tombstones without opening a vector
        touched = sorted(
            r["f"]
            for r in matched.select(
                F.element_at(F.split("__file", "/"), -1).alias("f")
            )
            .distinct()
            .collect()
        )
        changes = _write_changes(
            wh,
            database,
            table,
            matched.drop("__file").withColumn(
                "_change_type", F.lit("delete")
            ),
        )
    finally:
        matched.unpersist()
    n_deleted = (
        wh.spark.read.parquet(
            *[
                f"{_snap_dir(wh, database, table)}/{rel}"
                for rel in changes
            ]
        ).count()
        if changes
        else 0
    )
    next_v = _next_version(
        wh, database, table, vs=[prev_m["version"]]
    )
    manifest = {
        "version": next_v,
        "retired": sorted(prev_m.get("retired", [])),
        "schema": prev_m["schema"],
        "changes": changes,
        "dvs": list(prev_m.get("dvs", [])) + dv_files,
        "dv_rows": int(prev_m.get("dv_rows", 0)) + n_deleted,
        # file deltas (r14): a MoR delete moves no data files — other
        # writers' rebase checks read this instead of falling back
        # (their dv-state equality check still rejects rebasing PAST
        # this commit, as it must: the mask changed)
        "added": [],
        "removed": [],
    }
    # file-scoped mask planning: only recordable when the carried
    # vectors' coverage is known too — a legacy manifest with dvs but
    # no dv_files keeps the (correct, conservative) mask-everything
    # read until its vectors fold
    if not prev_m.get("dvs") or "dv_files" in prev_m:
        manifest["dv_files"] = sorted(
            set(prev_m.get("dv_files", [])) | set(touched)
        )
    # identical file list -> share the previous entry (inline stats
    # or shard references — shards are immutable)
    for k in (
        "files", "stats", "stat_cols", "bloom_cols", "shards",
        "n_files", "bloom_sidecars",
    ):
        if k in prev_m:
            manifest[k] = prev_m[k]
    if summary:
        manifest["summary"] = dict(summary)
    if prev_m.get("constraints"):
        manifest["constraints"] = prev_m["constraints"]
    if prev_m.get("txns"):
        manifest["txns"] = prev_m["txns"]
    _put_manifest(wh, database, table, manifest)
    return next_v, n_deleted


def delete_where_mor(
    wh: Warehouse,
    database: str,
    table: str,
    predicate,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Row-level DELETE via merge-on-read deletion vectors — see
    _delete_where_mor_once for semantics and the COW-vs-MoR cost
    contract. Conflict-retries with full recompute (_retry_dml),
    same as the COW DML family."""
    return _retry_dml(
        lambda: _delete_where_mor_once(
            wh, database, table, predicate, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def dv_fold_due(manifest: dict, file_fraction: float = 0.1) -> bool:
    """Whether a table's standing deletion vectors have outgrown the
    cheap merge-on-read posture and should be physically applied —
    the documented fold signal, as CODE instead of a docstring (r10
    verdict item): TRUE when ``dv_rows`` passes _DV_BROADCAST_ROWS
    (the reader anti-join stops broadcasting and starts shuffling
    every masked scan), or when the vectors name at least
    ``file_fraction`` of the live files (file-scoped masking stops
    being 'a few affected files pay, the rest ride free').
    ``dv_files`` may carry dead entries (files since retired by a
    rewrite), so the fraction can over-trigger — the fold those
    entries cause is a cheap metadata-only clear, never a wasted
    rewrite. Legacy manifests without ``dv_files`` fold only on the
    row signal. compact_small_files consults this automatically;
    maintain_table needs no signal (its full rewrite reads through
    the mask and commits with the vectors cleared)."""
    if not manifest.get("dvs"):
        return False
    if manifest.get("dv_rows", 0) > _DV_BROADCAST_ROWS:
        return True
    dvf = manifest.get("dv_files")
    if dvf is None:
        return False
    n = _manifest_n_files(manifest)
    return n > 0 and len(dvf) >= max(1, int(n * file_fraction))


def _apply_deletion_vectors_once(
    wh: Warehouse,
    database: str,
    table: str,
    summary: dict | None = None,
) -> tuple[int, int]:
    """One optimistic attempt of apply_deletion_vectors (wrapper
    below adds conflict retry). Physically apply the table's standing
    deletion vectors: rewrite ONLY the files that still hold
    tombstoned rows, commit with the vectors cleared. Content-
    preserving at the visible-row level (readers saw the mask
    already), so the commit records an explicit empty change set —
    CDC consumers cross it emitting nothing, exactly like compaction.
    Returns (version, files_rewritten); a table with no vectors (or
    only dead tombstones) commits a metadata-only clear or no-ops.

    File targeting reads only the files the vectors NAME (tombstones
    are (file, row) pairs, and the rewrite-must-mask invariant means
    a row that left its named file was physically dropped at the
    move) intersected with the live manifest — entries naming
    retired/repacked files are dead and reclaim as a metadata-only
    clear."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    prev = _manifest(wh, database, table, vs[-1])
    dvs = prev.get("dvs", [])
    if not dvs:
        return vs[-1], 0
    base = wh._path(database, table)
    schema = T.StructType.fromJson(json.loads(prev["schema"]))
    live = _manifest_files(wh, database, table, prev)
    dvf = _dv_frame(wh, database, table, dvs)
    # manifest-recorded coverage (dv_files) answers 'which files do
    # the vectors name' without a vector scan; legacy manifests
    # derive it from the sidecars once, here
    recorded = (
        set(prev["dv_files"])
        if "dv_files" in prev
        else {
            r["file"] for r in dvf.select("file").distinct().collect()
        }
    )
    candidates = sorted(recorded & set(live))
    if not candidates:
        # every tombstone names a retired/repacked file: dead entries,
        # metadata-only clear. Winner-added files can't conflict with
        # folding tombstones (they are never tombstoned — the rebase
        # precondition pins dv state unchanged): validate_added="ignore"
        next_v = _cow_commit(
            wh, database, table, prev, set(), [], [],
            summary=summary, dvs_override=([], 0),
            validate_added="ignore",
        )
        return next_v, 0
    tagged = (
        wh.spark.read.schema(schema)
        .parquet(*[f"{base}/{n}" for n in candidates])
        .withColumn(
            "__file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
    )
    if prev.get("dv_rows", 0) <= _DV_BROADCAST_ROWS:
        dvf = F.broadcast(dvf)
    affected = sorted(
        r["__file"]
        for r in tagged.join(
            dvf,
            (tagged["__file"] == dvf["file"])
            & (tagged["__row_id"] == dvf["rid"]),
            "semi",
        )
        .select("__file")
        .distinct()
        .collect()
    )
    if not affected:
        # every tombstone is dead (its rows already left the live
        # files via COW/overwrite): metadata-only clear (adds can't
        # conflict — same reasoning as the clear above)
        next_v = _cow_commit(
            wh, database, table, prev, set(), [], [],
            summary=summary, dvs_override=([], 0),
            validate_added="ignore",
        )
        return next_v, 0
    keep = _dv_mask(
        wh, database, table, prev,
        wh.spark.read.schema(schema).parquet(
            *[f"{base}/{n}" for n in affected]
        ),
    )
    rewritten = _cow_rewrite(wh, base, keep)
    next_v = _cow_commit(
        wh, database, table, prev, affected, rewritten, [],
        summary=summary, dvs_override=([], 0),
        # content-preserving over ITS files; winner-added files are
        # never tombstoned (dv state pinned unchanged), so adds
        # cannot conflict with physically applying the vectors
        validate_added="ignore",
    )
    return next_v, len(affected)


def apply_deletion_vectors(
    wh: Warehouse,
    database: str,
    table: str,
    summary: dict | None = None,
) -> tuple[int, int]:
    """Physically apply standing deletion vectors (rewrite only the
    files that hold tombstoned rows, clear the vectors) — see
    _apply_deletion_vectors_once. Conflict-retries with full
    recompute (_retry_dml). Run it when the vector approaches
    _DV_BROADCAST_ROWS (the reader anti-join stops broadcasting) or
    on the maintenance cadence; maintain_table's full rewrite also
    applies vectors implicitly (it reads through the mask and
    commits a fresh manifest)."""
    return _retry_dml(
        lambda: _apply_deletion_vectors_once(
            wh, database, table, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def merge_upsert(
    wh: Warehouse,
    database: str,
    table: str,
    updates: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int, int]:
    """MERGE (latest-wins upsert) via copy-on-write — see
    _merge_upsert_once for semantics. Conflict-retries with full
    recompute (_retry_dml); latest-wins semantics are unchanged by
    a retry because the update set is re-applied against whatever
    state the winning commit left."""
    return _retry_dml(
        lambda: _merge_upsert_once(
            wh, database, table, updates, key_col, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


def _merge_upsert_mor_once(
    wh: Warehouse,
    database: str,
    table: str,
    updates: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int, int]:
    """One optimistic attempt of merge_upsert_mor (wrapper below adds
    conflict retry). MERGE via MERGE-ON-READ — completes the MoR DML
    family (delete_where_mor r10, update_where_mor r11): matched rows
    tombstone with a deletion vector, EVERY update row appends as new
    data files, one commit — Iceberg's MoR MERGE shape (position
    deletes + new data files). Cost O(matched rows + update rows),
    never O(affected file bytes): upserting 100 dimension rows into a
    table of GB-scale files writes a KB sidecar plus the update batch,
    where the COW form rewrites every file containing a matched key.

    Same visible semantics as merge_upsert (latest-wins replace on
    ``key_col``, unmatched rows insert, try_cast column alignment,
    identical CDC pairs — pytest pins COW == MoR row-for-row). The
    appended rows keep the ``__row_id`` the updates carry — stamp ids
    (ingest/ids.py) if the new rows must be MoR-addressable later.
    Physical reclaim of the replaced copies is apply_deletion_vectors
    / maintenance, same as every vector. Requires the __row_id stamp.
    Returns (new_version, n_updated, n_inserted)."""
    from pyspark.sql import functions as F

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    prev_m, schema, tagged = _read_current_tagged(wh, database, table)
    if "__row_id" not in schema.names:
        raise ValueError(
            "merge-on-read merge needs the __row_id stamp "
            f"({database}.{table} lacks it); use merge_upsert (COW)"
        )
    n_batch = updates.count()
    if n_batch == 0:
        return vs[-1], 0, 0
    keys = updates.select(F.col(key_col)).distinct()
    aligned_updates = updates.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            if f.name in updates.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )
    matched = tagged.join(keys, key_col, "semi").persist()
    try:
        n_updated = matched.count()
        dv_rel: list = []
        touched: list = []
        if n_updated:
            dv_rel = _write_dv(
                wh,
                database,
                table,
                matched.select(
                    F.element_at(
                        F.split("__file", "/"), -1
                    ).alias("file"),
                    F.col("__row_id").alias("rid"),
                ),
            )
            touched = sorted(
                r["f"]
                for r in matched.select(
                    F.element_at(F.split("__file", "/"), -1).alias("f")
                )
                .distinct()
                .collect()
            )
        n_inserted = updates.join(
            matched.select(key_col).distinct(), key_col, "anti"
        ).count()
        changes = _write_changes(
            wh,
            database,
            table,
            matched.drop("__file")
            .withColumn("_change_type", F.lit("delete"))
            .unionByName(
                aligned_updates.withColumn(
                    "_change_type", F.lit("insert")
                )
            ),
        )
        # bound the appended batch's file count (~1M rows/file): a
        # 3-row dimension upsert must not fan into one near-empty
        # file per upstream partition
        landed = _cow_rewrite(
            wh, base,
            aligned_updates.coalesce(max(1, -(-n_batch // 1_000_000))),
            prefix="mormrg",
        )
    finally:
        matched.unpersist()
    dvf = None
    if not prev_m.get("dvs") or "dv_files" in prev_m:
        dvf = sorted(set(prev_m.get("dv_files", [])) | set(touched))
    next_v = _cow_commit(
        wh, database, table, prev_m, set(), landed, changes,
        summary=summary,
        # tombstoned files must stay live across a rebase (dv entries
        # bind to (file, row)), same contract as update_where_mor
        read_files=set(touched),
        # serializable rebase (r14): same MERGE existence-dependence
        # as the COW form — winner-added files must hold none of this
        # merge's keys
        validate_added=_added_scan_validator(
            wh, base, schema, (keys, key_col)
        ),
        dvs_override=(
            list(prev_m.get("dvs", [])) + dv_rel,
            int(prev_m.get("dv_rows", 0)) + n_updated,
            dvf,
        ),
    )
    return next_v, n_updated, n_inserted


def merge_upsert_mor(
    wh: Warehouse,
    database: str,
    table: str,
    updates: DataFrame,
    key_col: str,
    summary: dict | None = None,
) -> tuple[int, int, int]:
    """MERGE (latest-wins upsert) via merge-on-read deletion vectors +
    appended update batch — see _merge_upsert_mor_once for semantics
    and the O(matched + update rows) cost contract. Conflict-retries
    with full recompute (_retry_dml), same latest-wins reasoning as
    the COW form."""
    return _retry_dml(
        lambda: _merge_upsert_mor_once(
            wh, database, table, updates, key_col, summary=summary
        ),
        lock_key=wh._path(database, table),
    )


# --- write-audit-publish staging (Iceberg's WAP pattern, public) -----

_STAGED_DIR = "staged"


def stage_append(
    wh: Warehouse, database: str, table: str, batch: DataFrame
) -> str:
    """Write-Audit-Publish stage 1: the batch lands DURABLY under
    ``_snapshots/staged/<id>/`` — readable via read_staged for audit
    (row counts, quality gates, dedup checks), but INVISIBLE to every
    table reader and to commit_snapshot's directory listing. Publish
    atomically with publish_staged, or throw away with
    discard_staged; nothing touches the live table until publish.
    Returns the staging id.

    The batch aligns to the CURRENT table schema (try_cast,
    missing -> NULL). New columns are refused: a staged write must
    not leak schema change before its own publish — evolve with a
    regular append first.
    """
    import uuid

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    from pyspark.sql import functions as F

    schema = wh.schema(database, table)
    known = {f.name for f in schema.fields}
    extra = [c for c in batch.columns if c not in known]
    if extra:
        raise ValueError(
            f"staged append cannot add columns {extra}; evolve the "
            "table with a regular append first, then stage"
        )
    aligned = batch.select(
        *[
            (
                F.col(f.name).try_cast(f.dataType)
                if f.name in batch.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in schema.fields
        ]
    )
    sid = f"wap-{uuid.uuid4().hex[:16]}"
    aligned.write.mode("overwrite").parquet(
        f"{_snap_dir(wh, database, table)}/{_STAGED_DIR}/{sid}"
    )
    return sid


def read_staged(
    wh: Warehouse, database: str, table: str, staging_id: str
) -> DataFrame:
    """Audit view of a staged batch (WAP stage 2): exactly the rows
    publish_staged would make live."""
    d = f"{_snap_dir(wh, database, table)}/{_STAGED_DIR}/{staging_id}"
    if not hfs.is_dir(wh.spark, d):
        raise ValueError(
            f"no staged batch {staging_id!r} on {database}.{table}"
        )
    return wh.spark.read.schema(wh.schema(database, table)).parquet(d)


def publish_staged(
    wh: Warehouse,
    database: str,
    table: str,
    staging_id: str,
    stat_cols: list[str] | None = None,
) -> int:
    """WAP stage 3: move the audited files into the table under
    unique names and commit — the batch becomes visible exactly at
    the manifest PUT, as one ordinary append version (CDC consumers
    see plain inserts). File moves are renames (no data rewrite); a
    crash between the renames and the commit leaves the files to be
    adopted by the next commit, the same exposure as any append.
    The committed manifest records the staging id in its summary
    (Iceberg snapshot-summary's public design), so DESCRIBE HISTORY
    shows WAP publishes as such. Returns the published version."""
    d = f"{_snap_dir(wh, database, table)}/{_STAGED_DIR}/{staging_id}"
    # existence guard FIRST: a bogus/double-published staging id must
    # raise the documented error, not whatever a listing of a missing
    # directory happens to do on the underlying filesystem
    if not hfs.is_dir(wh.spark, d):
        raise ValueError(
            f"no staged batch {staging_id!r} on {database}.{table}"
        )
    names = [
        n for n in hfs.list_names(wh.spark, d) if n.endswith(".parquet")
    ]
    base = wh._path(database, table)
    for n in names:
        dst = f"{base}/{staging_id}-{n}"
        if not hfs.rename(wh.spark, f"{d}/{n}", dst):
            raise IOError(f"publish rename failed: {d}/{n} -> {dst}")
    hfs.delete(wh.spark, d)
    return commit_snapshot(
        wh, database, table, stat_cols=stat_cols,
        summary={"operation": "wap-publish", "staging_id": staging_id},
    )


def discard_staged(
    wh: Warehouse, database: str, table: str, staging_id: str
) -> bool:
    """WAP abort: delete the staged batch; the live table never knew
    it existed. Returns whether anything was deleted."""
    return hfs.delete(
        wh.spark,
        f"{_snap_dir(wh, database, table)}/{_STAGED_DIR}/{staging_id}",
    )


def compact_small_files(
    wh: Warehouse,
    database: str,
    table: str,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_file_bytes: int | None = None,
    sort_col: str | None = "__row_id",
    auto_fold_dvs: bool = True,
) -> dict:
    """Incremental bin-pack compaction — see _compact_small_files_once
    for the full semantics. Conflict-retries with full recompute
    (_retry_dml + the per-table commit gate, r13): a cadence job used
    to surface its lost CAS to the caller and skip the tick, which
    under saturated DML meant compaction lost MOST races and the
    small-file backlog grew (measured in mor_concurrent_churn_r13's
    first runs — 6 of 7 cadences lost); retried through the gate it
    lands like any other writer."""
    return _retry_dml(
        lambda: _compact_small_files_once(
            wh, database, table,
            small_file_bytes=small_file_bytes,
            target_file_bytes=target_file_bytes,
            sort_col=sort_col,
            auto_fold_dvs=auto_fold_dvs,
        ),
        lock_key=wh._path(database, table),
    )


def _compact_small_files_once(
    wh: Warehouse,
    database: str,
    table: str,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_file_bytes: int | None = None,
    sort_col: str | None = "__row_id",
    auto_fold_dvs: bool = True,
) -> dict:
    """Incremental bin-pack compaction as an ORDINARY copy-on-write
    commit (Iceberg's rewrite_data_files binpack strategy, public
    design): only live files smaller than ``small_file_bytes``
    rewrite into ~target-size files; larger files are untouched, and
    HISTORY IS PRESERVED — pinned readers and open CDC cursors keep
    working, unlike maintain_table's truncating full rewrite. The
    commit records an explicit empty change set (content-preserving),
    so streaming CDC consumers cross it without emitting a row.

    ``auto_fold_dvs`` (default on): when the standing deletion
    vectors trip the fold signal (dv_fold_due — dv_rows past the
    broadcast cap, or vectors naming >= 10% of live files), this
    steady-state loop runs apply_deletion_vectors FIRST, as its own
    content-preserving commit (CDC silent), then compacts the fresh
    state — so the documented 'run the fold when the signal fires'
    posture is automatic on the maintenance cadence instead of an
    operator's memory. Below the signal the vectors ride along
    untouched (the whole point of MoR is NOT paying the rewrite per
    delete).

    This is the steady-state maintenance loop for a continuously
    ingesting table: cost is proportional to the SMALL-FILE BACKLOG
    (the micro-batch debris the rotation thresholds produce), never
    to table size — at 100 TB you run this on a tight cadence and
    reserve maintain_table (full rewrite + retention truncation +
    physical reclaim) for the retention boundary. Replaced files stay
    on disk as the older versions' audit trail (retired set blocks
    re-adoption); maintain_table later reclaims them. Concurrent
    commits retry with full recompute via the public wrapper
    (compact_small_files), same as COW DML.
    Returns {version, files_rewritten, files_after, bytes_rewritten}.
    """
    from .operators.compaction import (
        DEFAULT_TARGET_FILE_BYTES,
        list_data_files,
        plan_target_files,
    )

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} is not snapshot-managed; "
            "commit_snapshot first"
        )
    base = wh._path(database, table)
    prev = _manifest(wh, database, table, vs[-1])
    if auto_fold_dvs and dv_fold_due(prev):
        apply_deletion_vectors(
            wh, database, table,
            summary={"operation": "auto-fold-dvs"},
        )
        vs = versions(wh, database, table)
        prev = _manifest(wh, database, table, vs[-1])
    files = _manifest_files(wh, database, table, prev)
    sizes = {
        p.rsplit("/", 1)[-1]: sz for p, sz in list_data_files(wh.spark, base)
    }
    small = [n for n in files if sizes.get(n, 0) < small_file_bytes]
    if len(small) < 2:
        return {
            "version": vs[-1],
            "files_rewritten": 0,
            "files_after": len(files),
            "bytes_rewritten": 0,
        }
    total = sum(sizes.get(n, 0) for n in small)
    n_target = plan_target_files(
        total,
        DEFAULT_TARGET_FILE_BYTES
        if target_file_bytes is None
        else target_file_bytes,
    )

    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(prev["schema"]))
    # rewrite-must-mask invariant (_dv_mask): packing MOVES rows into
    # new files, which would orphan their (file, row) tombstones —
    # reading through the mask physically drops tombstoned rows at
    # the move instead (visible content unchanged, changes=[] stays
    # honest; the dead vector entries match nothing until
    # apply_deletion_vectors / maintenance clears them)
    src = _dv_mask(
        wh, database, table, prev,
        wh.spark.read.schema(schema).parquet(
            *[f"{base}/{n}" for n in small]
        ),
    )
    if sort_col is not None and any(
        f.name == sort_col for f in schema.fields
    ):
        out = src.repartitionByRange(
            n_target, sort_col
        ).sortWithinPartitions(sort_col)
    else:
        out = src.coalesce(n_target)

    rewritten = _cow_rewrite(wh, base, out, prefix="pack")
    new_files = sorted(
        [n for n in files if n not in set(small)] + rewritten
    )
    # content-preserving: zero CDC rows (explicit empty change set).
    # A concurrent winner's ADDED files can never conflict with
    # packing these small files (their rows are untouched either
    # way): rebase over appends freely — the r13 rehearsal's lost
    # compaction races were exactly this shape
    next_v = _cow_commit(
        wh, database, table, prev, set(small), rewritten, [],
        validate_added="ignore",
    )
    return {
        "version": next_v,
        "files_rewritten": len(small),
        "files_after": len(new_files),
        "bytes_rewritten": total,
    }


def maintain_table(
    wh: Warehouse,
    database: str,
    table: str,
    sort_col: str | None = "__row_id",
    zorder_cols: list[str] | None = None,
    target_file_bytes: int | None = None,
    reclaim_grace_ms: int = 600_000,
    summary: dict | None = None,
) -> dict:
    """Periodic maintenance for a snapshot-managed table: TRUNCATES
    history to one fresh snapshot of the compacted layout. Returns
    the compaction stats plus the new version.

    ``reclaim_grace_ms``: unreferenced change dirs / manifest shards
    younger than this are NOT reclaimed. DML commits write their
    change files and shards BEFORE the manifest PUT (that ordering is
    what makes the PUT the single atomic commit point), so a commit in
    flight during maintenance briefly has metadata no manifest
    references yet; deleting it as debris would let the commit land a
    manifest naming missing files. The grace window (default 10 min —
    generous vs any real commit latency) means only metadata old
    enough that its owning commit either landed (now referenced) or
    died (true debris) is reclaimed; 0 restores reclaim-everything for
    quiesced tables.

    The compaction is itself a copy-on-write commit: the compacted
    layout is written to NEW file names alongside the live files, the
    manifest PUT for the new version is the single atomic commit
    point, and only AFTER that commit are old manifests expired and
    old data files physically deleted. A valid manifest therefore
    exists at every instant — concurrent snapshot readers of the
    LATEST version never observe a windowless table, and a crash at
    any step leaves either the old state (before the PUT) or the new
    state plus reclaimable orphans (after it; the new manifest's
    ``retired`` set stops commit_snapshot from re-adopting them, and
    the next maintenance deletes them). A reader PINNED to an older
    version loses that version at the expiry step — by design; it
    gets the explicit 'version not in snapshots' error, never a
    silently wrong answer. Version numbering stays MONOTONIC across
    truncation (the watermark survives in _snapshots/), so a CDC
    consumer whose from_version was truncated errs loudly too. Single
    maintenance writer assumed; run on a retention cadence, after the
    time-travel window you promise readers has passed.
    """
    import uuid

    from pyspark.sql import types as T

    from .operators.compaction import (
        DEFAULT_TARGET_FILE_BYTES,
        list_data_files,
        plan_target_files,
    )

    base = wh._path(database, table)
    vs = versions(wh, database, table)
    if not vs:
        # not yet snapshot-managed: adopt the directory as version 1
        # first so the COW rewrite below has a manifest to start from
        commit_snapshot(wh, database, table)
        vs = versions(wh, database, table)

    prev = _manifest(wh, database, table, vs[-1])
    prev_files = set(_manifest_files(wh, database, table, prev))
    retired = set(prev.get("retired", []))
    sizes = {
        p.rsplit("/", 1)[-1]: sz for p, sz in list_data_files(wh.spark, base)
    }
    total = sum(sizes.get(n, 0) for n in prev_files)
    n_target = plan_target_files(
        total,
        DEFAULT_TARGET_FILE_BYTES
        if target_file_bytes is None
        else target_file_bytes,
    )

    current = read_snapshot(wh, database, table)
    if zorder_cols:
        # multi-dimensional clustering (OPTIMIZE ZORDER's public
        # design): range-cluster on the Morton key so every compacted
        # file gets a bounded min/max rectangle in ALL the z-ordered
        # columns at once — the manifest zone maps then prune files
        # for predicates on ANY of them, not just a leading sort key
        from .operators.compaction import zorder_key

        zdf, zcol = zorder_key(current, list(zorder_cols))
        out = (
            zdf.repartitionByRange(n_target, zcol)
            .sortWithinPartitions(zcol)
            .drop(zcol, *[f"__z_{c}" for c in zorder_cols])
        )
    elif sort_col is not None and any(
        f.name == sort_col for f in current.schema.fields
    ):
        out = current.repartitionByRange(
            n_target, sort_col
        ).sortWithinPartitions(sort_col)
    else:
        out = current.coalesce(n_target)

    # COW rewrite: land in a temp dir, rename into the table under
    # fresh names (invisible to snapshot readers until the PUT)
    rewritten = _cow_rewrite(wh, base, out, prefix="compact")

    # same-snapshot numbering (see _next_version's OCC requirement):
    # maintenance is the documented single writer, but a concurrent
    # APPEND landing mid-rewrite must still fail this CAS loudly
    # rather than have its files dropped from the compacted manifest
    next_v = _next_version(wh, database, table, vs=vs)
    # recompute zone maps for the compacted layout: range-clustering on
    # sort_col is exactly what makes per-file min/max maximally
    # selective, so maintenance refreshes rather than drops them
    from pyspark.sql import types as T

    cols = prev.get("stat_cols", [])
    blooms = prev.get("bloom_cols", [])
    stats = (
        _file_stats(
            wh, base, sorted(rewritten),
            T.StructType.fromJson(json.loads(prev["schema"])), cols,
            blooms,
        )
        if (cols or blooms)
        else {}
    )
    new_manifest = {
        "version": next_v,
        # every pre-compaction file is now dead; listing them as
        # retired blocks commit_snapshot re-adoption until the
        # physical delete below (or a later maintenance) runs
        "retired": sorted(prev_files | retired),
        "schema": prev["schema"],
        # compaction preserves content exactly: an EXPLICIT empty
        # change set, so CDC consumers crossing this version emit
        # nothing (vs a pure append, where absent "changes" means
        # "the added files are the inserts")
        "changes": [],
        # prev=None: the compacted layout is all-fresh, so the entry
        # re-shards (or re-inlines) from scratch — maintenance is also
        # the shard-compaction point
        **_assemble_manifest_entry(
            wh, database, table, None, sorted(rewritten),
            added=sorted(rewritten), removed=set(),
            fresh_stats=stats, cols=cols, blooms=blooms,
        ),
    }
    if summary:
        # provenance on the truncated-to-one snapshot (and anything a
        # derived-table maintainer must re-pin across the truncation,
        # e.g. the ANN index's quantizer-sidecar pointer — history
        # before this version is gone, so the pointer must ride HERE)
        new_manifest["summary"] = dict(summary)
    if prev.get("constraints"):
        new_manifest["constraints"] = prev["constraints"]
    if prev.get("txns"):
        # idempotent-append watermarks survive history truncation
        new_manifest["txns"] = prev["txns"]
    _put_manifest(wh, database, table, new_manifest)
    # capture the change-dir / shard references of every manifest
    # ABOUT TO BE expired: those are definitively dead the moment
    # expiry removes the only manifests naming them, so they reclaim
    # unconditionally below
    dead_dirs: set = set()
    dead_dv_dirs: set = set()
    dead_shards: set = set()
    for v in versions(wh, database, table):
        if v == next_v:
            continue
        m = _manifest(wh, database, table, v)
        for rel in m.get("changes", []):
            dead_dirs.add(rel.split("/")[1])
        for rel in m.get("dvs", []):
            dead_dv_dirs.add(rel.split("/")[1])
        for rec in m.get("shards", []):
            dead_shards.add(rec["name"])
    # post-commit cleanup: drop old manifests, then old data files —
    # MINUS any file a retained manifest still references (tags are
    # retention barriers: a tag-protected version's files must stay
    # readable across maintenance; they reclaim on the first
    # maintenance after the tag is deleted, via the retired set)
    expired = expire_snapshots(wh, database, table, keep_last=1)
    protected: set = set()
    for v_keep in versions(wh, database, table):
        if v_keep != next_v:
            protected |= set(
                _manifest_files(
                    wh, database, table,
                    _manifest(wh, database, table, v_keep),
                )
            )
    for name in sorted((prev_files | retired) - protected):
        hfs.delete(wh.spark, f"{base}/{name}", recursive=False)
    # reclaim change-file dirs no retained manifest references — the
    # expired versions' CDF parquet, plus CAS-loser debris. Kept
    # change dirs are exactly the retained manifests' "changes" sets,
    # so a stream cursor inside the retention window replays fine and
    # one below it already errs loudly at the manifest read.
    # NEVER-referenced metadata gets a grace window: DML commits write
    # change files / shards BEFORE their manifest PUT, so young
    # unreferenced entries may belong to a commit in flight — deleting
    # them would let that commit land a manifest naming missing files.
    # Expired-manifest refs (dead_dirs/dead_shards) carry no such
    # ambiguity and reclaim regardless of age.
    # "Now" comes from the STORE's clock, not the driver's: the ages
    # being compared are filesystem mtimes stamped by the storage
    # service, and driver-vs-store skew would silently shrink (or
    # stretch) the window — a probe file written here and stat'ed
    # back yields the store's own timestamp, so the grace window is
    # skew-free by construction. If the probe write fails we fall
    # back to the driver clock (documented bounded-skew assumption).
    import time as _time
    import uuid as _uuid

    probe = f"{base}/{_SNAP_DIR}/.reclaim-probe-{_uuid.uuid4().hex}"
    try:
        hfs.write_text(wh.spark, probe, "")
        store_now_ms = hfs.mtime(wh.spark, probe)
        hfs.delete(wh.spark, probe, recursive=False)
    except Exception:
        store_now_ms = int(_time.time() * 1000)
    cutoff_ms = store_now_ms - reclaim_grace_ms
    chg_root = f"{base}/{_SNAP_DIR}/{_CHANGES_DIR}"
    referenced_dirs: set = set()
    for v in versions(wh, database, table):
        for rel in _manifest(wh, database, table, v).get("changes", []):
            referenced_dirs.add(rel.split("/")[1])
    for d in hfs.list_names(wh.spark, chg_root, dirs_only=True):
        if d in referenced_dirs:
            continue
        if (
            d in dead_dirs
            or hfs.mtime(wh.spark, f"{chg_root}/{d}") <= cutoff_ms
        ):
            hfs.delete(wh.spark, f"{chg_root}/{d}")
    # same for deletion-vector dirs: maintenance's full rewrite read
    # through the mask and committed a fresh manifest with no "dvs",
    # so every vector of the expired history is definitively applied
    # — reclaim dead ones unconditionally, unreferenced-young ones
    # ride the same in-flight-commit grace as change dirs
    dv_root = f"{base}/{_SNAP_DIR}/{_DV_DIR}"
    referenced_dv: set = set()
    for v in versions(wh, database, table):
        for rel in _manifest(wh, database, table, v).get("dvs", []):
            referenced_dv.add(rel.split("/")[1])
    for d in hfs.list_names(wh.spark, dv_root, dirs_only=True):
        if d in referenced_dv:
            continue
        if (
            d in dead_dv_dirs
            or hfs.mtime(wh.spark, f"{dv_root}/{d}") <= cutoff_ms
        ):
            hfs.delete(wh.spark, f"{dv_root}/{d}")
    # same for manifest shards: keep only the retained manifests'
    # shard set (history truncated to one version, so this reclaims
    # every expired-manifest shard immediately, plus unreferenced
    # debris older than the grace window; a concurrent sharded
    # commit's pre-PUT shards are inside the window and survive)
    sh_root = f"{base}/{_SNAP_DIR}/{_SHARDS_DIR}"
    referenced_shards: set = set()
    for v in versions(wh, database, table):
        for rec in _manifest(wh, database, table, v).get("shards", []):
            referenced_shards.add(rec["name"])
    for n in hfs.list_names(wh.spark, sh_root):
        if n in referenced_shards:
            continue
        if (
            n in dead_shards
            or hfs.mtime(wh.spark, f"{sh_root}/{n}") <= cutoff_ms
        ):
            hfs.delete(wh.spark, f"{sh_root}/{n}", recursive=False)
    # and for externalized-filter sidecars (r9): retained manifests
    # name their sidecars directly (bloom_sidecars), so GC never
    # opens a shard; unreferenced sidecars past the grace window are
    # lost-CAS debris or expired-version leftovers
    bl_root = f"{base}/{_SNAP_DIR}/{_BLOOMS_DIR}"
    referenced_sidecars: set = set()
    for v in versions(wh, database, table):
        referenced_sidecars |= set(
            _manifest(wh, database, table, v).get("bloom_sidecars", [])
        )
    for n in hfs.list_names(wh.spark, bl_root):
        if n in referenced_sidecars:
            continue
        if hfs.mtime(wh.spark, f"{bl_root}/{n}") <= cutoff_ms:
            hfs.delete(wh.spark, f"{bl_root}/{n}", recursive=False)
    # the dead files are physically gone: drain the retired set (a
    # crash before this re-PUT leaves stale retired names, which the
    # next commit_snapshot prunes against the directory listing).
    # Guard: a concurrent commit landing between the maintenance CAS
    # and expire_snapshots makes the maintenance version non-latest —
    # expire(keep_last=1) then already deleted ITS manifest, and a
    # blind re-PUT would resurrect an expired manifest as an extra
    # history entry the expiry decision never saw. Skip the drain in
    # that case: the newer commit inherited the retired set and the
    # next commit_snapshot prunes it against the directory anyway.
    vs_now = versions(wh, database, table)
    if vs_now and vs_now[-1] == next_v:
        still_dead = sorted(
            (prev_files | retired)
            & set(_data_files(wh, database, table))
        )
        drained = dict(new_manifest)
        drained["retired"] = still_dead
        _put_manifest(
            wh, database, table, drained,
            overwrite=True,  # same-version metadata rewrite, not a commit
        )
    return {
        "files_before": len(prev_files),
        "files_after": len(rewritten),
        "bytes_before": total,
        "bytes_after": sum(
            sz
            for p, sz in list_data_files(wh.spark, base)
            if p.rsplit("/", 1)[-1] in set(rewritten)
        ),
        "target_files": n_target,
        "expired_versions": expired,
        "reclaimed_files": len(
            (prev_files | retired) - set(rewritten) - protected
        ),
        "version": next_v,
    }


def _manifest(wh: Warehouse, database: str, table: str, v: int) -> dict:
    return json.loads(
        hfs.read_text(
            wh.spark, f"{_snap_dir(wh, database, table)}/v{v:012d}.json"
        )
    )


def read_changes(
    wh: Warehouse,
    database: str,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC between two snapshots: every row inserted or deleted going
    from ``from_version`` to ``to_version`` (latest when None),
    tagged ``_change_type`` in ('insert', 'delete'). An update made
    by merge_upsert surfaces as its delete/insert pair — the
    preimage/postimage form of a change feed.

    Incremental by construction: only the files that DIFFER between
    the two manifests are read (appends add files; copy-on-write
    DELETE/MERGE swap rewritten files), and the row-level diff is an
    exceptAll over just those files — rows in untouched files are
    never scanned, so the cost is proportional to the churn between
    the versions, not the table size. This is what lets a downstream
    pipeline consume a 100 TB table by reading only what changed
    since its last run, instead of re-scanning and re-diffing.

    Rows identical in an added and a removed file (COW rewrites carry
    the survivors into the new file) cancel in the exceptAll and
    produce no change row, which is exactly right.
    """
    vs = versions(wh, database, table)
    to_v = vs[-1] if to_version is None else to_version
    for v in (from_version, to_v):
        if v not in vs:
            raise ValueError(
                f"version {v} not in {database}.{table} snapshots {vs}"
            )
    old_m = _manifest(wh, database, table, from_version)
    new_m = _manifest(wh, database, table, to_v)
    # shard-aware diff: shards are immutable and shared by reference,
    # so shards present in BOTH manifests cancel without being opened
    # — the metadata cost of a changes read is O(churn shards)
    if "shards" in old_m and "shards" in new_m:
        old_recs = {r["name"] for r in old_m["shards"]}
        new_recs = {r["name"] for r in new_m["shards"]}
        old_files: set = set()
        for r in old_m["shards"]:
            if r["name"] not in new_recs:
                old_files |= set(
                    _read_shard(wh, database, table, r["name"])["files"]
                )
        new_files: set = set()
        for r in new_m["shards"]:
            if r["name"] not in old_recs:
                new_files |= set(
                    _read_shard(wh, database, table, r["name"])["files"]
                )
    else:
        old_files = set(_manifest_files(wh, database, table, old_m))
        new_files = set(_manifest_files(wh, database, table, new_m))
    base = wh._path(database, table)

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(new_m["schema"]))

    def read_files(names: set, file_schema: str):
        if not names:
            return wh.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(file_schema))
            )
        return wh.spark.read.schema(
            T.StructType.fromJson(json.loads(file_schema))
        ).parquet(*[f"{base}/{n}" for n in sorted(names)])

    added = read_files(new_files - old_files, new_m["schema"])
    removed = read_files(old_files - new_files, old_m["schema"])
    # schema evolution between the versions: align the old rows to
    # the new schema — missing columns read as NULL, TYPE-changed
    # columns cast to the new type (exceptAll requires identical
    # types; without the cast a widened column either throws an
    # AnalysisException or, worse, diffs as a spurious full
    # delete+insert), dropped columns fall away in the select
    removed = removed.select(
        *[
            (
                F.col(f.name).cast(f.dataType)
                if f.name in removed.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in schema.fields
        ]
    )

    # deletion-vector awareness, two parts (derivation: visible(v) =
    # files(v) minus tombstones(v), and the diff must be over VISIBLE
    # rows):
    # (1) each side of the file diff masks with ITS OWN manifest's
    #     vectors — a tombstoned row in a removed file was already
    #     invisible at from_version (its delete was emitted when the
    #     vector committed), and a tombstoned row in an added file
    #     was never visible at all. This also makes
    #     apply_deletion_vectors' rewrite cancel exactly (clean new
    #     files vs masked old files), like compaction.
    # (2) vectors added/dropped over files the span did NOT touch
    #     are pure visibility changes with no file diff to catch
    #     them: their rows read from the (unchanged) files named by
    #     the delta vectors — deletes for new tombstones, inserts
    #     for dropped ones (rollback's restore). Cost stays
    #     churn-proportional: only delta-named files are read.
    added = _dv_mask(wh, database, table, new_m, added)
    removed = _dv_mask(wh, database, table, old_m, removed)
    churn = (old_files - new_files) | (new_files - old_files)
    old_dv = old_m.get("dvs", [])
    new_dv = new_m.get("dvs", [])

    def _dv_delta_rows(rels: list[str]):
        if not rels or "__row_id" not in schema.names:
            return None
        d = _dv_frame(wh, database, table, rels)
        cand = {
            r["file"] for r in d.select("file").distinct().collect()
        } - churn
        # ... and live in BOTH manifests (r11 advisory fix): a vector
        # entry can outlive its file — an earlier span's COW/compaction
        # retires the file (dead tombstone), then a later metadata-only
        # clear (apply_deletion_vectors with no live rewrite) drops the
        # vector. Subtracting only THIS span's churn would make that
        # clear's dv_ins read the RETIRED file and emit its MoR-deleted
        # rows as phantom inserts across a content-preserving commit —
        # or fail outright once maintenance reclaims the file. A
        # visibility change needs the file live on both sides; the
        # membership probes are shard-range-bounded (_manifest_has),
        # keeping the metadata cost O(churn), never O(table).
        names = sorted(
            _manifest_has(wh, database, table, old_m, cand)
            & _manifest_has(wh, database, table, new_m, cand)
        )
        if not names:
            return None
        rows = read_files(set(names), new_m["schema"]).withColumn(
            "__dv_file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        return rows.join(
            d,
            (rows["__dv_file"] == d["file"])
            & (rows["__row_id"] == d["rid"]),
            "semi",
        ).drop("__dv_file")

    dv_del = _dv_delta_rows(
        [p for p in new_dv if p not in set(old_dv)]
    )
    dv_ins = _dv_delta_rows(
        [p for p in old_dv if p not in set(new_dv)]
    )

    inserts = added.exceptAll(removed).withColumn(
        "_change_type", F.lit("insert")
    )
    deletes = removed.exceptAll(added).withColumn(
        "_change_type", F.lit("delete")
    )
    if dv_del is not None:
        deletes = deletes.unionAll(
            dv_del.withColumn("_change_type", F.lit("delete"))
        )
    if dv_ins is not None:
        inserts = inserts.unionAll(
            dv_ins.withColumn("_change_type", F.lit("insert"))
        )
    return inserts.unionAll(deletes)


def orphan_files(
    wh: Warehouse, database: str, table: str
) -> dict[str, list[str]]:
    """Audit the table directory against its live manifests: which
    data files on disk does NO retained version reference, and which
    of those are known COW-retired (still needed only as the older
    versions' audit trail) vs true orphans (crash debris from an
    interrupted rewrite — safe to delete immediately).

    The dry-run half of VACUUM: at scale you run this on a cadence
    and alert on growth, then let maintenance (or a manual delete of
    the ``orphaned`` list) reclaim. Read-only; listing + manifest
    reads, no data scan. Also audits METADATA debris under
    ``_snapshots/``: change-file dirs and manifest shards no retained
    version references (expiry leftovers / CAS-loser writes), and
    interrupted-rewrite temp dirs (``rw-*`` + the appends' dot-stage
    dirs) — the crash residue classes the engine can produce.
    """
    disk = set(_data_files(wh, database, table))
    referenced: set = set()
    retired: set = set()
    ref_chg_dirs: set = set()
    ref_dv_dirs: set = set()
    ref_shards: set = set()
    for v in versions(wh, database, table):
        m = _manifest(wh, database, table, v)
        referenced |= set(_manifest_files(wh, database, table, m))
        retired |= set(m.get("retired", []))
        for rel in m.get("changes", []):
            ref_chg_dirs.add(rel.split("/")[1])
        for rel in m.get("dvs", []):
            ref_dv_dirs.add(rel.split("/")[1])
        for rec in m.get("shards", []):
            ref_shards.add(rec["name"])
    snapd = _snap_dir(wh, database, table)
    chg_debris = sorted(
        d
        for d in hfs.list_names(
            wh.spark, f"{snapd}/{_CHANGES_DIR}", dirs_only=True
        )
        if d not in ref_chg_dirs
    )
    dv_debris = sorted(
        d
        for d in hfs.list_names(
            wh.spark, f"{snapd}/{_DV_DIR}", dirs_only=True
        )
        if d not in ref_dv_dirs
    )
    shard_debris = sorted(
        n
        for n in hfs.list_names(wh.spark, f"{snapd}/{_SHARDS_DIR}")
        if n not in ref_shards
    )
    base = wh._path(database, table)
    rewrite_debris = sorted(
        [
            f"{_SNAP_DIR}/{d}"
            for d in hfs.list_names(wh.spark, snapd, dirs_only=True)
            if d.startswith("rw-")
        ]
        + [
            d
            for d in hfs.list_names(wh.spark, base, dirs_only=True)
            if d.startswith(".stage-")
        ]
    )
    return {
        "referenced": sorted(referenced & disk),
        "retired": sorted((retired & disk) - referenced),
        "orphaned": sorted(disk - referenced - retired),
        "missing": sorted(referenced - disk),
        "change_dirs_orphaned": chg_debris,
        "dv_dirs_orphaned": dv_debris,
        "shards_orphaned": shard_debris,
        "rewrite_tmp_dirs": rewrite_debris,
    }


def history(wh: Warehouse, database: str, table: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per retained snapshot — version,
    commit wall-clock, file/retired counts, and whether the commit
    carries zone-map stats. Metadata reads only (manifest per
    version; never a data scan); the operational at-a-glance view a
    table owner checks before time travel, rollback, or debugging a
    CDC consumer."""
    rows = []
    for v in versions(wh, database, table):
        m = _manifest(wh, database, table, v)
        summ = m.get("summary", {})
        rows.append(
            (
                v,
                float(m["committed_at"]) if "committed_at" in m else None,
                _manifest_n_files(m),
                len(m.get("retired", [])),
                bool(m.get("stat_cols")),
                summ.get("operation"),
                summ.get("staging_id"),
            )
        )
    return wh.spark.createDataFrame(
        rows,
        "version long, committed_at double, n_files long, "
        "n_retired long, has_stats boolean, operation string, "
        "staging_id string",
    )


def files_table(
    wh: Warehouse,
    database: str,
    table: str,
    version: int | None = None,
) -> DataFrame:
    """The ``files`` METADATA TABLE (Iceberg's files/data_files
    table, Delta's DESCRIBE DETAIL per-file form — public designs):
    one row per live data file of the version, with size, row count,
    and per-stat-column min/max/null-count from the manifest. A
    metadata read only — manifests and (for sharded tables) shard
    JSONs, never a data file — so at 100 TB it stays a driver-side
    fold. The operational view for layout debugging: file-size
    skew before a binpack, clustering quality before a z-order,
    row-count drift after heavy churn. Files committed before
    row-count stats were recorded show null rows (back-fill by
    touching them with any stats-carrying commit, or use
    stats_agg(allow_scan=True) for the aggregate view).

    Columns: file, size_bytes, rows, plus min_<c>/max_<c>/
    null_count_<c> (STRING-rendered min/max — one stable schema
    across arbitrary stat-column types) for each stat column."""
    from pyspark.sql import types as T

    from .operators.compaction import list_data_files

    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(f"{database}.{table} has no snapshots")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"version {v} not in {database}.{table} snapshots {vs}"
        )
    m = _manifest(wh, database, table, v)
    stat_cols = m.get("stat_cols", [])
    names = _manifest_files(wh, database, table, m)
    stats = _manifest_stats(wh, database, table, m)
    base = wh._path(database, table)
    sizes = {
        p.rsplit("/", 1)[-1]: sz
        for p, sz in list_data_files(wh.spark, base)
    }
    fields = [
        T.StructField("file", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("rows", T.LongType(), True),
    ]
    for c in stat_cols:
        fields += [
            T.StructField(f"min_{c}", T.StringType(), True),
            T.StructField(f"max_{c}", T.StringType(), True),
            T.StructField(f"null_count_{c}", T.LongType(), True),
        ]
    rows = []
    for n in names:
        rec = stats.get(n, {})
        row: list = [n, sizes.get(n), rec.get("__rows")]
        for c in stat_cols:
            rng = rec.get(c, [None, None])
            row += [
                None if rng[0] is None else str(rng[0]),
                None if rng[1] is None else str(rng[1]),
                rec.get(f"{c}__nulls"),
            ]
        rows.append(tuple(row))
    return wh.spark.createDataFrame(rows, T.StructType(fields))


_TTL_FILE = "ttl.json"


def set_ttl(
    wh: Warehouse,
    database: str,
    table: str,
    ts_col: str,
    keep_seconds: float,
) -> None:
    """Row-level TTL policy (ClickHouse MergeTree ``TTL ts +
    INTERVAL``, Delta-style retention DELETEs — public designs):
    rows whose ``ts_col`` falls behind the rolling window become
    deletable by ``apply_ttl``. Stored as TABLE CONFIG in a sidecar
    (``_snapshots/ttl.json``, atomic PUT) — like constraints it is
    policy, not version content: it survives rollback and
    maintenance, and ``clear_ttl`` removes it.

    Expiry itself is an ordinary copy-on-write DELETE commit, so it
    is atomic, time-travel-auditable, CDC-visible (downstream MVs
    see the expired rows as deletes and stay consistent — the reason
    TTL must NOT be a silent file drop). On a time-clustered layout
    (the normal case for event tables) the COW delete's survivor
    rewrite is bounded by parquet row-group stats: expiry rewrites
    only files the cutoff actually crosses, and fully-expired files
    drop from the manifest without a rewrite."""
    vs = versions(wh, database, table)
    if not vs:
        raise ValueError(
            f"{database}.{table} has no snapshots — TTL attaches to "
            "snapshot tables"
        )
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(
        json.loads(_manifest(wh, database, table, vs[-1])["schema"])
    )
    f = next((f for f in schema.fields if f.name == ts_col), None)
    if f is None:
        raise ValueError(f"TTL column {ts_col!r} not in table schema")
    kind = f.dataType.simpleString()
    if not (kind.startswith("timestamp") or kind == "date"):
        raise ValueError(
            f"TTL column {ts_col!r} must be timestamp/date, is {kind}"
        )
    if keep_seconds <= 0:
        raise ValueError("keep_seconds must be positive")
    hfs.put_text_atomic(
        wh.spark,
        f"{_snap_dir(wh, database, table)}/{_TTL_FILE}",
        json.dumps({"col": ts_col, "keep_seconds": keep_seconds}),
    )


def table_ttl(wh: Warehouse, database: str, table: str) -> dict | None:
    """The table's TTL policy, or None."""
    try:
        return json.loads(
            hfs.read_text(
                wh.spark,
                f"{_snap_dir(wh, database, table)}/{_TTL_FILE}",
            )
        )
    except Exception:
        return None


def clear_ttl(wh: Warehouse, database: str, table: str) -> bool:
    """Remove the TTL policy (no further expiry; data already
    expired stays expired). Returns False when none was set."""
    return hfs.delete(
        wh.spark,
        f"{_snap_dir(wh, database, table)}/{_TTL_FILE}",
        recursive=False,
    )


def apply_ttl(
    wh: Warehouse,
    database: str,
    table: str,
    now: float | None = None,
) -> dict:
    """Expire rows per the table's TTL policy: one COW DELETE of
    ``ts_col < now - keep_seconds``, committed with an
    ``operation: ttl-expiry`` summary. ``now`` is epoch seconds or
    a datetime in the column's wall clock (defaults to the driver
    clock; pass an explicit instant for deterministic/backfill runs
    — and note the same clock-source caveat as the maintenance
    reclaim window). Run it from the
    maintenance cadence, before compaction, so expired rows never
    compact back into fresh files. Returns {version, rows_expired,
    cutoff} (version None when nothing expired — TTL is a no-op
    commit-wise then, keeping history churn proportional to actual
    expiry)."""
    cfg = table_ttl(wh, database, table)
    if cfg is None:
        raise ValueError(
            f"{database}.{table} has no TTL policy (set_ttl first)"
        )
    import datetime as _dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    vs = versions(wh, database, table)
    schema = T.StructType.fromJson(
        json.loads(_manifest(wh, database, table, vs[-1])["schema"])
    )
    kind = next(
        f.dataType.simpleString()
        for f in schema.fields
        if f.name == cfg["col"]
    )
    # the cutoff literal is built IN THE COLUMN'S TYPE: tz-aware
    # timestamps compare on the instant; ntz/date columns compare on
    # wall time (``now`` as a datetime is taken as the same wall
    # clock the column holds; an epoch ``now`` round-trips through
    # the session timezone, which is an identity on the wall time)
    if isinstance(now, _dt.datetime):
        cut_lit = F.lit(
            now - _dt.timedelta(seconds=cfg["keep_seconds"])
        )
        cutoff = None
    else:
        cutoff = (
            time.time() if now is None else now
        ) - cfg["keep_seconds"]
        cut_lit = F.timestamp_seconds(F.lit(cutoff))
    if kind in ("timestamp_ntz", "date"):
        cut_lit = cut_lit.cast(kind)
    pred = F.col(cfg["col"]) < cut_lit
    # cheap existence probe first (parquet row-group stats short-
    # circuit the limit-1 scan): a no-expiry cycle commits nothing,
    # so running apply_ttl on a cadence costs history churn only
    # when rows actually expire
    if read_snapshot(wh, database, table).filter(pred).limit(1).count() == 0:
        return {"version": None, "rows_expired": 0, "cutoff": cutoff}
    v, n = delete_where(
        wh, database, table, pred,
        summary={
            "operation": "ttl-expiry",
            "cutoff": cutoff if cutoff is not None else str(now),
        },
    )
    return {"version": v, "rows_expired": n, "cutoff": cutoff}


_SAVEPOINTS_DIR = "_savepoints"


def create_savepoint(
    wh: Warehouse,
    name: str,
    tables: list,
) -> dict:
    """A CROSS-TABLE SAVEPOINT: one named cut pinning a version of
    EVERY listed table (the multi-table form of a tag — what a
    training run freezes: "documents v41 + embeddings v17 + events
    v102, together"). Written as one atomic JSON under
    ``<warehouse>/_savepoints/``, and each member version is also
    TAGGED (``sp-<name>``) so the savepoint inherits the tags'
    retention barrier: maintenance can never reclaim any member's
    files while the savepoint exists.

    Consistency contract, stated honestly: each member is pinned at
    its latest committed version AT CAPTURE TIME — per-table
    snapshot isolation (no torn reads within any table), not a
    cross-table transaction (a commit landing between two captures
    is visible in one table and not the other; quiesce writers or
    re-create the savepoint if that matters). ``tables`` is a list
    of (database, table) pairs. Returns {\"<db>.<table>\": version}."""
    if not _TAG_RE.match(name):
        raise ValueError(
            f"invalid savepoint name {name!r} "
            "(want [A-Za-z0-9][A-Za-z0-9._-]*, max 64 chars)"
        )
    pinned: dict = {}
    tagged: list = []
    try:
        for database, table in tables:
            vs = versions(wh, database, table)
            if not vs:
                raise ValueError(
                    f"{database}.{table} has no snapshots to pin"
                )
            v = tag_snapshot(
                wh, database, table, f"sp-{name}", version=vs[-1]
            )
            tagged.append((database, table))
            pinned[f"{database}.{table}"] = v
    except Exception:
        for database, table in tagged:
            delete_tag(wh, database, table, f"sp-{name}")
        raise
    path = f"{wh.root}/{_SAVEPOINTS_DIR}/{name}.json"
    ok = hfs.put_text_atomic(
        wh.spark,
        path,
        json.dumps({"tables": pinned, "created_at": time.time()}),
        overwrite=False,
    )
    if not ok:
        for database, table in tagged:
            delete_tag(wh, database, table, f"sp-{name}")
        raise ValueError(f"savepoint {name!r} already exists")
    return pinned


def savepoint(wh: Warehouse, name: str) -> dict:
    """The savepoint's pinned versions {\"db.table\": version}."""
    try:
        return json.loads(
            hfs.read_text(
                wh.spark, f"{wh.root}/{_SAVEPOINTS_DIR}/{name}.json"
            )
        )["tables"]
    except ValueError:
        raise
    except Exception:
        raise ValueError(f"no savepoint {name!r}")


def list_savepoints(wh: Warehouse) -> list:
    """Names of existing savepoints."""
    try:
        return sorted(
            n[:-5]
            for n in hfs.list_names(
                wh.spark, f"{wh.root}/{_SAVEPOINTS_DIR}"
            )
            if n.endswith(".json")
        )
    except Exception:
        return []


def read_savepoint(
    wh: Warehouse, name: str, database: str, table: str
) -> DataFrame:
    """Read one member table AS OF the savepoint's pinned version."""
    pinned = savepoint(wh, name)
    key = f"{database}.{table}"
    if key not in pinned:
        raise ValueError(
            f"savepoint {name!r} does not pin {key} "
            f"(pins: {sorted(pinned)})"
        )
    return read_snapshot(wh, database, table, version=pinned[key])


def delete_savepoint(wh: Warehouse, name: str) -> bool:
    """Drop the savepoint and release every member tag (the next
    maintenance on each table reclaims whatever only the savepoint
    kept alive). Returns False when it didn't exist."""
    try:
        pinned = savepoint(wh, name)
    except ValueError:
        return False
    for key in pinned:
        database, table = key.split(".", 1)
        delete_tag(wh, database, table, f"sp-{name}")
    return hfs.delete(
        wh.spark,
        f"{wh.root}/{_SAVEPOINTS_DIR}/{name}.json",
        recursive=False,
    )
