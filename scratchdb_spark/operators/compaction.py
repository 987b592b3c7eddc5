"""Small-file compaction (OPTIMIZE-style bin packing) for ingest output.

The reference's micro-batch ingest rotates a buffer file per
(database, table) on size/rows/age thresholds and appends each batch
to the destination (pkg/datasink/filesystem/filesystem.go:191-205,
pkg/workers/workers.go:64-116) — so a continuously-ingesting table
accumulates one small file per micro-batch. At 100 TB that layout is
scan-hostile: per-file open/footer overhead and tiny row groups
dominate, and min/max pruning is useless because every file spans the
whole key range. Warehouses solve this with a maintenance pass
(Delta/Iceberg OPTIMIZE); this module is the engine-native equivalent
for the parquet tables our ingest writes.

All filesystem access goes through the Hadoop FileSystem API (not
os.walk), so the same code compacts local dirs, HDFS, or s3a:// paths
on a cluster.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every data file directly under `path`,
    skipping _SUCCESS / hidden files. Local paths use os.scandir
    (DirEntry.stat is cached on Linux — no extra syscall per file);
    the JVM walk's py4j round trips are ~0.3 ms/entry, which
    maintenance cannot afford at 100k files (fs.py module docstring)."""
    from .. import fs as hfs

    lp = hfs._local_path(path)
    if lp is not None:
        try:
            with os.scandir(lp) as it:
                # startswith((_, .)) already hides Hadoop's
                # .<name>.crc checksum sidecars along with _SUCCESS
                return [
                    (f"{lp.rstrip('/')}/{e.name}", e.stat().st_size)
                    for e in it
                    if e.is_file() and not e.name.startswith(("_", "."))
                ]
        except FileNotFoundError:
            return []
    fs, hpath, _ = _fs(spark, path)
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def plan_target_files(total_bytes: int, target_file_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def _atomic_swap(spark: SparkSession, path: str, out) -> None:
    """Write `out` to a temp dir and swap it in with two renames, so a
    concurrent reader sees either the old or the new complete
    directory, never a half-written one.

    Table METADATA survives the swap: underscore-prefixed entries
    (`_snapshots/` manifests + version watermark, `_schema.json`
    sidecar) are COPIED from the live directory into the temp dir
    BEFORE the swap — spark.read.parquet ignores them, but losing them
    would reset snapshot version numbering (silently corrupting CDC
    cursors that remember a from_version) and drop the authoritative
    schema. Copy-before-swap makes the two renames the ONLY commit
    point: a failure at any step before rename 2 leaves the live
    directory (metadata included) untouched, and after rename 2 the
    new directory is already complete, so the backup delete can never
    destroy the sole metadata copy. Single maintenance writer assumed
    (concurrent compactions of one table race the renames)."""
    tmp = path.rstrip("/") + ".__compact_tmp__"
    bak = path.rstrip("/") + ".__compact_bak__"
    out.write.mode("overwrite").parquet(tmp)

    fs, hpath, jvm = _fs(spark, path)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    bak_p = jvm.org.apache.hadoop.fs.Path(bak)
    conf = spark._jsc.hadoopConfiguration()
    # carry metadata into tmp BEFORE the swap (copy, not rename: the
    # live directory stays intact until the swap commits)
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("_") and name != "_SUCCESS":
            dst = jvm.org.apache.hadoop.fs.Path(
                f"{tmp.rstrip('/')}/{name}"
            )
            if not jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, st.getPath(), fs, dst, False, conf
            ):
                raise IOError(
                    f"compaction metadata carry failed: "
                    f"{st.getPath()} -> {dst} (live table untouched)"
                )
    if not fs.rename(hpath, bak_p):
        raise IOError(f"compaction swap failed: {path} -> {bak}")
    if not fs.rename(tmp_p, hpath):
        if not fs.rename(bak_p, hpath):  # roll back
            raise IOError(
                f"compaction rollback ALSO failed; recover manually by "
                f"renaming {bak} back to {path}"
            )
        raise IOError(f"compaction swap failed: {tmp} -> {path}")
    # the new live dir is complete (data + metadata); losing the
    # backup delete leaves only a stale .__compact_bak__ dir behind
    fs.delete(bak_p, True)


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    sort_col: str | None = None,
) -> dict:
    """Rewrite the parquet directory at `path` into ~target-size files.

    Without `sort_col` the rewrite uses coalesce() — a narrow
    dependency, so compaction moves no bytes through a shuffle.
    With `sort_col` it uses repartitionByRange + sortWithinPartitions:
    one shuffle buys a clustered layout whose per-file min/max stats
    make future range predicates on that column prune files (the
    Spark-native analogue of the reference's ClickHouse MergeTree
    ORDER BY, destinations/clickhouse/destination.go:16-17).

    The rewrite lands in a temp dir first and is swapped in with two
    renames, so a concurrent reader sees either the old or the new
    complete directory, never a half-written one.
    """
    files_before = list_data_files(spark, path)
    total = sum(sz for _, sz in files_before)
    n_target = plan_target_files(total, target_file_bytes)

    df = spark.read.parquet(path)
    if sort_col is not None:
        out = df.repartitionByRange(n_target, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.coalesce(n_target)

    _atomic_swap(spark, path, out)

    files_after = list_data_files(spark, path)
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "bytes_before": total,
        "bytes_after": sum(sz for _, sz in files_after),
        "target_files": n_target,
    }


def _quantile_cutpoints(df, c: str, n_buckets: int) -> list:
    """``n_buckets - 1`` ascending cutpoints for column ``c``, computed
    WITHOUT any global sort. Numeric columns use approxQuantile
    (Greenwald-Khanna: one scan, mergeable per-partition summaries,
    driver receives only the cutpoint list). Other orderable types
    (string/date/...) use a bounded random sample fetched via
    orderBy(rand).limit(k) — Spark plans that as TakeOrdered (per-
    partition top-k merged on the driver), never a single-partition
    sort — and take empirical quantiles of the sample on the driver.
    Repeated cutpoints from skewed distributions are collapsed, so a
    heavily-skewed column just uses fewer effective buckets."""
    from pyspark.sql import types as T

    probs = [i / n_buckets for i in range(1, n_buckets)]
    field = df.schema[c]
    if isinstance(field.dataType, T.NumericType):
        cuts = df.stat.approxQuantile(c, probs, 1.0 / (4 * n_buckets))
    else:
        k = n_buckets * 32  # ~32 samples/bucket: quantile error well
        # under one bucket width with high probability
        sample = sorted(
            r[0]
            for r in df.select(c)
            .na.drop()
            .orderBy(F.rand(20240814))
            .limit(k)
            .collect()
        )
        if not sample:
            return []
        cuts = [
            sample[min(len(sample) - 1, int(p * len(sample)))]
            for p in probs
        ]
    out: list = []
    for v in cuts:
        if v is not None and (not out or v > out[-1]):
            out.append(v)
    return out


def zorder_key(df, cols: list[str], bits: int = 8):
    """Z-order (Morton) key column over 2+ dimensions for multi-column
    data clustering — the OPTIMIZE ZORDER analogue for plain parquet.

    Each column is quantile-bucketized to a ``bits``-bit integer, then
    the bit planes interleave into one BIGINT. Range-clustering files
    on this key gives every file a bounded min/max rectangle in ALL
    the z-ordered dimensions at once, so row-group/file pruning works
    for predicates on any single one — the property a single-column
    sort only provides for its leading column.

    100 TB shape: the driver fetches ~2^bits cutpoints per dimension
    once (approxQuantile — one scan with mergeable partition
    summaries; a bounded TakeOrdered sample for non-numeric types),
    and the per-row key is pure codegen — count-of-cutpoints-below
    over a literal array plus the bit interleave. NO window functions
    and NO single-partition exchange anywhere in the key stage: the
    earlier percent_rank formulation sorted the whole table into one
    task per z-ordered column, which inside maintain_table is exactly
    where a large table would die. Quantile bucketization also keeps
    skewed distributions spread across the grid, same as rank did.
    Default 8 bits = 256 buckets/dim: resolution only needs to exceed
    the target file count a few-fold for file-level pruning; raise it
    if clustering into >10k files.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    # The interleaved key must fit in the 64-bit BIGINT: JVM shiftleft
    # wraps the shift amount mod 64, so bits * len(cols) > 63 would
    # silently alias high bit planes into low positions and corrupt
    # the key. Auto-narrow per-column resolution instead.
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(
            f"zorder_key over {len(cols)} columns cannot fit even one "
            "bit plane per column in a 64-bit key; z-order fewer columns"
        )

    maxv = (1 << bits) - 1
    ranked = df
    qcols = []
    for c in cols:
        qc = f"__z_{c}"
        cuts = _quantile_cutpoints(df, c, 1 << bits)
        if not cuts:
            # constant / all-null / empty column: one bucket
            bucket = F.lit(0).cast("long")
        else:
            # bucket = #cutpoints <= value (0..len(cuts)), evaluated
            # as a literal-array filter — whole-stage codegen, no
            # shuffle; NULLs compare to nothing and land in bucket 0
            # (same position rank-ordering gave them). Low-cardinality
            # columns collapse to few effective buckets, so RESCALE to
            # the full bits range: Morton locality is NOT invariant to
            # bucket placement — values confined to the low corner
            # leave the top bit planes (the curve's primary
            # subdivisions) unused and measurably worsen clustering.
            arr = F.array(*[F.lit(v) for v in cuts])
            bucket = F.round(
                F.size(F.filter(arr, lambda x: x <= F.col(c)))
                * maxv
                / len(cuts)
            ).cast("long")
        ranked = ranked.withColumn(qc, bucket)
        qcols.append(qc)
    # interleave: output bit (i * n_cols + j) = bit i of column j
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, qc in enumerate(qcols):
            src_bit = F.shiftrightunsigned(F.col(qc), i).bitwiseAND(one)
            z = z.bitwiseOR(
                F.shiftleft(src_bit, i * len(cols) + j).cast("long")
            )
    return ranked.withColumn("__zkey", z), "__zkey"


def compact_path_zorder(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `path` range-clustered on the z-order key of `cols`:
    multi-dimensional clustering so min/max pruning works on each
    z-ordered column independently. Returns the new file count."""
    files = list_data_files(spark, path)
    total = sum(sz for _, sz in files)
    n_target = plan_target_files(total, target_file_bytes)
    df = spark.read.parquet(path)
    zdf, zcol = zorder_key(df, cols)
    out = (
        zdf.repartitionByRange(n_target, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol, *[f"__z_{c}" for c in cols])
    )
    _atomic_swap(spark, path, out)
    return n_target
