"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is non-reproducible across cluster layouts (it samples
per-partition), which is unacceptable for training-data lineage: the
same document must land in the same split on every run, every cluster
size, and in every engine that audits the data. The standard fix is
content-addressed splitting: bucket = md5(key) mod N. md5 is defined
identically everywhere, so the assignment is portable (the DuckDB
oracle reproduces it bit-for-bit) and stable under repartitioning.

Spark side stays JVM-only: ``md5``/``substring``/``conv`` are built-in
expressions inside whole-stage codegen — no Python UDF in the path, so
the split scales linearly with no shuffle at all (a pure map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from the first 8 md5 hex chars
    of the key's string form (32 uniform bits — plenty for splitting)."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).alias("bucket")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    grid: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: a row is kept iff its
    md5-bucket (over ``grid`` buckets) falls below
    ``fraction[stratum] * grid``.

    Unlike ``df.sampleBy`` (per-partition RNG), the decision is a pure
    function of the row key — reproducible across runs, engines, and
    cluster layouts, and auditable after the fact (lineage: you can
    prove exactly why a row is in the training set). A pure map, no
    shuffle.
    """
    bucket = hash_bucket(F.col(key_col), grid)
    expr = None
    for name, frac in fractions.items():
        cond = (F.col(strata_col) == name) & (
            bucket < int(round(frac * grid))
        )
        expr = cond if expr is None else expr | cond
    if default_fraction > 0:
        known = F.col(strata_col).isin(*fractions.keys())
        expr = expr | (
            ~known & (bucket < int(round(default_fraction * grid)))
        )
    return df.filter(expr)


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col`` assigning each row to a named split.

    ``fractions`` maps split name -> fraction (must sum to <= 1.0);
    assignment is by cumulative percent bucket, e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` -> buckets
    [0,90) / [90,95) / [95,100).
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = hash_bucket(F.col(key_col), 100)
    expr = None
    cum = 0
    for name, frac in fractions.items():
        cum += int(round(frac * 100))
        cond = bucket < cum
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return df.withColumn(split_col, expr.otherwise(F.lit("holdout")))


def balance_classes(
    df: DataFrame,
    label_col: str,
    id_col: str,
    cap: int,
    salt_chars: int = 2,
) -> DataFrame:
    """Class-balanced downsampling: keep at most ``cap`` rows per
    label, chosen by content-addressed order (md5 of the id) — the
    mixture-balancing primitive for training-data recipes (cap the
    over-represented classes, keep small classes whole).

    Deterministic and engine-portable for the same reason as
    hash_split: md5 order is identical everywhere, unlike
    ``ORDER BY rand()``.

    Scale shape (r10 — was a per-label global rank, i.e. ONE sort
    task per label, so a dominant class pushes ~its share of 100 TB
    through a single task; the same pattern class as epoch_shuffle's
    r9 fix): two-phase salted top-``cap``. The salt is the first
    ``salt_chars`` hex chars of the ordering key itself, so phase 1
    ranks inside PARTITIONED windows on (label, salt) — 16^salt_chars
    concurrent bounded sorts per label, md5 uniformity balances
    them — and keeps the ``cap`` key-smallest per (label, salt).
    Phase 2 ranks the survivors per label: at most cap x 16^salt_chars
    rows per label regardless of corpus size, so its per-label sort
    task is CAP-BOUNDED, not data-bounded. Output is bit-identical to
    the single-window form because md5 order (id tie-break) is total:
    every row of a label's global top-``cap`` is also in its salt's
    top-``cap`` (within-salt rank <= global rank), so phase 1 never
    drops a winner and phase 2 selects exactly the global top-``cap``.
    No partitionless window anywhere (pytest-pinned:
    test_balance_classes_plan_windows_partition_on_label_salt).
    """
    from pyspark.sql.window import Window

    key = F.md5(F.col(id_col).cast("string"))
    salt = F.substring(key, 1, salt_chars)
    w1 = Window.partitionBy(label_col, "__salt").orderBy(
        "__key", F.col(id_col)
    )
    survivors = (
        df.withColumn("__key", key)
        .withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(label_col).orderBy("__key", F.col(id_col))
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__key")
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic epoch-seeded global shuffle for training-data
    ordering: every row gets `shuffle_rank` (1-based, dense over the
    corpus) from ordering by md5(epoch || ':' || id) — a different
    but REPRODUCIBLE permutation per epoch, identical on any cluster,
    partitioning, or engine (the property torch-style RNG shuffles
    lose the moment worker counts change).

    Scale shape (r9 — was a partitionless Window, i.e. ONE
    single-partition sort task at 100 TB): the global rank is now the
    two-pass prefix-bucket construction. The bucket is the first
    ``prefix_chars`` hex chars of the shuffle key itself, so global
    key order == (bucket, key) order BY CONSTRUCTION — no
    repartitionByRange sampling, no sampled boundaries to reproduce.
    Pass 1 counts rows per bucket (ONE map-side-combined aggregate;
    16^prefix_chars rows collected — 256 at the default, bump to 3-4
    chars for 4k/64k-way parallelism at 100 TB). Pass 2 ranks within
    each bucket (a PARTITIONED window — 16^prefix_chars concurrent
    sorts of ~N/buckets rows, md5 uniformity balances them) and adds
    the bucket's cumulative offset via a literal map lookup (JVM-side,
    broadcast-free). Output is bit-identical to the global-rank form;
    the plan contains no SinglePartition exchange (pytest-pinned).
    """
    key = F.md5(
        F.concat(
            F.lit(str(int(epoch))), F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    bucket = F.substring(key, 1, prefix_chars)
    keyed = df.withColumn("shuffle_key", key).withColumn(
        "__bkt", bucket
    )
    # pass 1: per-bucket counts -> cumulative offsets (bounded
    # collect: 16^prefix_chars rows, 256 default)
    counts = {
        r["__bkt"]: r["cnt"]
        for r in keyed.groupBy("__bkt").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    if not counts:  # empty input: rank column exists, no rows
        return keyed.withColumn(
            "shuffle_rank", F.lit(None).cast("long")
        ).drop("__bkt")
    offsets: dict[str, int] = {}
    cum = 0
    for b in sorted(counts):
        offsets[b] = cum
        cum += counts[b]
    # pass 2: partitioned rank + offset — no partitionless window.
    # The offset lookup is a literal map while it stays plan-sized
    # (256 entries at the default 2-char prefix); at 3-4 chars
    # (4k/65k buckets) a literal that wide bloats the Catalyst plan,
    # so the offsets ride a broadcast-joined frame instead — same
    # values, same partitioned-window shape either way.
    w = Window.partitionBy("__bkt").orderBy("shuffle_key", F.col(id_col))
    rn = F.row_number().over(w)
    if len(offsets) <= 1024:
        off_map = F.create_map(
            *[
                F.lit(x)
                for b, o in sorted(offsets.items())
                for x in (b, o)
            ]
        )
        out = keyed.withColumn(
            "shuffle_rank",
            (F.element_at(off_map, F.col("__bkt")) + rn).cast("long"),
        )
    else:
        off_df = keyed.sparkSession.createDataFrame(
            sorted(offsets.items()), "__bkt string, __off long"
        )
        out = (
            keyed.join(F.broadcast(off_df), "__bkt")
            .withColumn(
                "shuffle_rank", (F.col("__off") + rn).cast("long")
            )
            .drop("__off")
        )
    return out.drop("__bkt")
