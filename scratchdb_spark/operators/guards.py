"""Scale guards for deliberately-quadratic exact baselines.

The catalog keeps O(n^2) exact operators (brute-force cosine, exact
n-gram jaccard, all-pairs GEMM) as correctness baselines for their
scale-safe approximate twins (IVF/LSH, minhash-LSH). On a 100 TB
corpus none of them should ever run by accident, so each takes an
explicit ``max_rows``/``max_pairs`` bound and refuses larger inputs
with a pointer to the operator that DOES scale. Passing a higher
bound (or ``None``) is an explicit caller opt-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QuadraticInputError(ValueError):
    """Input exceeds the declared bound for an O(n^2) baseline."""


class HotGroupError(ValueError):
    """A group exceeds the declared per-group row bound for an exact
    holistic aggregate (exact percentile / median / MAD)."""


def refuse_quadratic(
    df: DataFrame,
    max_rows: int | None,
    operator: str,
    alternative: str,
) -> int | None:
    """Probe ``df`` with ``LIMIT max_rows + 1`` and refuse if more
    than ``max_rows`` rows come back.

    The probe is NOT free — it executes ``df``'s upstream plan (the
    callers pass filtered/projected frames, not raw scans) — but the
    limit lets Spark stop as soon as max_rows + 1 rows surface instead
    of counting the whole input, so the guard's cost is bounded by the
    threshold it enforces, not by the input size. That linear,
    early-exiting probe is what makes it safe to run unconditionally
    in front of the O(n^2) work it guards.

    Returns the probed row count — EXACT whenever the guard passes
    (the limit only truncates above max_rows, which raises) — or None
    when ``max_rows`` is None (unbounded opt-in, nothing was counted).
    Callers can use it to size their blocking/partitioning without a
    second counting job."""
    if max_rows is None:
        return None
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise QuadraticInputError(
            f"{operator} is an O(n^2) exact baseline and its input has "
            f"more than max_rows={max_rows} rows. Use {alternative} at "
            f"scale, or pass a higher max_rows to opt in explicitly."
        )
    return n


def refuse_hot_groups(
    df: DataFrame,
    keys: list[str],
    max_group_rows: int | None,
    operator: str,
    alternative: str,
) -> None:
    """Refuse when any group of ``keys`` has more than
    ``max_group_rows`` rows.

    Spark's EXACT ``percentile`` (and any holistic aggregate) buffers
    every value of a group inside one executor's aggregation buffer, so
    a hot group is an OOM/straggler at scale no matter how wide the
    cluster is. This probe is a count-only aggregation — map-side
    combined, it shuffles one long per distinct key, never the values —
    so its cost is a linear scan, which the guarded exact aggregate was
    about to pay anyway. Mirrors ``refuse_quadratic``: the exact
    operator stays available as a correctness baseline, but can't run
    into a memory wall by accident; the sketch twin named in
    ``alternative`` is the scale path.
    """
    if max_group_rows is None:
        return
    row = df.groupBy(*keys).count().agg(F.max("count")).first()
    top = row[0] if row else None
    if top is not None and top > max_group_rows:
        raise HotGroupError(
            f"{operator} is an exact holistic aggregate whose buffer "
            f"holds every value of a group, and the hottest group of "
            f"{keys} has {top} rows (> max_group_rows={max_group_rows}). "
            f"Use {alternative} at scale, or pass a higher "
            f"max_group_rows to opt in explicitly."
        )


def refuse_quadratic_pair(
    left: DataFrame,
    right: DataFrame,
    max_pairs: int | None,
    operator: str,
    alternative: str,
) -> None:
    """Refuse when |left| * |right| exceeds ``max_pairs``."""
    if max_pairs is None:
        return
    n = left.count() * right.count()
    if n > max_pairs:
        raise QuadraticInputError(
            f"{operator} evaluates {n} candidate pairs "
            f"(> max_pairs={max_pairs}). Use {alternative} at scale, "
            f"or pass a higher max_pairs to opt in explicitly."
        )
