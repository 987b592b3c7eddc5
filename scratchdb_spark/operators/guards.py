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


class QuadraticInputError(ValueError):
    """Input exceeds the declared bound for an O(n^2) baseline."""


def refuse_quadratic(
    df: DataFrame,
    max_rows: int | None,
    operator: str,
    alternative: str,
) -> None:
    """Probe ``df`` with ``LIMIT max_rows + 1`` and refuse if more
    than ``max_rows`` rows come back.

    The probe is NOT free — it executes ``df``'s upstream plan (the
    callers pass filtered/projected frames, not raw scans) — but the
    limit lets Spark stop as soon as max_rows + 1 rows surface instead
    of counting the whole input, so the guard's cost is bounded by the
    threshold it enforces, not by the input size. That linear,
    early-exiting probe is what makes it safe to run unconditionally
    in front of the O(n^2) work it guards."""
    if max_rows is None:
        return
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise QuadraticInputError(
            f"{operator} is an O(n^2) exact baseline and its input has "
            f"more than max_rows={max_rows} rows. Use {alternative} at "
            f"scale, or pass a higher max_rows to opt in explicitly."
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
