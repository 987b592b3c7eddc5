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
    """Count ``df`` (parquet metadata count — cheap relative to the
    quadratic work being guarded) and refuse if it exceeds the bound."""
    if max_rows is None:
        return
    n = df.count()
    if n > max_rows:
        raise QuadraticInputError(
            f"{operator} is an O(n^2) exact baseline and its input has "
            f"{n} rows (> max_rows={max_rows}). Use {alternative} at "
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
