"""Join operators beyond the reference's single-key inner equi-join
(SURVEY.md §2.3 lists as-of / range joins as absent — these are the
versions a training-data/feature-store pipeline needs).

Both are pure DataFrame compositions (no UDFs, no driver loops):

- ``asof_join``: the union + ordered-window + last_value(ignorenulls)
  formulation — ONE shuffle+sort over (by, time), the same cost as a
  sort-merge join, instead of a per-group ``merge_asof`` in Python. Scales
  to arbitrarily many rows per key because the window is a running last,
  not a buffered frame.
- ``range_join``: equi-keys + interval containment via bucketized
  prefiltering: the range key is bucketed so the join explodes only
  bucket-overlapping candidates (Catalyst turns the bucket equality into a
  hash join) and the exact range predicate filters after — avoiding the
  O(n*m) nested-loop Spark falls back to for pure theta joins.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from space_spark.errors import UserInputError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Union[str, Sequence[str], None] = None,
    value_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row's values at
    the greatest right ``on`` <= left ``on`` (direction="backward"; ties
    match) or the least right ``on`` >= left ``on`` ("forward"). Unmatched
    left rows keep NULLs (left-join semantics).

    ``on``: ordering column name (numeric or timestamp), present in both.
    ``by``: optional equi-key column(s).
    ``value_cols``: right columns to carry (default: all non-key columns),
    appended with ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise UserInputError("direction must be 'backward' or 'forward'")
    by_cols: List[str] = (
        [by] if isinstance(by, str) else list(by) if by else []
    )
    rvals = value_cols or [
        c for c in right.columns if c != on and c not in by_cols
    ]
    if not rvals:
        raise UserInputError("right side has no value columns to attach")

    lmark = left.withColumn("__is_left", F.lit(1))
    for c in rvals:
        lmark = lmark.withColumn(f"__v_{c}", F.lit(None))
    rmark = right.select(
        *by_cols,
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__v_{c}") for c in rvals],
    )
    unioned = lmark.unionByName(rmark, allowMissingColumns=True)

    if direction == "backward":
        # Right rows sort BEFORE left rows at equal `on` so ties match.
        order = [F.col(on).asc(), F.col("__is_left").asc()]
    else:
        order = [F.col(on).desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(*by_cols).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in rvals:
        unioned = unioned.withColumn(
            f"{c}{suffix}", F.last(f"__v_{c}", ignorenulls=True).over(w)
        )
    return unioned.where(F.col("__is_left") == 1).select(
        *left.columns, *[f"{c}{suffix}" for c in rvals]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    by: Union[str, Sequence[str], None] = None,
    bucket_size: float = 1.0,
) -> DataFrame:
    """Join left points into right [lo, hi] intervals: equi-join on the
    range bucket (+ optional keys), exact containment filter after.

    Each interval is exploded into ceil((hi-lo)/bucket_size)+1 bucket rows;
    pick ``bucket_size`` near the typical interval width so the fan-out
    stays O(1) per interval while the join remains a hash join."""
    by_cols: List[str] = (
        [by] if isinstance(by, str) else list(by) if by else []
    )
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_size))
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_size)),
                F.floor(F.col(right_hi) / F.lit(bucket_size)),
            )
        ),
    )
    joined = lb.join(rb, on=by_cols + ["__bucket"], how="inner").where(
        (F.col(left_point) >= F.col(right_lo))
        & (F.col(left_point) <= F.col(right_hi))
    )
    return joined.drop("__bucket")
