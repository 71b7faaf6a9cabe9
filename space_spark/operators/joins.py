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


def _split_int_range(lo: int, hi: int, n: int):
    """Split [lo, hi] into <= n contiguous integer sub-ranges."""
    span = hi - lo + 1
    n = max(1, min(n, span))
    step = -(-span // n)
    out = []
    a = lo
    while a <= hi:
        out.append((a, min(a + step - 1, hi)))
        a += step
    return out


def range_partitioned_join(
    left_ds,
    right_ds,
    key: str,
    n_ranges: int = 8,
    left_fields: Optional[Sequence[str]] = None,
    right_fields: Optional[Sequence[str]] = None,
) -> DataFrame:
    """The reference's key-range partitioned equi-join (SURVEY §2.3 J2,
    ray/ops/join.py:49-211) re-expressed on Spark: the join key's global
    range comes from both space tables' manifest stats
    (``Dataset.key_range`` — driver metadata, zero jobs), the two ranges
    intersect, the intersection splits into ``n_ranges`` sub-ranges, and
    each sub-range inner-joins the MANIFEST-PRUNED file subsets of both
    sides; results union. Every matching key lies inside both tables'
    stat ranges, hence inside the intersection and in exactly one
    sub-range — the union equals the plain equi-join row-for-row.

    When to prefer it over a plain join: both tables clustered on the
    key (``append(cluster_by=...)``) — each sub-join then reads only the
    files overlapping its range and AQE picks a per-range strategy
    (broadcast for small ranges), bounding memory per range with no
    single global shuffle. The reference NEEDED this (Ray has no shuffle
    service); on Spark it is an optional layout-aware strategy and the
    default remains Catalyst's own join planning. Integer keys split
    into true sub-ranges; non-integer ranges fall back to one range
    (still pruned to the intersection)."""
    from space_spark.core.expressions import Field

    key_l, key_r = left_ds.key_range(key), right_ds.key_range(key)
    left_fields = list(left_fields or left_ds.schema.fieldNames())
    right_fields = list(right_fields or right_ds.schema.fieldNames())
    if key not in left_fields or key not in right_fields:
        raise UserInputError(f"join key {key!r} must be in both field sets")
    clash = (set(left_fields) & set(right_fields)) - {key}
    if clash:
        raise UserInputError(
            f"non-key columns appear on both sides: {sorted(clash)}"
        )
    if left_ds.num_rows == 0 or right_ds.num_rows == 0:
        l = left_ds.read(fields=left_fields).where(F.lit(False))
        r = right_ds.read(fields=right_fields).where(F.lit(False))
        return l.join(r, on=key, how="inner")
    if key_l[0] is None or key_r[0] is None:
        # Stats unavailable for the key on a NON-empty side (non-stats
        # type, or an all-NULL key column in some file): key_range
        # cannot distinguish that from an unbounded range, so fall back
        # to the plain unpartitioned join rather than silently return
        # an empty (wrong) result.
        return left_ds.read(fields=left_fields).join(
            right_ds.read(fields=right_fields), on=key, how="inner"
        )
    lo, hi = max(key_l[0], key_r[0]), min(key_l[1], key_r[1])
    if lo > hi:
        l = left_ds.read(fields=left_fields).where(F.lit(False))
        r = right_ds.read(fields=right_fields).where(F.lit(False))
        return l.join(r, on=key, how="inner")
    if isinstance(lo, int) and isinstance(hi, int):
        bounds = _split_int_range(lo, hi, n_ranges)
    else:
        bounds = [(lo, hi)]
    pieces = []
    for a, b in bounds:
        expr = (Field(key) >= a) & (Field(key) <= b)
        l = left_ds.read(filter_=expr, fields=left_fields)
        r = right_ds.read(filter_=expr, fields=right_fields)
        pieces.append(l.join(r, on=key, how="inner"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
