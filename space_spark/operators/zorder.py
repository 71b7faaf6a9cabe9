"""Z-order (Morton-interleaved) clustering for multi-column file pruning.

Single-column ``cluster_by`` gives each data file a disjoint range of ONE
column, so manifest min/max pruning only helps predicates on that column.
Z-ordering quantile-buckets each clustering column and interleaves the
bucket bits into one Morton key; range-partitioning + sorting on that key
gives every data file a compact hyper-rectangle in the multi-column value
space, so the existing per-column manifest stats (core/schema.py
stats_fields — every scalar column already carries min/max) prune files
for predicates on ANY of the z-ordered columns.

The reference's storage has no clustering at all (its manifest stats are
populated from arrival order); this is the write-side layout lever a
100 TB table needs. Scale notes:

- Quantile cut points come from ``DataFrame.approxQuantile`` — one
  distributed pass, and the driver holds only ``cols * 2^bits`` doubles
  (bounded protocol data, not row data).
- Bucketing a value is a fold over a literal cut-point array
  (``aggregate``), and bit interleaving is a static unrolled
  shiftleft/bitwise-OR expression — all JVM-side, no Python, no shuffle
  beyond the final ``repartitionByRange`` the write was doing anyway.
- Skew-safe: quantile (not uniform-width) buckets keep cells equally
  populated under skewed distributions.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark.errors import UserInputError

ZKEY_COL = "__zorder_key"

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)


# String/binary columns are z-ordered by their first 6 bytes read as a
# big-endian unsigned integer: 48 bits stays exact in a double (< 2^53),
# and fixed-width right-zero-padded hex preserves byte order, so the
# encoding is order-preserving on the prefix. Real tables cluster on
# string keys (URL host, language, source); a 6-byte prefix separates
# those at file granularity — values that tie on the prefix simply land
# in the same bucket, costing pruning resolution, never correctness
# (cut points are computed under the same transform).
_STR_PREFIX_BYTES = 6


def _as_double(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, _NUMERIC):
        return F.col(col).cast("double")
    if isinstance(dt, _TEMPORAL):
        if isinstance(dt, T.DateType):
            return F.unix_date(F.col(col)).cast("double")
        return F.unix_micros(F.col(col).cast("timestamp_ltz")).cast("double")
    if isinstance(dt, (T.StringType, T.BinaryType)):
        raw = (F.col(col) if isinstance(dt, T.BinaryType)
               else F.encode(F.col(col), "UTF-8"))
        hexed = F.rpad(
            F.hex(F.substring(raw, 1, _STR_PREFIX_BYTES)),
            2 * _STR_PREFIX_BYTES, "0",
        )
        return F.conv(hexed, 16, 10).cast("double")
    raise UserInputError(
        f"zorder_by column {col!r} has unsupported type {dt.simpleString()}"
        " (numeric/date/timestamp/string/binary only)"
    )


def _bucket(col: Column, cuts: List[float]) -> Column:
    """Quantile-bucket id in [0, len(cuts)]: the number of cut points at
    or below the value, computed by a balanced binary-search CASE tree —
    log2(cuts) comparisons per row on the evaluation path, plain
    comparisons/WHENs so whole-stage codegen applies. (The previous
    O(cuts) higher-order fold cost ~17 s per pass on a 255-cut key over
    600k rows; the range shuffle evaluates the key twice, so the fold
    dominated the whole z-ordered write.)"""
    safe = F.coalesce(col, F.lit(float("-inf")))  # nulls sort first

    def search(lo: int, hi: int) -> Column:
        # Invariant: cuts[:lo] <= value < cuts[hi:]; answer in [lo, hi].
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            F.lit(float(cuts[mid])) <= safe, search(mid + 1, hi)
        ).otherwise(search(lo, mid))

    return search(0, len(cuts))


def _interleave(buckets: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position i*k + j.
    Static unrolled expression (bits*k shift/or terms, codegen-friendly)."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        bl = b.cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bl, i).bitwiseAND(F.lit(1)),
                            i * k + j)
            )
    return z


def zorder_cuts(
    df: DataFrame, cols: Sequence[str], bits_per_col: int
) -> List[List[float]]:
    """Per-column quantile cut points (one approxQuantile pass over the
    casted projection; relative error scaled to the bucket width)."""
    n_cuts = (1 << bits_per_col) - 1
    probs = [(i + 1) / (n_cuts + 1) for i in range(n_cuts)]
    casted = df.select(
        *[_as_double(df, c).alias(c) for c in cols]
    )
    rel_err = max(1.0 / (4 * (n_cuts + 1)), 1e-4)
    all_cuts = casted.approxQuantile(list(cols), probs, rel_err)
    # Deduplicate (low-cardinality columns repeat cut values) while
    # keeping order — fewer effective buckets is fine.
    out: List[List[float]] = []
    for cuts in all_cuts:
        seen, uniq = set(), []
        for c in cuts:
            if c not in seen:
                seen.add(c)
                uniq.append(c)
        out.append(uniq)
    return out


def _q(name: str) -> str:
    """Backquote a column name for SQL rendering."""
    return "`" + name.replace("`", "``") + "`"


def _dlit_sql(x: float) -> str:
    """SQL fragment parsing to exactly the double ``x`` (string->double
    cast is correctly rounded and accepts repr's shortest round-trip
    decimals plus 'Infinity'/'-Infinity'/'NaN')."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _as_double_sql(df: DataFrame, col: str) -> str:
    """SQL text of ``_as_double`` — same expression tree, one parser
    call instead of per-node py4j chatter (r14-opt, see _bucket_sql)."""
    dt = df.schema[col].dataType
    q = _q(col)
    if isinstance(dt, _NUMERIC):
        return f"CAST({q} AS DOUBLE)"
    if isinstance(dt, _TEMPORAL):
        if isinstance(dt, T.DateType):
            return f"CAST(unix_date({q}) AS DOUBLE)"
        return (f"CAST(unix_micros(CAST({q} AS TIMESTAMP_LTZ)) "
                "AS DOUBLE)")
    if isinstance(dt, (T.StringType, T.BinaryType)):
        raw = q if isinstance(dt, T.BinaryType) else f"encode({q}, 'UTF-8')"
        hexed = (f"rpad(hex(substring({raw}, 1, {_STR_PREFIX_BYTES})), "
                 f"{2 * _STR_PREFIX_BYTES}, '0')")
        return f"CAST(conv({hexed}, 16, 10) AS DOUBLE)"
    raise UserInputError(
        f"zorder_by column {col!r} has unsupported type {dt.simpleString()}"
        " (numeric/date/timestamp/string/binary only)"
    )


def _bucket_sql(col_sql: str, cuts: List[float]) -> str:
    """SQL text of ``_bucket``'s balanced binary-search CASE tree.
    Rendering the whole tree as ONE string parsed by F.expr replaces
    ~4-5 py4j round trips PER CUT (a 255-cut string key cost ~1s of
    pure driver latency per z-ordered write) with a single call; the
    parsed tree is node-identical to the Column-built one, so bucket
    values — and therefore file layout and every pruning result — are
    unchanged (pinned by test_zorder_sql_render_matches_column_builders)."""
    safe = f"coalesce({col_sql}, {_dlit_sql(float('-inf'))})"

    def search(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (f"(CASE WHEN {_dlit_sql(float(cuts[mid]))} <= {safe} "
                f"THEN {search(mid + 1, hi)} "
                f"ELSE {search(lo, mid)} END)")

    return search(0, len(cuts))


def _interleave_sql(names: Sequence[str], bits: int) -> str:
    """SQL text of ``_interleave`` over simple column references."""
    k = len(names)
    z = "CAST(0 AS BIGINT)"
    for j, n in enumerate(names):
        b = f"CAST({_q(n)} AS BIGINT)"
        for i in range(bits):
            z = (f"({z} | shiftleft(shiftright({b}, {i}) & 1, "
                 f"{i * k + j}))")
    return z


def add_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: Optional[int] = None,
    cuts: Optional[List[List[float]]] = None,
) -> Tuple[DataFrame, str]:
    """Append the Morton key column ``ZKEY_COL``; returns (df, colname).
    Pass precomputed ``cuts`` to skip the quantile pass (compaction reuses
    the cuts computed on the full table).

    Construction (r14-opt): the bucket CASE trees and the Morton
    interleave are rendered as SQL text and parsed in k+1 F.expr calls
    — the Column-by-Column build paid py4j round trips per tree node
    (~0.5-1 s driver latency per write at 255 cuts). Buckets land in
    named temporary columns so the interleave references each tree
    once; Catalyst's CollapseProject inlines them right back, giving
    the same final plan the direct build produced. `_bucket` /
    `_interleave` remain as the executable spec the render is tested
    against."""
    cols = list(cols)
    if not cols:
        raise UserInputError("zorder_by requires at least one column")
    bits = bits_per_col or max(4, 16 // len(cols))
    if cuts is None:
        cuts = zorder_cuts(df, cols, bits)
    tmp = {
        f"__zb_{j}": F.expr(_bucket_sql(_as_double_sql(df, c), cut))
        for j, (c, cut) in enumerate(zip(cols, cuts))
    }
    keyed = df.withColumns(tmp).withColumn(
        ZKEY_COL, F.expr(_interleave_sql(list(tmp), bits))
    ).drop(*tmp)
    return keyed, ZKEY_COL


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits_per_col: Optional[int] = None,
) -> DataFrame:
    """Range-partition + sort ``df`` by its Morton key into ``num_files``
    output partitions and drop the helper column — the write-side layout
    transform used by ``Dataset.append(zorder_by=...)``.

    Default key resolution scales with the target file count: enough
    Morton cells for ~64 cells per output file (finer cuts buy no extra
    pruning once files are the quantum, and per-row bucketing cost grows
    with log2(cuts))."""
    if bits_per_col is None:
        want_cells_log2 = (64 * max(num_files, 1) - 1).bit_length()
        bits_per_col = max(3, min(8, -(-want_cells_log2 // len(list(cols)))))
    keyed, key = add_zorder_key(df, cols, bits_per_col)
    return (
        keyed.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )
