"""Sequence packing for LLM training: assign documents to fixed-size
context-window bins by global token offset.

The standard packing layout concatenates documents in a deterministic
order and cuts at context-length boundaries; a document's placement is
``offset = cumulative tokens before it``, ``bin = floor(offset /
context_len)``. The naive DataFrame formulation —
``SUM(n) OVER (ORDER BY id)`` — is a GLOBAL window: Spark plans it as a
single partition, the classic scale-killer. This implementation computes
the same prefix sum in two phases:

1. range-repartition by id + per-partition running sum (window keyed by
   ``spark_partition_id()`` — partitions are id-ordered by construction
   of range partitioning);
2. per-partition totals (one tiny aggregate, O(partitions) rows) are
   cumulated on the driver and joined back as broadcast offsets.

Values are identical to the global-window SQL (the oracle runs exactly
that), but no task ever sees more than one partition's rows.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str,
    ntok_col: str,
    context_len: int,
    num_partitions: int = 0,
) -> DataFrame:
    """Add ``offset`` (tokens before this doc in id order) and ``bin_id``
    (``floor(offset / context_len)``) to every row."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # `ranged` feeds TWO jobs (the totals collect and the final joined
    # plan). Pin one evaluation: if the input is nondeterministic across
    # re-executions (anything downstream of a shuffle), range boundaries /
    # partition ids could differ between the jobs and the joined offsets
    # would silently corrupt — same discipline as dedup_clusters.
    ranged = ranged.localCheckpoint(eager=True)
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum(ntok_col).over(w))
    # Partition totals: O(partitions) rows — the bounded driver collect
    # that replaces the unbounded single-partition global window. Plain
    # per-partition sums (no window) so this pass never sorts.
    totals = sorted(
        ranged.groupBy("__pid").agg(F.sum(ntok_col).alias("__tot"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    acc = 0
    offs = []
    for r in totals:
        offs.append((r["__pid"], acc))
        acc += r["__tot"]
    # Arrow-native literal (a list-of-tuples createDataFrame is a
    # Python-RDD plan needing worker processes to evaluate).
    off_df = spark.createDataFrame(pa.table({
        "__pid": pa.array([p for p, _ in offs], pa.int32()),
        "__poff": pa.array([o for _, o in offs], pa.int64()),
    }))
    return (
        local.join(F.broadcast(off_df), on="__pid")
        .withColumn(
            "offset", (F.col("__poff") + F.col("__cum") - F.col(ntok_col))
            .cast("long")
        )
        .withColumn(
            "bin_id", F.floor(F.col("offset") / F.lit(context_len))
            .cast("long")
        )
        .drop("__pid", "__cum", "__poff")
    )
