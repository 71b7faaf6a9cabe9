"""Training-shard export: the last step of a data pipeline — lay the
corpus out as N shards in a deterministic pseudo-random order and hand
the trainer a manifest.

Trainers want (a) a reproducible global shuffle (not ``rand()``, which
changes under retries/repartitioning), (b) even shards a data-loader
can stripe across workers, (c) a manifest with per-shard row/token
counts for step accounting. The shuffle key is the md5 integer of
``"<id>:<seed>"`` (the repo-wide deterministic-hash discipline, same
construction as ``sampling.hash_bucket``): shard = key mod n_shards,
within-shard order = key order — together a fixed permutation of the
corpus that any engine can recompute.

Scale: one hash-shuffle on the shard id (the write's natural
partitioning), sort WITHIN partitions only (no global sort), and the
manifest is a partial-aggregable groupBy over what was actually
WRITTEN (read back from the sink, so the manifest can never disagree
with the files)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col: Column, seed: int = 42) -> Column:
    """Deterministic 60-bit shuffle key: first 15 md5 hex digits of
    ``"<id>:<seed>"`` as a long (non-negative). Identical in any SQL
    engine: ``('0x' || substring(md5(id || ':' || seed), 1, 15))::BIGINT``.
    """
    key = F.concat_ws(":", id_col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def with_shards(df: DataFrame, id_col: str, n_shards: int,
                seed: int = 42) -> DataFrame:
    """Add ``__key`` (shuffle position) and ``shard_id`` columns.

    NULL-id rows are EXCLUDED (the ``exact_dedup`` discipline): their
    md5 key would collapse to one identical value (``concat_ws`` skips
    NULL), silently piling every such row at one position of one shard
    — and a training example without an id can't be accounted for in a
    manifest anyway."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    k = shuffle_key(F.col(id_col), seed)
    return df.where(F.col(id_col).isNotNull()).withColumn(
        "__key", k
    ).withColumn(
        "shard_id", (F.col("__key") % n_shards).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    n_shards: int,
    seed: int = 42,
) -> DataFrame:
    """Write the corpus as ``shard_id=N`` parquet partitions in
    deterministic shuffle order and return the manifest, aggregated
    from the FILES JUST WRITTEN: (shard_id, n_rows, min_key, max_key,
    first_id = the id at the shard's first shuffle position). If the
    input has an ``n_tokens`` column the manifest also carries its
    per-shard sum (token-budget accounting for the trainer)."""
    spark = df.sparkSession
    sharded = with_shards(df, id_col, n_shards, seed)
    (
        sharded.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "__key")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("__key").alias("min_key"),
        F.max("__key").alias("max_key"),
        F.min_by(id_col, "__key").alias("first_id"),
    ]
    if "n_tokens" in written.columns:
        aggs.append(F.sum("n_tokens").cast("long").alias("n_tokens"))
    return written.groupBy(
        F.col("shard_id").cast("int").alias("shard_id")
    ).agg(*aggs)
