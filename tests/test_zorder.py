"""Z-order clustering: Morton key construction and multi-column manifest
pruning (operators/zorder.py + Dataset.append/compact(zorder_by=...))."""

import pytest
from pyspark.sql import functions as F

from space_spark import Dataset, field
from space_spark.errors import UserInputError
from space_spark.operators.zorder import (
    add_zorder_key,
    zorder_layout,
    ZKEY_COL,
)

SF_DIR = "/root/testdata/sf0.001"


def test_zorder_key_deterministic_and_monotone_per_cell(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    keyed, key = add_zorder_key(df, ["a", "b"], bits_per_col=4)
    assert key == ZKEY_COL
    again, _ = add_zorder_key(df, ["a", "b"], bits_per_col=4)
    assert (
        keyed.orderBy("a").select(key).collect()
        == again.orderBy("a").select(key).collect()
    )
    # 4 bits per column -> keys fit in 8 bits
    mx = keyed.agg(F.max(key)).collect()[0][0]
    assert 0 <= mx < 256


def test_zorder_layout_drops_helper_and_preserves_rows(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("a"), (F.col("id") % 13).alias("b")
    )
    out = zorder_layout(df, ["a", "b"], num_files=4)
    assert ZKEY_COL not in out.columns
    assert out.count() == 500
    assert out.rdd.getNumPartitions() == 4


def test_zorder_rejects_complex_columns(spark):
    df = spark.createDataFrame([(1, ["x"])], "a long, s array<string>")
    with pytest.raises(UserInputError):
        add_zorder_key(df, ["s"])


def test_zorder_string_prefix_encoding_is_order_preserving(spark):
    """The 6-byte-prefix double encoding must sort like the bytes do —
    that is what makes string quantile cuts and bucket comparisons
    meaningful."""
    from space_spark.operators.zorder import _as_double

    vals = ["", "a", "ab", "abc", "abcdefgh", "b", "ba", "zz", "zzzzzzz"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [
        r["s"] for r in
        df.select("s", _as_double(df, "s").alias("d"))
        .orderBy(F.col("d").asc(), F.col("s").asc()).collect()
    ]
    assert got == sorted(vals)


def test_zorder_string_prefix_sound_for_multibyte_utf8(spark):
    """Pruning soundness over the full UTF-8 range: whenever the
    6-byte-prefix encodings differ, their order must agree with Spark's
    own string order (byte-wise UTF-8). Ties (shared 6-byte prefix,
    or a prefix cut INSIDE a multi-byte sequence) only cost pruning
    resolution, never ordering correctness."""
    from space_spark.operators.zorder import _as_double

    vals = [
        "", " ", "0", "A", "a", "~", "\x7f",           # ASCII edges
        "é", "éa", "é",                          # 2-byte + combining
        "中", "中文", "中a", "日本語",                    # 3-byte CJK
        "😀", "😀x", "🚀🚀🚀",                           # 4-byte emoji
        "aé", "a中", "a😀", "aaaaa😀", "aaaaaa😀",      # cut inside seq
        "zzzzzÿ", "zzzzzzÿ",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s", _as_double(df, "s").alias("d")
    ).collect()
    # Spark's reference order for the same strings:
    order = {
        r["s"]: i for i, r in enumerate(
            df.orderBy(F.col("s").asc()).collect()
        )
    }
    for a in rows:
        for b in rows:
            if a["d"] < b["d"]:
                assert order[a["s"]] < order[b["s"]], (
                    f"{a['s']!r} encoded below {b['s']!r} but sorts after"
                )


def test_append_zorder_string_column_prunes(spark, tmp_location):
    """Z-order on (numeric, string): a filter on the STRING column alone
    must prune files — the string is bucketed by its byte-prefix, so
    files carry compact min/max ranges on it."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ds = Dataset.create(
        spark, tmp_location, orders.schema, ["o_orderkey"]
    )
    ds.append(orders, zorder_by=["o_custkey", "o_orderpriority"],
              target_files=16)
    total = len(ds.data_files())
    assert total >= 8
    by_prio = len(ds.data_files(field("o_orderpriority") == "1-URGENT"))
    assert by_prio < total, f"string column never pruned: {by_prio}/{total}"
    got = (
        ds.read(filter_=field("o_orderpriority") == "1-URGENT")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
        .collect()[0]
    )
    want = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_custkey").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_append_zorder_prunes_both_dimensions(spark, tmp_location):
    """The point of z-order vs cluster_by: with cluster_by(l_orderkey) a
    filter on l_partkey prunes ~nothing; z-ordered files carry compact
    min/max rectangles on BOTH columns, so both predicates prune."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ds = Dataset.create(
        spark, tmp_location, li.schema, ["l_orderkey", "l_linenumber"]
    )
    ds.append(li, zorder_by=["l_orderkey", "l_partkey"], target_files=16)
    total = len(ds.data_files())
    assert total >= 8

    ok_lo, ok_hi = 1000, 1300
    by_order = len(ds.data_files(
        (field("l_orderkey") >= ok_lo) & (field("l_orderkey") < ok_hi)
    ))
    by_part = len(ds.data_files(
        (field("l_partkey") >= 100) & (field("l_partkey") < 150)
    ))
    assert by_order < total, f"l_orderkey never pruned: {by_order}/{total}"
    assert by_part < total, f"l_partkey never pruned: {by_part}/{total}"

    # correctness: masked/pruned read == plain parquet oracle
    got = (
        ds.read(filter_=(field("l_partkey") >= 100)
                & (field("l_partkey") < 150))
        .agg(F.count(F.lit(1)), F.sum("l_orderkey"))
        .collect()[0]
    )
    want = (
        li.where((F.col("l_partkey") >= 100) & (F.col("l_partkey") < 150))
        .agg(F.count(F.lit(1)), F.sum("l_orderkey"))
        .collect()[0]
    )
    assert tuple(got) == tuple(want)


def test_append_zorder_cluster_by_exclusive(spark, tmp_location):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(10)
    ds = Dataset.create(
        spark, tmp_location, li.schema, ["l_orderkey", "l_linenumber"]
    )
    with pytest.raises(UserInputError):
        ds.append(li, cluster_by=["l_orderkey"], zorder_by=["l_partkey"])


def test_compact_zorder_restores_layout(spark, tmp_location):
    """Trickle-append unclustered batches, then compact(zorder_by=...):
    the healed table prunes on both dimensions and reads identically."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    ds = Dataset.create(
        spark, tmp_location, li.schema, ["l_orderkey", "l_linenumber"]
    )
    for i in range(4):
        ds.append(li.where(F.col("l_orderkey") % 4 == i).coalesce(2))
    before = len(ds.data_files())
    ds.compact(target_bytes=64 * 1024 * 1024,
               zorder_by=["l_orderkey", "l_partkey"])
    total = len(ds.data_files())
    assert total < before
    n_rows = ds.read().count()
    assert n_rows == li.count()


def test_zorder_sql_render_matches_column_builders(spark):
    """r14-opt: add_zorder_key renders the bucket CASE trees and the
    Morton interleave as SQL text (k+1 F.expr calls instead of py4j
    chatter per tree node). The rendered key must equal the
    Column-built `_bucket`/`_interleave` spec bit-for-bit over every
    supported key type, including NULLs (which sort to bucket 0)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from space_spark.operators.zorder import (
        _as_double,
        _bucket,
        _interleave,
        add_zorder_key,
        zorder_cuts,
    )

    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BinaryType()),
    ])
    rows = [
        Row(n=i,
            f=(None if i % 7 == 0 else i / 3.0),
            d=dt.date(2026, 1, 1 + (i % 27)),
            ts=dt.datetime(2026, 1, 1, i % 23, 5),
            s=(None if i % 11 == 0 else f"host-{i % 13}.example"),
            b=bytes([i % 251]) * 3)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, schema)
    cols = ["n", "f", "d", "ts", "s", "b"]
    bits = 3
    cuts = zorder_cuts(df, cols, bits)
    keyed, key = add_zorder_key(df, cols, bits_per_col=bits, cuts=cuts)
    spec = _interleave(
        [_bucket(_as_double(df, c), cut) for c, cut in zip(cols, cuts)],
        bits,
    )
    diff = (keyed.withColumn("__spec", spec)
            .where(~F.col(key).eqNullSafe(F.col("__spec")))
            .count())
    assert diff == 0
    # The helper columns never leak into the keyed output.
    assert [c for c in keyed.columns if c.startswith("__zb_")] == []
