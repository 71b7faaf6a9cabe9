"""As-of/range joins, point lookups, snapshot expiry + vacuum."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.errors import UserInputError
from space_spark.operators.joins import asof_join, range_join

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("A", 5, 3), ("B", 7, 4)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 15, 102.0),
         ("B", 99, 500.0)],
        "sym string, t long, px double",
    )
    got = asof_join(trades, quotes, on="t", by="sym").orderBy(
        "sym", "t"
    ).collect()
    # A@5 ties quote@5; A@10 ties quote@10; A@20 -> quote@15; B@7 -> none.
    assert [(r.sym, r.t, r.px_asof) for r in got] == [
        ("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 7, None),
    ]


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 12, "next"), (1, 8, "prev")], "k long, t long, tag string"
    )
    got = asof_join(left, right, on="t", by="k", direction="forward").collect()
    assert got[0].tag_asof == "next"


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 95.0)], "pid long, x double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 50.0)],
        "band string, lo double, hi double",
    )
    got = range_join(points, bands, "x", "lo", "hi", bucket_size=10.0)
    rows = {(r.pid, r.band) for r in got.collect()}
    assert rows == {(1, "low"), (2, "mid")}


def test_read_by_keys(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(
        spark.createDataFrame(
            [Row(id=i, val=float(i)) for i in range(100)], SIMPLE
        )
    )
    got = ds.read_by_keys([3, 97, 500]).orderBy("id").collect()
    assert [r.id for r in got] == [3, 97]

    keys_df = spark.createDataFrame([(5,), (6,)], "id long")
    assert ds.read_by_keys(keys_df).count() == 2

    with pytest.raises(UserInputError):
        ds.read_by_keys(spark.createDataFrame([(1,)], "wrong long"))


def test_expire_and_vacuum(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    for i in range(4):
        ds.append(
            spark.createDataFrame(
                [Row(id=10 * i + j, val=float(j)) for j in range(5)], SIMPLE
            )
        )
    ds.delete(field("id") < 3)  # snapshot 5 rewrites snapshot 1's file
    assert ds.current_snapshot_id == 5

    expired = ds.expire_snapshots(keep_last=2)
    assert expired == [1, 2, 3]  # head 5 + parent 4 kept, plus snapshot 0

    removed = ds.vacuum()
    # The pre-delete file of commit 1 is no longer referenced by any live
    # snapshot -> reclaimed; current data still reads fine.
    assert any(r.startswith("data/") for r in removed)
    assert sorted(r.id for r in ds.read().collect()) == sorted(
        set(range(0, 5)) - {0, 1, 2} | set(range(10, 15))
        | set(range(20, 25)) | set(range(30, 35))
    )
    # vacuum is idempotent.
    assert ds.vacuum() == []


def test_vacuum_keeps_record_files(spark, tmp_location):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["blob"]
    )
    ds.append(
        spark.createDataFrame(
            [Row(id=i, blob=f"b{i}".encode()) for i in range(10)], schema
        ).coalesce(1)
    )
    ds.delete(field("id") < 5)
    ds.expire_snapshots(keep_last=1)
    removed = ds.vacuum()
    # Record file still referenced by surviving rows' addresses: kept.
    assert not any(r.startswith("records/") for r in removed)
    got = ds.read().orderBy("id").collect()
    assert [r.blob for r in got] == [f"b{i}".encode() for i in range(5, 10)]


def test_expire_older_than_protects_recent_history(spark, tmp_location):
    """Time-based retention (Iceberg-style): snapshots created at or
    after ``older_than`` survive even beyond keep_last; a cutoff after
    everything falls back to keep_last-only behavior."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    for i in range(4):
        ds.append(spark.createDataFrame(
            [Row(id=10 * i + j, val=float(j)) for j in range(3)], SIMPLE))
    # Cutoff before every commit: all four snapshots are recent -> none
    # expire even with keep_last=1.
    assert ds.expire_snapshots(
        keep_last=1, older_than="2000-01-01T00:00:00+00:00") == []
    assert set(ds.metadata.snapshots) == {0, 1, 2, 3, 4}
    # Cutoff after every commit: only keep_last guards remain.
    expired = ds.expire_snapshots(
        keep_last=1, older_than="2100-01-01T00:00:00+00:00")
    assert expired == [1, 2, 3]
    assert set(ds.metadata.snapshots) == {0, 4}
    assert ds.read().count() == 12


def test_range_partitioned_join_equals_plain_join(spark, tmp_location):
    """The per-range union equals Catalyst's own equi-join row-for-row;
    empty key-range intersections short-circuit to an empty result with
    the joined schema; overlapping non-key columns are rejected."""
    from space_spark.operators.joins import range_partitioned_join

    left_schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("lv", T.DoubleType()),
    ])
    right_schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("rv", T.StringType()),
    ])
    dl = Dataset.create(spark, tmp_location + "_l", left_schema, ["k"])
    dl.append(spark.createDataFrame(
        [Row(k=i, lv=float(i)) for i in range(0, 300, 2)], left_schema),
        cluster_by=["k"], target_files=4)
    dr = Dataset.create(spark, tmp_location + "_r", right_schema, ["k"])
    dr.append(spark.createDataFrame(
        [Row(k=i, rv=f"s{i}") for i in range(100, 400, 3)], right_schema),
        cluster_by=["k"], target_files=4)

    got = sorted(tuple(r) for r in range_partitioned_join(
        dl, dr, "k", n_ranges=5).collect())
    want = sorted(tuple(r) for r in dl.read().join(
        dr.read(), on="k", how="inner").collect())
    assert got == want and len(got) > 0

    # Disjoint ranges: left is all < 1000, shift right above it.
    dr2 = Dataset.create(spark, tmp_location + "_r2", right_schema, ["k"])
    dr2.append(spark.createDataFrame(
        [Row(k=i, rv="x") for i in range(1000, 1010)], right_schema))
    empty = range_partitioned_join(dl, dr2, "k")
    assert empty.columns == ["k", "lv", "rv"]
    assert empty.count() == 0

    import pytest as _pytest

    from space_spark.errors import UserInputError

    clash_schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("lv", T.DoubleType()),
    ])
    dc = Dataset.create(spark, tmp_location + "_c", clash_schema, ["k"])
    dc.append(spark.createDataFrame([Row(k=1, lv=0.0)], clash_schema))
    with _pytest.raises(UserInputError, match="both sides"):
        range_partitioned_join(dl, dc, "k")


def test_range_join_falls_back_without_key_stats(spark, tmp_location):
    """A non-empty side whose key stats are unavailable (a file whose
    key column is entirely NULL has no parquet min/max) must fall back
    to the plain unpartitioned join — never silently return empty."""
    from space_spark.operators.joins import range_partitioned_join

    ls = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("k", T.LongType()),
    ])
    rs = T.StructType([
        T.StructField("rid", T.LongType()), T.StructField("k", T.LongType()),
    ])
    dl = Dataset.create(spark, tmp_location + "_nl", ls, ["id"])
    dl.append(spark.createDataFrame(
        [Row(id=1, k=None), Row(id=2, k=5)], ls).coalesce(1))
    dr = Dataset.create(spark, tmp_location + "_nr", rs, ["rid"])
    dr.append(spark.createDataFrame([Row(rid=9, k=5)], rs))
    assert range_partitioned_join(dl, dr, "k").count() == 1


def test_expire_older_than_validates_and_parses(spark, tmp_location):
    from space_spark.errors import UserInputError

    ds = Dataset.create(spark, tmp_location + "_ot", SIMPLE, ["id"])
    ds.append(spark.createDataFrame([Row(id=1, val=1.0)], SIMPLE))
    import pytest as _pytest

    with _pytest.raises(UserInputError, match="ISO-8601"):
        ds.expire_snapshots(keep_last=1, older_than="week_ago")
    # 'Z' suffix parses (string comparison would mis-order it)
    assert ds.expire_snapshots(
        keep_last=1, older_than="2000-01-01T00:00:00Z") == []


def test_rollback_rewinds_branch_to_ancestor(spark, tmp_location):
    """rollback(): metadata-only branch rewind (Iceberg
    rollback_to_snapshot): head moves to an ancestor, reads follow,
    abandoned snapshots stay time-travelable until expiry, and a
    non-ancestor target is refused."""
    from pyspark.sql import Row, types as T

    from space_spark import Dataset
    from space_spark.errors import UserInputError

    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])

    def rows(lo, hi):
        return spark.createDataFrame(
            [Row(id=i, v=float(i)) for i in range(lo, hi)], sch
        )

    ds = Dataset.create(spark, tmp_location, sch, ["id"])
    ds.append(rows(0, 10))
    v1 = ds.current_snapshot_id
    ds.append(rows(10, 20))
    v2 = ds.current_snapshot_id
    ds.append(rows(20, 30))

    ds.rollback(v1)
    assert ds.current_snapshot_id == v1
    assert ds.read().count() == 10
    # Abandoned snapshots remain readable by id.
    assert ds.read(version=v2).count() == 20
    # Fresh handles see the rewound head.
    assert Dataset.load(spark, tmp_location).read().count() == 10

    # A write after rollback grows a NEW lineage from v1.
    ds.append(rows(50, 55))
    assert ds.read().count() == 15
    v_new = ds.current_snapshot_id
    assert ds.metadata.snapshot(v_new).parent_snapshot_id == v1

    # v2 is no longer an ancestor of the new head: refuse.
    with pytest.raises(UserInputError, match="ancestor"):
        ds.rollback(v2)
    # No-op rollback to the current head is fine.
    ds.rollback(v_new)
    assert ds.current_snapshot_id == v_new


def test_rollback_by_tag_and_branch_isolation(spark, tmp_location):
    from pyspark.sql import Row, types as T

    from space_spark import Dataset

    sch = T.StructType([T.StructField("id", T.LongType())])
    ds = Dataset.create(spark, tmp_location, sch, ["id"])
    ds.append(spark.createDataFrame([Row(id=1)], sch))
    ds.add_tag("good")
    ds.append(spark.createDataFrame([Row(id=2)], sch))
    ds.add_branch("exp")

    ds.rollback("good")
    assert ds.read().count() == 1
    # Other branches are untouched by a main rollback.
    assert ds.read(branch="exp").count() == 2
