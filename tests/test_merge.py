"""MERGE INTO (round 9): conditional reconcile of a source frame
against a table by primary key — one snapshot commit, pruned matched
probe, untouched rows for matched-but-condition-false pairs."""

import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark import Dataset
from space_spark.errors import UserInputError

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=ts, v=v) for k, ts, v in rows], SCHEMA
    )


def _state(ds):
    return sorted((r["k"], r["ts"], r["v"])
                  for r in ds.reload().read().collect())


@pytest.fixture()
def table(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"])
    ds.append(_df(spark, [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]))
    return ds


def test_merge_update_insert_default(spark, table):
    v0 = table.current_snapshot_id
    table.merge(_df(spark, [(2, 20, "B"), (9, 20, "new")]))
    assert _state(table) == [
        (1, 10, "a"), (2, 20, "B"), (3, 10, "c"), (9, 20, "new")]
    # ONE snapshot commit, and time travel shows the pre-merge state.
    assert table.current_snapshot_id == v0 + 1
    old = sorted((r["k"], r["v"])
                 for r in table.read(version=v0).collect())
    assert old == [(1, "a"), (2, "b"), (3, "c")]


def test_merge_condition_guards_stale_updates(spark, table):
    """The idempotent-ingest guard: only update when the source row is
    NEWER; stale matched rows stay untouched, new keys still insert."""
    table.merge(
        _df(spark, [(2, 5, "stale"), (3, 30, "fresh"), (7, 1, "new")]),
        matched_condition=lambda s, t: s["ts"] > t["ts"],
    )
    assert _state(table) == [
        (1, 10, "a"), (2, 10, "b"), (3, 30, "fresh"), (7, 1, "new")]


def test_merge_matched_delete(spark, table):
    table.merge(
        _df(spark, [(1, 99, "x"), (8, 99, "y")]),
        when_matched="delete", when_not_matched="insert",
    )
    assert _state(table) == [
        (2, 10, "b"), (3, 10, "c"), (8, 99, "y")]


def test_merge_conditional_delete_only(spark, table):
    """Delete matched rows older than the source's ts; ignore new keys
    (an expiry feed)."""
    table.merge(
        _df(spark, [(1, 50, "_"), (2, 1, "_"), (6, 50, "_")]),
        when_matched="delete", when_not_matched="ignore",
        matched_condition=lambda s, t: s["ts"] > t["ts"],
    )
    assert _state(table) == [(2, 10, "b"), (3, 10, "c")]


def test_merge_matched_ignore_insert_only(spark, table):
    table.merge(
        _df(spark, [(1, 99, "CLOBBER"), (5, 1, "new")]),
        when_matched="ignore",
    )
    assert _state(table) == [
        (1, 10, "a"), (2, 10, "b"), (3, 10, "c"), (5, 1, "new")]


def test_merge_duplicate_source_pks_raise(spark, table):
    with pytest.raises(UserInputError, match="duplicate"):
        table.merge(_df(spark, [(2, 20, "x"), (2, 21, "y")]))
    # Nothing committed.
    assert _state(table) == [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")]


def test_merge_rejects_bad_clauses(spark, table):
    with pytest.raises(UserInputError):
        table.merge(_df(spark, []), when_matched="upsert")
    with pytest.raises(UserInputError):
        table.merge(_df(spark, []), when_not_matched="update")


def test_merge_rejects_reserved_column_names(spark, tmp_location):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("__m", T.StringType()),
    ])
    ds = Dataset.create(spark, tmp_location, schema, ["k"])
    src = spark.createDataFrame([Row(k=1, __m="x")], schema)
    with pytest.raises(UserInputError, match="reserves"):
        ds.merge(src)


def test_merge_timestamp_pk_bloom_table_non_utc_session(spark,
                                                        tmp_location):
    """Compose the round's two riskiest changes: merge's matched probe
    rides read_by_keys over a bloom-enabled TIMESTAMP-PK table under a
    non-UTC session — a bloom false negative would silently turn an
    update into a duplicate-key insert attempt."""
    import datetime as dt

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    base = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        ds = Dataset.create(spark, tmp_location, schema, ["ts"],
                            bloom_filters=True)
        rows = [Row(ts=base + dt.timedelta(minutes=i), v=f"v{i}")
                for i in range(10)]
        ds.append(spark.createDataFrame(rows, schema).coalesce(1))
        src = spark.createDataFrame(
            [Row(ts=rows[3].ts, v="UPDATED"),
             Row(ts=base + dt.timedelta(days=9), v="NEW")], schema)
        ds.merge(src)
        got = {r["v"] for r in ds.reload().read().collect()}
        assert "UPDATED" in got and "NEW" in got
        assert "v3" not in got  # the matched row was replaced, not duped
        assert len(got) == 11
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
