"""Column rename: metadata-only over immutable physical names.

Reference parity note: the reference stores field IDs expressly 'to
enable schema evolution later' (core/schema/arrow.py:28-31) but ships no
rename; this implements the rename that design reserves. Files and
manifest stats keep the PHYSICAL (creation-time) name; only the logical
name changes, so a rename is O(metadata) at any table size.
"""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark import Dataset, field
from space_spark.errors import UserInputError
from space_spark.sources.datasource import register_space_source


SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _mk(spark, tmp, rows=None):
    ds = Dataset.create(spark, os.path.join(tmp, "t"), SCHEMA, ["k"])
    rows = rows if rows is not None else [(i, f"s{i}", i * 10)
                                          for i in range(100)]
    ds.append(spark.createDataFrame(rows, SCHEMA))
    return ds


def test_rename_read_write_prune(spark, tmp_path):
    ds = _mk(spark, str(tmp_path))
    before = {(r["k"], r["v"], r["n"]) for r in ds.read().collect()}
    ds.rename_column("v", "label")
    assert ds.schema.fieldNames() == ["k", "label", "n"]
    got = {(r["k"], r["label"], r["n"]) for r in ds.read().collect()}
    assert got == before
    # filter on a renamed column + on an untouched column
    assert ds.read(field("label") == "s7").count() == 1
    # write AFTER the rename (new physical files keep the ORIGINAL name)
    ds.append(spark.createDataFrame([(100, "s100", 1000)],
                                    ds.schema))
    assert ds.read().count() == 101
    # both pre- and post-rename files serve the renamed column
    assert ds.read(field("label") == "s100").count() == 1
    # pruning on the renamed PK still cuts files
    ds2 = _mk(spark, str(tmp_path / "p"))
    ds2.append(spark.createDataFrame(
        [(i, f"s{i}", i) for i in range(1000, 1100)], SCHEMA))
    ds2.rename_column("k", "id")
    pruned = ds2.data_files(field("id") >= 1000)
    assert 0 < len(pruned) < len(ds2.data_files())


def test_rename_pk_dml(spark, tmp_path):
    ds = _mk(spark, str(tmp_path))
    ds.rename_column("k", "id")
    assert ds.primary_keys == ["id"]
    ds.insert(spark.createDataFrame([(500, "x", 0)], ds.schema))
    with pytest.raises(Exception):
        ds.insert(spark.createDataFrame([(500, "dup", 0)], ds.schema))
    ds.upsert(spark.createDataFrame([(500, "y", 1)], ds.schema))
    assert ds.read(field("id") == 500).collect()[0]["v"] == "y"
    ds.delete(field("id") == 500)
    assert ds.read(field("id") == 500).count() == 0
    # the delete stream across the rename carries current logical names
    d = ds.diff(0, ds.current_snapshot_id)
    assert "id" in d.columns and "k" not in d.columns
    # merge-on-read delete under a renamed schema
    ds.delete(field("id") == 1, rewrite=False)
    assert ds.read(field("id") == 1).count() == 0


def test_rename_collisions_and_back(spark, tmp_path):
    ds = _mk(spark, str(tmp_path))
    ds.rename_column("v", "label")
    # logical collision
    with pytest.raises(UserInputError):
        ds.rename_column("n", "label")
    # physical collision: 'v' is still the physical name of 'label'
    with pytest.raises(UserInputError):
        ds.rename_column("n", "v")
    with pytest.raises(UserInputError):
        ds.add_column("v", T.LongType())
    # rename back to the physical name clears the mapping
    ds.rename_column("label", "v")
    assert ds.metadata.renames == {}
    assert ds.read(field("v") == "s3").count() == 1
    # dropping a renamed column retires BOTH names
    ds.rename_column("n", "count")
    ds.drop_column("count")
    for blocked in ("n", "count"):
        with pytest.raises(UserInputError):
            ds.add_column(blocked, T.LongType())


def test_rename_time_travel_and_compact(spark, tmp_path):
    ds = _mk(spark, str(tmp_path))
    v1 = ds.current_snapshot_id
    ds.rename_column("v", "label")
    ds.append(spark.createDataFrame([(200, "s200", 0)], ds.schema))
    # time travel shows CURRENT names (Iceberg convention)
    tt = ds.read(version=v1)
    assert "label" in tt.columns and "v" not in tt.columns
    assert tt.count() == 100
    # compact across mixed pre/post-rename files, clustered by new name
    before = {(r["k"], r["label"]) for r in ds.read().collect()}
    ds.compact(target_bytes=1 << 30, cluster_by=["label"])
    assert {(r["k"], r["label"]) for r in ds.read().collect()} == before


def test_rename_record_field(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    ds = Dataset.create(spark, os.path.join(str(tmp_path), "r"), schema,
                        ["k"], record_fields=["payload"])
    rows = [(i, f"blob{i}".encode()) for i in range(20)]
    ds.append(spark.createDataFrame(rows, schema))
    ds.rename_column("payload", "blob")
    assert ds.record_fields == ["blob"]
    got = {(r["k"], bytes(r["blob"])) for r in ds.read().collect()}
    assert got == set(rows)
    # reference read still yields address structs under the new name
    ref = ds.read(reference_read=True).select("blob").first()
    assert ref["blob"]["_FILE"] is not None


def test_rename_datasource_and_sink(spark, tmp_path):
    register_space_source(spark)
    ds = _mk(spark, str(tmp_path))
    ds.rename_column("v", "label")
    ds.rename_column("k", "id")
    loc = ds.location
    df = spark.read.format("space").load(loc)
    assert set(df.columns) == {"id", "label", "n"}
    assert df.count() == 100
    # pushed filter on a renamed column (file scan runs under physical)
    assert df.where(F.col("id") == 5).select("label").collect()[0][0] == "s5"
    # format('space') write after a rename: files land physical, read back
    add = spark.createDataFrame([(300, "s300", 3000)],
                                ds.schema)
    add.write.format("space").mode("append").save(loc)
    ds.reload()
    assert ds.read(field("id") == 300).count() == 1
    assert spark.read.format("space").load(loc).count() == 101
