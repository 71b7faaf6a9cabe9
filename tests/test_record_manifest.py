"""Record-file manifests (reference record_manifest, storage.py:459-480)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, field

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("blob_a", T.BinaryType()),
        T.StructField("blob_b", T.BinaryType()),
    ]
)


def test_record_manifest(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"],
        record_fields=["blob_a", "blob_b"],
    )
    ds.append(
        spark.createDataFrame(
            [Row(id=i, blob_a=f"a{i}".encode(), blob_b=f"b{i}".encode())
             for i in range(12)],
            SCHEMA,
        ).coalesce(2)
    )
    man = ds.record_manifest().collect()
    by_field = {}
    for r in man:
        by_field.setdefault(r._FIELD, []).append(r)
    assert set(by_field) == {"blob_a", "blob_b"}
    # 2 partitions -> 2 blob files per field; counts sum to row count.
    for fld, rows in by_field.items():
        assert sum(r._NUM_ROWS for r in rows) == 12
        assert all(r._SIZE_BYTES > 0 for r in rows)
        assert all(r._FILE_PATH.startswith("records/") for r in rows)

    # Carried over (not dropped) through a CoW delete.
    ds.delete(field("id") < 3)
    man2 = ds.record_manifest().collect()
    assert {r._FILE_PATH for r in man2} == {r._FILE_PATH for r in man}

    # Second append adds new manifest rows.
    ds.append(
        spark.createDataFrame(
            [Row(id=100, blob_a=b"x", blob_b=b"y")], SCHEMA
        )
    )
    assert ds.record_manifest().count() > len(man)


def test_record_manifest_empty_for_index_only(spark, tmp_location):
    schema = T.StructType([T.StructField("id", T.LongType())])
    ds = Dataset.create(spark, tmp_location, schema, ["id"])
    ds.append(spark.createDataFrame([Row(id=1)], schema))
    assert ds.record_manifest().count() == 0
