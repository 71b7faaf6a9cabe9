"""Record-field storage: address indirection, reference reads, lazy resolve
(mirrors reference tests/core/ops/test_append.py record-field cases and
tests/core/test_random_access.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, field

RECORDS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("images", T.BinaryType()),
    ]
)


def records_df(spark, ids):
    return spark.createDataFrame(
        [Row(id=i, name=f"n{i}", images=f"images{i}".encode()) for i in ids],
        RECORDS,
    )


@pytest.fixture()
def ds(spark, tmp_location):
    d = Dataset.create(
        spark, tmp_location, RECORDS, ["id"], record_fields=["images"]
    )
    # Single data file so later deletes hit files containing BOTH matching
    # and surviving rows (the survivor-rewrite path must carry addresses
    # over without re-writing blobs).
    d.append(records_df(spark, range(20)).coalesce(1))
    return d


def test_roundtrip_blob_values(spark, ds):
    got = ds.read().orderBy("id").collect()
    assert [r.images for r in got] == [
        f"images{i}".encode() for i in range(20)
    ]


def test_reference_read_returns_addresses(spark, ds):
    got = ds.read(reference_read=True).orderBy("id").collect()
    assert all(r.images._FILE.startswith("records/images_") for r in got)
    assert got[0].images._ROW_ID is not None


def test_record_fields_not_resolved_unless_selected(spark, ds):
    df = ds.read(fields=["id", "name"])
    assert df.columns == ["id", "name"]
    assert df.count() == 20


def test_delete_keeps_record_files(spark, ds):
    import glob
    import os

    before = set(glob.glob(os.path.join(ds.location, "records", "*")))
    ds.delete(field("id") < 10)
    after = set(glob.glob(os.path.join(ds.location, "records", "*")))
    # Copy-on-write delete rewrites index files only; record files are
    # untouched (reference core/ops/delete.py:42-45).
    assert before == after
    got = ds.read().orderBy("id").collect()
    assert [r.id for r in got] == list(range(10, 20))
    # Survivors still resolve their blobs through carried-over addresses.
    assert got[0].images == b"images10"


def test_filter_with_records(spark, ds):
    got = ds.read(filter_=field("id") == 7).collect()
    assert len(got) == 1 and got[0].images == b"images7"
