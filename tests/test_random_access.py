"""Random-access point reads (mirrors reference
tests/core/test_random_access.py:40-273)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.core.random_access import RandomAccessDataSource
from space_spark.errors import UserInputError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("feat1", T.BinaryType()),
        T.StructField("feat2", T.BinaryType()),
    ]
)


@pytest.fixture()
def ds(spark, tmp_location):
    d = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"], record_fields=["feat1", "feat2"]
    )
    d.append(
        spark.createDataFrame(
            [Row(id=i, feat1=f"a{i}".encode(), feat2=f"b{i}".encode())
             for i in range(30)],
            SCHEMA,
        )
    )
    return d


def test_single_field(spark, ds):
    src = RandomAccessDataSource(ds, ["feat1"])
    assert len(src) == 30
    assert src[7] == b"a7"
    assert src.__getitems__([3, 1, 28]) == [b"a3", b"a1", b"a28"]


def test_multi_field_and_deserialize(spark, ds):
    src = RandomAccessDataSource(
        ds, ["feat1", "feat2"], deserialize=lambda b: b.decode()
    )
    assert src[5] == {"feat1": "a5", "feat2": "b5"}
    batch = src.__getitems__([10, 2])
    assert batch == [
        {"feat1": "a10", "feat2": "b10"},
        {"feat1": "a2", "feat2": "b2"},
    ]


def test_filtered_and_versioned(spark, ds):
    src = RandomAccessDataSource(ds, ["feat1"], filter_=field("id") >= 25)
    assert len(src) == 5
    assert src[0] == b"a25"  # ordered by pk

    ds.append(
        spark.createDataFrame([Row(id=99, feat1=b"x", feat2=b"y")], SCHEMA)
    )
    old = RandomAccessDataSource(ds, ["feat1"], version=1)
    assert len(old) == 30


def test_errors(spark, ds):
    src = RandomAccessDataSource(ds, ["feat1"])
    with pytest.raises(IndexError):
        src[30]
    with pytest.raises(UserInputError):
        RandomAccessDataSource(ds, ["id"])  # not a record field
