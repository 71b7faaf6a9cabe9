"""The arrow (driver-side) manifest-pruning path must agree with the Spark
path on every supported predicate shape."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark.core import manifests as mf
from space_spark.core.expressions import field, lit

STATS_FIELDS = [("a", T.IntegerType()), ("b", T.IntegerType())]


@pytest.fixture(scope="module")
def manifest_path():
    d = tempfile.mkdtemp(prefix="arrow_prune_")
    path = os.path.join(d, "manifest.parquet")
    stat = pa.struct([("_MIN", pa.int32()), ("_MAX", pa.int32())])
    tbl = pa.table(
        {
            mf.FILE_PATH_COL: ["f0", "f1", "f2", "f3"],
            mf.NUM_ROWS_COL: pa.array([10, 10, 10, 10], pa.int64()),
            mf.SIZE_BYTES_COL: pa.array([1, 1, 1, 1], pa.int64()),
            "_STATS_a": pa.array(
                [
                    {"_MIN": 0, "_MAX": 10},
                    {"_MIN": 20, "_MAX": 30},
                    {"_MIN": 5, "_MAX": 5},
                    {"_MIN": None, "_MAX": None},
                ],
                stat,
            ),
            "_STATS_b": pa.array(
                [
                    {"_MIN": 100, "_MAX": 200},
                    {"_MIN": 0, "_MAX": 5},
                    {"_MIN": 7, "_MAX": 7},
                    {"_MIN": 1, "_MAX": 2},
                ],
                stat,
            ),
        }
    )
    pq.write_table(tbl, path)
    return path


PREDICATES = [
    field("a") == 25,
    field("a") != 5,
    field("a") < 5,
    field("a") <= 5,
    field("a") > 10,
    field("a") >= 10,
    (field("a") > 10) & (field("b") < 10),
    (field("a") > 100) | (field("b") >= 100),
    ~(field("a") == 25),
    field("a") < field("b"),
    field("a") > field("b"),
    lit(1) == lit(2),
    field("nostats") == 1,
    (field("a") == 25) & (field("nostats") == 1),
    None,
]


@pytest.mark.parametrize("pred", PREDICATES, ids=[str(p) for p in PREDICATES])
def test_arrow_path_matches_spark_path(spark, manifest_path, pred):
    arrow_files = mf._prune_files_arrow(
        [manifest_path], pred, {"a", "b"}
    )
    df = mf.read_manifests(spark, [manifest_path], STATS_FIELDS)
    if pred is not None:
        fals = pred.falsifiable({"a", "b"})
        if fals is not None:
            df = df.where(~F.coalesce(fals, F.lit(False)))
    spark_files = [r[0] for r in df.select(mf.FILE_PATH_COL).collect()]
    assert sorted(arrow_files) == sorted(spark_files)


def test_timestamp_string_literal_falls_back(spark, tmp_location):
    """A string literal against a timestamp stat can't be pruned by the
    arrow path (type mismatch) — prune_files must fall back to Spark and
    still answer correctly."""
    from pyspark.sql import Row
    import datetime as dt

    from space_spark import Dataset

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    ds = Dataset.create(spark, tmp_location, schema, ["id"])
    ds.append(
        spark.createDataFrame(
            [Row(id=i, ts=dt.datetime(2024, 1, 1 + i)) for i in range(3)],
            schema,
        )
    )
    out = ds.read(filter_=field("ts") > "2024-01-02").collect()
    assert len(out) == 1
