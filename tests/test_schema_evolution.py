"""Schema evolution: add/drop columns over existing data files."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.errors import UserInputError

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def test_add_column(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(10)], SIMPLE))

    ds.add_column("tag", T.StringType())
    assert ds.schema.fieldNames() == ["id", "val", "tag"]
    # Fresh field id, never recycled.
    assert ds.metadata.field_ids["tag"] == max(
        ds.metadata.field_ids.values()
    )

    # Old files read NULL for the new column.
    got = ds.read().orderBy("id").collect()
    assert all(r.tag is None for r in got)

    # New appends carry it; mixed-file reads work, and the new column's
    # stats prune new files only (old files have no stats -> kept).
    new = spark.createDataFrame(
        [Row(id=100 + i, val=1.0, tag=f"t{i}") for i in range(5)],
        ds.schema,
    )
    ds.append(new)
    assert ds.read().count() == 15
    tagged = ds.read(filter_=field("tag") == "t3").collect()
    assert len(tagged) == 1 and tagged[0].id == 103

    with pytest.raises(UserInputError):
        ds.add_column("tag", T.StringType())  # exists


def test_drop_column_and_retirement(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(5)], SIMPLE))
    ds.drop_column("val")
    assert ds.schema.fieldNames() == ["id"]
    assert ds.read().columns == ["id"]
    # Appends with the old column now rejected.
    with pytest.raises(UserInputError):
        ds.append(spark.createDataFrame([Row(id=9, val=1.0)], SIMPLE))
    ds.append(spark.createDataFrame([Row(id=9)], "id long"))
    assert ds.read().count() == 6

    # Retired name cannot be re-added (old files carry old-typed bytes).
    with pytest.raises(UserInputError):
        ds.add_column("val", T.StringType())
    with pytest.raises(UserInputError):
        ds.drop_column("id")  # primary key

    # Survives reload.
    again = Dataset.load(spark, tmp_location)
    assert again.schema.fieldNames() == ["id"]
    assert again.metadata.retired_columns == ["val"]


def test_align_cast_memo_tracks_schema_evolution(spark, tmp_location):
    """The write funnel's memoized schema-cast list (Dataset.
    _schema_cast_columns, r13-opt) must never serve a stale entry:
    evolution changes the schema-JSON key, so post-evolution writes
    cast the evolved shape; identical schemas hit the cache (same
    list object); distinct tables with distinct schemas never share."""
    from space_spark.core.dataset import Dataset as DS

    ds = Dataset.create(spark, tmp_location + "/a", SIMPLE, ["id"])
    ds.append(spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(3)], SIMPLE))
    c1 = ds._schema_cast_columns()
    assert len(c1) == 2
    assert ds._schema_cast_columns() is c1  # cache hit: same object

    ds.add_column("tag", T.StringType())
    c2 = ds._schema_cast_columns()
    assert len(c2) == 3 and c2 is not c1  # new key, no stale entry
    # A real write through _align carries the evolved column + type.
    ds.append(spark.createDataFrame(
        [Row(id=100, val=1.0, tag="evolved")], ds.schema))
    got = ds.read(filter_=field("id") == 100).collect()
    assert got[0].tag == "evolved"
    assert dict(ds.read().dtypes)["tag"] == "string"

    # A second table with a different schema gets its own entry.
    other = T.StructType([T.StructField("id", T.LongType()),
                          T.StructField("name", T.StringType())])
    ds2 = Dataset.create(spark, tmp_location + "/b", other, ["id"])
    c3 = ds2._schema_cast_columns()
    assert len(c3) == 2 and c3 is not c1
    # Same-content schema from a fresh handle still hits the cache.
    again = Dataset.load(spark, tmp_location + "/a")
    assert again._schema_cast_columns() is c2

    # The cache is context-scoped: a (simulated) new SparkContext
    # identity drops every entry, so Columns never outlive their py4j
    # gateway.
    saved = dict(DS._ALIGN_CAST_CACHE)
    try:
        DS._ALIGN_CAST_CACHE["ctx"] = object()
        assert ds._schema_cast_columns() is not c2
    finally:
        DS._ALIGN_CAST_CACHE.update(saved)
