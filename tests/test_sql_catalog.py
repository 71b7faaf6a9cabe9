"""SQL-catalog surface: schema-less ``CREATE TABLE ... USING space``
attaches an existing table to the Spark session catalog; SELECT /
INSERT INTO / spark.table() then work against the transaction log.

Beyond reference parity — the reference has no SQL surface (README.md:17
delegates SQL to external engines). The table location is carried in the
catalog schema's field metadata because Spark's Python-data-source bridge
hands catalog-table reader()/writer() calls empty options (verified
against pyspark 4.1 sql/worker/create_data_source.py behavior).
"""

import uuid

import pytest
from pyspark.sql import functions as F

from space_spark import Dataset
from space_spark.catalogs.directory import DirCatalog
from space_spark.errors import UserInputError


@pytest.fixture()
def cat(spark, tmp_location):
    return DirCatalog(spark, tmp_location + "_root")


def _fresh_name() -> str:
    return "sqlcat_" + uuid.uuid4().hex[:10]


@pytest.fixture()
def attached(spark, cat):
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 3).cast("long").alias("v")
    )
    ds = cat.create_dataset("t", df.schema, ["id"])
    ds.append(df)
    tbl = cat.attach_sql("t", _fresh_name())
    yield cat, ds, tbl
    spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")


def test_select_matches_dataset_read(spark, attached):
    _, ds, tbl = attached
    a = sorted((r["id"], r["v"]) for r in spark.table(tbl).collect())
    b = sorted((r["id"], r["v"]) for r in ds.read().collect())
    assert a == b and len(a) == 20


def test_sql_filter_and_projection(spark, attached):
    _, _, tbl = attached
    got = spark.sql(
        f"SELECT id FROM `{tbl}` WHERE v = 0 ORDER BY id"
    ).collect()
    assert [r["id"] for r in got] == [i for i in range(20) if i % 3 == 0]


def test_insert_into_values_visible_both_sides(spark, attached, cat):
    _, _, tbl = attached
    spark.sql(f"INSERT INTO `{tbl}` VALUES (100, 7), (101, 8)")
    assert spark.table(tbl).count() == 22
    # The SQL write went through the same transaction log.
    ds2 = cat.dataset("t")
    got = sorted(r["id"] for r in ds2.read(fields=["id"]).collect())
    assert got[-2:] == [100, 101]
    assert len(ds2.versions().collect()) >= 2  # append committed a snapshot


def test_insert_into_select(spark, attached):
    _, ds, tbl = attached
    spark.sql(
        f"INSERT INTO `{tbl}` SELECT id + 1000, v FROM `{tbl}` WHERE v = 1"
    )
    n_src = sum(1 for i in range(20) if i % 3 == 1)
    assert spark.table(tbl).count() == 20 + n_src


def test_attach_requires_existing_dataset(cat):
    from space_spark.errors import SpaceError

    with pytest.raises(SpaceError):
        cat.attach_sql("nope")


def test_attach_rejects_bad_sql_name(spark, cat):
    df = spark.range(3).select("id")
    cat.create_dataset("t2", df.schema, ["id"]).append(df)
    with pytest.raises(UserInputError):
        cat.attach_sql("t2", "bad-name; DROP TABLE x")


def test_enable_sql_attaches_all(spark, cat):
    df = spark.range(3).select("id")
    for name in ("alpha", "beta"):
        cat.create_dataset(name, df.schema, ["id"]).append(df)
    tables = cat.enable_sql()
    try:
        assert sorted(tables) == ["alpha", "beta"]
        for t in tables:
            assert spark.table(t).count() == 3
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS `{t}`")


def test_file_uri_location_normalized(spark, tmp_location):
    df = spark.range(5).select("id")
    ds = Dataset.create(spark, tmp_location, df.schema, ["id"])
    ds.append(df)
    ds2 = Dataset.load(spark, "file:" + tmp_location)
    assert ds2.read().count() == 5


def test_dataframe_read_still_carries_location_metadata(spark, attached):
    """format('space') reads keep working and the stamped metadata is the
    documented carrier (regression pin for the smuggling mechanism)."""
    from space_spark.sources.datasource import LOCATION_METADATA_KEY

    _, ds, tbl = attached
    sch = spark.table(tbl).schema
    assert LOCATION_METADATA_KEY in (sch.fields[0].metadata or {})
    df = (
        spark.read.format("space")
        .option("path", ds.location)
        .load()
    )
    assert df.count() == 20


def test_insert_into_with_reserved_path_option(spark, tmp_location):
    """CREATE TABLE ... USING space OPTIONS (path '<dir>'): Spark
    normalizes the reserved 'path' option to a file: URI before the
    INSERT INTO writer sees it — _location must strip the scheme or
    the table 'disappears' for SQL DML (round-10 fix)."""
    df = spark.range(5).select("id")
    Dataset.create(spark, tmp_location, df.schema, ["id"]).append(df)
    tbl = "t_path_opt"
    spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")
    spark.sql(
        f"CREATE TABLE `{tbl}` USING space OPTIONS (path '{tmp_location}')"
    )
    try:
        spark.sql(f"INSERT INTO `{tbl}` VALUES (100), (101)")
        assert spark.table(tbl).count() == 7
        ds = Dataset.load(spark, tmp_location)
        assert ds.read().count() == 7
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{tbl}`")
