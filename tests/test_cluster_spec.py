"""Persistent table clustering (Delta CLUSTER BY analog): declared at
create (or via set_clustering), applied by append and compact by
default, overridable per call, followed by schema evolution."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.errors import UserInputError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _rows(spark, n):
    return spark.createDataFrame(
        [Row(id=i, grp=i % 8, v=float(i)) for i in range(n)], SCHEMA
    )


def test_declared_clustering_applies_on_plain_append(
    spark, tmp_location
):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"], cluster_by=["grp"]
    )
    assert ds.metadata.cluster_spec == {"cols": ["grp"],
                                        "kind": "range"}
    ds.append(_rows(spark, 800))  # no per-call layout args
    all_files = ds.data_files()
    hit = ds.data_files(filter_=field("grp") == 3)
    # Range-disjoint files: a point filter prunes most of them.
    assert len(hit) < len(all_files)
    got = ds.read(filter_=field("grp") == 3).count()
    assert got == 100


def test_explicit_args_override_declared_spec(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"], cluster_by=["grp"]
    )
    # Overriding with id-clustering must not range-partition by grp.
    ds.append(_rows(spark, 400), cluster_by=["id"])
    hit_id = ds.data_files(filter_=field("id") == 7)
    assert len(hit_id) <= 2  # id ranges disjoint per file


def test_compact_rebins_under_declared_spec(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"], cluster_by=["grp"]
    )
    # Trickle appends WITH an override produce interleaved layout...
    for i in range(4):
        ds.append(_rows(spark, 1000), cluster_by=["id"])
    before = len(ds.data_files(filter_=field("grp") == 1))
    # Small target so the rewrite emits SEVERAL files — otherwise a
    # single output file can't demonstrate range-disjointness.
    ds.compact(target_bytes=16 * 1024)
    after_all = ds.data_files()
    after = len(ds.data_files(filter_=field("grp") == 1))
    # ...compaction heals back to the declared grp layout.
    assert len(after_all) > 1
    assert after < len(after_all) and after <= before
    assert ds.read().count() == 4000


def test_set_clustering_alter_and_clear(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["id"])
    assert ds.metadata.cluster_spec is None
    ds.set_clustering(zorder_by=["id", "grp"])
    assert ds.metadata.cluster_spec == {"cols": ["id", "grp"],
                                        "kind": "zorder"}
    ds.append(_rows(spark, 200))  # exercises the zorder default path
    assert ds.read().count() == 200
    ds.set_clustering()  # clear
    assert ds.metadata.cluster_spec is None


def test_schema_evolution_follows_spec(spark, tmp_location):
    ds = Dataset.create(
        spark, tmp_location, SCHEMA, ["id"], cluster_by=["grp", "v"]
    )
    ds.rename_column("grp", "bucket")
    assert ds.metadata.cluster_spec["cols"] == ["bucket", "v"]
    ds.drop_column("v")
    assert ds.metadata.cluster_spec["cols"] == ["bucket"]
    ds.drop_column("bucket")
    assert ds.metadata.cluster_spec is None


def test_declaration_validation(spark, tmp_location):
    with pytest.raises(UserInputError, match="not both"):
        Dataset.create(
            spark, tmp_location, SCHEMA, ["id"],
            cluster_by=["grp"], zorder_by=["id"],
        )
    with pytest.raises(UserInputError, match="not in schema"):
        Dataset.create(
            spark, tmp_location, SCHEMA, ["id"], cluster_by=["nope"]
        )
