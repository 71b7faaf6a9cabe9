"""Create/append/read lifecycle (mirrors reference tests/core/test_runners.py
and tests/core/ops/test_append.py / test_read.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.errors import SchemaError, SpaceError, UserInputError

ALL_TYPES = T.StructType(
    [
        T.StructField("int64", T.LongType()),
        T.StructField("float64", T.DoubleType()),
        T.StructField("bool", T.BooleanType()),
        T.StructField("string", T.StringType()),
    ]
)


def make_all_types(spark):
    # Canonical two-batch fixture (FIXTURES.md F2).
    batch1 = [
        Row(int64=1, float64=0.1, bool=True, string="a"),
        Row(int64=2, float64=0.2, bool=False, string="b"),
        Row(int64=3, float64=0.3, bool=False, string="c"),
    ]
    batch2 = [
        Row(int64=0, float64=-0.1, bool=False, string="A"),
        Row(int64=10, float64=100.0, bool=False, string="z"),
    ]
    return (
        spark.createDataFrame(batch1, ALL_TYPES),
        spark.createDataFrame(batch2, ALL_TYPES),
    )


def test_create_and_load(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    assert ds.current_snapshot_id == 0
    assert ds.read().count() == 0

    ds2 = Dataset.load(spark, tmp_location)
    assert ds2.schema.fieldNames() == ALL_TYPES.fieldNames()
    assert ds2.primary_keys == ["int64"]
    assert ds2.metadata.field_ids["int64"] == 1


def test_create_validation(spark, tmp_location):
    with pytest.raises(SchemaError):
        Dataset.create(spark, tmp_location, ALL_TYPES, [])
    with pytest.raises(SchemaError):
        Dataset.create(spark, tmp_location, ALL_TYPES, ["missing"])
    with pytest.raises(SchemaError):
        Dataset.create(spark, tmp_location, ALL_TYPES, ["float64"])
    with pytest.raises(SchemaError):
        Dataset.create(
            spark, tmp_location, ALL_TYPES, ["int64"], record_fields=["string"]
        )


def test_append_read_roundtrip(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    b1, b2 = make_all_types(spark)
    ds.append(b1)
    assert ds.current_snapshot_id == 1
    ds.append(b2)
    assert ds.current_snapshot_id == 2

    got = ds.read().orderBy("int64").collect()
    assert [r.int64 for r in got] == [0, 1, 2, 3, 10]
    assert [r.string for r in got] == ["A", "a", "b", "c", "z"]
    assert ds.metadata.snapshot(2).num_rows == 5


def test_read_filter_fields_and_pruning(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    b1, b2 = make_all_types(spark)
    ds.append(b1)
    ds.append(b2)

    # Manifest pruning: batch1 file has int64 in [1,3]; filter >= 10 must
    # prune it out.
    files = ds.data_files(field("int64") >= 10)
    all_files = ds.data_files()
    assert len(files) < len(all_files)

    got = ds.read(filter_=field("int64") >= 10).collect()
    assert len(got) == 1 and got[0].string == "z"

    got = ds.read(
        filter_=(field("string") == "b") | (field("float64") < 0.0),
        fields=["int64", "string"],
    ).orderBy("int64")
    assert got.columns == ["int64", "string"]
    assert [r.int64 for r in got.collect()] == [0, 2]


def test_time_travel_and_refs(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    b1, b2 = make_all_types(spark)
    ds.append(b1)
    ds.add_tag("after_b1")
    ds.append(b2)

    assert ds.read(version=1).count() == 3
    assert ds.read(version="after_b1").count() == 3
    assert ds.read().count() == 5

    versions = ds.versions().collect()
    tagged = [r for r in versions if r.tag_or_branch == "after_b1"]
    assert len(tagged) == 1 and tagged[0].snapshot_id == 1

    with pytest.raises(UserInputError):
        ds.add_tag("after_b1")  # duplicate ref


def test_branches(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    b1, b2 = make_all_types(spark)
    ds.append(b1)
    ds.add_branch("dev")
    ds.set_current_branch("dev")
    ds.append(b2)

    # Branch commit must not move main (storage.py:328-339).
    assert ds.read(branch="dev").count() == 5
    assert ds.read(branch="main").count() == 3
    ds.set_current_branch("main")
    assert ds.read().count() == 3


def test_empty_append_skips_commit(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    empty = spark.createDataFrame([], ALL_TYPES)
    ds.append(empty)
    assert ds.current_snapshot_id == 0


def test_table_already_exists(spark, tmp_location):
    Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    with pytest.raises(SpaceError):
        Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])


def test_clustered_append_prunes_to_one_file(spark, tmp_location):
    """cluster_by gives files disjoint key ranges: a point predicate must
    prune to a single file."""
    from pyspark.sql import Row

    ds = Dataset.create(spark, tmp_location, ALL_TYPES, ["int64"])
    rows = [
        Row(int64=i, float64=i / 10.0, bool=False, string=f"s{i}")
        for i in range(1000)
    ]
    ds.append(
        spark.createDataFrame(rows, ALL_TYPES),
        cluster_by=["int64"], target_files=8,
    )
    all_files = ds.data_files()
    assert len(all_files) == 8
    hit = ds.data_files(field("int64") == 500)
    assert len(hit) == 1  # disjoint ranges -> exactly one file can match
    got = ds.read(filter_=field("int64") == 500).collect()
    assert len(got) == 1 and got[0].string == "s500"


def test_detail_reports_table_properties(spark, tmp_location):
    """Dataset.detail(): DESCRIBE DETAIL analog — metadata-only table
    summary carrying every declared property."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from space_spark import Dataset, field

    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("g", T.LongType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, sch, ["id"],
        check_constraints={"g_pos": field("g") >= 0},
        not_null=["g"],
        cluster_by=["g"],
    )
    ds.append(spark.createDataFrame(
        [Row(id=i, g=i % 3) for i in range(10)], sch
    ))
    d = ds.detail()
    assert d["num_rows"] == 10 and d["num_files"] >= 1
    assert d["primary_keys"] == ["id"]
    assert list(d["constraints"]) == ["g_pos"]
    assert d["not_null"] == ["g"]
    assert d["cluster_spec"] == {"cols": ["g"], "kind": "range"}
    assert d["current_version"] == ds.current_snapshot_id
    assert d["branches"]["main"] == ds.current_snapshot_id
    assert d["materialized_view"] is None
    # On an MV table, detail() surfaces the sync state (round 13).
    view = ds.aggregate_view(["g"], {"n": ("count", "*")})
    mv = view.materialize(spark, tmp_location + "_mv")
    mv.refresh()
    dmv = mv.dataset.detail()["materialized_view"]
    assert dmv == {
        "plan_op": "aggregate",
        "source_location": ds.location,
        "source_snapshot_synced": ds.current_snapshot_id,
    }


def test_history_labels_every_operation(spark, tmp_location):
    """DESCRIBE HISTORY analog (round 12): one row per snapshot,
    newest first, operation-labeled across the DML surface; pre-label
    snapshots surface null (see from_dict default), never a guess."""
    from space_spark import field

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    ds = Dataset.create(spark, tmp_location, schema, ["id"])

    def rows(lo, hi):
        return spark.sql(
            f"SELECT id, id * 10 AS v FROM range({lo}, {hi})"
        ).coalesce(1)

    ds.append(rows(0, 20))
    ds.insert(rows(20, 30))
    ds.upsert(rows(5, 10))
    ds.update(field("id") == 7, {"v": 777})
    ds.merge(rows(25, 35))
    ds.delete(field("id") >= 30)
    ds.delete(field("id") == 0, rewrite=False)   # merge-on-read
    ds.overwrite(rows(0, 50))
    for lo in range(100, 130, 10):   # small files for compact to heal
        ds.append(rows(lo, lo + 10))
    ds.compact(target_bytes=1 << 30)
    hist = {r.version: r for r in ds.history().collect()}
    ops = [hist[v].operation for v in sorted(hist)]
    assert ops == [
        "CREATE", "APPEND", "INSERT", "UPSERT", "UPDATE", "MERGE",
        "DELETE", "DELETE", "OVERWRITE", "APPEND", "APPEND", "APPEND",
        "COMPACT",
    ], ops
    # Newest-first ordering, metadata sanity, change-log shape.
    got = ds.history().collect()
    assert [r.version for r in got] == sorted(hist, reverse=True)
    assert hist[max(hist)].operation == "COMPACT"
    assert hist[8].operation == "OVERWRITE" and hist[8].has_deletes
    assert hist[1].n_added_files > 0 and not hist[1].has_deletes
    # Clone origin labels CLONE on the new table.
    clone = ds.clone(tmp_location + "_c")
    assert clone.history().collect()[-1].operation == "CLONE"


def test_history_labels_cdc_streaming_and_maintenance_ops(
    spark, tmp_location, tmp_path
):
    """Round-13 (verdict r12 #7): the ops the main enumeration skips —
    CDC apply, delete-vector folding, the streaming sink, MV refresh,
    and zero-copy load — each write their own label too, so a
    long-lived table's history() names EVERY writer. Rollback is
    metadata-only (no snapshot, nothing to label); pre-round-12
    snapshots keep null operation by design — never guessed (the
    migration path is natural turnover: every NEW commit is labeled,
    and expire_snapshots retires the unlabeled tail)."""
    from space_spark import field
    from space_spark.sources.datasource import register_space_source
    from space_spark.sources.loaders import append_parquet

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ])

    def rows(lo, hi):
        return spark.sql(
            f"SELECT id, id * 10 AS v FROM range({lo}, {hi})"
        ).coalesce(1)

    ds = Dataset.create(spark, tmp_location, schema, ["id"])
    ds.append(rows(0, 20))
    # CDC apply: one atomic adds+deletes snapshot.
    ds.apply_changes(rows(20, 25), rows(0, 3).select("id"))
    # Two MoR deletes then fold the vectors.
    ds.delete(field("id") == 5, rewrite=False)
    ds.delete(field("id") == 6, rewrite=False)
    ds.compact_delete_vectors()
    # Zero-copy external load.
    ext = str(tmp_path / "ext")
    rows(100, 110).write.parquet(ext)
    append_parquet(ds, ext + "/*.parquet")
    # Streaming sink (format('space') writeStream).
    register_space_source(spark)
    sink_loc = str(tmp_path / "sink_tbl")
    sink = Dataset.create(spark, sink_loc, schema, ["id"])
    (spark.readStream.format("space").load(ds.location)
     .writeStream.format("space")
     .option("path", sink_loc)
     .option("checkpointLocation", str(tmp_path / "ckpt"))
     .trigger(availableNow=True)
     .start().awaitTermination(120))
    ops = [r.operation for r in ds.history().collect()]
    assert ops[::-1] == [
        "CREATE", "APPEND", "APPLY CHANGES", "DELETE", "DELETE",
        "COMPACT DELETE VECTORS", "ZERO-COPY LOAD",
    ], ops
    sink_ops = {r.operation for r in sink.reload().history().collect()}
    assert "STREAMING APPEND" in sink_ops, sink_ops
    # MV refresh labels its per-snapshot commits on the MV table.
    view = ds.filter_view(lambda row: row["id"] >= 0)
    mv = view.materialize(spark, str(tmp_path / "mv_tbl"))
    mv.refresh()
    mv_ops = {r.operation for r in mv.dataset.history().collect()}
    assert "MV REFRESH" in mv_ops, mv_ops
