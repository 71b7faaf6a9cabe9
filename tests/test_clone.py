"""Zero-copy shallow clone (Dataset.clone): divergence, isolation,
vacuum safety, MoR carry, version pinning.

Beyond the reference (whose tables cannot fork); semantics modeled on
Delta SHALLOW CLONE / Iceberg snapshot tables.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset
from space_spark.errors import SpaceError, UserInputError

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ]
)


def rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, v=i * 0.5, s=f"s{i}") for i in range(lo, hi)], SCHEMA
    )


@pytest.fixture()
def two_locations():
    d = tempfile.mkdtemp(prefix="space_spark_clone_")
    yield d + "/src", d + "/dst"
    shutil.rmtree(d, ignore_errors=True)


def collect_ids(ds, **kw):
    return sorted(r.id for r in ds.read(**kw).select("id").collect())


def test_clone_reads_source_rows_without_copying_data(
    spark, two_locations
):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    src.append(rows(spark, 10, 20))

    clone = src.clone(dst_loc)
    assert collect_ids(clone) == list(range(20))
    assert clone.metadata.primary_keys == ["id"]
    # Metadata-only: the clone's data directory holds no parquet.
    data_dir = os.path.join(dst_loc, "data")
    assert not [
        f
        for _r, _d, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    ]


def test_clone_then_write_diverges_both_ways(spark, two_locations):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    clone = src.clone(dst_loc)

    clone.append(rows(spark, 100, 105))
    src.append(rows(spark, 200, 203))

    assert collect_ids(clone) == list(range(10)) + [100, 101, 102, 103, 104]
    assert collect_ids(src) == list(range(10)) + [200, 201, 202]


def test_clone_cow_delete_rewrites_locally_source_untouched(
    spark, two_locations
):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    before = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(src_loc, "data"))
        for f in fs
    )

    clone = src.clone(dst_loc)
    from space_spark import field

    clone.delete(field("id") < 3)
    assert collect_ids(clone) == list(range(3, 10))
    assert collect_ids(src) == list(range(10))
    after = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(src_loc, "data"))
        for f in fs
    )
    assert before == after  # CoW landed in the clone, not the source


def test_clone_vacuum_never_reaps_source_files(spark, two_locations):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    clone = src.clone(dst_loc)
    from space_spark import field

    clone.delete(field("id") < 5)  # CoW rewrite -> orphanable history
    clone.expire_snapshots(keep_last=1)
    removed = clone.vacuum(metadata_grace_sec=0.0)
    assert all(not r.startswith("..") for r in removed)
    assert collect_ids(src) == list(range(10))
    assert collect_ids(clone) == list(range(5, 10))


def test_clone_pins_version_and_carries_mor_vectors(
    spark, two_locations
):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    v_after_first = src.current_snapshot_id
    from space_spark import field

    src.delete(field("id") >= 8, rewrite=False)  # MoR vector at head
    src.append(rows(spark, 50, 52))

    pinned = src.clone(dst_loc + "_v1", version=v_after_first)
    assert collect_ids(pinned) == list(range(10))

    head = src.clone(dst_loc + "_head")
    assert collect_ids(head) == list(range(8)) + [50, 51]
    shutil.rmtree(dst_loc + "_v1", ignore_errors=True)
    shutil.rmtree(dst_loc + "_head", ignore_errors=True)


def test_clone_starts_fresh_history_and_resets_stream_progress(
    spark, two_locations
):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 5))
    src.append(rows(spark, 5, 8))
    src.metadata.stream_progress["sinkA"] = 7  # simulate sink bookkeeping
    src.log.write_metadata(src.metadata)

    clone = Dataset.load(spark, src_loc).clone(dst_loc)
    assert list(clone.metadata.snapshots) == [0]
    assert clone.metadata.tags == {}
    assert clone.metadata.stream_progress == {}
    assert clone.versions().count() == 1


def test_clone_refuses_existing_dest(spark, two_locations):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 3))
    src.clone(dst_loc)
    with pytest.raises(SpaceError):
        src.clone(dst_loc)


def test_clone_preserves_renames_and_pruning(spark, two_locations):
    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 10))
    src.rename_column("v", "value")
    clone = src.clone(dst_loc)
    assert "value" in clone.schema.fieldNames()
    from space_spark import field

    # Manifest stats survived the path remap: pruning still works.
    assert len(clone.data_files(filter_=field("id") > 10_000)) == 0
    got = clone.read(filter_=field("id") == 4).collect()
    assert [r.value for r in got] == [2.0]


def test_clone_cdf_bootstrap_warns_about_cut_lineage(
    spark, two_locations
):
    """diff()/readChangeFeed starting at a clone's origin snapshot
    yields no rows for the cloned data (lineage was cut) — the read
    path must say so instead of silently streaming nothing."""
    import warnings

    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 6))
    clone = src.clone(dst_loc)
    clone.append(rows(spark, 10, 12))

    with pytest.warns(UserWarning, match="clone boundary"):
        d = clone.diff(0, clone.current_snapshot_id)
    # The feed still carries post-clone changes — only pre-existing
    # rows are absent.
    assert sorted(r.id for r in d.collect()) == [10, 11]

    # A regular table's diff from version 0 stays silent.
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        src.diff(0, src.current_snapshot_id)

    # The streaming CDC reader warns at construction time too.
    from space_spark.sources.datasource import (
        SpaceChangeFeedStreamReader,
    )
    from space_spark.sources import datasource as ds_mod

    cdf_schema = ds_mod.SpaceDataSource(
        {"path": dst_loc, "readchangefeed": "true"}
    ).schema()
    with pytest.warns(UserWarning, match="clone boundary"):
        SpaceChangeFeedStreamReader(dst_loc, {}, cdf_schema)


# ----------------------------------------------------- record-field clones
REC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def rec_rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, payload=f"blob-{i}".encode() * 50)
         for i in range(lo, hi)], REC_SCHEMA
    )


def test_clone_record_table_reads_identical_blobs(spark, two_locations):
    """Shallow clone of a blob table: addresses resolve through the
    record-base indirection to the SOURCE's blob files, byte-identical,
    with zero blob bytes copied at clone time."""
    src_loc, dst_loc = two_locations
    src = Dataset.create(
        spark, src_loc, REC_SCHEMA, ["id"], record_fields=["payload"]
    )
    src.append(rec_rows(spark, 0, 8))
    clone = src.clone(dst_loc)
    assert clone.metadata.record_bases  # indirection recorded

    got = {r.id: bytes(r.payload) for r in clone.read().collect()}
    want = {i: f"blob-{i}".encode() * 50 for i in range(8)}
    assert got == want
    # No blob bytes were copied: the clone's records dir is absent/empty.
    rec_dir = os.path.join(dst_loc, "records")
    assert not os.path.isdir(rec_dir) or not os.listdir(rec_dir)


def test_clone_record_table_appends_local_blobs(spark, two_locations):
    """Post-clone appends write blobs under the CLONE; reads resolve a
    mix of local and source-based addresses. The source never sees the
    clone's rows."""
    src_loc, dst_loc = two_locations
    src = Dataset.create(
        spark, src_loc, REC_SCHEMA, ["id"], record_fields=["payload"]
    )
    src.append(rec_rows(spark, 0, 4))
    clone = src.clone(dst_loc)
    clone.append(rec_rows(spark, 10, 13))

    got = {r.id: bytes(r.payload) for r in clone.read().collect()}
    assert set(got) == {0, 1, 2, 3, 10, 11, 12}
    assert got[11] == b"blob-11" * 50
    assert os.listdir(os.path.join(dst_loc, "records"))  # local blobs
    assert sorted(r.id for r in src.read().select("id").collect()) == \
        [0, 1, 2, 3]


def test_clone_record_table_random_access(spark, two_locations):
    """RandomAccessDataSource on a clone resolves through the bases."""
    from space_spark.core.random_access import RandomAccessDataSource

    src_loc, dst_loc = two_locations
    src = Dataset.create(
        spark, src_loc, REC_SCHEMA, ["id"], record_fields=["payload"]
    )
    src.append(rec_rows(spark, 0, 6))
    clone = src.clone(dst_loc)
    ra = RandomAccessDataSource(clone, ["payload"])
    assert len(ra) == 6
    assert bytes(ra[2]) == b"blob-2" * 50
    assert [bytes(b) for b in ra.__getitems__([0, 5])] == \
        [b"blob-0" * 50, b"blob-5" * 50]


def test_clone_of_clone_record_chain(spark, two_locations):
    """A clone of a clone inherits the full base chain — addresses from
    the ORIGINAL source still resolve two hops away."""
    src_loc, dst_loc = two_locations
    src = Dataset.create(
        spark, src_loc, REC_SCHEMA, ["id"], record_fields=["payload"]
    )
    src.append(rec_rows(spark, 0, 3))
    c1 = src.clone(dst_loc)
    c1.append(rec_rows(spark, 5, 7))
    c2 = c1.clone(dst_loc + "2")
    got = {r.id: bytes(r.payload) for r in c2.read().collect()}
    assert set(got) == {0, 1, 2, 5, 6}
    assert got[0] == b"blob-0" * 50 and got[6] == b"blob-6" * 50
    assert len(c2.metadata.record_bases) == 2
    shutil.rmtree(dst_loc + "2", ignore_errors=True)


def test_clone_record_table_compact_records_localizes(
    spark, two_locations
):
    """compact_records() on a clone rewrites the shared small blobs
    into blob files UNDER THE CLONE — after it, reads no longer depend
    on the source's records dir."""
    src_loc, dst_loc = two_locations
    src = Dataset.create(
        spark, src_loc, REC_SCHEMA, ["id"], record_fields=["payload"]
    )
    # Two appends -> several small blob files (compaction candidates).
    src.append(rec_rows(spark, 0, 4))
    src.append(rec_rows(spark, 4, 8))
    clone = src.clone(dst_loc)
    clone.compact_records(target_bytes=10 * 1024 * 1024)
    # Source records dir removed: clone must still read everything.
    shutil.rmtree(os.path.join(src_loc, "records"))
    got = {r.id: bytes(r.payload) for r in clone.read().collect()}
    assert got == {i: f"blob-{i}".encode() * 50 for i in range(8)}


def test_expired_parent_snapshot_does_not_warn_clone(
    spark, two_locations
):
    """Review fix: a regular table whose snapshot lineage was severed
    by expire_snapshots must NOT emit the shallow-clone CDF warning —
    only a clone's snapshot-0 origin qualifies."""
    import warnings

    from space_spark import field

    src_loc, _ = two_locations
    ds = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    ds.append(rows(spark, 0, 6))
    ds.delete(field("id") < 2)          # CoW snapshot: rows, no adds
    ds.append(rows(spark, 10, 12))
    kept = ds.expire_snapshots(keep_last=2)
    assert kept  # something actually expired
    start = min(
        s for s in ds.metadata.snapshots
        if ds.metadata.snapshots[s].parent_snapshot_id is None
        or s != 0
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ds.diff(ds.metadata.snapshot(
            ds.current_snapshot_id).parent_snapshot_id,
            ds.current_snapshot_id)


def test_clone_crash_midway_is_recoverable(spark, two_locations):
    """A clone interrupted after creating the dest directory tree but
    before the atomic entrypoint publish leaves NO readable table —
    and a re-clone into the same dest succeeds (exists() is
    entrypoint-based, not directory-based)."""
    from space_spark.core import metadata as md
    from space_spark.errors import SpaceError

    src_loc, dst_loc = two_locations
    src = Dataset.create(spark, src_loc, SCHEMA, ["id"])
    src.append(rows(spark, 0, 5))
    # Simulate the crash: the directory skeleton exists (init_location
    # ran, maybe some manifests copied), but no entrypoint was
    # published.
    dest_log = md.MetadataLog(dst_loc)
    dest_log.init_location()
    with pytest.raises(SpaceError):
        Dataset.load(spark, dst_loc)  # not a table yet
    clone = src.clone(dst_loc)  # retry completes normally
    assert collect_ids(clone) == list(range(5))
