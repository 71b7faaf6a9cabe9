"""compact(): the small-files maintenance operator. Rewrites under-sized
data files into ~target-sized ones as a NO-CHANGE snapshot — rows
identical, diff() across the compaction empty, blobs untouched."""

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _rows(spark, ids):
    # JVM-side literal plan (r14 suite wall time): the list-of-Rows
    # form is a Python-RDD plan paying worker round-trips on every one
    # of this file's ~50 trickle appends. Same ids, same val = id/2.0
    # doubles, same schema.
    ids = list(ids)
    lo, hi = (min(ids), max(ids) + 1) if ids else (0, 0)
    df = spark.range(lo, hi).select(
        F.col("id"), (F.col("id") / F.lit(2.0)).alias("val")
    )
    if ids != list(range(lo, hi)):
        df = df.where(F.col("id").isin(ids))
    return df.coalesce(1)


@pytest.fixture()
def fragmented(spark, tmp_location):
    """8 trickle appends -> 8 tiny data files."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    for i in range(8):
        ds.append(_rows(spark, range(i * 10, (i + 1) * 10)))
    return ds


def test_compact_merges_small_files(spark, fragmented):
    ds = fragmented
    assert len(ds.data_files()) == 8
    before = sorted((r.id, r.val) for r in ds.read().collect())
    v_before = ds.current_snapshot_id

    ds.compact(target_bytes=64 * 1024 * 1024)

    files = ds.data_files()
    assert len(files) == 1  # ceil(tiny bytes / 64MB) == 1
    after = sorted((r.id, r.val) for r in ds.read().collect())
    assert after == before
    # Row/byte accounting stays consistent.
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    assert snap.num_rows == 80
    # The compaction snapshot carries NO changelog: diff across it is
    # empty, so MVs/changefeeds replay nothing.
    assert ds.diff(v_before, None).count() == 0
    # ...but history is preserved: time travel still sees the old layout.
    assert ds.read(version=v_before).count() == 80


def test_compact_noop_when_healthy(spark, fragmented):
    ds = fragmented
    v = ds.current_snapshot_id
    # Tiny target: every existing file is already >= 50% of target, so
    # nothing qualifies and no snapshot is committed.
    ds.compact(target_bytes=2)
    assert ds.current_snapshot_id == v
    assert len(ds.data_files()) == 8


def test_compact_skips_healthy_keeps_pruning(spark, tmp_location):
    """Only the under-sized files are rewritten; a healthy file's bytes
    are never touched (its path survives compaction verbatim)."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    big = spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(20000)], SIMPLE
    ).coalesce(1)
    ds.append(big)
    healthy = set(ds.data_files())
    for i in range(4):
        ds.append(_rows(spark, range(30000 + i * 5, 30005 + i * 5)))
    assert len(ds.data_files()) == 5

    # Threshold (=target/2) sits between the tiny files (~1 KB) and the
    # big one (hundreds of KB): only the tiny files qualify.
    ds.compact(target_bytes=100 * 1024)

    files = set(ds.data_files())
    assert healthy <= files, "healthy file was rewritten"
    assert len(files) == 2  # big file + one merged small file
    assert ds.read().count() == 20020


def test_compact_clustered_restores_pruning(spark, tmp_location):
    """cluster_by re-sorts the merged rows so manifest min/max pruning
    selects ~one file per point lookup again."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    # Interleaved appends destroy range locality: every file spans the
    # whole id domain.
    for i in range(6):
        ds.append(_rows(spark, range(i, 600, 6)))
    assert len(ds.data_files(filter_=(field("id") == 17))) == 6

    ds.compact(target_bytes=1024 * 1024, cluster_by=["id"])
    nf = len(ds.data_files())
    assert nf == 1
    assert ds.read().count() == 600
    assert sorted(r.id for r in ds.read().collect()) == list(range(0, 600))


def test_compact_record_fields_blobs_untouched(spark, tmp_location):
    """Compaction is index-file-only: record blobs keep their addresses
    and files, like CoW delete survivors."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    for i in range(4):
        ds.append(
            spark.createDataFrame(
                [Row(id=j, payload=f"p{j}".encode())
                 for j in range(i * 5, (i + 1) * 5)],
                schema,
            ).coalesce(1)
        )
    blob_files = sorted(
        glob.glob(os.path.join(ds.location, "records", "*"))
    )
    assert len(ds.data_files()) == 4

    ds.compact(target_bytes=64 * 1024 * 1024)

    assert len(ds.data_files()) == 1
    assert sorted(
        glob.glob(os.path.join(ds.location, "records", "*"))
    ) == blob_files
    got = ds.read().orderBy("id").collect()
    assert [r.payload for r in got] == [
        f"p{j}".encode() for j in range(20)
    ]
    # Addresses still resolve post-compaction (random access path).
    refs = ds.read(reference_read=True).orderBy("id").collect()
    assert all(r.payload._FILE.startswith("records/") for r in refs)


def test_compact_then_delete_and_diff(spark, fragmented):
    """The table stays fully functional after compaction: CoW delete and
    the change feed operate on the compacted layout."""
    ds = fragmented
    ds.compact(target_bytes=64 * 1024 * 1024)
    v = ds.current_snapshot_id
    ds.delete(field("id") < 10)
    assert ds.read().count() == 70
    d = ds.diff(v, None)
    assert d.filter("_change_type = 'DELETE'").count() == 10
    assert d.filter("_change_type = 'ADD'").count() == 0


def test_compact_records_merges_blobs_and_preserves_reads(
    spark, tmp_location
):
    """20 trickle record appends -> compact_records leaves a handful of
    blob files; read(), reference resolution, random access and diff()
    are unchanged; old blobs survive for time travel until vacuumed."""
    from space_spark.core.random_access import RandomAccessDataSource

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    for i in range(20):
        ds.append(
            spark.createDataFrame(
                [Row(id=i * 2, payload=f"blob-{i * 2}".encode()),
                 Row(id=i * 2 + 1, payload=f"blob-{i * 2 + 1}".encode())],
                schema,
            ).coalesce(1)
        )
    before = {r["id"]: r["payload"] for r in ds.read().collect()}
    ra_before = RandomAccessDataSource(ds, ["payload"]).__getitems__(
        list(range(10))
    )
    old_blobs = set(
        glob.glob(os.path.join(ds.location, "records", "*.parquet"))
    )
    assert len(old_blobs) == 20
    pre_version = ds.current_snapshot_id

    ds.compact_records(target_bytes=64 * 1024 * 1024)

    # Live refs now point at <= 2 compacted blobs...
    live_refs = {
        r["payload"]["_FILE"]
        for r in ds.read(reference_read=True).collect()
    }
    assert len(live_refs) <= 2
    assert all("_compact_" in p for p in live_refs)
    # ...and every read path is value-identical.
    after = {r["id"]: r["payload"] for r in ds.read().collect()}
    assert after == before
    assert RandomAccessDataSource(ds, ["payload"]).__getitems__(
        list(range(10))
    ) == ra_before
    # No-change commit: empty change feed across the compaction.
    d = ds.diff(pre_version, None)
    assert d.count() == 0
    # Time travel still resolves through the OLD blobs...
    tt = {r["id"]: r["payload"]
          for r in ds.read(version=pre_version).collect()}
    assert tt == before
    # ...so vacuum keeps them while the old snapshot is live, and
    # removes them once expired.
    ds.vacuum()
    assert old_blobs <= set(
        glob.glob(os.path.join(ds.location, "records", "*.parquet"))
    )
    ds.expire_snapshots(keep_last=1)
    ds.vacuum()
    remaining = set(
        glob.glob(os.path.join(ds.location, "records", "*.parquet"))
    )
    assert not (old_blobs & remaining)
    assert {r["id"]: r["payload"] for r in ds.read().collect()} == before


def test_compact_records_noop_cases(spark, tmp_location):
    """Healthy blobs (over the ratio threshold) and single-small-file
    fields are never rewritten; tables without record fields no-op."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    ds.append(spark.createDataFrame(
        [Row(id=1, payload=b"x")], schema).coalesce(1))
    blobs = sorted(glob.glob(os.path.join(ds.location, "records", "*")))
    v = ds.current_snapshot_id
    ds.compact_records()  # one small file: nothing to merge
    assert ds.current_snapshot_id == v
    assert sorted(
        glob.glob(os.path.join(ds.location, "records", "*"))
    ) == blobs

    plain = Dataset.create(
        spark, tmp_location + "_plain",
        T.StructType([T.StructField("id", T.LongType())]), ["id"],
    )
    pv = plain.current_snapshot_id
    plain.compact_records()
    assert plain.current_snapshot_id == pv


def test_compact_records_no_per_blob_driver_io(
    spark, tmp_location, monkeypatch
):
    """Round-6 invariant: compaction PLANNING does zero per-candidate-
    blob driver I/O — sizes and row counts ride the record manifests.
    Parquet footer reads of existing blobs on the driver are banned
    outright; stat calls are allowed only for the NEW compacted blobs
    (the record-manifest writer sizes its own output)."""
    import pyarrow.parquet as pq_mod

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    for i in range(6):
        ds.append(spark.createDataFrame(
            [Row(id=i, payload=f"p{i}".encode())], schema).coalesce(1))

    real_read_metadata = pq_mod.read_metadata
    real_getsize = os.path.getsize

    def guarded_read_metadata(path, *a, **kw):
        assert "/records/" not in str(path), (
            f"driver footer read of blob {path} during compact_records"
        )
        return real_read_metadata(path, *a, **kw)

    def guarded_getsize(path):
        if "/records/" in str(path):
            assert "_compact_" in str(path), (
                f"driver stat of pre-existing blob {path} during "
                "compact_records planning"
            )
        return real_getsize(path)

    monkeypatch.setattr(pq_mod, "read_metadata", guarded_read_metadata)
    monkeypatch.setattr(os.path, "getsize", guarded_getsize)
    ds.compact_records()
    monkeypatch.undo()

    got = {r["id"]: r["payload"] for r in ds.reload().read().collect()}
    assert got == {i: f"p{i}".encode() for i in range(6)}


def test_compact_records_crash_before_commit_is_recoverable(
    spark, tmp_location
):
    """A crash AFTER the compacted blobs are written but BEFORE the
    commit must leave the table untouched (readers never see the new
    blobs) and leave only orphans that vacuum() reclaims — the
    write-then-commit ordering every CoW maintenance op follows."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    for i in range(5):
        ds.append(spark.createDataFrame(
            [Row(id=i, payload=f"p{i}".encode())], schema).coalesce(1))
    before = {r["id"]: r["payload"] for r in ds.read().collect()}
    v = ds.current_snapshot_id

    orig = ds._commit_rewrite

    def crash(*a, **kw):
        raise RuntimeError("simulated crash before compaction commit")

    ds._commit_rewrite = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            ds.compact_records()
    finally:
        ds._commit_rewrite = orig

    # Orphaned compacted blobs exist on disk but the table ignores them.
    orphans = [p for p in glob.glob(
        os.path.join(ds.location, "records", "*.parquet"))
        if "_compact_" in p]
    assert orphans, "crash point did not run after the blob write"
    fresh = Dataset.load(spark, tmp_location)
    assert fresh.current_snapshot_id == v
    assert {r["id"]: r["payload"] for r in fresh.read().collect()} == before

    removed = fresh.vacuum()
    assert all(not os.path.exists(p) for p in orphans)
    assert any("_compact_" in r for r in removed)
    # ...and a re-run compaction completes normally afterwards.
    fresh.compact_records()
    assert {r["id"]: r["payload"]
            for r in fresh.read().collect()} == before


def test_compact_records_conflict_retry(spark, tmp_location):
    """A concurrent append landing between compact_records' snapshot pin
    and its commit forces TransactionConflictError; the retry re-derives
    against the new head (including the freshly appended blob) and the
    final table is complete and value-correct."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"]
    )
    for i in range(6):
        ds.append(spark.createDataFrame(
            [Row(id=i, payload=f"p{i}".encode())], schema).coalesce(1))
    intruder = Dataset.load(spark, tmp_location)

    orig = ds._commit_rewrite
    state = {"commits": 0}

    def racing_commit(*args, **kwargs):
        state["commits"] += 1
        if state["commits"] == 1:
            intruder.append(spark.createDataFrame(
                [Row(id=100, payload=b"p100")], schema).coalesce(1))
        return orig(*args, **kwargs)

    ds._commit_rewrite = racing_commit
    try:
        ds.compact_records()
    finally:
        ds._commit_rewrite = orig
    assert state["commits"] >= 2  # first attempt conflicted, retry ran
    got = {r["id"]: r["payload"] for r in ds.read().collect()}
    assert got == {**{i: f"p{i}".encode() for i in range(6)},
                   100: b"p100"}


def test_compact_where_rewrites_only_overlapping_small_files(
    spark, fragmented
):
    """Partial compaction (OPTIMIZE ... WHERE analog): only small files
    whose manifest stats overlap the predicate are rewritten; the rest
    of the fragmentation is untouched."""
    ds = fragmented
    before_files = set(ds.data_files())
    assert len(before_files) == 8
    rows_before = sorted((r.id, r.val) for r in ds.read().collect())

    # Files hold ids [0,10), [10,20), ... — compact only ids < 40.
    ds.compact(target_bytes=64 * 1024 * 1024, where=field("id") < 40)

    after_files = set(ds.data_files())
    # 4 overlapping small files merged into 1; 4 untouched survive.
    untouched = before_files & after_files
    assert len(untouched) == 4
    assert len(after_files) == 5
    assert sorted((r.id, r.val) for r in ds.read().collect()) \
        == rows_before
    # The untouched half is exactly the id >= 40 range.
    pruned = set(ds.data_files(filter_=field("id") >= 40))
    assert pruned == untouched


def test_compact_where_no_overlap_is_noop(spark, fragmented):
    ds = fragmented
    v = ds.current_snapshot_id
    ds.compact(target_bytes=64 * 1024 * 1024,
               where=field("id") > 10_000)
    assert ds.current_snapshot_id == v  # nothing to do, no commit


def test_compact_where_unknown_column_raises(spark, fragmented):
    from space_spark.errors import UserInputError

    with pytest.raises(UserInputError, match="pric"):
        fragmented.compact(where=field("pric") > 5)
