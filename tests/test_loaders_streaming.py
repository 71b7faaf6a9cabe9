"""Zero-copy loaders (mirrors reference tests/core/loaders/) and the
streaming surface."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset, field
from space_spark.errors import UserInputError
from space_spark.sources.loaders import append_binary_files, append_parquet
from space_spark.streaming.changefeed import (
    ChangeFeedProcessor,
    stream_append,
    stream_apply_changes,
    stream_upsert,
    windowed_event_counts,
)

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def test_append_parquet_zero_copy(spark, tmp_location):
    ext_dir = tmp_location + "_ext"
    spark.createDataFrame(
        [Row(id=i, val=i / 2.0) for i in range(40)], SIMPLE
    ).coalesce(2).write.parquet(ext_dir)

    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    append_parquet(ds, ext_dir + "/*.parquet")
    assert ds.read().count() == 40
    # Zero copy: no new data files under the table location.
    assert os.listdir(os.path.join(ds.location, "data")) == []
    # Stats still drive pruning on the foreign files.
    assert len(ds.data_files(field("id") > 1000)) == 0

    with pytest.raises(UserInputError):
        append_parquet(ds, ext_dir + "/nothing-*.parquet")


def test_append_parquet_rejects_null_pks_without_footer_stats(
    spark, tmp_location
):
    """A foreign writer that records NO column statistics must not
    sneak null primary keys past the footer check: the loader falls
    back to a column-pruned scan of the PK column (ADVICE r6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ext_dir = tmp_location + "_ext"
    os.makedirs(ext_dir)
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2, None], pa.int64()),
            "val": pa.array([0.1, 0.2, 0.3], pa.float64()),
        }),
        os.path.join(ext_dir, "nostats.parquet"),
        write_statistics=False,
    )
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    with pytest.raises(UserInputError, match="[Nn]ull"):
        append_parquet(ds, ext_dir + "/*.parquet")
    # Stats-free but null-free files load fine (one extra scan, no error).
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "val": pa.array([0.1, 0.2, 0.3], pa.float64()),
        }),
        os.path.join(ext_dir, "nostats.parquet"),
        write_statistics=False,
    )
    append_parquet(ds, ext_dir + "/*.parquet")
    assert ds.read().count() == 3


def test_append_binary_files_zero_copy(spark, tmp_location):
    blob_dir = tmp_location + "_blobs"
    os.makedirs(blob_dir)
    for i in range(5):
        with open(os.path.join(blob_dir, f"img_{i}.bin"), "wb") as f:
            f.write(f"payload-{i}".encode() * (i + 1))

    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    ds = Dataset.create(
        spark, tmp_location, schema, ["name"], record_fields=["payload"]
    )

    def index_fn(payload: bytes, path: str):
        return {
            "name": os.path.basename(path),
            "n_bytes": len(payload),
        }

    append_binary_files(ds, blob_dir + "/*.bin", index_fn, "payload")
    got = ds.read().orderBy("name").collect()
    assert [r.name for r in got] == [f"img_{i}.bin" for i in range(5)]
    assert got[1].payload == b"payload-1" * 2  # resolved from ORIGINAL file
    # Addresses point outside the table dir (zero copy).
    ref = ds.read(reference_read=True).orderBy("name").collect()
    assert all(r.payload._FILE.endswith(".bin") for r in ref)


def test_change_feed_processor(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(20)], SIMPLE))
    ds.delete(field("id") < 5)

    seen = []
    ckpt = tmp_location + "_ckpt/progress.json"
    proc = ChangeFeedProcessor(ds, ckpt)
    processed = proc.process_available(
        lambda df, sid, ctype: seen.append((sid, ctype, df.count()))
    )
    assert processed == [1, 2]
    assert seen == [(1, "ADD", 20), (2, "DELETE", 5)]

    # Checkpointed: nothing new -> no work; new commit -> only the delta.
    assert proc.process_available(lambda *a: seen.append(a)) == []
    ds.append(spark.createDataFrame([Row(id=100, val=1.0)], SIMPLE))
    seen.clear()
    assert proc.process_available(
        lambda df, sid, ctype: seen.append((sid, ctype, df.count()))
    ) == [3]
    assert seen == [(3, "ADD", 1)]


def test_stream_append_into_table(spark, tmp_location):
    src_dir = tmp_location + "_stream_src"
    spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(15)], SIMPLE
    ).coalesce(1).write.parquet(src_dir)

    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    stream = (
        spark.readStream.format("parquet").schema(SIMPLE)
        .option("maxFilesPerTrigger", "1").load(src_dir)
    )
    q = stream_append(stream, ds, tmp_location + "_stream_ckpt")
    q.awaitTermination(120)
    q.stop()
    assert ds.reload().read().count() == 15


def test_stream_upsert_into_table(spark, tmp_location):
    """CDC-style streaming merge: later micro-batches REPLACE matching
    keys; replays converge (idempotent upsert)."""
    src_dir = tmp_location + "_up_src"
    # two source files processed as separate micro-batches: base rows,
    # then an update wave overlapping half the keys
    spark.createDataFrame(
        [Row(id=i, val=0.0) for i in range(10)], SIMPLE
    ).coalesce(1).write.parquet(src_dir)
    spark.createDataFrame(
        [Row(id=i, val=99.0) for i in range(5, 15)], SIMPLE
    ).coalesce(1).write.mode("append").parquet(src_dir)

    ds = Dataset.create(spark, tmp_location + "_up", SIMPLE, ["id"])
    stream = (
        spark.readStream.format("parquet").schema(SIMPLE)
        .option("maxFilesPerTrigger", "1").load(src_dir)
    )
    q = stream_upsert(stream, ds, tmp_location + "_up_ckpt")
    q.awaitTermination(120)
    q.stop()
    got = {r["id"]: r["val"] for r in ds.reload().read().collect()}
    assert len(got) == 15
    # keys 5-14 carry the update wave's value regardless of batch order
    # interleaving (each file is one batch; both orders end identically
    # here because the waves' overlap rows differ only in val and the
    # later-arriving file is the update)
    assert all(got[i] == 99.0 for i in range(10, 15))
    assert all(got[i] in (0.0, 99.0) for i in range(5, 10))
    # replaying the same batch is a no-op state-wise (idempotence)
    ds.upsert(spark.createDataFrame(
        [Row(id=i, val=99.0) for i in range(5, 15)], SIMPLE))
    got2 = {r["id"]: r["val"] for r in ds.reload().read().collect()}
    assert len(got2) == 15 and all(got2[i] == 99.0 for i in range(5, 15))


def test_stream_apply_changes_replicates_table(spark, tmp_location):
    """readChangeFeed -> stream_apply_changes: the target converges to
    the source's state across append + upsert + delete, even when the
    availableNow catch-up packs all three snapshots into one batch (the
    per-key latest-change reduction nets delete+add to the add)."""
    from space_spark.sources.datasource import register_space_source

    register_space_source(spark)
    src = Dataset.create(spark, tmp_location + "_cdc_src", SIMPLE, ["id"])
    src.append(spark.createDataFrame(
        [Row(id=i, val=float(i)) for i in range(20)], SIMPLE))
    src.upsert(spark.createDataFrame(
        [Row(id=i, val=-1.0) for i in range(5, 10)]
        + [Row(id=i, val=-2.0) for i in range(20, 25)], SIMPLE))
    src.delete(field("id") >= 15)  # drops 15..19 and 20..24

    tgt = Dataset.create(spark, tmp_location + "_cdc_tgt", SIMPLE, ["id"])
    feed = (
        spark.readStream.format("space")
        .option("readChangeFeed", "true")
        .load(src.location)
    )
    q = stream_apply_changes(feed, tgt, tmp_location + "_cdc_ckpt")
    q.awaitTermination(180)
    q.stop()
    want = {r["id"]: r["val"] for r in src.reload().read().collect()}
    got = {r["id"]: r["val"] for r in tgt.reload().read().collect()}
    assert got == want
    assert set(got) == set(range(15))
    assert all(got[i] == -1.0 for i in range(5, 10))

    # replaying the whole feed from scratch converges (idempotence)
    q2 = stream_apply_changes(
        spark.readStream.format("space")
        .option("readChangeFeed", "true").load(src.location),
        tgt, tmp_location + "_cdc_ckpt2",
    )
    q2.awaitTermination(180)
    q2.stop()
    got2 = {r["id"]: r["val"] for r in tgt.reload().read().collect()}
    assert got2 == want


def test_windowed_event_counts(spark):
    ev_schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    import datetime as dt
    import tempfile

    src = tempfile.mkdtemp(prefix="space_stream_") + "/ev"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=base + dt.timedelta(minutes=m), event_type="click")
        for m in range(12)
    ]
    spark.createDataFrame(rows, ev_schema).coalesce(1).write.parquet(src)

    agg = windowed_event_counts(spark, src, ev_schema, window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("win_counts").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.sql(
        "SELECT n FROM win_counts ORDER BY window_start"
    ).collect()
    assert [r.n for r in got] == [5, 5, 2]


def test_stream_dedup_keeps_first_arrival(spark, tmp_location):
    """Duplicate keys across micro-batches are dropped within the
    watermark horizon; state stays bounded by the watermark."""
    from space_spark.streaming.changefeed import stream_dedup

    ev = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_location + "_sd_src"
    spark.createDataFrame(
        [Row(k=1, ts=t0, v="a"), Row(k=2, ts=t0, v="b")], ev
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [Row(k=1, ts=t0 + dt.timedelta(minutes=1), v="dup"),
         Row(k=3, ts=t0 + dt.timedelta(minutes=1), v="c")], ev
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(ev)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = stream_dedup(stream, "k", "ts")
    q = (
        out.writeStream.format("memory").queryName("sd_out")
        .option("checkpointLocation", tmp_location + "_sd_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = {r["k"]: r["v"] for r in spark.sql(
        "SELECT * FROM sd_out").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] in ("a", "dup")  # exactly one arrival of k=1 kept
    assert spark.sql("SELECT * FROM sd_out WHERE k = 1").count() == 1


def test_zero_copy_loads_labeled_in_history(spark, tmp_location):
    """Zero-copy loads stamp their operation like every other commit
    path (second round-12 review: they were the one unlabeled site,
    indistinguishable from legacy-client commits in history())."""
    import pyarrow.parquet as _pq

    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    ext = tmp_location + "_ext"
    src.coalesce(1).write.parquet(ext)
    from space_spark.sources.loaders import append_parquet

    ds = Dataset.create(spark, tmp_location, src.schema, ["r_regionkey"])
    append_parquet(ds, ext + "/*.parquet")
    ops = {r.version: r.operation for r in ds.history().collect()}
    assert ops[max(ops)] == "ZERO-COPY LOAD", ops


def test_append_parquet_all_empty_files_is_a_noop(spark, tmp_location):
    """Zero-row external files register nothing — and leave no orphan
    manifest behind (round-13 review: the shared commit loop links no
    manifest for rows == 0, so writing one first would orphan it)."""
    import glob

    ext = tmp_location + "_ext"
    spark.createDataFrame([], SIMPLE).coalesce(1).write.parquet(ext)
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    v0 = ds.current_snapshot_id
    manifests_before = set(
        glob.glob(os.path.join(ds.location, "metadata", "manifest_*"))
    )
    append_parquet(ds, ext + "/*.parquet")
    assert ds.current_snapshot_id == v0
    assert ds.read().count() == 0
    manifests_after = set(
        glob.glob(os.path.join(ds.location, "metadata", "manifest_*"))
    )
    assert manifests_after == manifests_before


def test_zero_copy_not_null_proven_from_footers_no_scan(
    spark, tmp_location
):
    """r14-opt (r13 verdict #5): on a NOT-NULL-only table, a zero-copy
    load whose files' own footers prove null_count == 0 for every NOT
    NULL column must run ZERO Spark jobs for the validation — the
    whole load is driver-side footer work. A file that footers can't
    clear (or that actually violates) still scans and still rejects."""
    from space_spark.errors import ConstraintViolationError

    ext = tmp_location + "_ext"
    spark.createDataFrame(
        [Row(id=1, val=1.0), Row(id=2, val=2.0)], SIMPLE
    ).coalesce(1).write.parquet(ext)
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"],
                        not_null=["val"])
    jt = spark.sparkContext._jsc.sc().statusTracker()
    before = set(jt.getJobIdsForGroup(None))
    append_parquet(ds, ext + "/*.parquet")
    after = set(jt.getJobIdsForGroup(None))
    assert after == before, "proven-clean zero-copy load ran Spark jobs"
    assert ds.read().count() == 2

    # A violating external file is still rejected (the footer proof
    # can never pass it: its null count is nonzero).
    bad = tmp_location + "_bad"
    spark.createDataFrame(
        [Row(id=3, val=None)], SIMPLE
    ).coalesce(1).write.parquet(bad)
    with pytest.raises(ConstraintViolationError, match=r"NOT NULL\(val\)"):
        append_parquet(ds, bad + "/*.parquet")
