"""Streaming MV maintenance: stream_refresh drives a MaterializedView
off the source's CDC readStream end-to-end (the streaming form of
MaterializedView.refresh — round-8 capability, beyond the batch-only
reference change feed, SURVEY.md §2.8/§2.9)."""

from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset, MaterializedView
from space_spark.sources.datasource import register_space_source
from space_spark.streaming.changefeed import stream_refresh

from tests.test_views import (  # noqa: F401
    DOUBLE_SCHEMA,
    SIMPLE,
    make_double_udf,
    simple_df,
)


def _drain(q):
    assert q.awaitTermination(600), "stream_refresh did not drain in 600s"
    q.stop()


def _mv_state(mv):
    return sorted(
        (r["int64"], r["double"])
        for r in MaterializedView.load(mv.spark, mv.dataset.location)
        .read().collect()
    )


def _expected(view):
    return sorted((r["int64"], r["double"]) for r in view.read().collect())


def test_stream_refresh_converges_and_marks_synced(spark, tmp_location):
    register_space_source(spark)
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["int64"])
    # map + filter chain: the filter makes UPDATED-to-fail rows a real
    # case (the MV must drop them even though the transform emits
    # nothing for them).
    view = (
        ds.map_batches(make_double_udf(), DOUBLE_SCHEMA)
        .filter(lambda row: row["double"] >= 1.0, input_fields=["double"])
    )
    mv = view.materialize(spark, tmp_location + "_mv")

    # Mutations: append (ids 0..9 -> double=i/5, filter keeps i>=5),
    # upsert id 7 to float64=0.0 (double=0.0 -> filtered OUT: must
    # vanish), upsert id 3 to float64=9.0 (double=18 -> filtered IN:
    # appears), CoW delete id 9.
    ds.append(simple_df(spark, range(10)))
    ds.upsert(spark.createDataFrame(
        [Row(int64=7, float64=0.0), Row(int64=3, float64=9.0)], SIMPLE))
    from space_spark import field

    ds.delete(field("int64") == 9)

    _drain(stream_refresh(mv, tmp_location + "_ckpt"))

    assert _mv_state(mv) == _expected(view)
    got = dict(_mv_state(mv))
    assert 7 not in got      # updated to fail the filter
    assert got[3] == 18.0    # updated to pass the filter
    assert 9 not in got      # deleted at the source

    # Marker landed with the commit: a batch refresh has nothing to do.
    reloaded = MaterializedView.load(spark, mv.dataset.location)
    assert reloaded.refresh() == []


def test_stream_refresh_is_incremental_across_runs(spark, tmp_location):
    register_space_source(spark)
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["int64"])
    view = ds.map_batches(make_double_udf(), DOUBLE_SCHEMA)
    mv = view.materialize(spark, tmp_location + "_mv")
    ckpt = tmp_location + "_ckpt"

    ds.append(simple_df(spark, range(5)))
    _drain(stream_refresh(mv, ckpt))
    v1 = mv.dataset.reload().current_snapshot_id
    assert _mv_state(mv) == _expected(view)

    # Second batch of source commits; SAME checkpoint resumes from the
    # stream's offsets — exactly one more MV commit for the catch-up.
    ds.append(simple_df(spark, range(10, 15)))
    ds.upsert(spark.createDataFrame([Row(int64=2, float64=2.0)], SIMPLE))
    mv2 = MaterializedView.load(spark, mv.dataset.location)
    _drain(stream_refresh(mv2, ckpt))
    assert _mv_state(mv2) == _expected(view)
    v2 = mv2.dataset.reload().current_snapshot_id
    assert v2 == v1 + 1  # one availableNow micro-batch = one commit

    # Batch and streaming maintenance interleave: batch refresh sees
    # the marker the stream committed and applies only what's new.
    ds.append(simple_df(spark, range(20, 22)))
    mv3 = MaterializedView.load(spark, mv.dataset.location)
    assert len(mv3.refresh()) == 1
    assert _mv_state(mv3) == _expected(view)


def test_stream_refresh_replayed_batch_converges(spark, tmp_location):
    """Crash between the MV commit and the stream checkpoint advance =
    the batch replays; apply_changes re-applies the same net changes to
    the same keys, so the MV state (and the monotone marker) converge."""
    register_space_source(spark)
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["int64"])
    view = ds.map_batches(make_double_udf(), DOUBLE_SCHEMA)
    mv = view.materialize(spark, tmp_location + "_mv")
    ds.append(simple_df(spark, range(8)))

    # First run with checkpoint A, then replay the SAME feed with a
    # fresh checkpoint B — the worst-case full replay.
    _drain(stream_refresh(mv, tmp_location + "_ckptA"))
    state_once = _mv_state(mv)
    mv_b = MaterializedView.load(spark, mv.dataset.location)
    _drain(stream_refresh(mv_b, tmp_location + "_ckptB",
                          starting_version=0))
    assert _mv_state(mv_b) == state_once == _expected(view)


def test_stream_refresh_resolves_record_sources(spark, tmp_location):
    """Round-9 verdict #5: blob-column sources stream too. The CDC feed
    carries address structs; the sink must resolve them to BYTES before
    the view runs — proven by a view that computes over the blob
    content itself, converging to the batch-refresh result."""
    register_space_source(spark)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    ds = Dataset.create(spark, tmp_location, schema, ["k"],
                        record_fields=["payload"])

    def blob_len_udf():
        def fn(batch):
            return {"k": batch["k"],
                    "n": [len(b) if b is not None else -1
                          for b in batch["payload"]]}
        return fn

    out_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("n", T.LongType()),
    ])
    view = ds.map_batches(blob_len_udf(), out_schema)
    mv = view.materialize(spark, tmp_location + "_mv")

    def rows(ids):
        return spark.createDataFrame(
            [Row(k=i, payload=bytes([i % 250] * (i + 1))) for i in ids],
            schema,
        )

    ds.append(rows(range(6)))
    # Upsert id 2 with a 2-byte blob: the MV must see the NEW bytes.
    ds.upsert(spark.createDataFrame([Row(k=2, payload=b"xx")], schema))
    from space_spark import field

    ds.delete(field("k") == 5)

    _drain(stream_refresh(mv, tmp_location + "_ckpt"))

    got = sorted(
        (r["k"], r["n"])
        for r in MaterializedView.load(spark, mv.dataset.location)
        .read().collect()
    )
    assert got == [(0, 1), (1, 2), (2, 2), (3, 4), (4, 5)], got
    # Marker atomic with the commit: batch refresh has nothing left.
    assert MaterializedView.load(spark, mv.dataset.location).refresh() \
        == []
