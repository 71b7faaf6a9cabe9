"""MV refresh over a LONG source history: the refresh loop applies one
MV commit per source snapshot (history mirroring, ray/runners.py:200-215
analog) and its driver-side metadata work stays linear in snapshots —
pinned before anyone points a streaming writer at it.

Source snapshots are synthesized by direct log commits re-adding one
tiny real data file (mirrors test_scale_planning.py's synthesis
approach: refresh planning never needs distinct file contents), so the
test measures the refresh loop itself, not 60 slow source appends."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from space_spark import Dataset
from space_spark.core import metadata as md

N_SNAPSHOTS = 60


@pytest.fixture()
def long_history_source(spark, tmp_location):
    df = spark.range(5).coalesce(1).select(
        F.col("id"), (F.col("id") % 2).alias("v")
    )
    ds = Dataset.create(spark, tmp_location, df.schema, ["id"])
    ds.append(df)
    base = ds.metadata.snapshot(ds.current_snapshot_id)
    rel_file = base.added_files[0]
    for _ in range(N_SNAPSHOTS - 1):
        parent_id = ds.current_snapshot_id
        parent = ds.metadata.snapshot(parent_id)
        snap = md.Snapshot(
            snapshot_id=-1,
            parent_snapshot_id=parent_id,
            created_at="",
            manifest_files=list(parent.manifest_files),
            num_rows=parent.num_rows + 5,
            data_bytes=parent.data_bytes,
            added_files=[rel_file],
            record_manifest_files=list(parent.record_manifest_files),
        )
        ds.metadata = ds.log.commit_snapshot(parent_id, ds.branch, snap)
    return ds


def test_refresh_applies_one_commit_per_snapshot(
    spark, tmp_location, long_history_source
):
    ds = long_history_source
    assert len(ds.metadata.snapshots) >= N_SNAPSHOTS

    def ident(batch):
        return {"id": batch["id"], "v": batch["v"]}

    view = ds.map_batches(
        ident,
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("v", T.LongType())]),
    )
    mv = view.materialize(spark, tmp_location + "_mv")
    start = time.perf_counter()
    applied = mv.refresh()
    elapsed = time.perf_counter() - start
    assert len(applied) == N_SNAPSHOTS
    # One MV commit per source snapshot: history mirrors history.
    mv_versions = mv.dataset.versions().count()
    assert mv_versions >= N_SNAPSHOTS
    # Synced marker advanced to the head in the SAME commits (no separate
    # marker writes to race a crash through).
    info = mv.dataset.metadata.logical_plan
    assert int(info["source_snapshot_synced"]) == ds.current_snapshot_id
    # Bounded wall-clock: linear small-job work, no quadratic metadata
    # pass. Generous bound for shared-VM variance (60 tiny appends).
    assert elapsed < 240, f"refresh took {elapsed:.1f}s for {N_SNAPSHOTS}"
    # Incremental: a second refresh is a no-op and near-instant.
    t2 = time.perf_counter()
    assert mv.refresh() == []
    assert time.perf_counter() - t2 < 10
