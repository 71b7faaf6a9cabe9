"""Transaction-log durability and hygiene (round-7 review of the commit
core): exclusive create, superseded-metadata reclamation, format-version
fail-fast, no-op update skipping, file:-URI decoding."""

import glob
import json
import os
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset
from space_spark.core import metadata as md
from space_spark.errors import SpaceError

SIMPLE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, val=i / 2.0) for i in range(lo, hi)], SIMPLE
    ).coalesce(1)


def _meta_files(location):
    return sorted(glob.glob(os.path.join(location, "_space",
                                         "metadata_*.json")))


def test_create_publish_is_exclusive(spark, tmp_location):
    """The entrypoint is published with an atomic exclusive link: even a
    racer that passed the exists() pre-check cannot clobber an existing
    table's schema (create/create TOCTOU)."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(_rows(spark, 0, 5))
    before = _meta_files(tmp_location)
    log = md.MetadataLog(tmp_location)
    meta = md.initial_metadata(md.TYPE_DATASET, SIMPLE, ["id"], [], {})
    with pytest.raises(SpaceError, match="already exists"):
        log.write_metadata(meta, create=True)
    # The loser must not have damaged the winner, and must clean up its
    # own already-written metadata file and entrypoint temp.
    assert ds.reload().read().count() == 5
    assert _meta_files(tmp_location) == before
    assert not glob.glob(os.path.join(tmp_location, "_space",
                                      "entrypoint.json.tmp.*"))


def test_vacuum_sees_concurrent_commits(spark, tmp_location):
    """A stale handle's vacuum must not treat files committed by a
    NEWER writer as orphans: liveness comes from a fresh reload, not
    the handle's cached metadata."""
    a = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    a.append(_rows(spark, 0, 5))
    b = Dataset.load(spark, tmp_location)
    b.append(_rows(spark, 5, 10))  # a's cached metadata doesn't know this
    removed = a.vacuum()
    # Spark writer sidecars (_SUCCESS, .crc) are legitimate orphans;
    # no committed DATA file may be reaped.
    data = [r for r in removed
            if r.endswith(".parquet")
            and not os.path.basename(r).startswith(".")]
    assert data == [], data
    assert b.reload().read().count() == 10


def test_vacuum_reclaims_orphan_registry_files(spark, tmp_location):
    """Pickled UDF/serializer orphans (losing create races, dropped
    fields) are age-gated reclaimed; fresh files survive — a create in
    progress writes its pickles before publishing the entrypoint."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(_rows(spark, 0, 3))
    udfs = os.path.join(tmp_location, "_space", "udfs")
    orphan = os.path.join(udfs, "serializer_ghost_deadbeef.pkl")
    with open(orphan, "wb") as f:
        f.write(b"stale pickle")
    assert not any("udfs" in r for r in ds.vacuum())  # fresh: kept
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    removed = ds.vacuum()
    assert any(r.endswith("ghost_deadbeef.pkl") for r in removed)
    assert not os.path.exists(orphan)


def test_vacuum_reclaims_superseded_metadata(spark, tmp_location):
    """Every commit orphans the previous full-copy metadata file; vacuum
    must reclaim them (age-gated) or a frequent committer grows the log
    dir without bound. History stays intact: all snapshots live in the
    CURRENT metadata file."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    for lo in (0, 5, 10):
        ds.append(_rows(spark, lo, lo + 5))
    assert len(_meta_files(tmp_location)) == 4  # create + 3 commits
    # Fresh files survive the default grace...
    kept = ds.vacuum()
    assert not any("metadata_" in r for r in kept)
    # ...and are reclaimed once old enough.
    removed = ds.vacuum(metadata_grace_sec=0)
    meta_removed = [r for r in removed if "metadata_" in r]
    assert len(meta_removed) == 3
    left = _meta_files(tmp_location)
    assert len(left) == 1
    with open(os.path.join(tmp_location, "_space",
                           "entrypoint.json")) as f:
        current = json.load(f)["metadata_file"]
    assert os.path.basename(current) == os.path.basename(left[0])
    ds = Dataset.load(spark, tmp_location)
    assert ds.read().count() == 15
    assert ds.read(version=1).count() == 5  # time travel intact


def test_vacuum_reclaims_crashed_entrypoint_tmp(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(_rows(spark, 0, 3))
    tmp = os.path.join(tmp_location, "_space",
                       "entrypoint.json.tmp.deadbeef")
    with open(tmp, "w") as f:
        f.write('{"metadata_file": "_space/metadata_gone.json"}')
    old = time.time() - 7200
    os.utime(tmp, (old, old))
    removed = ds.vacuum()
    assert any(r.endswith("tmp.deadbeef") for r in removed)
    assert not os.path.exists(tmp)


def test_future_format_version_fails_fast(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(_rows(spark, 0, 3))
    log = md.MetadataLog(tmp_location)
    with open(log.entrypoint_path) as f:
        rel = json.load(f)["metadata_file"]
    path = log.abs_path(rel)
    with open(path) as f:
        doc = json.load(f)
    doc["format_version"] = 2
    with open(path, "w") as f:
        json.dump(doc, f)
    with pytest.raises(SpaceError, match="format_version"):
        Dataset.load(spark, tmp_location)


def test_noop_update_writes_no_metadata_file(spark, tmp_location):
    """expire_snapshots that expires nothing (and any other no-op
    mutate) must not churn an orphan metadata file."""
    ds = Dataset.create(spark, tmp_location, SIMPLE, ["id"])
    ds.append(_rows(spark, 0, 3))
    before = _meta_files(tmp_location)
    ds.expire_snapshots(keep_last=10)
    assert _meta_files(tmp_location) == before


def test_file_uri_location_percent_decodes(tmp_path):
    loc = str(tmp_path / "my table")
    log = md.MetadataLog("file:" + loc.replace(" ", "%20"))
    assert log.location == os.path.abspath(loc)
    assert md.MetadataLog(loc).location == log.location


def test_round11_metadata_fields_survive_serde():
    """record_bases / generated_columns / identity_columns / not_null
    must round-trip to_json <-> from_json exactly — a field silently
    dropped by serde would erase the constraint/indirection on the
    NEXT commit's metadata rewrite."""
    from pyspark.sql import types as T

    from space_spark.core import metadata as md

    meta = md.initial_metadata(
        md.TYPE_DATASET,
        T.StructType([T.StructField("a", T.LongType())]),
        ["a"], [], {"a": 1},
    )
    meta.record_bases = ["../src", "/abs/other"]
    meta.generated_columns = {"g": '{"n":"field","name":"a"}'}
    meta.identity_columns = {"a": {"start": 5, "step": 2,
                                   "watermark": 11}}
    meta.not_null = ["a"]
    back = md.StorageMetadata.from_json(meta.to_json())
    assert back.record_bases == meta.record_bases
    assert back.generated_columns == meta.generated_columns
    assert back.identity_columns == meta.identity_columns
    assert back.not_null == meta.not_null
    # And a second rewrite is byte-stable (no churn per commit).
    assert back.to_json() == meta.to_json()
