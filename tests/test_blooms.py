"""Per-file primary-key Bloom filters (core/blooms.py): unit properties
plus the read_by_keys point-read pruning path end-to-end."""

import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark import Dataset, field
from space_spark.core import blooms as bl

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _df(spark, ids):
    return spark.createDataFrame(
        [Row(k=i, v=f"v{i}") for i in ids], SCHEMA
    )


def test_no_false_negatives_and_sane_fpp():
    vals = list(range(0, 5000, 3)) + [f"s{i}" for i in range(500)]
    bm = bl.build(vals)
    for v in vals:
        assert bl.might_contain(bm, v)
    absent = [f"absent{i}" for i in range(2000)]
    fpp = sum(bl.might_contain(bm, v) for v in absent) / len(absent)
    assert fpp < 0.05, fpp  # ~0.8% expected at 10 bits/key, k=7


def test_empty_or_missing_bloom_never_prunes():
    assert bl.might_contain(b"", 1)
    assert bl.file_matches_any({"k": None}, [{"k": 1}], ["k"])
    assert bl.file_matches_any({}, [{"k": 1}], ["k"])


def test_composite_key_semantics():
    bma = bl.build([1, 2, 3])
    bmb = bl.build(["x", "y"])
    blooms = {"a": bma, "b": bmb}
    assert bl.file_matches_any(blooms, [{"a": 1, "b": "x"}], ["a", "b"])
    # Component-wise misses kill the tuple.
    assert not bl.file_matches_any(
        blooms, [{"a": 99, "b": "x"}], ["a", "b"])
    # Any matching tuple keeps the file.
    assert bl.file_matches_any(
        blooms, [{"a": 99, "b": "zz"}, {"a": 2, "b": "y"}], ["a", "b"])


def test_read_by_keys_prunes_unclustered_files(spark, tmp_location):
    """The case range stats can't help: every file's key range spans the
    whole domain (interleaved appends), so only Bloom membership can
    skip files. 4 appends x interleaved ids; a 2-key probe must touch
    far fewer than all files and still return exact rows."""
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    for r in range(4):
        # Stride-4 interleave: file r holds keys r, r+4, r+8, ... —
        # every file's (min, max) spans ~the whole domain.
        ds.append(_df(spark, range(r, 400, 4)).coalesce(1))
    ds = ds.reload()
    all_files = ds.data_files()
    assert len(all_files) == 4
    keys = _df(spark, [17, 17 + 4]).select("k")  # both in file 1
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    survivors = ds._bloom_prune(all_files, snapshot, keys)
    assert len(survivors) < 4, "bloom pruned nothing"
    got = sorted(r["k"] for r in ds.read_by_keys([17, 21]).collect())
    assert got == [17, 21]


def test_read_by_keys_correct_after_delete_and_rename(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    ds.append(_df(spark, range(0, 100, 2)).coalesce(1))
    ds.append(_df(spark, range(1, 100, 2)).coalesce(1))
    ds.delete(field("k") == 21)  # CoW rewrite must rebuild blooms
    ds.rename_column("k", "key")  # blooms live under the physical name
    ds = Dataset.load(spark, tmp_location)
    got = sorted(r["key"] for r in ds.read_by_keys([20, 21, 22]).collect())
    assert got == [20, 22]
    got2 = {r["key"]: r["v"] for r in ds.read_by_keys([7]).collect()}
    assert got2 == {7: "v7"}


def test_bloom_skipped_for_oversized_key_sets(spark, tmp_location):
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    ds.append(_df(spark, range(50)))
    ds.BLOOM_PROBE_MAX_KEYS = 3
    keys = _df(spark, [1, 2, 3, 4, 5]).select("k")
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    files = ds.data_files()
    assert ds._bloom_prune(files, snapshot, keys) == files
    got = sorted(r["k"] for r in ds.read_by_keys([1, 2, 3, 4, 5]).collect())
    assert got == [1, 2, 3, 4, 5]


def test_default_tables_unchanged(spark, tmp_location):
    """bloom_filters defaults OFF: no bloom metadata, no manifest
    columns, read_by_keys identical to before."""
    from space_spark.core import manifests as mf

    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"])
    ds.append(_df(spark, range(20)))
    assert ds.metadata.bloom is None
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    blooms = mf.read_file_blooms(
        ds._manifest_abs_paths(snapshot), ["k"])
    assert all(v["k"] is None for v in blooms.values())
    assert sorted(r["k"] for r in ds.read_by_keys([3, 7]).collect()) \
        == [3, 7]


def test_zero_copy_load_builds_blooms(spark, tmp_location):
    """External (zero-copy) file loads on a bloom table must index the
    foreign files too, or the index silently degrades to never-prune."""
    from space_spark.core import manifests as mf
    from space_spark.sources.loaders import append_parquet

    ext = tmp_location + "_ext"
    _df(spark, range(30)).coalesce(1).write.parquet(ext)
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    append_parquet(ds, ext + "/*.parquet")
    ds = ds.reload()
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    blooms = mf.read_file_blooms(
        ds._manifest_abs_paths(snapshot), ["k"])
    assert blooms and all(v["k"] for v in blooms.values())
    assert sorted(r["k"] for r in ds.read_by_keys([5, 29]).collect()) \
        == [5, 29]


def test_distributed_stats_path_builds_blooms(spark, tmp_location):
    """Appends writing more than _DRIVER_STATS_MAX_FILES files collect
    footer stats via a distributed parallelize map — the bloom build
    must survive that executor-side path too (closure pickling, the
    in-function blooms import), not just the driver loop."""
    from space_spark.core import manifests as mf

    n_files = mf._DRIVER_STATS_MAX_FILES + 4
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    ds.append(_df(spark, range(720)).repartition(n_files))
    ds = ds.reload()
    assert len(ds.data_files()) >= n_files - 1
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    blooms = mf.read_file_blooms(
        ds._manifest_abs_paths(snapshot), ["k"])
    assert len(blooms) >= n_files - 1
    assert all(v["k"] for v in blooms.values())
    got = sorted(r["k"] for r in ds.read_by_keys([5, 700]).collect())
    assert got == [5, 700]
    # And the probe actually prunes: two keys live in at most two files.
    keys = _df(spark, [5, 700]).select("k")
    survivors = ds._bloom_prune(ds.data_files(), snapshot, keys)
    assert len(survivors) <= 4  # 2 true files + tolerated fp margin


def test_build_arrow_equals_scalar_build():
    """The vectorized arrow build and the scalar build must produce
    BIT-IDENTICAL filters — the probe hashes scalar-side."""
    import pyarrow as pa

    ints = list(range(-500, 500, 7)) + [0, 2**62, -(2**62)]
    assert bl.build_arrow(pa.chunked_array([pa.array(ints)])) \
        == bl.build(ints)
    strs = [f"doc-{i}" for i in range(300)]
    assert bl.build_arrow(pa.chunked_array([pa.array(strs)])) \
        == bl.build(strs)
    # Nulls skipped identically.
    assert bl.build_arrow(pa.array([1, None, 2]), n_keys=2) \
        == bl.build([1, None, 2], n_keys=2)


def test_canonical_temporal_hashing():
    """date/datetime values hash as their epoch integers, so arrow
    (tz-aware UTC) and Spark (unix_micros/unix_date longs) agree."""
    import datetime as dt

    import pyarrow as pa

    ts = [dt.datetime(2024, 3, 1, 12, 30, 0, 250, tzinfo=dt.timezone.utc),
          dt.datetime(1969, 12, 31, 23, 59, 59, tzinfo=dt.timezone.utc)]
    micros = [int((t - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc))
                  / dt.timedelta(microseconds=1)) for t in ts]
    bm = bl.build_arrow(pa.array(ts, pa.timestamp("us", tz="UTC")))
    for m in micros:
        assert bl.might_contain(bm, m)
    days = [19000, 0, -365]
    bmd = bl.build_arrow(pa.array(days, pa.int32()).cast(pa.date32()))
    for d in days:
        assert bl.might_contain(bmd, d)


def test_timestamp_pk_bloom_no_false_negatives(spark, tmp_location):
    """ADVICE r8 (medium): v1 hashed str(value) — build-side tz-aware
    pyarrow timestamps vs probe-side naive session-tz Spark timestamps
    rendered differently, so bloom-enabled timestamp-PK tables silently
    DROPPED matching rows. v2 canonicalizes both sides to epoch micros;
    this must hold even under a non-UTC session timezone."""
    import datetime as dt

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    # tz-AWARE instants: naive datetimes are themselves ambiguous in
    # Spark (tuple-form createDataFrame localizes in system tz, the
    # Arrow path in session tz) — aware values pin the instant so this
    # test isolates the bloom hash divergence, not literal semantics.
    base = dt.datetime(2024, 5, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    rows = [Row(ts=base + dt.timedelta(minutes=i), v=f"v{i}")
            for i in range(40)]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        ds = Dataset.create(spark, tmp_location, schema, ["ts"],
                            bloom_filters=True)
        # Two interleaved files so ranges overlap and only blooms prune.
        ds.append(spark.createDataFrame(rows[0::2], schema).coalesce(1))
        ds.append(spark.createDataFrame(rows[1::2], schema).coalesce(1))
        ds = ds.reload()
        probe = [rows[3].ts, rows[7].ts]  # both in file 2
        got = sorted(r["v"] for r in ds.read_by_keys(probe).collect())
        assert got == ["v3", "v7"], got  # v1 bug: [] (false negatives)
        keys = spark.createDataFrame([(p,) for p in probe], ["ts"])
        snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
        survivors = ds._bloom_prune(ds.data_files(), snapshot, keys)
        assert len(survivors) == 1, "bloom should prune the even file"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_version_gate_makes_old_filters_inert(spark, tmp_location):
    """A table whose pinned bloom version differs from this code's must
    neither build nor probe filters — degrade to semi-join, never to a
    wrong (false-negative) prune."""
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    ds.append(_df(spark, range(20)).coalesce(1))
    assert ds.metadata.bloom["v"] == bl.BLOOM_VERSION
    ds.metadata.bloom["v"] = bl.BLOOM_VERSION - 1  # simulate old table
    assert ds._bloom_pks() == ()
    snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
    keys = _df(spark, [999999]).select("k")  # absent key: v2 would prune
    assert ds._bloom_prune(ds.data_files(), snapshot, keys) \
        == ds.data_files()


def test_null_probe_key_never_matches_never_crashes(spark, tmp_location):
    """Review r9: a NULL row in the probe key set (e.g. from an outer
    join) must not crash the bloom probe — PKs are NOT NULL, so a null
    component simply matches nothing."""
    assert bl.might_contain(bl.build([1, 2, 3]), None) is False
    ds = Dataset.create(spark, tmp_location, SCHEMA, ["k"],
                        bloom_filters=True)
    ds.append(_df(spark, range(10)).coalesce(1))
    keys = spark.createDataFrame([(3,), (None,)], "k long")
    got = sorted(r["k"] for r in ds.read_by_keys(keys).collect())
    assert got == [3]


def test_tz_naive_timestamp_builds_no_filter():
    """Review r9: isAdjustedToUTC=false parquet timestamps are
    wall-clock, not instants — hashing them would false-negative under
    a non-UTC session. No filter (None) -> never prunes."""
    import pyarrow as pa

    naive = pa.array([1000000, 2000000], pa.int64()).cast(
        pa.timestamp("us"))  # tz=None
    assert bl.build_arrow(naive) is None
    aware = pa.array([1000000], pa.int64()).cast(
        pa.timestamp("us", tz="UTC"))
    assert bl.build_arrow(aware) is not None


def test_old_writer_bloom_columns_are_invisible(tmp_path):
    """Review r9: the manifest column name is version-suffixed
    (_BLOOM2_) — filters written by a previous release (under _BLOOM_)
    read back as None, so version-skewed writers degrade the index to
    never-prune instead of mis-probing v1 bitmaps with v2 hashes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from space_spark.core import manifests as mf

    assert mf.BLOOM_PREFIX == "_BLOOM2_"
    path = str(tmp_path / "manifest-old.parquet")
    pq.write_table(pa.table({
        mf.FILE_PATH_COL: ["data/f1.parquet"],
        mf.NUM_ROWS_COL: pa.array([10], pa.int64()),
        mf.SIZE_BYTES_COL: pa.array([100], pa.int64()),
        "_BLOOM_k": pa.array([b"\xff" * 16], pa.binary()),
    }), path)
    blooms = mf.read_file_blooms([path], ["k"])
    assert blooms["data/f1.parquet"]["k"] is None


def test_build_arrow_default_sizing_matches_scalar():
    """Review r9: both builders size AFTER dropping nulls, keeping the
    bit-identical contract for the default n_keys argument too."""
    import pyarrow as pa

    vals = list(range(200)) + [None] * 50
    assert bl.build(vals) == bl.build_arrow(pa.array(vals, pa.int64()))


def test_int96_naive_is_utc_build_matches_aware():
    """ADVICE r10 (medium): Spark's DEFAULT outputTimestampType is
    INT96, which pyarrow reads as tz-NAIVE ns holding UTC instants.
    With naive_is_utc (the footer-proven INT96 case) the build must be
    bit-identical to the tz-aware build — and still degrade to None
    without the proof."""
    import pyarrow as pa

    micros = [1000000, 2000000, -5000000]
    naive_ns = pa.array([m * 1000 for m in micros], pa.int64()).cast(
        pa.timestamp("ns"))  # tz=None, as pyarrow reads INT96
    aware = pa.array(micros, pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    built = bl.build_arrow(naive_ns, naive_is_utc=True)
    assert built == bl.build_arrow(aware)
    for m in micros:
        assert bl.might_contain(built, m)
    # Sub-micro nanos (a foreign INT96 writer): lossy cast -> degrade.
    subs = pa.array([1500, 2500], pa.int64()).cast(pa.timestamp("ns"))
    assert bl.build_arrow(subs, naive_is_utc=True) is None


def test_int96_timestamp_pk_prunes_under_default_conf(spark, tmp_location):
    """ADVICE r10 (medium): under Spark's DEFAULT parquet conf (INT96
    timestamps) a bloom table with a timestamp PK used to silently
    build NO filters — every append paid the PK re-read for zero
    pruning. The footer's physical type now proves the values are UTC
    instants; filters build and prune, even under a non-UTC session."""
    import datetime as dt

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.StringType()),
    ])
    base = dt.datetime(2024, 5, 1, 0, 0, 0, tzinfo=dt.timezone.utc)
    rows = [Row(ts=base + dt.timedelta(minutes=i), v=f"v{i}")
            for i in range(40)]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        ds = Dataset.create(spark, tmp_location, schema, ["ts"],
                            bloom_filters=True)
        ds.append(spark.createDataFrame(rows[0::2], schema).coalesce(1))
        ds.append(spark.createDataFrame(rows[1::2], schema).coalesce(1))
        ds = ds.reload()
        # Filters were actually BUILT (not the silent-None degrade).
        snapshot = ds.metadata.snapshot(ds.current_snapshot_id)
        probe = [rows[3].ts, rows[7].ts]  # both odd-minute -> file 2
        got = sorted(r["v"] for r in ds.read_by_keys(probe).collect())
        assert got == ["v3", "v7"], got
        keys = spark.createDataFrame([(p,) for p in probe], ["ts"])
        survivors = ds._bloom_prune(ds.data_files(), snapshot, keys)
        assert len(survivors) == 1, \
            "INT96 timestamp PK built no usable bloom filters"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.outputTimestampType", old_tt)


def test_tz_naive_degrade_warns():
    """The no-filter degrade must be loud: the table pays the PK
    re-read on every append for zero pruning otherwise (ADVICE r9)."""
    import warnings

    import pyarrow as pa

    naive = pa.array([1000000], pa.int64()).cast(pa.timestamp("us"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert bl.build_arrow(naive) is None
    assert any("bloom filter degraded" in str(x.message) for x in w)


# ---------------------------- non-PK bloom columns (round 12)
WIDE = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("trace_id", T.StringType()),
    T.StructField("payload", T.StringType()),
])


def _wide(spark, lo, hi):
    # trace ids are high-cardinality and UNcorrelated with k, so k-range
    # file layout gives min/max stats nothing to prune on trace_id.
    return spark.sql(
        f"SELECT id AS k, concat('t-', md5(cast(id AS string))) AS trace_id,"
        f" repeat('x', 8) AS payload FROM range({lo}, {hi})"
    ).coalesce(1)


def test_bloom_on_non_pk_column_prunes_equality_reads(
    spark, tmp_location
):
    """bloom_filters=[...]: a top-level equality conjunct on the
    indexed non-PK column prunes files by MEMBERSHIP where min/max
    stats prune nothing (every file spans the full md5 domain)."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"],
        bloom_filters=["trace_id"],
    )
    for lo in range(0, 400, 100):
        ds.append(_wide(spark, lo, lo + 100))
    assert len(ds.data_files()) == 4
    probe = ds.read().where(F.col("k") == 250).select("trace_id") \
        .collect()[0].trace_id
    hit = ds.data_files(filter_=field("trace_id") == probe)
    assert len(hit) == 1, hit  # membership pruning: 1 of 4 files
    got = ds.read(filter_=field("trace_id") == probe).collect()
    assert [r.k for r in got] == [250]
    # A value present in NO file prunes everything (bloom has no
    # false negatives, so zero survivors is PROOF of absence).
    assert ds.data_files(filter_=field("trace_id") == "t-absent") == []
    # Compound conjunct: equality rides along with a range term.
    both = ds.data_files(
        filter_=(field("trace_id") == probe) & (field("k") >= 0)
    )
    assert len(both) == 1


def test_bloom_equality_never_descends_or_subtrees(spark, tmp_location):
    """(trace==absent) OR (k==5) matches rows via the k arm — an OR
    subtree cannot force equality on every row, so the bloom pruner
    must not use it (only the top-level And-spine is walked)."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"],
        bloom_filters=["trace_id"],
    )
    ds.append(_wide(spark, 0, 100))
    flt = (field("trace_id") == "t-absent") | (field("k") == 5)
    assert len(ds.data_files(filter_=flt)) == 1
    assert [r.k for r in ds.read(filter_=flt).collect()] == [5]


def test_read_by_keys_degrades_when_pks_not_bloom_covered(
    spark, tmp_location
):
    """A custom index that omits the PKs: read_by_keys falls back to
    range + semi-join (no crash, correct rows); equality pruning on
    the indexed column still engages."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"],
        bloom_filters=["trace_id"],
    )
    ds.append(_wide(spark, 0, 50))
    got = ds.read_by_keys([7, 11]).select("k").collect()
    assert sorted(r.k for r in got) == [7, 11]


def test_bloom_filters_list_validation(spark, tmp_location):
    from space_spark.errors import UserInputError

    with pytest.raises(UserInputError, match="unknown column"):
        Dataset.create(spark, tmp_location + "/a", WIDE, ["k"],
                       bloom_filters=["ghost"])
    # Empty list is falsy -> same as bloom_filters=False (no index).
    ds = Dataset.create(spark, tmp_location + "/b", WIDE, ["k"],
                        bloom_filters=[])
    assert ds.metadata.bloom is None
    with pytest.raises(UserInputError, match="duplicate"):
        Dataset.create(spark, tmp_location + "/c", WIDE, ["k"],
                       bloom_filters=["trace_id", "trace_id"])


def test_bloom_prunes_isin_lists(spark, tmp_location):
    """isin desugars to a single-column Or-of-equals chain — the
    extractor recognizes it and a file survives when ANY member might
    be present (IN-list point reads: a batch of content hashes)."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"],
        bloom_filters=["trace_id"],
    )
    for lo in range(0, 400, 100):
        ds.append(_wide(spark, lo, lo + 100))
    probes = [r.trace_id for r in ds.read()
              .where(F.col("k").isin([50, 250])).collect()]
    hit = ds.data_files(filter_=field("trace_id").isin(probes))
    assert len(hit) == 2, hit  # two files of four hold the members
    got = ds.read(filter_=field("trace_id").isin(probes)).collect()
    assert sorted(r.k for r in got) == [50, 250]
    # All-absent IN prunes everything; mixed OR across columns doesn't
    # engage the bloom (not a single-column chain) but stays correct.
    assert ds.data_files(
        filter_=field("trace_id").isin(["a", "b"])) == []
    mixed = (field("trace_id") == "absent") | (field("k") == 7)
    assert [r.k for r in ds.read(filter_=mixed).collect()] == [7]


def test_explain_files_reports_pruning_stages(spark, tmp_location):
    """explain_files: per-stage survivor counts — stats leave all 4
    k-range files for an unclustered trace_id equality, bloom
    membership drops to 1; the engaged-columns map names the index
    and literal count; MoR sidecar count rides along."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"],
        bloom_filters=["trace_id"],
    )
    for lo in range(0, 400, 100):
        ds.append(_wide(spark, lo, lo + 100))
    probe = ds.read().where(F.col("k") == 250).collect()[0].trace_id
    rep = ds.explain_files(field("trace_id") == probe)
    assert rep["files_total"] == 4
    assert rep["files_after_stats"] == 4   # min/max can't help here
    assert rep["files_after_bloom"] == 1   # membership can
    assert rep["bloom_engaged"] == {"trace_id": 1}
    assert rep["delete_vector_sidecars"] == 0
    # Range filter on the clustered key: stats do the work, bloom
    # doesn't engage.
    rep2 = ds.explain_files((field("k") >= 0) & (field("k") < 100))
    assert rep2["files_after_stats"] == 1
    assert rep2["files_after_bloom"] == 1
    assert rep2["bloom_engaged"] == {}
    # No filter: totals only.
    rep3 = ds.explain_files()
    assert rep3["files_total"] == rep3["files_after_bloom"] == 4
    # MoR delete: the sidecar count surfaces.
    ds.delete(field("k") == 1, rewrite=False)
    assert ds.explain_files()["delete_vector_sidecars"] == 1


def test_bloom_bits_per_key_sizes_filters_and_stays_probe_compatible(
    spark, tmp_location
):
    """bloom_bits_per_key is a BUILD-side knob: a 16-b/k table writes
    ~1.6x larger per-file filters (lower FPP) while probes — which
    read the bitmap's own length — prune identically; validation
    rejects out-of-range values."""
    from space_spark.core import manifests as mf
    from space_spark.errors import UserInputError

    def mk(loc, bpk):
        ds = Dataset.create(
            spark, loc, WIDE, ["k"], bloom_filters=["trace_id"],
            bloom_bits_per_key=bpk,
        )
        ds.append(_wide(spark, 0, 2000))
        return ds

    small = mk(tmp_location + "/s", None)   # default 10 b/k
    big = mk(tmp_location + "/b", 16)
    assert big.metadata.bloom["bpk"] == 16
    assert "bpk" not in small.metadata.bloom

    def filter_len(ds):
        snap = ds.metadata.snapshot(ds.current_snapshot_id)
        by_file = mf.read_file_blooms(
            ds._manifest_abs_paths(snap), ["trace_id"]
        )
        (blooms,) = by_file.values()
        return len(blooms["trace_id"])

    assert filter_len(big) == filter_len(small) * 16 // 10  # 1.6x bytes
    # Both prune a point read the same way (membership is exact for
    # present values; the knob only moves the false-positive rate).
    for ds in (small, big):
        probe = ds.read().where(F.col("k") == 7).collect()[0].trace_id
        assert len(ds.data_files(filter_=field("trace_id") == probe)) == 1
        assert ds.read(
            filter_=field("trace_id") == probe
        ).collect()[0].k == 7
    with pytest.raises(UserInputError, match=r"\[5, 20\]"):
        Dataset.create(spark, tmp_location + "/x", WIDE, ["k"],
                       bloom_filters=True, bloom_bits_per_key=40)


def test_set_bloom_alters_index_on_existing_table(spark, tmp_location):
    """ALTER surface: enable the index on a grown table (old files
    have no filters and are never pruned — correct, just unhelped;
    new appends build), re-size, re-target, and drop."""
    ds = Dataset.create(spark, tmp_location, WIDE, ["k"])
    ds.append(_wide(spark, 0, 100))          # pre-index file
    assert ds.metadata.bloom is None
    ds.set_bloom(["trace_id"], bits_per_key=12)
    assert ds.metadata.bloom["pks"] == ["trace_id"]
    assert ds.metadata.bloom["bpk"] == 12
    for lo in range(100, 400, 100):          # indexed files
        ds.append(_wide(spark, lo, lo + 100))
    # A probe living in an INDEXED file: the un-filtered legacy file
    # survives (absent filter never prunes), the other two indexed
    # files drop -> 2 of 4.
    probe = ds.read().where(F.col("k") == 250).collect()[0].trace_id
    assert len(ds.data_files(filter_=field("trace_id") == probe)) == 2
    got = ds.read(filter_=field("trace_id") == probe).collect()
    assert [r.k for r in got] == [250]
    # A probe living in the LEGACY file: still found (its file has no
    # filter to prune it).
    probe0 = ds.read().where(F.col("k") == 5).collect()[0].trace_id
    got0 = ds.read(filter_=field("trace_id") == probe0).collect()
    assert 5 in {r.k for r in got0}
    # Survives reload; drop restores the unindexed plan.
    assert Dataset.load(spark, ds.location).metadata.bloom["bpk"] == 12
    ds.set_bloom(None)
    assert ds.metadata.bloom is None
    assert len(ds.data_files(filter_=field("trace_id") == probe)) == 4


def test_type_mismatched_equality_literal_never_misprunes(
    spark, tmp_location
):
    """Second round-12 review: a literal whose python type mismatches
    the indexed column (string col == int) must NOT hash in the wrong
    domain and silently prune matching files — pruning skips (engaged
    stays empty) and Spark's own coercing row filter decides."""
    ds = Dataset.create(spark, tmp_location, WIDE, ["k"],
                        bloom_filters=["trace_id"])
    # trace ids that LOOK numeric, so a coercing comparison can match.
    ds.append(spark.sql(
        "SELECT id AS k, cast(id AS string) AS trace_id,"
        " 'x' AS payload FROM range(0, 50)"
    ).coalesce(1))
    rep = ds.explain_files(field("trace_id") == 7)   # int vs string col
    assert rep["bloom_engaged"] == {}, rep
    assert rep["files_after_bloom"] == rep["files_after_stats"]
    got = ds.read(filter_=field("trace_id") == 7).collect()
    assert [r.k for r in got] == [7]                  # Spark coerced
    # Float literal on the string column: no crash, no prune, defer.
    rep2 = ds.explain_files(field("trace_id") == 7.5)
    assert rep2["bloom_engaged"] == {}
    assert ds.read(filter_=field("trace_id") == 7.5).count() == 0


def test_drop_column_cleans_bloom_index(spark, tmp_location):
    """Second round-12 review: dropping a bloom-indexed non-PK column
    must remove it from the index config, or every later write's
    footer-stats pass crashes reading the dropped column."""
    ds = Dataset.create(spark, tmp_location, WIDE, ["k"],
                        bloom_filters=["trace_id", "payload"])
    ds.append(_wide(spark, 0, 50))
    ds.drop_column("payload")
    assert ds.metadata.bloom["pks"] == ["trace_id"]
    ds.append(_wide(spark, 50, 100).drop("payload"))  # must not crash
    assert ds.read().count() == 100
    ds.drop_column("trace_id")
    assert ds.metadata.bloom is None                  # empty -> dropped
    ds.append(spark.sql(
        "SELECT id AS k FROM range(100, 110)").coalesce(1))
    assert ds.read().count() == 110


def test_oversized_in_list_skips_bloom_probe(spark, tmp_location):
    """IN lists above BLOOM_PROBE_MAX_KEYS skip the probe (same
    discipline as the point-read path) instead of building a giant
    one-row canonicalization plan."""
    ds = Dataset.create(spark, tmp_location, WIDE, ["k"],
                        bloom_filters=["trace_id"])
    ds.append(_wide(spark, 0, 50))
    probe = ds.read().where(F.col("k") == 7).collect()[0].trace_id
    big = [f"absent{i}" for i in range(30)] + [probe]
    ds.BLOOM_PROBE_MAX_KEYS = 10   # shrink the cap for the test
    try:
        rep = ds.explain_files(field("trace_id").isin(big))
        assert rep["bloom_engaged"] == {}              # over cap: off
        got = ds.read(filter_=field("trace_id").isin(big)).collect()
        assert [r.k for r in got] == [7]
    finally:
        del ds.BLOOM_PROBE_MAX_KEYS


def test_bloom_read_touches_only_survivor_row_groups(tmp_location):
    """write_manifest splits bloom-bearing manifests into bounded row
    groups, and read_file_blooms(only_files=...) decodes ONLY the row
    groups containing survivors — a needle probe on a 100k-file table
    must never materialize the whole bloom column on the driver
    (round-12 judge finding). Accounting makes the cost observable."""
    import pyarrow.parquet as pq

    from space_spark.core import manifests as mf

    os.makedirs(tmp_location, exist_ok=True)
    path = os.path.join(tmp_location, "manifest.parquet")
    bloom = bytes(bl.build(list(range(20000))))
    n = 400
    rels = [f"data/f{i:04d}.parquet" for i in range(n)]
    stats = [
        {"num_rows": 10, "size_bytes": 100, "mins": {"k": i},
         "maxs": {"k": i}, "blooms": {"k": bloom}}
        for i in range(n)
    ]
    mf.write_manifest(None, path, rels, stats, [("k", T.LongType())],
                      bloom_pks=["k"])
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 3, md.num_row_groups

    acc = {}
    got = mf.read_file_blooms([path], ["k"], only_files={rels[5]},
                              accounting=acc)
    assert set(got) == {rels[5]}
    assert got[rels[5]]["k"] == bloom
    assert acc["bloom_row_groups_read"] == 1
    assert acc["bloom_row_groups_total"] == md.num_row_groups

    acc_full = {}
    full = mf.read_file_blooms([path], ["k"], accounting=acc_full)
    assert len(full) == n
    assert acc_full["bloom_row_groups_read"] == md.num_row_groups
    # The needle probe decoded a strict fraction of the bloom bytes.
    assert 0 < acc["bloom_bytes_read"] * 2 < acc_full["bloom_bytes_read"]
    # Result equals the full read restricted to the survivor.
    assert got == {rels[5]: full[rels[5]]}

    # Survivors spread across groups: one decode per touched group.
    acc2 = {}
    got2 = mf.read_file_blooms(
        [path], ["k"], only_files={rels[0], rels[-1]}, accounting=acc2
    )
    assert set(got2) == {rels[0], rels[-1]}
    assert acc2["bloom_row_groups_read"] == 2


def test_explain_files_reports_bloom_probe_cost(spark, tmp_location):
    """explain_files surfaces what the membership probe COST: bloom
    bytes decoded and row groups touched/present."""
    ds = Dataset.create(
        spark, tmp_location, WIDE, ["k"], bloom_filters=["trace_id"],
    )
    for lo in range(0, 200, 100):
        ds.append(_wide(spark, lo, lo + 100))
    probe = ds.read().where(F.col("k") == 50).collect()[0].trace_id
    rep = ds.explain_files(field("trace_id") == probe)
    assert rep["bloom_bytes_read"] > 0
    assert rep["bloom_row_groups_read"] >= 1
    assert rep["bloom_row_groups_read"] <= rep["bloom_row_groups_total"]
    # No engagement -> no bloom bytes decoded.
    rep2 = ds.explain_files((field("k") >= 0) & (field("k") < 100))
    assert rep2["bloom_bytes_read"] == 0
    assert rep2["bloom_row_groups_read"] == 0


def test_driver_prune_gate_ignores_bloom_bytes(tmp_location, monkeypatch):
    """prune_files' driver-vs-Spark decision must size the manifests by
    their STATS bytes, not raw file size: blooms dominate an indexed
    manifest and the arrow prune never reads them, so counting them
    would demote an indexed table to the distributed manifest scan at a
    few hundred files (round 13)."""
    import pyarrow.parquet as pq

    from space_spark.core import manifests as mf

    os.makedirs(tmp_location, exist_ok=True)
    path = os.path.join(tmp_location, "manifest.parquet")
    bloom = bytes(bl.build(list(range(50000))))  # ~62 KB per file
    n = 80
    rels = [f"data/f{i:03d}.parquet" for i in range(n)]
    stats = [
        {"num_rows": 10, "size_bytes": 100, "mins": {"k": i * 10},
         "maxs": {"k": i * 10 + 9}, "blooms": {"k": bloom}}
        for i in range(n)
    ]
    mf.write_manifest(None, path, rels, stats, [("k", T.LongType())],
                      bloom_pks=["k"])
    # Force the gate low enough that RAW size (with blooms) exceeds it
    # but stats-only bytes do not.
    raw = os.path.getsize(path)
    md = pq.ParquetFile(path).metadata
    stats_bytes = sum(
        md.row_group(rg).column(ci).total_compressed_size
        for rg in range(md.num_row_groups)
        for ci in range(md.row_group(rg).num_columns)
        if not md.row_group(rg).column(ci).path_in_schema
        .startswith("_BLOOM")
    )
    assert stats_bytes < raw // 10, (stats_bytes, raw)
    monkeypatch.setattr(mf, "_DRIVER_PRUNE_MAX_BYTES", raw // 2)

    calls = []
    real = mf._prune_files_arrow

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(mf, "_prune_files_arrow", spy)
    from space_spark import field

    got = mf.prune_files(None, [path], field("k") < 20,
                         [("k", T.LongType())])
    assert calls, "arrow (driver) prune should run despite raw size"
    assert sorted(got) == [rels[0], rels[1]], got


def test_bloom_row_group_split_bounds_skewed_filters(tmp_location):
    """The row-group cut is running-byte, not average-based: a few
    large filters among many tiny ones must not pack hundreds of MBs
    into one group (round-13 review). Every group's bloom payload stays
    under the cap (+ at most one row's filter, since a cut happens on
    overflow)."""
    import pyarrow.parquet as pq

    from space_spark.core import manifests as mf

    os.makedirs(tmp_location, exist_ok=True)
    path = os.path.join(tmp_location, "manifest.parquet")
    big = bytes(bl.build(list(range(400_000))))     # ~500 KB
    tiny = bytes(bl.build(list(range(200))))        # ~256 B
    n = 3000
    blooms = [big if i % 300 == 0 else tiny for i in range(n)]
    rels = [f"data/f{i:04d}.parquet" for i in range(n)]
    stats = [
        {"num_rows": 10, "size_bytes": 100, "mins": {"k": i},
         "maxs": {"k": i}, "blooms": {"k": blooms[i]}}
        for i in range(n)
    ]
    mf.write_manifest(None, path, rels, stats, [("k", T.LongType())],
                      bloom_pks=["k"])
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 2
    cap = mf._BLOOM_RG_MAX_BYTES + len(big)
    offset = 0
    for rg in range(md.num_row_groups):
        n_rows = md.row_group(rg).num_rows
        assert n_rows <= 4096
        group_bytes = sum(
            len(b) for b in blooms[offset:offset + n_rows]
        )
        assert group_bytes <= cap, (rg, group_bytes)
        offset += n_rows
    # Round-trip intact: a survivor-bounded read still returns the
    # right bytes for a big-filter row and a tiny-filter row.
    got = mf.read_file_blooms([path], ["k"],
                              only_files={rels[0], rels[1]})
    assert got[rels[0]]["k"] == big and got[rels[1]]["k"] == tiny
