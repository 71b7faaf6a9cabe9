"""Row-level delete bitmap sidecar: encoding + end-to-end changelog.

Mirrors the reference's RowBitmap change log (metadata.proto:160-191,
ops/change_data.py:126-141): deletions are logged as per-file row-position
bitmaps with O(deleted) bytes, and the DELETE stream is reconstructible by
re-reading the parent version's files masked by the bitmap."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from space_spark import Dataset, field, lit
from space_spark.core import bitmaps as bm
from space_spark.errors import UserInputError


# ------------------------------------------------------------- unit: encoding
def test_sparse_encoding_is_o_deleted():
    # 1 deleted row out of 1M: 5 bytes (tag + one uint32), not 125 KB.
    blob = bm.encode_positions(np.array([123456]), 1_000_000)
    assert len(blob) == 5
    assert bm.decode_positions(blob, 1_000_000).tolist() == [123456]


def test_dense_encoding_caps_at_bitset():
    # Half the file deleted: bitset (n/8 bytes) beats 4-byte positions.
    n = 10_000
    pos = np.arange(0, n, 2)
    blob = bm.encode_positions(pos, n)
    assert len(blob) == 1 + (n + 7) // 8
    assert np.array_equal(bm.decode_positions(blob, n), pos)


def test_empty_and_full():
    assert bm.decode_positions(bm.encode_positions(np.array([]), 100),
                               100).size == 0
    full = np.arange(100)
    assert np.array_equal(
        bm.decode_positions(bm.encode_positions(full, 100), 100), full
    )


def test_all_rows_encoding_is_o1():
    """A full-file delete encodes in ONE byte at any row count — the
    reference's RowBitmap.all_rows flag (metadata.proto:182). Both the
    explicit encode_all path and encode_positions' full-set detection
    hit it, and count/merge never materialize positions."""
    for n in (1, 100, 2_000_000_000):  # 2e9 rows: arange would be 16 GB
        blob = bm.encode_all(n)
        assert len(blob) == 1 and bm.is_all(blob)
        assert bm.count_positions(blob, n) == n
    # encode_positions recognizes a full set (small n only — the point
    # of encode_all is that callers never build the full array).
    full = np.arange(500)
    blob = bm.encode_positions(full, 500)
    assert len(blob) == 1 and bm.is_all(blob)
    assert np.array_equal(bm.decode_positions(blob, 500), full)
    # merge with ALL short-circuits to ALL without decoding.
    sparse = bm.encode_positions(np.array([3, 7]), 2_000_000_000)
    merged, nd = bm.merge_blobs([sparse, bm.encode_all(2_000_000_000)],
                                2_000_000_000)
    assert bm.is_all(merged) and nd == 2_000_000_000


def test_count_positions_matches_decode():
    n = 4096
    for pos in (np.array([]), np.array([0, 1, 4095]),
                np.arange(0, n, 2), np.arange(n)):
        blob = bm.encode_positions(pos, n)
        assert bm.count_positions(blob, n) == pos.size == \
            bm.decode_positions(blob, n).size


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=5000).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.integers(min_value=0, max_value=n - 1),
                unique=True,
                max_size=min(n, 500),
            ),
        )
    )
)
def test_roundtrip_property(case):
    n, positions = case
    pos = np.unique(np.array(positions, dtype=np.uint32))
    blob = bm.encode_positions(pos, n)
    assert np.array_equal(bm.decode_positions(blob, n), pos)
    # Never worse than both representations.
    assert len(blob) <= 1 + min(4 * pos.size, (n + 7) // 8)


# --------------------------------------------------------- end-to-end sidecar
@pytest.fixture()
def big_table(spark, tmp_location):
    n = 100_000
    df = spark.range(n).coalesce(1).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    ds = Dataset.create(spark, tmp_location, df.schema, ["id"])
    ds.append(df)
    assert len(ds.data_files()) == 1
    return ds, n


def test_small_delete_logs_o1_bitmap_bytes(big_table):
    ds, n = big_table
    ds.delete((field("id") == lit(5)) | (field("id") == lit(77_777)))
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    assert snap.deleted_bitmap_file is not None
    side = pq.read_table(ds.log.abs_path(snap.deleted_bitmap_file))
    assert side.num_rows == 1  # one affected file
    blob = side["bitmap"][0].as_py()
    # 2 deleted rows from a 100k-row file: tag + 2 uint32 = 9 bytes.
    assert len(blob) == 9, f"bitmap not O(deleted): {len(blob)} bytes"
    assert side["num_rows"][0].as_py() == n


def test_bitmap_stream_matches_pk_stream(big_table):
    ds, _ = big_table
    ds.delete(field("id") < lit(100))
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    via_pks = sorted(
        r["id"] for r in ds.read_deleted_pks(snap).collect()
    )
    via_bitmap = sorted(
        r["id"] for r in ds.read_deleted_pks_via_bitmap(snap).collect()
    )
    assert via_bitmap == via_pks
    assert len(via_bitmap) == 100


def test_dense_delete_uses_bitset(big_table):
    ds, n = big_table
    ds.delete(field("v") < lit(5))  # ~5/7 of rows
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    side = pq.read_table(ds.log.abs_path(snap.deleted_bitmap_file))
    blob = side["bitmap"][0].as_py()
    assert len(blob) == 1 + (n + 7) // 8  # dense container
    assert (
        ds.read_deleted_pks_via_bitmap(snap).count()
        == ds.read_deleted_pks(snap).count()
    )


def test_upsert_writes_bitmap_too(spark, tmp_location):
    df = spark.range(1000).coalesce(1).select(
        F.col("id"), F.lit("old").alias("s")
    )
    ds = Dataset.create(spark, tmp_location, df.schema, ["id"])
    ds.append(df)
    up = spark.range(3).select(F.col("id"), F.lit("new").alias("s"))
    ds.upsert(up)
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    assert snap.deleted_bitmap_file is not None
    assert sorted(
        r["id"] for r in ds.read_deleted_pks_via_bitmap(snap).collect()
    ) == [0, 1, 2]


def test_no_bitmap_raises(spark, tmp_location):
    df = spark.range(10).select("id")
    ds = Dataset.create(spark, tmp_location, df.schema, ["id"])
    ds.append(df)
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    with pytest.raises(UserInputError):
        ds.read_deleted_pks_via_bitmap(snap)


def test_vacuum_keeps_bitmap_sidecar(big_table):
    ds, _ = big_table
    ds.delete(field("id") == lit(1))
    snap = ds.metadata.snapshot(ds.current_snapshot_id)
    removed = ds.vacuum(dry_run=True)
    assert snap.deleted_bitmap_file not in removed


def test_read_sidecars_batched_matches_sequential(tmp_path):
    """>8 files takes the single Arrow-dataset scan path; result rows and
    the with_filename grouping column must match the sequential path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from space_spark.core import bitmaps as bm

    paths = []
    for i in range(20):
        p = str(tmp_path / f"side_{i}.parquet")
        pos = np.array([i, i + 100], dtype=np.uint32)
        pq.write_table(
            pa.table({
                "file": pa.array([f"data/f{i}.parquet"], pa.string()),
                "num_rows": pa.array([1000], pa.int64()),
                "n_deleted": pa.array([2], pa.int64()),
                "bitmap": pa.array(
                    [bm.encode_positions(pos, 1000)], pa.binary()
                ),
            }),
            p,
        )
        paths.append(p)
    batched = bm.read_sidecars(paths, with_filename=True)
    assert batched.num_rows == 20
    assert sorted(batched["__filename"].to_pylist()) == sorted(paths)
    few = bm.read_sidecars(paths[:3], with_filename=True)
    assert few.num_rows == 3
    assert few["__filename"].to_pylist() == paths[:3]
    # decoded content identical across both paths
    row = batched.filter(
        pa.compute.equal(batched["file"], "data/f7.parquet")
    )
    got = bm.decode_positions(row["bitmap"][0].as_py(), 1000)
    assert got.tolist() == [7, 107]


def test_merge_blobs_unions_and_dedups():
    import numpy as np

    from space_spark.core import bitmaps as bm

    a = bm.encode_positions(np.array([1, 5, 9], dtype=np.uint32), 100)
    b = bm.encode_positions(np.array([5, 9, 50], dtype=np.uint32), 100)
    blob, nd = bm.merge_blobs([a, b], 100)
    assert nd == 4
    assert bm.decode_positions(blob, 100).tolist() == [1, 5, 9, 50]
