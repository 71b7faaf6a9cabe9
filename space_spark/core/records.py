"""Record-field storage: blob files + ``{_FILE,_ROW_ID}`` address columns.

The reference stores bulky "record" fields row-oriented (ArrayRecord files)
and keeps only an address struct in the columnar index files
(docs/design.md:3-14; address struct core/schema/arrow.py:212-215; writer
core/ops/append.py:246-298; reader core/ops/read.py:137-205). We keep the
exact observable semantics — address indirection, lazy resolution,
``reference_read``, deletes never rewrite record files — but store blobs in
single-column Parquet files (``value: binary``), which Spark/Arrow read
natively, instead of ArrayRecord (not available here and an encoding
detail, not a capability).

Both the write and resolve paths run inside ``mapInArrow`` — per-partition,
Arrow-batched, shared-nothing — so they scale with executors: each task
writes its own blob files (addresses are file-local, no coordination) and
resolution groups a batch's addresses by file to batch point-reads
(read.py:181-189 uses the same group-by-file trick).
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator, List, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from space_spark.core.schema import FILE_COL, ROW_ID_COL, physical_schema

RECORDS_DIR = "records"
VALUE_COL = "value"

# Roll blob files at this many uncompressed bytes (reference default 100MB,
# core/options.py:74-75).
MAX_RECORD_FILE_BYTES = 100 * 1024 * 1024


class _BlobWriter:
    """Per-task, per-field rolling blob writer; addresses are file-local."""

    def __init__(self, location: str, field: str):
        self.location = location
        self.field = field
        self.writer = None
        self.rel_path = None
        self.next_row_id = 0
        self.bytes_written = 0

    def _open(self) -> None:
        name = f"{self.field}_{uuid.uuid4().hex[:20]}.parquet"
        self.rel_path = os.path.join(RECORDS_DIR, name)
        abs_path = os.path.join(self.location, self.rel_path)
        os.makedirs(os.path.dirname(abs_path), exist_ok=True)
        self.writer = pq.ParquetWriter(
            abs_path, pa.schema([pa.field(VALUE_COL, pa.binary())])
        )
        self.next_row_id = 0
        self.bytes_written = 0

    def write(self, values: pa.Array) -> pa.StructArray:
        if self.writer is None:
            self._open()
        n = len(values)
        start = self.next_row_id
        self.writer.write_table(
            pa.table({VALUE_COL: pc.cast(values, pa.binary())})
        )
        self.next_row_id += n
        self.bytes_written += values.nbytes
        addresses = pa.StructArray.from_arrays(
            [
                pa.array([self.rel_path] * n, pa.string()),
                pa.array(range(start, start + n), pa.int32()),
            ],
            names=[FILE_COL, ROW_ID_COL],
        )
        if self.bytes_written >= MAX_RECORD_FILE_BYTES:
            self.close()
        return addresses

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
            self.writer = None


def resolve_blob_path(location: str, rel_path: str,
                      bases: Sequence[str] = ()) -> str:
    """Absolute path of a blob file, searching the table location first
    and then each record base (shallow-clone indirection,
    core/metadata.py StorageMetadata.record_bases): a clone's data
    files carry source-written addresses like ``records/<uuid>`` that
    exist only under the SOURCE root, while post-clone appends write
    blobs under the clone's own root with the same address shape. Blob
    filenames are uuids, so at most one root has the file. Falls back
    to the primary join when nothing exists — the caller's open then
    raises the natural FileNotFoundError."""
    primary = os.path.join(location, rel_path)
    if not bases or os.path.exists(primary):
        return primary
    for base in bases:
        cand = os.path.join(base, rel_path)
        if os.path.exists(cand):
            return cand
    return primary


def read_blob_column(location: str, rel_path: str,
                     bases: Sequence[str] = ()) -> pa.Array:
    """All record values of one blob file, indexable by _ROW_ID.

    Two layouts: our own record files are single-column Parquet; zero-copy
    external files (sources/loaders.py append_binary_files) are raw bytes —
    the whole file is the one record at row id 0."""
    abs_path = resolve_blob_path(location, rel_path, bases)
    if rel_path.endswith(".parquet"):
        return pq.read_table(abs_path).column(VALUE_COL).combine_chunks()
    with open(abs_path, "rb") as f:
        return pa.array([f.read()], pa.binary())


def write_record_fields(
    df: DataFrame, location: str, record_fields: Sequence[str]
) -> DataFrame:
    """Logical DataFrame -> physical: blob values written to record files,
    value columns replaced by address structs (append.py:246-298)."""
    logical = df.schema
    phys = physical_schema(logical, record_fields)
    fields = list(record_fields)
    loc = location

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writers = {f: _BlobWriter(loc, f) for f in fields}
        try:
            for batch in batches:
                arrays, names = [], []
                for i, name in enumerate(batch.schema.names):
                    col = batch.column(i)
                    if name in writers:
                        arrays.append(writers[name].write(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col))
                    else:
                        arrays.append(col)
                    names.append(name)
                yield pa.RecordBatch.from_arrays(arrays, names=names)
        finally:
            for w in writers.values():
                w.close()

    return df.mapInArrow(task, phys)


def resolve_record_fields(
    df: DataFrame,
    location: str,
    record_fields: Sequence[str],
    logical_schema: T.StructType,
    bases: Sequence[str] = (),
) -> DataFrame:
    """Physical DataFrame -> logical: fetch blob bytes for address columns.

    Addresses in a batch are grouped by file so each blob file is read once
    per batch (read.py:155-205); a tiny per-task cache handles consecutive
    batches hitting the same file.
    """
    selected = [f.name for f in df.schema.fields]
    out_fields = [
        T.StructField(
            f, T.BinaryType(), True
        ) if f in record_fields else logical_schema[f]
        for f in selected
    ]
    out_schema = T.StructType([
        T.StructField(sf.name, sf.dataType, True) for sf in out_fields
    ])
    fields = [f for f in record_fields if f in selected]
    loc = location
    base_list = tuple(bases)

    def task(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cache: dict = {}

        def load(rel_path: str) -> pa.Array:
            if rel_path not in cache:
                if len(cache) >= 2:
                    cache.clear()
                cache[rel_path] = read_blob_column(loc, rel_path,
                                                   base_list)
            return cache[rel_path]

        for batch in batches:
            arrays, names = [], []
            for i, name in enumerate(batch.schema.names):
                col = batch.column(i)
                if name in fields:
                    arrays.append(_resolve_column(col, load))
                else:
                    arrays.append(col)
                names.append(name)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(task, out_schema)


def _resolve_column(addresses: pa.Array, load) -> pa.Array:
    """Resolve one address-struct column to binary values, order-preserving."""
    n = len(addresses)
    files = addresses.field(FILE_COL)
    row_ids = addresses.field(ROW_ID_COL)
    out: List = [None] * n
    files_py = files.to_pylist()
    rows_py = row_ids.to_pylist()
    by_file: dict = {}
    for idx in range(n):
        f = files_py[idx]
        if f is None:
            continue
        by_file.setdefault(f, []).append(idx)
    for f, idxs in by_file.items():
        values = load(f)
        taken = values.take(pa.array([rows_py[i] for i in idxs], pa.int64()))
        for j, i in enumerate(idxs):
            out[i] = taken[j].as_py()
    return pa.array(out, pa.binary())
