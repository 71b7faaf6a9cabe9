"""Spark Python DataSource for space tables: ``spark.read.format("space")``
and ``spark.readStream.format("space")``.

This is the DataSourceV2 "escape hatch" SCALE.md describes, working today:

- **Batch**: planning happens entirely over manifest metadata (the same
  Spark-free pyarrow pruning path interactive reads use), pushed-down
  filters skip whole files, and each ``InputPartition`` is a size-bounded
  file group that EXECUTORS read directly with pyarrow — the driver never
  materializes a ``spark.read.parquet(*paths)`` list, so planning cost is
  O(manifest rows), not O(path-list bytes).
- **Streaming**: offsets are snapshot ids; each micro-batch reads exactly
  the data files ADDED between two snapshots (append-driven, the same
  contract as Spark's file streaming source; CoW survivor rewrites carry
  ``added_files=[]`` so deletes/upserts never re-emit old rows).

Reference parity: ray/data_sources.py:38-151 exposes the same shape to Ray
(block-level read tasks from the storage layer); here the blocks are Spark
``InputPartition``s and Catalyst drives the scan.

Filters are reported back as unsupported even when used for pruning:
manifest pruning is FILE-level, so Spark must still re-apply the row-level
predicate — pruning is an optimization, never a correctness dependency.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from space_spark.core import manifests as mf
from space_spark.core import metadata as md
from space_spark.core import schema as sc
from space_spark.core.expressions import Expr, field

DEFAULT_PARTITION_BYTES = 128 << 20


# ---------------------------------------------------------------- helpers --
def _load(location: str):
    log = md.MetadataLog(location)
    return log, log.read_metadata()


def _physical(meta) -> T.StructType:
    return sc.physical_schema(meta.schema, meta.record_fields)


def _arrow_schema(spark_schema: T.StructType) -> pa.Schema:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _filters_to_expr(filters: List[Filter]) -> Optional[Expr]:
    """Translate Spark's pushed filters into the falsifiable-pruning Expr
    DSL (conjunction of the recognizable comparisons; anything else is
    simply not used for pruning)."""
    ops = {
        EqualTo: lambda f, v: f == v,
        GreaterThan: lambda f, v: f > v,
        GreaterThanOrEqual: lambda f, v: f >= v,
        LessThan: lambda f, v: f < v,
        LessThanOrEqual: lambda f, v: f <= v,
    }
    expr = None
    for flt in filters:
        build = ops.get(type(flt))
        attr = getattr(flt, "attribute", None)
        if build is None or attr is None or len(attr) != 1:
            continue
        term = build(field(attr[0]), flt.value)
        expr = term if expr is None else (expr & term)
    return expr


def _prune(log, meta, snapshot_id: int, expr: Optional[Expr]) -> List[str]:
    """Manifest pruning without a SparkSession (pyarrow backend; falls back
    to the unpruned list rather than failing planning)."""
    snap = meta.snapshot(snapshot_id)
    paths = [log.abs_path(p) for p in snap.manifest_files]
    if not paths:
        return []
    stat_names = {n for n, _ in sc.stats_fields(meta.schema,
                                                meta.record_fields)}
    try:
        return mf._prune_files_arrow(paths, expr, stat_names)
    except Exception:
        return mf._prune_files_arrow(paths, None, stat_names)


def _group_files(abs_paths: List[str], max_bytes: int
                 ) -> Iterator[List[str]]:
    group, size = [], 0
    for p in abs_paths:
        try:
            b = os.path.getsize(p)
        except OSError:
            b = max_bytes
        if group and size + b > max_bytes:
            yield group
            group, size = [], 0
        group.append(p)
        size += b
    if group:
        yield group


def _read_aligned(abs_paths: List[str], schema: pa.Schema
                  ) -> Iterator[pa.RecordBatch]:
    """Read files and align to the table's physical schema (files written
    before a schema-evolution add_column lack the new columns — fill with
    nulls, exactly like the Spark read path's fixed physical schema)."""
    for path in abs_paths:
        tbl = pq.read_table(path)
        cols = []
        for f in schema:
            if f.name in tbl.column_names:
                col = tbl.column(f.name)
                if col.type != f.type:
                    col = col.cast(f.type)
            else:
                col = pa.nulls(len(tbl), f.type)
            cols.append(col)
        yield from pa.table(dict(zip(schema.names, cols)),
                            schema=schema).to_batches()


# ------------------------------------------------------------------ batch --
class SpaceBatchReader(DataSourceReader):
    def __init__(self, location: str, options):
        self.location = location
        self.version = options.get("version")
        self.max_bytes = int(options.get("partition_bytes",
                                         DEFAULT_PARTITION_BYTES))
        self._expr: Optional[Expr] = None

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        self._expr = _filters_to_expr(filters)
        # File-level pruning only — every filter must still run row-level.
        return iter(filters)

    def partitions(self) -> List[InputPartition]:
        log, meta = _load(self.location)
        version = int(self.version) if self.version is not None else None
        snap_id = meta.resolve_version(version)
        rel = _prune(log, meta, snap_id, self._expr)
        abs_paths = [log.abs_path(p) for p in rel]
        groups = list(_group_files(abs_paths, self.max_bytes))
        return [InputPartition(g) for g in groups] or [InputPartition([])]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        _, meta = _load(self.location)
        yield from _read_aligned(partition.value,
                                 _arrow_schema(_physical(meta)))


# -------------------------------------------------------------- streaming --
class SpaceStreamReader(DataSourceStreamReader):
    """Snapshot-id offsets; micro-batches read added files only."""

    def __init__(self, location: str, options):
        self.location = location
        self.start_version = int(options.get("startingversion", 0))
        self.max_bytes = int(options.get("partition_bytes",
                                         DEFAULT_PARTITION_BYTES))

    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_version}

    def latestOffset(self) -> dict:
        _, meta = _load(self.location)
        return {"snapshot_id": meta.resolve_version(None)}

    def _added_files(self, start: int, end: int) -> List[str]:
        log, meta = _load(self.location)
        out: List[str] = []
        snap_id = end
        while snap_id > start:
            snap = meta.snapshot(snap_id)
            out.extend(log.abs_path(p) for p in snap.added_files)
            if snap.parent_snapshot_id is None:
                break
            snap_id = snap.parent_snapshot_id
        out.reverse()  # oldest first
        return out

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        files = self._added_files(start["snapshot_id"], end["snapshot_id"])
        groups = list(_group_files(files, self.max_bytes))
        return [InputPartition(g) for g in groups] or [InputPartition([])]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        _, meta = _load(self.location)
        yield from _read_aligned(partition.value,
                                 _arrow_schema(_physical(meta)))

    def commit(self, end: dict) -> None:
        pass  # progress is tracked by the stream's own checkpoint


# ----------------------------------------------------------------- source --
class SpaceDataSource(DataSource):
    """``format("space").option("path"| "location", <table dir>)``.

    Options: ``version`` (batch time travel), ``startingVersion``
    (streaming replay start, default 0 = full history),
    ``partition_bytes`` (per-InputPartition ceiling)."""

    @classmethod
    def name(cls) -> str:
        return "space"

    def _location(self) -> str:
        loc = self.options.get("path") or self.options.get("location")
        if not loc:
            raise ValueError("space source requires .option('path', ...) "
                             "or .load(<table location>)")
        return loc

    def schema(self) -> T.StructType:
        _, meta = _load(self._location())
        return _physical(meta)

    def reader(self, schema: T.StructType) -> SpaceBatchReader:
        return SpaceBatchReader(self._location(), self.options)

    def streamReader(self, schema: T.StructType) -> SpaceStreamReader:
        return SpaceStreamReader(self._location(), self.options)


def register_space_source(spark) -> None:
    """Register the 'space' format on a session (idempotent). Also enables
    Python-data-source filter pushdown (off by default in Spark 4.1), which
    the reader requires for its file-level pruning hook."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static-conf sessions: pushFilters simply never fires
    spark.dataSource.register(SpaceDataSource)
