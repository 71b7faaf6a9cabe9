"""Runner compatibility shim: the reference splits execution into
``ds.local()`` (single-process) and ``ds.ray()`` (distributed) runners
(core/runners.py:203-287, ray/runners.py:52-316). Here ONE engine — Spark
— covers both, so both entry points return the same thin adapter whose
methods map 1:1 onto the reference runner surface; existing call sites
port verbatim.

Reads can come back as Arrow (the reference's batch convention) or as the
DataFrame itself for further Spark-side composition.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pyarrow as pa


class SparkRunner:
    """Adapter exposing the reference runner API over a Dataset/View."""

    def __init__(self, target):
        self._t = target

    # -- reads (reference core/runners.py:207-227) -------------------------
    def read(self, filter_=None, fields=None, version=None,
             reference_read: bool = False,
             batch_size: Optional[int] = None) -> Iterator[pa.RecordBatch]:
        """Iterator of Arrow record batches (the reference's read shape).
        ``batch_size`` re-slices batches; None keeps Spark's batching."""
        df = self._df(filter_, fields, version, reference_read)
        reader = df.toArrow().to_reader() if batch_size is None else \
            df.toArrow().to_reader(max_chunksize=batch_size)
        return iter(reader)

    def read_all(self, filter_=None, fields=None, version=None,
                 reference_read: bool = False) -> pa.Table:
        """Whole result as one Arrow table (core/runners.py:58-77)."""
        return self._df(filter_, fields, version, reference_read).toArrow()

    def _df(self, filter_=None, fields=None, version=None,
            reference_read: bool = False):
        from space_spark.core.views import View

        if isinstance(self._t, View):
            return self._t.read()
        kwargs = {}
        if filter_ is not None:
            kwargs["filter_"] = filter_
        if fields is not None:
            kwargs["fields"] = fields
        if version is not None:
            kwargs["version"] = version
        if reference_read:
            kwargs["reference_read"] = True
        return self._t.read(**kwargs)

    # -- mutations (reference core/runners.py:239-287) ----------------------
    def append(self, data) -> None:
        self._t.append(self._to_df(data))

    def insert(self, data) -> None:
        self._t.insert(self._to_df(data))

    def upsert(self, data) -> None:
        self._t.upsert(self._to_df(data))

    def delete(self, filter_) -> None:
        self._t.delete(filter_)

    def diff(self, start_version, end_version) -> pa.Table:
        return self._t.diff(start_version, end_version).toArrow()

    def refresh(self, target_version=None):
        return self._t.refresh(target_version)

    def _to_df(self, data):
        """Accept a DataFrame, Arrow table, pandas frame, or dict-of-lists
        (the reference's InputData union)."""
        from pyspark.sql import DataFrame

        if isinstance(data, DataFrame):
            return data
        spark = self._t.spark
        if isinstance(data, pa.Table):
            return spark.createDataFrame(data.to_pandas(),
                                         schema=self._t.schema)
        if isinstance(data, dict):
            data = pa.Table.from_pydict(data)
            return spark.createDataFrame(data.to_pandas(),
                                         schema=self._t.schema)
        return spark.createDataFrame(data, schema=self._t.schema)
