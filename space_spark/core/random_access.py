"""Random-access point reads of record fields for training loops.

Parity: reference RandomAccessDataSource (core/random_access.py:144-241):
``__len__`` / ``__getitem__`` / ``__getitems__`` over record-field blobs,
with file-instruction coalescing (:244-287) — reads for one batch are
grouped per blob file so each file is opened once.

This is deliberately NOT a Spark job: a training loop issues point reads
from one process; the address table (small: pk + {file,row_id} per row) is
fetched once via a reference read, then lookups are local pyarrow reads.
At cluster scale each trainer worker holds only its shard of addresses
(pass a filter to restrict the address fetch).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Any, Callable, Dict, List, Optional, Sequence

import pyarrow as pa

from space_spark.core.schema import FILE_COL, ROW_ID_COL
from space_spark.errors import UserInputError


class RandomAccessDataSource:
    """Index-style access to record-field bytes of a space table.

    ``feature_fields``: record fields to fetch; single field -> bare bytes
    per item, multiple -> dict per item (reference semantics).
    ``deserialize``: optional per-field callable applied to the raw bytes.
    """

    def __init__(
        self,
        dataset,
        feature_fields: Optional[Sequence[str]] = None,
        version=None,
        filter_=None,
        deserialize: Optional[Callable[[bytes], Any]] = None,
        file_cache_size: int = 4,
    ):
        self.location = dataset.location
        self.record_bases = tuple(dataset.record_search_bases)
        self.feature_fields = list(feature_fields or dataset.record_fields)
        unknown = set(self.feature_fields) - set(dataset.record_fields)
        if unknown:
            raise UserInputError(
                f"Not record fields: {sorted(unknown)}"
            )
        if not self.feature_fields:
            raise UserInputError("Dataset has no record fields")
        # deserialize: a callable applied to every field's bytes, or True
        # to use the table's persisted per-field serializers
        # (TfFeatures-analog; reference random_access.py deserialize flag).
        if deserialize is True:
            self._deserializers = {
                f: (dataset.serializer(f).deserialize
                    if dataset.serializer(f) else None)
                for f in self.feature_fields
            }
        elif callable(deserialize):
            self._deserializers = {
                f: deserialize for f in self.feature_fields
            }
        else:
            self._deserializers = {f: None for f in self.feature_fields}
        self._cache: OrderedDict = OrderedDict()
        self._cache_size = file_cache_size
        # One reference read fetches all addresses (index data only — no
        # blobs move). Ordered by primary key for a stable item order.
        pks = dataset.primary_keys
        addr_df = (
            dataset.read(
                filter_=filter_,
                fields=list(pks) + self.feature_fields,
                version=version,
                reference_read=True,
            )
            .orderBy(*pks)
            .toPandas()
        )
        self._addresses = {
            f: [
                (row[FILE_COL], row[ROW_ID_COL]) if row is not None else None
                for row in addr_df[f]
            ]
            for f in self.feature_fields
        }
        self._length = len(addr_df)

    def __len__(self) -> int:
        return self._length

    def _file_column(self, rel_path: str) -> pa.Array:
        if rel_path in self._cache:
            self._cache.move_to_end(rel_path)
            return self._cache[rel_path]
        from space_spark.core.records import read_blob_column

        col = read_blob_column(self.location, rel_path,
                               self.record_bases)
        self._cache[rel_path] = col
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return col

    def _fetch(self, field: str, indices: Sequence[int]) -> List[Any]:
        addrs = self._addresses[field]
        out: List[Any] = [None] * len(indices)
        # Coalesce per blob file (random_access.py:244-287).
        by_file: Dict[str, List[int]] = {}
        for pos, idx in enumerate(indices):
            addr = addrs[idx]
            if addr is None:
                continue
            by_file.setdefault(addr[0], []).append(pos)
        deser = self._deserializers.get(field)
        for rel_path, positions in by_file.items():
            col = self._file_column(rel_path)
            row_ids = pa.array(
                [addrs[indices[p]][1] for p in positions], pa.int64()
            )
            values = col.take(row_ids)
            for j, p in enumerate(positions):
                v = values[j].as_py()
                out[p] = deser(v) if deser else v
        return out

    def __getitems__(self, indices: Sequence[int]) -> List[Any]:
        for i in indices:
            if not 0 <= i < self._length:
                raise IndexError(i)
        per_field = {f: self._fetch(f, indices) for f in self.feature_fields}
        if len(self.feature_fields) == 1:
            return per_field[self.feature_fields[0]]
        return [
            {f: per_field[f][i] for f in self.feature_fields}
            for i in range(len(indices))
        ]

    def __getitem__(self, index: int) -> Any:
        return self.__getitems__([index])[0]
