"""DirCatalog: name -> location registry rooted at a directory.

Parity: reference catalogs (base API catalogs/base.py:28-85, directory
implementation catalogs/directory.py:30-78): datasets live at
``<root>/<name>``; create/load/list/delete plus ``materialize`` for views.
"""

from __future__ import annotations

import os
import shutil
from typing import List, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from space_spark.core import metadata as md
from space_spark.core.dataset import Dataset
from space_spark.core.views import MaterializedView, View
from space_spark.errors import SpaceError, UserInputError


class DirCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _location(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise UserInputError(f"Invalid dataset name {name!r}")
        return os.path.join(self.root, name)

    def create_dataset(
        self,
        name: str,
        schema: T.StructType,
        primary_keys: Sequence[str],
        record_fields: Sequence[str] = (),
    ) -> Dataset:
        return Dataset.create(
            self.spark, self._location(name), schema, primary_keys,
            record_fields,
        )

    def dataset(self, name: str) -> Dataset:
        location = self._location(name)
        if not md.MetadataLog(location).exists():
            raise SpaceError(f"Dataset {name!r} not found in catalog")
        return Dataset.load(self.spark, location)

    def materialize(self, name: str, view: View) -> MaterializedView:
        return view.materialize(self.spark, self._location(name))

    def datasets(self) -> List[str]:
        out = []
        for entry in sorted(os.listdir(self.root)):
            if md.MetadataLog(os.path.join(self.root, entry)).exists():
                out.append(entry)
        return out

    def drop_dataset(self, name: str) -> None:
        location = self._location(name)
        if not md.MetadataLog(location).exists():
            raise SpaceError(f"Dataset {name!r} not found in catalog")
        shutil.rmtree(location)
