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

    # ------------------------------------------------------- SQL surface --
    def attach_sql(self, name: str, table_name: str | None = None) -> str:
        """Register dataset ``name`` in the Spark session catalog so the
        SQL-first path works: ``spark.table(name)``, ``SELECT ... FROM
        name``, ``INSERT INTO name ...``. Returns the SQL table name.

        Implemented as schema-less ``CREATE TABLE ... USING space``; the
        table location rides in the catalog schema's field metadata (see
        SpaceDataSource), which is what makes SELECT/INSERT on the
        catalog table find the transaction log. Beyond reference parity —
        the reference has no SQL surface at all (README.md:17 delegates
        SQL to external engines)."""
        location = self._location(name)
        if not md.MetadataLog(location).exists():
            raise SpaceError(f"Dataset {name!r} not found in catalog")
        from space_spark.sources.datasource import register_space_source

        register_space_source(self.spark)
        tbl = table_name or name
        if not tbl.replace("_", "").isalnum():
            raise UserInputError(f"Invalid SQL table name {tbl!r}")
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS `{tbl}` USING space "
            f"OPTIONS (table_path '{location}')"
        )
        return tbl

    def enable_sql(self) -> List[str]:
        """Attach every dataset in this catalog to the session catalog."""
        return [self.attach_sql(n) for n in self.datasets()]
