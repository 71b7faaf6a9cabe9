"""space_spark — a PySpark-native, versioned lakehouse engine.

A from-scratch rebuild of the capabilities of google/space (an ML-focused
lakehouse storage framework: versioned copy-on-write tables, hybrid
index/record storage, change-data feeds, lazy UDF/join views and
incrementally refreshed materialized views) re-expressed Spark-first:

- Tables are Parquet data files tracked by a JSON transaction log with
  Parquet manifests (Iceberg/Delta-shaped, see ``core/metadata.py``).
- Scans are plain ``spark.read.parquet`` over a manifest-pruned file list,
  so Catalyst keeps predicate pushdown / column pruning / AQE.
- Mutations are copy-on-write rewrites committed with optimistic
  concurrency.
- Everything distributable runs as Spark jobs; only metadata handling is
  driver-side.

Reference parity citations point into the google/space repo (read-only at
/root/reference) as ``file:line``.
"""

from space_spark.core.dataset import Dataset
from space_spark.core.expressions import field, lit
from space_spark.core.agg_views import AggregateView, MaterializedAggregate
from space_spark.core.views import MaterializedView, View
from space_spark.catalogs.directory import DirCatalog
from space_spark.errors import (
    ConstraintViolationError,
    PrimaryKeyExistError,
    SpaceError,
    TransactionConflictError,
    VersionNotFoundError,
)

__all__ = [
    "Dataset",
    "View",
    "MaterializedView",
    "AggregateView",
    "MaterializedAggregate",
    "DirCatalog",
    "field",
    "lit",
    "SpaceError",
    "ConstraintViolationError",
    "PrimaryKeyExistError",
    "TransactionConflictError",
    "VersionNotFoundError",
]

__version__ = "0.1.0"
