"""Schema handling: validation, field IDs, logical vs physical schema.

Parity notes (reference paths relative to /root/reference/python/src/space/):
- Field IDs assigned depth-first at create time (core/schema/field_ids.py:26-71);
  we store them in ``StructField.metadata["space.field_id"]`` instead of
  Parquet field-id metadata — they key nothing internally (manifest stats are
  keyed by column NAME here) but are kept for parity/evolution headroom.
- Validation rules (core/schema/utils.py:65-94): >=1 primary key; PK fields
  must exist and not be float/list/struct/map/binary; record fields must be
  binary and must not be primary keys.
- Logical vs physical schema (core/storage.py:76-81, core/schema/arrow.py:227-241):
  record fields are stored as an address struct ``{_FILE: string, _ROW_ID: int}``
  in the index Parquet files; the logical schema shows the user type (binary).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import types as T

from space_spark.errors import SchemaError

# Address-struct constants (reference core/schema/constants.py:17-18).
FILE_COL = "_FILE"
ROW_ID_COL = "_ROW_ID"

ADDRESS_STRUCT = T.StructType(
    [
        T.StructField(FILE_COL, T.StringType(), True),
        T.StructField(ROW_ID_COL, T.IntegerType(), True),
    ]
)

FIELD_ID_KEY = "space.field_id"

# Types whose per-file min/max stats are collected into the index manifest
# and used for falsifiable-filter pruning. (Reference collects stats for
# primary keys only — core/manifests/index.py:42-65; we widen to every
# comparable index field, which strictly increases pruning opportunities.)
_STATS_TYPES = (
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
)

_PK_FORBIDDEN = (
    T.ArrayType,
    T.StructType,
    T.MapType,
    T.BinaryType,
    T.FloatType,
    T.DoubleType,
)


def validate(
    schema: T.StructType,
    primary_keys: Sequence[str],
    record_fields: Sequence[str],
) -> None:
    names = set(schema.fieldNames())
    if not primary_keys:
        raise SchemaError("At least one primary key is required")
    for pk in primary_keys:
        if pk not in names:
            raise SchemaError(f"Primary key {pk!r} not found in schema")
        dt = schema[pk].dataType
        if isinstance(dt, _PK_FORBIDDEN):
            raise SchemaError(f"Primary key {pk!r} has invalid type {dt}")
        if pk in record_fields:
            raise SchemaError(f"Primary key {pk!r} cannot be a record field")
    for rf in record_fields:
        if rf not in names:
            raise SchemaError(f"Record field {rf!r} not found in schema")
        if not isinstance(schema[rf].dataType, T.BinaryType):
            raise SchemaError(
                f"Record field {rf!r} must be binary, got {schema[rf].dataType}"
            )


def assign_field_ids(schema: T.StructType) -> T.StructType:
    """Assign integer field IDs depth-first, stored in field metadata.

    Mirrors reference core/schema/field_ids.py:26-71 (DFS order, nested
    lists/structs get IDs too).
    """
    counter = [0]

    def visit(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                counter[0] += 1
                fid = counter[0]
                child = visit(f.dataType)
                meta = dict(f.metadata or {})
                meta[FIELD_ID_KEY] = fid
                fields.append(T.StructField(f.name, child, f.nullable, meta))
            return T.StructType(fields)
        if isinstance(dt, T.ArrayType):
            counter[0] += 1
            return T.ArrayType(visit(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            counter[0] += 2
            return T.MapType(
                visit(dt.keyType), visit(dt.valueType), dt.valueContainsNull
            )
        return dt

    return visit(schema)  # type: ignore[return-value]


def field_id_map(schema: T.StructType) -> Dict[str, int]:
    return {
        f.name: f.metadata[FIELD_ID_KEY]
        for f in schema.fields
        if f.metadata and FIELD_ID_KEY in f.metadata
    }


def physical_schema(
    logical: T.StructType, record_fields: Sequence[str]
) -> T.StructType:
    """Replace record fields with the address struct (arrow.py:227-241)."""
    fields = []
    for f in logical.fields:
        if f.name in record_fields:
            fields.append(T.StructField(f.name, ADDRESS_STRUCT, True, f.metadata))
        else:
            fields.append(f)
    return T.StructType(fields)


def stats_fields(
    schema: T.StructType, record_fields: Sequence[str]
) -> List[Tuple[str, T.DataType]]:
    """Index fields eligible for min/max manifest stats."""
    out = []
    for f in schema.fields:
        if f.name in record_fields:
            continue
        if isinstance(f.dataType, _STATS_TYPES):
            out.append((f.name, f.dataType))
    return out


def rename_struct(schema: T.StructType, mapping: dict) -> T.StructType:
    """Top-level field renames (keeping type/nullability/metadata incl.
    field ids). ``mapping`` maps current names -> replacement names;
    absent names pass through."""
    if not mapping:
        return schema
    return T.StructType(
        [
            T.StructField(
                mapping.get(f.name, f.name), f.dataType, f.nullable,
                dict(f.metadata or {}),
            )
            for f in schema.fields
        ]
    )
