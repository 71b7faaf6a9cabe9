"""Field serializers + extension types (File, TfFeatures-analog).

Parity (reference paths relative to /root/reference/python/src/space/):
- Serializer protocol (core/serializers/base.py:30-50): per-field
  serialize/deserialize between Python values and the stored bytes of a
  record field. The reference's concrete impl wraps TFDS ``FeaturesDict``
  (core/schema/types/tf_features.py:29-64); TFDS isn't in this
  environment, so ``TfFeaturesSerializer`` gates the real dependency
  behind an import-try and ``PickleSerializer`` is the deterministic
  stand-in with the same protocol.
- File extension type (core/schema/types/files.py:29-64, proto
  metadata.proto:206-210): a string path column + a directory prefix
  carried as metadata; readers resolve relative paths against the prefix.
  Spark-side this is a plain StringType with ``StructField.metadata`` keys
  — no custom type plumbing needed.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_TYPE_KEY = "space.type"
FILE_DIRECTORY_KEY = "space.file.directory"


class FieldSerializer:
    """Protocol: value <-> bytes for one record field.

    ``spark_type`` optionally declares the Spark type ``deserialize``
    produces, letting the DataFrame read path surface deserialized values
    as a typed column (reference applies its TfFeatures deserializer on
    read, tf_features.py:54-64); None means bytes-in/bytes-out."""

    spark_type: Optional[T.DataType] = None

    def serialize(self, value: Any) -> bytes:
        raise NotImplementedError

    def deserialize(self, value_bytes: bytes) -> Any:
        raise NotImplementedError


def deserialize_udf(ser: FieldSerializer,
                    out_type: Optional[T.DataType] = None):
    """Arrow-batched column transform applying ``ser.deserialize`` to a
    binary column — the DataFrame-read-path analog of the reference's
    deserialize-on-access (random_access + tf_features). The serializer
    instance rides the closure (cloudpickled to executors).

    The serializer MUST declare ``spark_type`` (or the caller must pass
    ``out_type``): ``deserialize`` returns arbitrary Python values, and
    guessing BinaryType would surface as an opaque Arrow conversion error
    mid-query instead of an actionable message here."""
    from pyspark.sql.functions import pandas_udf

    out_type = out_type or ser.spark_type
    if out_type is None:
        from space_spark.errors import UserInputError

        raise UserInputError(
            f"deserialize=True needs a declared Spark output type, but "
            f"{type(ser).__name__} has spark_type=None. Set spark_type on "
            f"the serializer (e.g. BinaryType for bytes-in/bytes-out), or "
            f"read without deserialize and use RandomAccessDataSource for "
            f"driver-side Python values."
        )

    def _de(col: pd.Series) -> pd.Series:
        return col.map(
            lambda b: None if b is None else ser.deserialize(bytes(b))
        )

    return pandas_udf(out_type)(_de)


class PickleSerializer(FieldSerializer):
    """Deterministic default serializer (protocol-pinned pickle)."""

    def serialize(self, value: Any) -> bytes:
        return pickle.dumps(value, protocol=4)

    def deserialize(self, value_bytes: bytes) -> Any:
        return pickle.loads(value_bytes)


class TfFeaturesSerializer(FieldSerializer):
    """TFDS FeaturesDict serializer — the reference's TfFeatures type
    (core/schema/types/tf_features.py:29-64).

    With tensorflow_datasets installed, values go through the user's
    ``FeaturesDict`` (full nested support). Without it — this container —
    the vendored pure-python ``tf.train.Example`` wire codec
    (core/tf_example.py) handles the FLAT feature-dict subset: the bytes
    are wire-compatible with TFDS for flat dicts of bytes/str, int, and
    float features, so data written here deserializes with real TFDS and
    vice versa. Nested FeaturesDicts require TFDS and raise a clear
    error from the codec."""

    def __init__(self, features_dict=None):
        self.features = features_dict
        try:
            import tensorflow_datasets as tfds  # noqa: F401

            self._tfds = features_dict is not None
        except ImportError:
            self._tfds = False
            if features_dict is not None:
                raise NotImplementedError(
                    "A TFDS FeaturesDict was supplied but "
                    "tensorflow_datasets is not installed; omit it to use "
                    "the built-in flat tf.train.Example codec, or install "
                    "TFDS for nested feature support."
                )

    def serialize(self, value: Any) -> bytes:
        if self._tfds:  # pragma: no cover - TFDS not in this container
            return self.features.serialize_example(value)
        from space_spark.core import tf_example as tfe

        return tfe.encode_example(value)

    def deserialize(self, value_bytes: bytes) -> Any:
        if self._tfds:  # pragma: no cover - TFDS not in this container
            import tensorflow_datasets as tfds

            return tfds.as_numpy(
                self.features.deserialize_example(value_bytes)
            )
        from space_spark.core import tf_example as tfe

        return tfe.decode_example(value_bytes)


# ------------------------------------------------------------ File type ----
def file_field(name: str, directory: str = "",
               nullable: bool = True) -> T.StructField:
    """Declare a File-typed column: a relative path string whose full path
    is ``directory/<value>`` (files.py:29-64)."""
    return T.StructField(
        name, T.StringType(), nullable,
        {FILE_TYPE_KEY: "file", FILE_DIRECTORY_KEY: directory},
    )


def is_file_field(field: T.StructField) -> bool:
    return bool(field.metadata) and field.metadata.get(FILE_TYPE_KEY) == "file"


def file_directory(field: T.StructField) -> str:
    return (field.metadata or {}).get(FILE_DIRECTORY_KEY, "")


def resolve_file_paths(
    df: DataFrame, schema: T.StructType,
    suffix: str = "_fullpath",
) -> DataFrame:
    """Add ``<col>_fullpath`` columns for every File-typed column present
    in ``df`` (the read-side resolution the reference does on access)."""
    out = df
    for f in schema.fields:
        if is_file_field(f) and f.name in df.columns:
            prefix = file_directory(f)
            full: Column = (
                F.concat(F.lit(prefix.rstrip("/") + "/"), F.col(f.name))
                if prefix else F.col(f.name)
            )
            out = out.withColumn(f.name + suffix, full)
    return out
