"""Extension types: File columns + field serializers (mirrors reference
tests/core/test_runners.py:278 File type and tf_features round trips)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from space_spark import Dataset
from space_spark.core.random_access import RandomAccessDataSource
from space_spark.core.serializers import (
    FieldSerializer,
    PickleSerializer,
    TfFeaturesSerializer,
    file_field,
    is_file_field,
    resolve_file_paths,
)
from space_spark.errors import UserInputError


def test_file_type_roundtrip(spark, tmp_location):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            file_field("image_path", directory="/data/images"),
        ]
    )
    ds = Dataset.create(spark, tmp_location, schema, ["id"])
    ds.append(
        spark.createDataFrame(
            [Row(id=1, image_path="a/1.jpg"), Row(id=2, image_path="b/2.jpg")],
            schema,
        )
    )
    loaded = Dataset.load(spark, tmp_location)
    f = loaded.schema["image_path"]
    assert is_file_field(f)  # metadata survives the log round trip

    resolved = resolve_file_paths(loaded.read(), loaded.schema)
    got = {r.id: r.image_path_fullpath for r in resolved.collect()}
    assert got == {1: "/data/images/a/1.jpg", 2: "/data/images/b/2.jpg"}


class UpperSerializer(FieldSerializer):
    def serialize(self, value):
        return value.upper().encode()

    def deserialize(self, value_bytes):
        return value_bytes.decode().lower()


def test_field_serializer_persisted(spark, tmp_location):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    ser = UpperSerializer()
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["payload"],
        serializers={"payload": ser},
    )
    ds.append(
        spark.createDataFrame(
            [Row(id=i, payload=ser.serialize(f"value{i}")) for i in range(5)],
            schema,
        )
    )
    # Serializer survives reload and drives deserialize=True.
    loaded = Dataset.load(spark, tmp_location)
    assert loaded.serializer("payload").deserialize(b"ABC") == "abc"
    src = RandomAccessDataSource(loaded, ["payload"], deserialize=True)
    assert src[3] == "value3"
    # Raw bytes without deserialize.
    raw = RandomAccessDataSource(loaded, ["payload"])
    assert raw[3] == b"VALUE3"


def test_read_path_deserialize(spark, tmp_location):
    """read(deserialize=True) surfaces record blobs through the persisted
    serializer as a typed column — mirror of the reference's TfFeatures
    deserialize-on-read (tf_features.py:54-64)."""
    import json

    from pyspark.sql import types as T2

    # Defined inside the test so cloudpickle ships it by VALUE — a
    # module-level class would be pickled by reference and fail to import
    # on executors.
    class JsonSerializer(FieldSerializer):
        spark_type = T2.MapType(T2.StringType(), T2.LongType())

        def serialize(self, value):
            return json.dumps(value, sort_keys=True).encode()

        def deserialize(self, value_bytes):
            return json.loads(value_bytes)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.BinaryType()),
        ]
    )
    ser = JsonSerializer()
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["features"],
        serializers={"features": ser},
    )
    ds.append(
        spark.createDataFrame(
            [Row(id=i, features=ser.serialize({"len": i, "sq": i * i}))
             for i in range(4)],
            schema,
        )
    )
    loaded = Dataset.load(spark, tmp_location)
    df = loaded.read(deserialize=True)
    assert dict(df.schema["features"].dataType.__dict__) != {}  # typed col
    assert df.schema["features"].dataType == ser.spark_type
    got = {r.id: dict(r.features) for r in df.collect()}
    assert got == {i: {"len": i, "sq": i * i} for i in range(4)}
    # Raw bytes remain the default read.
    raw = loaded.read().collect()
    assert isinstance(raw[0].features, (bytes, bytearray))


def test_pickle_serializer_roundtrip():
    s = PickleSerializer()
    value = {"a": [1, 2, 3], "b": "x"}
    assert s.deserialize(s.serialize(value)) == value


def test_tf_features_serializer_gated():
    with pytest.raises(NotImplementedError):
        TfFeaturesSerializer({"image": "bytes"})


def test_serializer_requires_record_field(spark, tmp_location):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    with pytest.raises(UserInputError):
        Dataset.create(
            spark, tmp_location, schema, ["id"], record_fields=["payload"],
            serializers={"id": PickleSerializer()},
        )


def test_deserialize_udf_requires_spark_type():
    """deserialize=True without a declared spark_type must fail with an
    actionable message, not a downstream Arrow conversion error."""
    from space_spark.core.serializers import (
        PickleSerializer,
        deserialize_udf,
    )

    with pytest.raises(UserInputError, match="spark_type"):
        deserialize_udf(PickleSerializer())
