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
    # Supplying a TFDS FeaturesDict still requires TFDS.
    with pytest.raises(NotImplementedError):
        TfFeaturesSerializer({"image": "bytes"})


def test_tf_features_flat_roundtrip():
    """TFDS-free path: flat feature dicts round-trip through the vendored
    tf.train.Example wire codec."""
    import numpy as np

    s = TfFeaturesSerializer()
    value = {
        "image": b"\x89PNG fake bytes",
        "label": [3],
        "weights": [0.5, 1.5, -2.25],
        "tags": [b"a", b"bb"],
    }
    out = s.deserialize(s.serialize(value))
    assert out["image"] == [b"\x89PNG fake bytes"]
    assert out["label"].tolist() == [3]
    assert out["label"].dtype == np.int64
    assert out["weights"].dtype == np.float32
    assert out["weights"].tolist() == [0.5, 1.5, -2.25]
    assert out["tags"] == [b"a", b"bb"]


def test_tf_example_wire_bytes_pinned():
    """Pin the wire encoding against a hand-assembled tf.train.Example so
    compatibility with real TFDS/TF can't silently drift: Example(features
    = Features(feature = {'x': Feature(int64_list = Int64List(value =
    [7]))})) per the protobuf wire spec."""
    from space_spark.core import tf_example as tfe

    # Inside out: Int64List{value=[7]} -> field 1 packed varint
    int64_list = bytes([0x0A, 0x01, 0x07])
    # Feature{int64_list=...} -> field 3, len-delimited
    feature = bytes([0x1A, len(int64_list)]) + int64_list
    # map entry {key='x'=1, value=Feature=2}
    entry = bytes([0x0A, 0x01]) + b"x" + bytes([0x12, len(feature)]) + feature
    # Features{feature entry} -> field 1
    features = bytes([0x0A, len(entry)]) + entry
    # Example{features} -> field 1
    example = bytes([0x0A, len(features)]) + features
    assert tfe.encode_example({"x": [7]}) == example
    assert tfe.decode_example(example)["x"].tolist() == [7]


def test_tf_example_negative_ints_and_unpacked():
    import numpy as np

    from space_spark.core import tf_example as tfe

    out = tfe.decode_example(tfe.encode_example({"a": [-1, -(2**40), 5]}))
    assert out["a"].tolist() == [-1, -(2**40), 5]
    assert out["a"].dtype == np.int64
    # ndarray input, float32 precision
    v = np.array([1.25, -0.5], dtype=np.float32)
    got = tfe.decode_example(tfe.encode_example({"f": v}))["f"]
    assert got.tolist() == [1.25, -0.5]


def test_tf_features_dataset_roundtrip(spark, tmp_location):
    """End-to-end: a record field serialized as tf.train.Example bytes,
    stored through the blob sink, read back and decoded."""
    from space_spark import Dataset
    from space_spark.core import tf_example as tfe

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("features", T.BinaryType()),
    ])
    rows = [
        (i, tfe.encode_example({"label": [i], "name": f"doc{i}"}))
        for i in range(10)
    ]
    ds = Dataset.create(
        spark, tmp_location, schema, ["id"], record_fields=["features"],
        serializers={"features": TfFeaturesSerializer()},
    )
    ds.append(spark.createDataFrame(rows, schema))
    got = {r["id"]: r["features"] for r in ds.read().collect()}
    dec = TfFeaturesSerializer().deserialize(bytes(got[3]))
    assert dec["label"].tolist() == [3]
    assert dec["name"] == [b"doc3"]


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


def test_tf_example_nested_features_flatten():
    """Nested FeaturesDicts encode exactly like their TFDS flattening
    ("/"-joined names), and unflatten=True inverts it."""
    import numpy as np

    from space_spark.core.tf_example import decode_example, encode_example

    nested = {
        "meta": {"id": [7], "lang": b"en"},
        "text": b"hello",
        "emb": {"v": [1.5, 2.5]},
    }
    flat = {
        "meta/id": [7], "meta/lang": b"en",
        "text": b"hello", "emb/v": [1.5, 2.5],
    }
    assert encode_example(nested) == encode_example(flat)
    got = decode_example(encode_example(nested), unflatten=True)
    assert set(got) == {"meta", "text", "emb"}
    assert got["meta"]["lang"] == [b"en"]
    assert got["text"] == [b"hello"]
    assert np.array_equal(got["meta"]["id"], np.array([7]))
    assert np.allclose(got["emb"]["v"], np.array([1.5, 2.5]))
    # flat decode keeps the wire names
    assert set(decode_example(encode_example(nested))) == set(flat)


def test_tf_example_unflatten_conflict_raises():
    import pytest as _pytest

    from space_spark.core.tf_example import decode_example, encode_example

    for feats in ({"a": b"x", "a/b": b"y"}, {"a/b": b"y", "a": b"x"}):
        # conflict must raise in BOTH wire orders (leaf-first used to
        # silently overwrite the nested dict)
        with _pytest.raises(ValueError, match="both a leaf"):
            decode_example(encode_example(feats), unflatten=True)
