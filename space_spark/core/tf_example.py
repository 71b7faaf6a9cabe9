"""Pure-python codec for the ``tf.train.Example`` wire format.

The reference's TfFeatures extension type stores record-field values as
TFDS ``FeaturesDict.serialize_example`` bytes — which, for the flat
feature dicts the reference's own tests use, is exactly a
``tf.train.Example`` protobuf (reference
python/src/space/core/schema/types/tf_features.py:29-64). TFDS is not in
this environment, so this module implements the stable, publicly
documented protobuf wire encoding of that message family directly:

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature  { oneof { BytesList bytes_list = 1;
                       FloatList float_list = 2 [packed];
                       Int64List int64_list = 3 [packed]; } }

Supported value types (the "FeaturesDict subset"): per feature name, a
``bytes``/``str`` (or list thereof), a list/ndarray of ints
(→ Int64List), or a list/ndarray of floats (→ FloatList, float32
precision — the proto field is ``float``, matching TFDS). Nested
FeaturesDicts are supported the way TFDS serializes them: flattened
into the single Example with "/"-joined feature names
({"a": {"b": v}} encodes as feature "a/b"); ``decode_example(...,
unflatten=True)`` rebuilds the nesting (only safe when flat feature
names themselves never contain "/" — TFDS resolves that ambiguity with
the schema, which raw bytes don't carry).

Bytes produced here deserialize with real TFDS/TensorFlow and vice
versa for this subset; ``tests/test_extension_types.py`` pins the wire
bytes against hand-assembled vectors.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

import numpy as np

_WT_VARINT = 0
_WT_LEN = 2
_WT_32BIT = 5


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement 10-byte form (proto int64)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_number: int, wire_type: int) -> bytes:
    return _varint((field_number << 3) | wire_type)


def _len_delimited(field_number: int, payload: bytes) -> bytes:
    return _tag(field_number, _WT_LEN) + _varint(len(payload)) + payload


def _encode_feature(value: Any) -> bytes:
    """One ``Feature`` message from a python value."""
    if isinstance(value, (bytes, str)):
        value = [value]
    if isinstance(value, np.ndarray):
        if value.ndim != 1:
            raise ValueError(
                "tf.train.Example features are flat lists; reshape "
                f"{value.shape} to 1-D (or store as bytes)"
            )
        value = value.tolist()
    if not isinstance(value, (list, tuple)):
        value = [value]
    if len(value) == 0:
        raise ValueError("empty feature value: type is undecidable "
                         "(wrap as bytes for an explicit empty)")
    first = value[0]
    if isinstance(first, (bytes, str)):
        items = [v.encode("utf-8") if isinstance(v, str) else bytes(v)
                 for v in value]
        blist = b"".join(_len_delimited(1, b) for b in items)
        return _len_delimited(1, blist)  # Feature.bytes_list = 1
    if isinstance(first, (bool, np.bool_)) or isinstance(
            first, (int, np.integer)):
        packed = b"".join(_varint(int(v)) for v in value)
        ilist = _len_delimited(1, packed)  # Int64List.value packed
        return _len_delimited(3, ilist)  # Feature.int64_list = 3
    if isinstance(first, (float, np.floating)):
        packed = struct.pack(f"<{len(value)}f", *[float(v) for v in value])
        flist = _len_delimited(1, packed)  # FloatList.value packed
        return _len_delimited(2, flist)  # Feature.float_list = 2
    raise ValueError(f"Unsupported feature value type {type(first)}; "
                     "use bytes/str, ints, or floats (flat)")


def _flatten(features: Dict[str, Any], prefix: str = "") -> List[Tuple]:
    """TFDS-style flattening of nested FeaturesDicts: "/"-joined names,
    dict order preserved depth-first."""
    out: List[Tuple] = []
    for name, value in features.items():
        full = f"{prefix}{name}"
        if isinstance(value, dict):
            out.extend(_flatten(value, full + "/"))
        else:
            out.append((full, value))
    return out


def encode_example(features: Dict[str, Any]) -> bytes:
    """Serialize a (possibly nested) feature dict to ``tf.train.Example``
    bytes; nested dicts flatten to "/"-joined names as TFDS does."""
    entries = b""
    for name, value in _flatten(features):  # dict order — deterministic
        entry = _len_delimited(1, name.encode("utf-8")) + _len_delimited(
            2, _encode_feature(value)
        )
        entries += _len_delimited(1, entry)  # Features.feature map entry
    return _len_delimited(1, entries)  # Example.features = 1


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _read_fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            n, pos = _read_varint(buf, pos)
            val = buf[pos:pos + n]
            pos += n
        elif wt == _WT_32BIT:
            val = buf[pos:pos + 4]
            pos += 4
        elif wt == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"Bad wire type {wt}")
        yield field, wt, val


def _decode_signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _decode_feature(buf: bytes) -> Any:
    for field, _wt, val in _read_fields(buf):
        if field == 1:  # BytesList
            return [v for f2, _w, v in _read_fields(val) if f2 == 1]
        if field == 2:  # FloatList (packed or repeated 32-bit)
            out: List[float] = []
            for f2, w, v in _read_fields(val):
                if f2 != 1:
                    continue
                if w == _WT_LEN:
                    out.extend(struct.unpack(f"<{len(v) // 4}f", v))
                else:
                    out.extend(struct.unpack("<f", v))
            return np.asarray(out, dtype=np.float32)
        if field == 3:  # Int64List (packed or repeated varint)
            ints: List[int] = []
            for f2, w, v in _read_fields(val):
                if f2 != 1:
                    continue
                if w == _WT_LEN:
                    p = 0
                    while p < len(v):
                        x, p = _read_varint(v, p)
                        ints.append(_decode_signed64(x))
                else:
                    ints.append(_decode_signed64(v))
            return np.asarray(ints, dtype=np.int64)
    raise ValueError("Feature message with no recognized list field")


def decode_example(blob: bytes, unflatten: bool = False) -> Dict[str, Any]:
    """Parse ``tf.train.Example`` bytes back to {name: value}.

    BytesList → list[bytes]; Int64List → int64 ndarray; FloatList →
    float32 ndarray (mirroring ``tfds.as_numpy`` for the flat subset).
    ``unflatten=True`` rebuilds nested dicts from "/"-joined names (the
    inverse of ``encode_example``'s TFDS-style flattening)."""
    out: Dict[str, Any] = {}
    for field, _wt, features_buf in _read_fields(blob):
        if field != 1:
            continue
        for f2, _w2, entry in _read_fields(features_buf):
            if f2 != 1:
                continue
            name = None
            value = None
            for f3, _w3, v in _read_fields(entry):
                if f3 == 1:
                    name = v.decode("utf-8")
                elif f3 == 2:
                    value = _decode_feature(v)
            if name is not None:
                out[name] = value
    if not unflatten:
        return out
    nested: Dict[str, Any] = {}
    for name, value in out.items():
        node = nested
        *parents, leaf = name.split("/")
        for p in parents:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ValueError(
                    f"cannot unflatten {name!r}: {p!r} is both a leaf "
                    "feature and a nested dict"
                )
            node = nxt
        if isinstance(node.get(leaf), dict):
            # Order-independent conflict detection: the nested sibling
            # may have been built before OR after this leaf arrives.
            raise ValueError(
                f"cannot unflatten {name!r}: {leaf!r} is both a leaf "
                "feature and a nested dict"
            )
        node[leaf] = value
    return nested
