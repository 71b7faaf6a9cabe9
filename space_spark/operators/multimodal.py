"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Space stores bulky media as record fields (binary); the processing a
training pipeline needs on top — decode, feature-extract, resize,
frame-sample — runs as Arrow-batched ``mapInPandas`` stages so each task
handles a bounded batch of blobs (no driver involvement, no shuffle).

Codecs are optional dependencies: ``image_features(decode="real")`` does
a true PIL header decode when PIL is importable (nulls for corrupt
payloads, NotImplementedError when the codec is absent), while the
default ``decode="pseudo"`` computes DETERMINISTIC metadata from the raw
bytes (length, md5-derived pseudo-dimensions) so the Spark-side plumbing
— schema, batch shape, partitioning — is testable codec-free and the
values are reproducible in the SQL oracle. libsndfile/ffmpeg paths
remain pseudo-only stubs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _pseudo_dims(payload: bytes) -> tuple:
    """Deterministic fake decode: derive (width, height, channels) from the
    byte length. Mirrors the SQL oracle expression exactly
    (width = n%1920+1, height = (n*7919+13)%1080+1, channels = n%3+1)."""
    n = len(payload)
    return n % 1920 + 1, (n * 7919 + 13) % 1080 + 1, n % 3 + 1


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401
        return True
    except ImportError:
        return False


def _real_dims(payload: bytes):
    """PIL header decode: (width, height, channels) or all-None when the
    bytes aren't a decodable image (a 100 TB crawl ALWAYS contains
    corrupt blobs — a poison payload must yield nulls, not kill the
    task). ``Image.open`` reads only the header, so this is O(bytes
    parsed), not a full pixel decode."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())
    except Exception:
        return None, None, None


def image_features(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "payload",
                   decode: str = "pseudo") -> DataFrame:
    """Per-image metadata extraction over binary blobs.

    Arrow-batched mapInPandas: each task decodes its partition's blobs
    independently. ``decode``:

    - ``"pseudo"`` (default): deterministic byte-derived dimensions,
      bit-reproducible in the SQL oracle — the registered-query path.
    - ``"real"``: PIL header decode (width/height/band count; nulls for
      undecodable payloads). Raises ``NotImplementedError`` when no
      imaging library is importable on the driver — the executors need
      it too (same Python env by deployment contract).
    - ``"auto"``: ``"real"`` when PIL imports, else ``"pseudo"``.
    """
    if decode not in ("pseudo", "real", "auto"):
        raise ValueError(f"decode must be pseudo|real|auto, got {decode!r}")
    if decode == "auto":
        decode = "real" if _pil_available() else "pseudo"
    if decode == "real" and not _pil_available():
        raise NotImplementedError(
            "decode='real' requires PIL; this environment has no codec "
            "libraries. Use decode='pseudo' (or 'auto') for the "
            "deterministic metadata path."
        )
    dims_fn = _real_dims if decode == "real" else _pseudo_dims

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[blob_col]
            dims = [dims_fn(p if p is not None else b"")
                    for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) if p is not None else 0
                                for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "content_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        task, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("mean_amplitude", T.DoubleType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _pseudo_audio(payload: bytes) -> tuple:
    """Deterministic fake audio decode (no libsndfile in this container):
    sample_rate/n_samples derive from the byte length, mean_amplitude from
    the md5 digest — every value is reproducible in the SQL oracle
    (sample_rate = 8000*(n%3+1), n_samples = n*256 + n*31%997,
    mean_amplitude = first-8-md5-hex-digits % 1000 / 1000)."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    sample_rate = 8000 * (n % 3 + 1)
    n_samples = n * 256 + (n * 31) % 997
    # No rounding: one IEEE division of exact integers is bit-identical in
    # every engine, while round() halfway behavior differs (banker's vs
    # half-away-from-zero).
    duration = n_samples / sample_rate
    amplitude = int(digest[:8], 16) % 1000 / 1000.0
    return n, sample_rate, n_samples, duration, amplitude, digest


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "payload") -> DataFrame:
    """Per-clip audio metadata over binary blobs — the audio analog of
    ``image_features`` (same bounded-batch mapInPandas shape a real
    libsndfile/torchaudio decode would use; swap ``_pseudo_audio`` for the
    real decoder when the codec is available)."""

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_pseudo_audio(p if p is not None else b"")
                     for p in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "n_samples": [f[2] for f in feats],
                    "duration_sec": [f[3] for f in feats],
                    "mean_amplitude": [f[4] for f in feats],
                    "content_md5": [f[5] for f in feats],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        task, AUDIO_FEATURES_SCHEMA
    )


def decode_image_real(payload: bytes):
    """Real image decode — requires an imaging library not present in this
    environment; plumbing above is identical once available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Image decoding requires PIL; this environment has no codec "
            "libraries. Use image_features() for metadata plumbing."
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      blob_col: str = "payload",
                      every_n_bytes: int = 1024) -> DataFrame:
    """Video-frame-sampling stand-in: emits one row per sampled "frame"
    (a byte-offset slice), demonstrating the 1->N mapInPandas shape a real
    frame sampler uses."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[blob_col]):
                payload = payload or b""
                for idx, off in enumerate(
                    range(0, max(len(payload), 1), every_n_bytes)
                ):
                    out_id.append(int(doc_id))
                    out_idx.append(idx)
                    out_md5.append(
                        hashlib.md5(payload[off:off + every_n_bytes])
                        .hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return df.select(id_col, blob_col).mapInPandas(task, schema)
