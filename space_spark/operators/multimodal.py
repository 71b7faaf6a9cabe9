"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Space stores bulky media as record fields (binary); the processing a
training pipeline needs on top — decode, feature-extract, resize,
frame-sample — runs as Arrow-batched ``mapInPandas`` stages so each task
handles a bounded batch of blobs (no driver involvement, no shuffle).

Codecs are optional dependencies: ``image_features(decode="real")`` does
a true PIL header decode when PIL is importable (nulls for corrupt
payloads, NotImplementedError when the codec is absent);
``decode="headers"`` parses PNG/GIF/BMP/JPEG container headers in pure
Python — a real format decode that needs no codec library, so it
EXECUTES in codec-free environments and is pinned to agree with PIL
wherever PIL exists. ``audio_features(decode="real")`` uses libsndfile
(via soundfile) when importable and the stdlib ``wave`` reader for
RIFF/WAVE PCM otherwise — always available. The default
``decode="pseudo"`` computes DETERMINISTIC metadata from the raw bytes
(length, md5-derived pseudo-values) so the Spark-side plumbing —
schema, batch shape, partitioning — is testable codec-free and the
values are reproducible in the SQL oracle; registered queries stay on
it. The ffmpeg (video) path remains a pseudo-only stub.
"""

from __future__ import annotations

import hashlib
import struct
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


def _parse_header_dims(payload: bytes):
    """Pure-Python container-header parse for PNG / GIF / BMP / JPEG:
    (width, height, channels) or all-None for anything else. Channel
    counts mirror PIL's band count for each container (PNG color types
    0/2/3/4/6 -> L/RGB/P/LA/RGBA, GIF -> P, JPEG from the SOF component
    count) so ``decode="headers"`` and ``decode="real"`` agree wherever
    both can run — pinned by tests/test_multimodal_decode.py. Needs no
    codec library, so the real-format parse path executes (not skips)
    in codec-free environments."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(payload[25])
            # Dims are unsigned 32-bit on the wire but the output schema
            # is int32; a hostile header claiming >2^31 pixels must not
            # wrap negative (or kill the task under safe Arrow
            # conversion). The PNG spec itself caps dims at 2^31-1.
            if channels is None or w > 0x7FFFFFFF or h > 0x7FFFFFFF:
                return None, None, None
            return w, h, channels
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            return w, h, 1  # PIL opens GIF frames palette-mode: 1 band
        if payload[:2] == b"BM" and len(payload) >= 34:
            w, h = struct.unpack("<ii", payload[18:26])
            bpp = struct.unpack("<H", payload[28:30])[0]
            compression = struct.unpack("<I", payload[30:34])[0]
            # PIL opens plain BI_RGB 32-bpp as 3-band RGB (raw mode
            # BGRX); bitfield/alpha variants are ambiguous -> nulls.
            channels = {8: 1, 24: 3}.get(bpp)
            if bpp == 32 and compression == 0:
                channels = 3
            if channels is None or w <= 0 or h == 0:
                return None, None, None
            return w, abs(h), channels
        if payload[:2] == b"\xff\xd8":
            # Walk JFIF segments to the first SOF marker.
            i = 2
            while i + 4 <= len(payload) and payload[i] == 0xFF:
                marker, seglen = payload[i + 1], struct.unpack(
                    ">H", payload[i + 2:i + 4]
                )[0]
                if 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC
                ):
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return w, h, payload[i + 9]
                i += 2 + seglen
    except Exception:
        pass
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
    - ``"headers"``: pure-Python PNG/GIF/BMP/JPEG container-header
      parse, PIL-band-compatible, no codec dependency; payloads in any
      other format yield nulls.
    - ``"auto"``: ``"real"`` when PIL imports, else ``"pseudo"``.
    """
    if decode not in ("pseudo", "real", "headers", "auto"):
        raise ValueError(
            f"decode must be pseudo|real|headers|auto, got {decode!r}"
        )
    if decode == "auto":
        decode = "real" if _pil_available() else "pseudo"
    if decode == "real" and not _pil_available():
        raise NotImplementedError(
            "decode='real' requires PIL; this environment has no codec "
            "libraries. Use decode='headers' for a dependency-free "
            "container-header parse, or decode='pseudo' (or 'auto') "
            "for the deterministic metadata path."
        )
    dims_fn = {"real": _real_dims, "headers": _parse_header_dims,
               "pseudo": _pseudo_dims}[decode]

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


def _soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401
        return True
    except ImportError:
        return False


def _real_audio(payload: bytes) -> tuple:
    """True audio decode: libsndfile (via ``soundfile``) when importable
    — any format it knows — else the stdlib ``wave`` reader for
    RIFF/WAVE PCM, which needs NO optional dependency, so the real path
    executes in codec-free environments too. Undecodable payloads yield
    nulls for the decoded fields (a 100 TB crawl always contains
    corrupt blobs; a poison payload must not kill the task).
    mean_amplitude is the mean absolute sample normalized to [0, 1]
    (PCM ints divided by full scale — the same values libsndfile's
    float output produces for PCM16, pinned by the equivalence test in
    soundfile-present environments)."""
    import io

    import numpy as np

    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    bad = (n, None, None, None, None, digest)
    if _soundfile_available():
        import soundfile as sf_

        try:
            data, rate = sf_.read(io.BytesIO(payload), always_2d=True)
        except Exception:
            return bad
        frames = int(data.shape[0])
        amp = float(np.abs(data).mean()) if data.size else 0.0
        return n, int(rate), frames, frames / rate, amp, digest
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            width = w.getsampwidth()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return bad
    if rate <= 0 or nch <= 0 or width not in (1, 2, 3, 4):
        return bad
    # Truncated payloads can hand back partial samples; trim to whole
    # samples, and derive frame count / duration from the bytes ACTUALLY
    # present, not the header's claim — matching what libsndfile reports
    # for the same blob (a hostile header claiming 1e9 frames must not
    # publish a 1e9-sample duration).
    raw = raw[: len(raw) - (len(raw) % width)]
    if width == 3:  # 24-bit PCM: sign-extend 3-byte little-endian
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        arr = (b[:, 0].astype(np.int64)
               | b[:, 1].astype(np.int64) << 8
               | b[:, 2].astype(np.int64) << 16)
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr) \
            .astype(np.float64)
    else:
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        arr = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, midpoint 128
        norm = np.abs(arr - 128.0) / 128.0
    else:
        norm = np.abs(arr) / float(2 ** (8 * width - 1))
    frames = arr.size // nch
    amp = float(norm[: frames * nch].mean()) if frames else 0.0
    return n, rate, frames, frames / rate, amp, digest


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "payload",
                   decode: str = "pseudo") -> DataFrame:
    """Per-clip audio metadata over binary blobs — the audio analog of
    ``image_features``, same bounded-batch mapInPandas shape. ``decode``:

    - ``"pseudo"`` (default): deterministic byte-derived values,
      bit-reproducible in the SQL oracle — the registered-query path.
    - ``"real"``: libsndfile via ``soundfile`` when importable, else
      the stdlib WAV reader (always available); undecodable payloads
      yield nulls.
    - ``"auto"``: ``"real"`` when soundfile imports, else ``"pseudo"``
      (mirrors the image discipline; the stdlib-WAV real path is an
      explicit opt-in because it nulls every non-WAV payload).
    """
    if decode not in ("pseudo", "real", "auto"):
        raise ValueError(f"decode must be pseudo|real|auto, got {decode!r}")
    if decode == "auto":
        decode = "real" if _soundfile_available() else "pseudo"
    feat_fn = _real_audio if decode == "real" else _pseudo_audio

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [feat_fn(p if p is not None else b"")
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


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _mp4_boxes(buf: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", buf[i:i + 4])[0]
        typ = buf[i + 4:i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
            hdr = 16
        elif size == 0:  # box extends to EOF
            size = end - i
        if size < hdr:
            return
        yield typ, i + hdr, min(i + size, end)
        i += size


def _parse_video_header(payload: bytes) -> tuple:
    """Pure-Python ISO-BMFF (MP4/MOV) and RIFF-AVI header parse:
    (container, width, height, n_frames, duration_sec), all-None for
    anything else. MP4: moov/mvhd gives timescale+duration, the first
    moov/trak/tkhd with a nonzero 16.16-fixed width/height gives
    dimensions (frame count is not in the movie header -> None). AVI:
    the standard hdrl/avih chunk carries frame count, per-frame
    microseconds, and dimensions. Needs no codec library, so the real
    video-container parse executes in ffmpeg-free environments."""
    none = (None, None, None, None, None)
    try:
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            width = height = duration = None
            for typ, a, b in _mp4_boxes(payload, 0, len(payload)):
                if typ != b"moov":
                    continue
                for t2, c, d in _mp4_boxes(payload, a, b):
                    if t2 == b"mvhd":
                        ver = payload[c]
                        if ver == 1:
                            ts, = struct.unpack(">I", payload[c + 20:c + 24])
                            dur, = struct.unpack(">Q", payload[c + 24:c + 32])
                        else:
                            ts, = struct.unpack(">I", payload[c + 12:c + 16])
                            dur, = struct.unpack(">I", payload[c + 16:c + 20])
                        if ts:
                            duration = dur / ts
                    elif t2 == b"trak" and width is None:
                        for t3, e, f in _mp4_boxes(payload, c, d):
                            if t3 == b"tkhd" and f - e >= 8:
                                w, h = struct.unpack(
                                    ">II", payload[f - 8:f]
                                )
                                if w and h:
                                    width, height = w >> 16, h >> 16
            if duration is None and width is None:
                return none
            return "mp4", width, height, None, duration
        if (len(payload) >= 28 and payload[:4] == b"RIFF"
                and payload[8:12] == b"AVI " and payload[12:16] == b"LIST"
                and payload[20:24] == b"hdrl" and payload[24:28] == b"avih"):
            o = 32  # avih payload (chunk data) offset
            usec_pf, = struct.unpack("<I", payload[o:o + 4])
            frames, = struct.unpack("<I", payload[o + 16:o + 20])
            w, h = struct.unpack("<II", payload[o + 32:o + 40])
            if w > 0x7FFFFFFF or h > 0x7FFFFFFF:  # uint32 vs int32 schema
                return none
            duration = frames * usec_pf / 1e6 if usec_pf else None
            return "avi", w, h, frames, duration
    except Exception:
        pass
    return none


def _pseudo_video(payload: bytes) -> tuple:
    """Deterministic fake video decode mirroring the image/audio pseudo
    kernels (oracle-expressible: width/height as in _pseudo_dims,
    n_frames = n % 240 + 1, duration at 24 fps)."""
    n = len(payload)
    frames = n % 240 + 1
    return ("pseudo", n % 1920 + 1, (n * 7919 + 13) % 1080 + 1,
            frames, frames / 24.0)


def video_features(df: DataFrame, id_col: str = "doc_id",
                   blob_col: str = "payload",
                   decode: str = "pseudo") -> DataFrame:
    """Per-clip video container metadata over binary blobs — the
    modality-completing analog of image/audio features (same bounded
    -batch mapInPandas shape). ``decode="headers"`` does a real
    MP4/AVI container-header parse with no codec dependency (frame
    DECODE still needs ffmpeg — that remains ``frame_sample_stub``'s
    honest pseudo territory); ``"pseudo"`` (default) is the
    deterministic oracle-reproducible path."""
    if decode not in ("pseudo", "headers"):
        raise ValueError(f"decode must be pseudo|headers, got {decode!r}")
    feat_fn = (_parse_video_header if decode == "headers"
               else _pseudo_video)

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [p if p is not None else b""
                        for p in pdf[blob_col]]
            feats = [feat_fn(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in payloads],
                    "container": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "n_frames": [f[3] for f in feats],
                    "duration_sec": [f[4] for f in feats],
                    "content_md5": [hashlib.md5(p).hexdigest()
                                    for p in payloads],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        task, VIDEO_FEATURES_SCHEMA
    )


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
