"""Codec-equivalence via vendored golden fixtures (round-7 verdict
"Next round #7"): this container has no PIL/soundfile, so the
live-library equivalence tests in test_multimodal_decode.py skip. These
tests close that gap offline — each fixture is a REAL-ENCODER-PRODUCED
file (not one of our own constructed containers) with its ground-truth
metadata recorded from the producing/consuming codec, so the
dependency-free parsers are checked against external reality, not
against themselves.

Fixtures:
- a 1x1 RGBA PNG — the ubiquitous "transparent pixel" data-URI blob,
  produced by a real libpng-path encoder (complete zlib IDAT, valid
  CRCs; the test re-proves completeness from first principles before
  trusting it). PIL reports size=(1,1), mode=RGBA -> 4 bands.
- the classic 1x1 GIF89a "spacer" — real encoder output; PIL reports
  size=(1,1), mode=P -> 1 band.
- PCM16 WAV normalization: libsndfile's float output for PCM16 divides
  samples by 0x8000 (its documented fixed-point scaling), so for
  samples [0, 16384, -16384, 32767] the mean |amplitude| is EXACTLY
  (0 + 0.5 + 0.5 + 32767/32768)/4 — recorded here as a constant rather
  than derived from our own implementation.
"""

import base64
import struct
import sys
import os
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from space_spark.operators.multimodal import (  # noqa: E402
    _parse_header_dims,
    _real_audio,
)

# Real-encoder 1x1 RGBA PNG (8-bit, color type 6).
GOLDEN_PNG_1X1_RGBA = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkY"
    "PhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)
# Real-encoder 1x1 GIF89a (global palette, the web "spacer" pixel).
GOLDEN_GIF_1X1 = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_golden_png_fixture_is_a_complete_real_image():
    """Prove the vendored bytes are a full, internally-consistent PNG
    (magic, IHDR CRC, decompressible IDAT covering every scanline byte)
    — so the golden assertion below is against a real image, not a
    truncated header."""
    p = GOLDEN_PNG_1X1_RGBA
    assert p[:8] == b"\x89PNG\r\n\x1a\n"
    assert p[12:16] == b"IHDR"
    assert struct.unpack(">I", p[29:33])[0] == (
        zlib.crc32(p[12:29]) & 0xFFFFFFFF
    )
    idat_len = struct.unpack(">I", p[33:37])[0]
    assert p[37:41] == b"IDAT"
    scanlines = zlib.decompress(p[41:41 + idat_len])
    # 1 row x (1 filter byte + 1 px * 4 channels)
    assert len(scanlines) == 5
    assert p[-8:-4] == b"IEND"


def test_header_parse_matches_pil_on_golden_png():
    # PIL: size=(1,1), mode=RGBA, len(getbands())=4.
    assert _parse_header_dims(GOLDEN_PNG_1X1_RGBA) == (1, 1, 4)


def test_header_parse_matches_pil_on_golden_gif():
    assert GOLDEN_GIF_1X1[:6] == b"GIF89a"
    assert GOLDEN_GIF_1X1[-1:] == b";"  # trailer: complete stream
    # PIL: size=(1,1), mode=P, len(getbands())=1.
    assert _parse_header_dims(GOLDEN_GIF_1X1) == (1, 1, 1)


def test_pcm16_normalization_matches_libsndfile_constant():
    """libsndfile scales PCM16 by 1/0x8000; its mean |amplitude| for
    these four samples is an exact dyadic rational, recorded as a
    literal. The stdlib-wave path must reproduce it bit-for-bit."""
    from tests.test_multimodal_decode import make_wav

    blob = make_wav([0, 16384, -16384, 32767])
    n, rate, frames, duration, amp, digest = _real_audio(blob)
    assert frames == 4
    assert amp == (0.0 + 0.5 + 0.5 + 32767 / 32768) / 4
    assert amp == 0.49999237060546875
    assert duration == 4 / rate


def test_headers_decode_path_over_golden_blobs(spark):
    """The distributed headers path (mapInPandas) over the vendored
    real files — the executor-side plumbing, not just the parser fn."""
    from space_spark.operators.multimodal import image_features

    df = spark.createDataFrame(
        [(1, GOLDEN_PNG_1X1_RGBA), (2, GOLDEN_GIF_1X1), (3, b"junk")],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in
           image_features(df, decode="headers").collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) \
        == (1, 1, 4)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) \
        == (1, 1, 1)
    assert out[3]["width"] is None
