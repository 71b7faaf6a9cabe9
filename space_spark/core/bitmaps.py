"""Row-level delete bitmaps: compact per-file encodings of deleted row
positions.

The reference's change log stores deletions as per-file roaring bitmaps
(metadata.proto:160-191 ``RowBitmap {file, all_rows, roaring_bitmap,
num_rows}``) and reconstructs the DELETE stream by re-reading the original
data files masked by the bitmap, primary-key fields only
(ops/change_data.py:126-141). This module provides the same capability
with a dependency-free two-container encoding that matches roaring's
small/dense split at file granularity:

- SPARSE (tag 0): sorted uint32 positions — O(deleted rows) bytes. A
  1-row delete from a 1M-row file is 5 bytes, not 125 KB.
- DENSE (tag 1): raw bitset — O(file rows / 8) bytes, chosen when more
  than 1/32nd of the file is deleted (the crossover where 4-byte
  positions outgrow 1-bit membership).

Encoding is chosen per file by actual size, so bitmap bytes are always
min(4*k, num_rows/8) + 1 — never O(rows) for a small delete and never
O(4*rows) for a near-full delete.
"""

from __future__ import annotations

import numpy as np

_TAG_SPARSE = 0
_TAG_DENSE = 1


def encode_positions(positions: np.ndarray, num_rows: int) -> bytes:
    """Encode sorted deleted-row positions within a file of ``num_rows``.

    ``positions`` must be non-negative, strictly increasing, and less
    than ``num_rows`` (callers pass ``np.unique`` output).
    """
    pos = np.asarray(positions, dtype=np.uint32)
    sparse_bytes = 4 * int(pos.size)
    dense_bytes = (num_rows + 7) // 8
    if sparse_bytes <= dense_bytes:
        return bytes([_TAG_SPARSE]) + pos.tobytes()
    bits = np.zeros(num_rows, dtype=bool)
    bits[pos] = True
    return bytes([_TAG_DENSE]) + np.packbits(bits).tobytes()


def decode_positions(blob: bytes, num_rows: int) -> np.ndarray:
    """Decode to a sorted uint32 array of deleted row positions."""
    if not blob:
        return np.empty(0, dtype=np.uint32)
    tag, payload = blob[0], blob[1:]
    if tag == _TAG_SPARSE:
        return np.frombuffer(payload, dtype=np.uint32)
    if tag == _TAG_DENSE:
        bits = np.unpackbits(
            np.frombuffer(payload, dtype=np.uint8), count=num_rows
        )
        return np.nonzero(bits)[0].astype(np.uint32)
    raise ValueError(f"Unknown bitmap tag {tag}")
