"""Per-file primary-key Bloom filters for point-read pruning.

Range (min/max) manifest stats prune point lookups well only when the
table is clustered on the probed key; on an unclustered table every
file's range covers almost every key and a single-row lookup still
scans the table. A small Bloom filter per (file, PK column) — built at
write time from the file's actual key values, stored as a binary
manifest column — lets ``read_by_keys`` skip files that provably do
not contain ANY probed key, turning point reads on unclustered tables
from O(table) into O(matching files + false positives).

Design for 100 TB:
- build cost rides the existing footer-stats pass (the per-file stat
  collection is already distributed for large commits); one extra
  columnar read of the PK columns per newly written file, never a
  table scan;
- size ~10 bits/key (k=7 double-hashed probes -> ~0.8% false-positive
  rate), capped at 1 MiB per filter so a 10M-row file degrades to a
  coarser filter instead of bloating the manifest;
- probing is driver-side over manifest rows (one row per data file —
  the same driver-scale object the planner already holds) against a
  BOUNDED key set; large key sets skip Bloom pruning and keep the
  broadcast semi-join path.

Hashing is Kirsch-Mitzenmacher double hashing over the two 64-bit
halves of ``md5(str(value))`` — deterministic, dependency-free, and
identical wherever Python runs (build on executors, probe on the
driver). Opt-in per table (``Dataset.create(..., bloom_filters=True)``)
because every append pays the PK re-read; existing tables and default
tables are byte-identical to before.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Optional, Sequence

BITS_PER_KEY = 10
NUM_HASHES = 7
MIN_BITS = 1024
MAX_BITS = 1 << 23  # 1 MiB per filter


def _encode(value) -> bytes:
    if isinstance(value, bytes):
        return value
    return str(value).encode("utf-8")


def _hash_pair(value) -> tuple:
    d = hashlib.md5(_encode(value)).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return h1, h2


def sized_bits(n_keys: int) -> int:
    bits = max(MIN_BITS, min(MAX_BITS, n_keys * BITS_PER_KEY))
    return (bits + 7) // 8 * 8


def build(values: Iterable, n_keys: Optional[int] = None) -> bytes:
    """Bloom bitmap over ``values`` (NULLs skipped — PKs reject nulls at
    ingress anyway)."""
    vals = values if isinstance(values, (list, tuple)) else list(values)
    bits = sized_bits(n_keys if n_keys is not None else len(vals))
    bitmap = bytearray(bits // 8)
    for v in vals:
        if v is None:
            continue
        h1, h2 = _hash_pair(v)
        for i in range(NUM_HASHES):
            pos = (h1 + i * h2) % bits
            bitmap[pos >> 3] |= 1 << (pos & 7)
    return bytes(bitmap)


def might_contain(bitmap: bytes, value) -> bool:
    if not bitmap:
        return True  # absent/empty filter: never prune
    bits = len(bitmap) * 8
    h1, h2 = _hash_pair(value)
    for i in range(NUM_HASHES):
        pos = (h1 + i * h2) % bits
        if not bitmap[pos >> 3] & (1 << (pos & 7)):
            return False
    return True


def file_matches_any(blooms: Dict[str, Optional[bytes]],
                     key_rows: Sequence[dict],
                     pks: List[str]) -> bool:
    """True if ANY probed key tuple may be present: for a tuple to be in
    the file, EVERY component must pass its column's filter. A file
    with any missing filter is never pruned."""
    if any(blooms.get(pk) in (None, b"") for pk in pks):
        return True
    return any(
        all(might_contain(blooms[pk], row[pk]) for pk in pks)
        for row in key_rows
    )
