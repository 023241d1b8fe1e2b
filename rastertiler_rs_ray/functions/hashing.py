"""Stable 64-bit content hashing for tile/image dedup.

The reference keys its ``images`` table on ``seahash(png_bytes) as i64``
(/root/reference/src/mbtiles.rs:104-107). Any stable 64-bit hash gives
the same *semantics* (content-addressed dedup); we pin blake2b with an
8-byte digest (stdlib, C speed, stable across processes/versions) and
use it consistently everywhere — golden fixtures derive from this
hash, tile *assignments* derive from the reference's tile math.
"""

from __future__ import annotations

import hashlib

import numpy as np


def content_hash64(data: bytes) -> int:
    """bytes → signed int64 (matches the reference's `as i64` cast)."""
    digest = hashlib.blake2b(data, digest_size=8).digest()
    return int(np.uint64(int.from_bytes(digest, "little")).astype(np.int64))


def hash_binary_column(blobs) -> np.ndarray:
    """Iterable of bytes → int64 numpy array of content hashes."""
    return np.fromiter(
        (content_hash64(b) for b in blobs), dtype=np.int64, count=len(blobs)
    )
