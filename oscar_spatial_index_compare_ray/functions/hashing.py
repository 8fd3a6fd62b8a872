"""Stable, deterministic hashing used across the engine.

The reference deduplicates posting lists through a globally shared,
mutex-synchronized ``ItemIndexFactory`` (src/OscarSearchSgIndex.cpp:190,
196-197).  A shared mutable dedup store does not scale across nodes, so
this engine replaces it with *content hashing*: ``index_id =
hash(sorted items)`` is deterministic, needs no coordination, and two
workers producing the same list produce the same id.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def stable_hash64_bytes(data: bytes) -> int:
    """64-bit stable hash of bytes (md5 prefix; stable across runs/processes)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def stable_hash64_str(s: str) -> int:
    return stable_hash64_bytes(s.encode("utf-8"))


def content_hash_u32_list(items: np.ndarray) -> int:
    """Deterministic id for a sorted uint32 posting list."""
    a = np.ascontiguousarray(np.asarray(items, dtype=np.uint32))
    return stable_hash64_bytes(a.tobytes())


# --- vectorized 64-bit mix hashes (splitmix64 family) -------------------
# Used for salting, minhash permutations and LSH banding; pure numpy.

def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    z = np.asarray(x, dtype=np.uint64).copy()
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def hash_u64_with_seed(x: np.ndarray, seed: int) -> np.ndarray:
    return splitmix64(np.asarray(x, dtype=np.uint64) ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))


def token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token (stable across processes)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    # crc-free stable path: blake2b 8-byte digests are fast for short keys
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out
