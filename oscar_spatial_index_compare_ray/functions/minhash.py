"""Near-duplicate-detection kernels: shingles, MinHash, SimHash,
n-gram Jaccard — the sketch family for web-scale dedup.

MinHash uses H independent 64-bit hash families via splitmix64 seeds;
SimHash is the classic 64-bit bit-vote over token hashes.  All pure
numpy, deterministic across processes (required: dedup results must not
depend on parallelism)."""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64, token_hashes
from .tokenize import tokenize

_U64 = np.uint64


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-token shingle hashes of a document."""
    toks = tokenize(text)
    th = token_hashes(toks)
    if len(th) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(th) < k:
        combined = th[0:1].copy()
        for i in range(1, len(th)):
            combined = combined * _U64(1099511628211) ^ th[i: i + 1]
        return np.unique(combined)
    sh = th[: len(th) - k + 1].copy()
    for i in range(1, k):
        sh = sh * _U64(1099511628211) ^ th[i: len(th) - k + 1 + i]
    return np.unique(sh)


def minhash_signature(shingles: np.ndarray, num_hashes: int = 64) -> np.ndarray:
    """MinHash signature: per hash family, min over shingle rehashes."""
    if len(shingles) == 0:
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = splitmix64(np.arange(num_hashes, dtype=np.uint64) ^ _U64(0x5EED))
    # (H, S) rehash matrix via xor-mix; min per row
    return splitmix64(shingles[None, :] ^ seeds[:, None]).min(axis=1)


def lsh_bands(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Band hashes of a signature: (bands,) uint64 — equal band hash in
    the same band index ⇒ LSH candidate pair."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.uint64)
    for b in range(bands):
        seg = sig[b * rows: (b + 1) * rows]
        h = _U64(b + 1)
        for v in seg:
            h = splitmix64(h ^ v)
        out[b] = h
    return out


def simhash(text: str) -> np.uint64:
    """64-bit SimHash over token hashes (bit votes)."""
    th = token_hashes(tokenize(text))
    if len(th) == 0:
        return _U64(0)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & _U64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = _U64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= _U64(1) << _U64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)
    # popcount via bit tricks
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return ((x * _U64(0x0101010101010101)) >> _U64(56)).astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
