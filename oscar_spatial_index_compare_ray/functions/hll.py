"""HyperLogLog — mergeable approximate-distinct sketch.

The reference aggregates exactly everywhere (SURVEY.md §2.6 note); at
10¹² docs, distinct counts (vocabulary size, distinct urls per pixel)
need a sketch.  Classic HLL (Flajolet et al. 2007) with the standard
bias correction; pure numpy, deterministic, and MERGEABLE — emit one
sketch per batch inside ``map_batches``, combine with elementwise max
in a tiny reduce (the partial-aggregation pattern for sketches,
ray_guide 'Aggregation at scale')."""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_U64 = np.uint64


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HLL":
        """Add pre-hashed uint64 values (vectorized)."""
        h = np.asarray(h, dtype=np.uint64)
        if not len(h):
            return self
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        rest = (h << _U64(self.p)) | (_U64(1) << _U64(self.p - 1))  # sentinel stops clz
        # rank = leading zeros of the remaining bits + 1, via bit_length
        lz = np.zeros(len(h), dtype=np.uint8)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            hi = x >> _U64(64 - shift)
            z = hi == 0
            lz[z] += shift
            x = np.where(z, x << _U64(shift), x)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_ints(self, values: np.ndarray, seed: int = 0) -> "HLL":
        return self.add_hashes(splitmix64(np.asarray(values, np.uint64) ^ _U64(seed)))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h

    def count(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        if est <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return float(est)
