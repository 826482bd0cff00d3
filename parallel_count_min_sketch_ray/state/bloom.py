"""Bloom filter: mergeable set-membership sketch.

Extension per BASELINE.json north_star (``doc_id`` membership); no
reference implementation (SURVEY.md §2.4).  Contract: zero false
negatives; false-positive rate <= the configured bound at capacity.

Classic Bloom (Bloom 1970) sized from (capacity, fp_rate):
``m = ceil(-n ln(fp) / ln(2)^2)`` bits, ``k = round(m/n ln 2)`` probes.
Probes via Kirsch–Mitzenmacher double hashing ``h1 + i*h2`` over two
independent splitmix64 streams — k probes from 2 hashes, preserving
the asymptotic fp bound.  Merge = bitwise OR (associative, commutative,
idempotent), valid for identical (m, k, seed).
"""

from __future__ import annotations

import math

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import splitmix64


@base.register_sketch
class BloomFilter:
    KIND = "bloom"

    def __init__(self, capacity: int = 1_000_000, fp_rate: float = 0.01, seed: int = 42):
        if capacity <= 0 or not (0.0 < fp_rate < 1.0):
            raise ValueError("capacity must be > 0, fp_rate in (0, 1)")
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.seed = int(seed)
        ln2 = math.log(2.0)
        ideal_bits = int(math.ceil(-capacity * math.log(fp_rate) / (ln2 * ln2)))
        # round up to a power of two: probe = mask instead of modulo
        # (vectorized % by an arbitrary m is the hot cost; the extra
        # bits only lower the realized fp rate)
        self.num_bits = 1 << max(3, (ideal_bits - 1).bit_length())
        self.num_hashes = max(1, round(ideal_bits / capacity * ln2))
        self.bits = np.zeros((self.num_bits + 7) // 8, dtype=np.uint8)
        self.count = 0  # items added (upper bound across merges: sum)

    _IDENTITY = ("capacity", "fp_rate", "seed", "num_bits", "num_hashes")

    def empty_like(self) -> "BloomFilter":
        return BloomFilter(self.capacity, self.fp_rate, self.seed)

    def _positions(self, items: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing."""
        x = np.asarray(items).astype(np.uint64, copy=False)
        h1 = splitmix64(x ^ np.uint64(self.seed))
        h2 = splitmix64(x ^ np.uint64(self.seed) ^ np.uint64(0xA076_1D64_78BD_642F))
        h2 |= np.uint64(1)  # odd -> full-period stride
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        mask = np.uint64(self.num_bits - 1)  # num_bits is a power of two
        return ((h1[None, :] + i * h2[None, :]) & mask).astype(np.int64)

    _CHUNK = 1 << 19

    def update(self, items: np.ndarray, counts=None) -> None:
        items = np.asarray(items)
        if items.size == 0:
            return
        if items.size > self._CHUNK:
            for i in range(0, items.size, self._CHUNK):
                self.update(items[i : i + self._CHUNK])
            return
        pos = np.unique(self._positions(items).ravel())  # sorted bit positions
        byte_idx = pos >> 3
        bit = (1 << (pos & 7)).astype(np.uint8)
        # OR-per-byte via group reduceat on the sorted positions
        # (np.bitwise_or.at is ~20x slower)
        starts = np.nonzero(np.diff(byte_idx, prepend=-1))[0]
        ubytes = byte_idx[starts]
        ored = np.bitwise_or.reduceat(bit, starts)
        self.bits[ubytes] |= ored
        self.count += int(items.size)

    def contains(self, items: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool array (no false negatives)."""
        items = np.atleast_1d(np.asarray(items))
        if items.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(items)  # (k, n)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def contains_one(self, item: int) -> bool:
        return bool(self.contains(np.array([item]))[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        base.check_compatible(self, other, self._IDENTITY)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.count += other.count
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.num_bits

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {
                "capacity": self.capacity,
                "fp_rate": self.fp_rate,
                "seed": self.seed,
                "count": self.count,
            },
            {"bits": self.bits},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "BloomFilter":
        sk = cls(params["capacity"], params["fp_rate"], params["seed"])
        sk.bits = arrays["bits"].astype(np.uint8, copy=False)
        sk.count = int(params["count"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return (
            f"BloomFilter(capacity={self.capacity}, fp={self.fp_rate}, "
            f"m={self.num_bits}, k={self.num_hashes}, n~{self.count})"
        )

    def describe(self) -> str:
        """Parameter + bit-state dump (pretty-printer surface)."""
        return "\n".join(
            [
                repr(self),
                f"  bits: {self.num_bits} hashes: {self.num_hashes} "
                f"fill_ratio: {self.fill_ratio():.4f}",
                f"  items_added (merge upper bound): {self.count}",
            ]
        )

