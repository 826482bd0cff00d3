"""HyperLogLog: mergeable distinct-count sketch.

No reference implementation exists (SURVEY.md §2.4) — the contract is
"same mergeable-UDAF shape as CMS" per BASELINE.json's north_star, with
the published bound (Flajolet et al. 2007: relative standard error
~= 1.04 / sqrt(m)) as the test oracle.

Dense HLL with m = 2**p registers over a 64-bit splitmix hash:
register index = low p bits, rho = 1 + leading zeros of the remaining
64-p bits.  Merge = elementwise register max (associative, commutative,
idempotent).  Estimator: classic alpha_m * m^2 / sum(2^-M) with
linear-counting small-range correction; no large-range correction is
needed for 64-bit hashes.
"""

from __future__ import annotations

import math

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import splitmix64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@base.register_sketch
class HyperLogLog:
    KIND = "hll"

    def __init__(self, p: int = 14, seed: int = 42):
        if not (4 <= p <= 20):
            raise ValueError("p must be in [4, 20]")
        self.p = int(p)
        self.seed = int(seed)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    _IDENTITY = ("p", "seed")

    def empty_like(self) -> "HyperLogLog":
        return HyperLogLog(self.p, self.seed)

    _CHUNK = 1 << 20  # sort-based reduction works on cache-sized chunks

    def update(self, items: np.ndarray, counts=None) -> None:
        """Vectorized add; ``counts`` is ignored (distinct-count
        semantics — multiplicity does not matter)."""
        items = np.asarray(items)
        if items.size == 0:
            return
        if items.size > self._CHUNK:
            for i in range(0, items.size, self._CHUNK):
                self.update(items[i : i + self._CHUNK])
            return
        h = splitmix64(items.astype(np.uint64, copy=False) ^ np.uint64(self.seed))
        idx = (h & np.uint64(self.m - 1)).astype(np.uint32)
        rest = h >> np.uint64(self.p)
        # rho = position of the leftmost 1-bit in the top 64-p bits
        nbits = 64 - self.p
        lz = np.full(items.shape, nbits, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # floor(log2) via float conversion is exact for < 2**53;
            # 64-p = 50 bits at default p=14, so always exact there.
            # For p < 11 split high/low 32 bits to stay exact.
            r = rest[nz]
            hi = (r >> np.uint64(32)).astype(np.float64)
            lo = (r & np.uint64(0xFFFFFFFF)).astype(np.float64)
            log2 = np.where(
                hi > 0,
                32 + np.floor(np.log2(np.maximum(hi, 1))),
                np.floor(np.log2(np.maximum(lo, 1))),
            ).astype(np.int64)
            lz[nz] = (nbits - 1 - log2).astype(np.uint8)
        rho = lz + 1  # in [1, 64-p+1] <= 61 < 2**7
        # max-per-register via one uint32 sort (rho in the low 7 bits,
        # register id above): ~50x faster than np.maximum.at
        key = (idx << np.uint32(7)) | rho.astype(np.uint32)
        key.sort()
        ids = key >> np.uint32(7)
        ends = np.nonzero(np.diff(ids))[0]
        ends = np.concatenate([ends, [ids.size - 1]])
        uidx = ids[ends].astype(np.int64)  # unique -> race-free fancy assign
        rmax = (key[ends] & np.uint32(0x7F)).astype(np.uint8)
        self.registers[uidx] = np.maximum(self.registers[uidx], rmax)

    def update_hashed(self, h64: np.ndarray) -> None:
        """Add pre-hashed uint64 values (e.g. from hash64_strings)."""
        self.update(h64)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        base.check_compatible(self, other, self._IDENTITY)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)  # linear counting
        return float(est)

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND, {"p": self.p, "seed": self.seed}, {"registers": self.registers}
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "HyperLogLog":
        sk = cls(params["p"], params["seed"])
        sk.registers = arrays["registers"].astype(np.uint8, copy=False)
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return f"HyperLogLog(p={self.p}, m={self.m}, est={self.estimate():.1f})"

    def describe(self) -> str:
        """Parameter + register-state dump (the pretty-printer surface
        of SURVEY.md §2.1 #16, extended to every sketch sibling)."""
        zeros = int(np.count_nonzero(self.registers == 0))
        return "\n".join(
            [
                repr(self),
                f"  registers: m={self.m} zero={zeros} "
                f"max_rank={int(self.registers.max())}",
                f"  estimate: {self.estimate():.1f}",
            ]
        )

