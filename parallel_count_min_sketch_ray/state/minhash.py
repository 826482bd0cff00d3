"""MinHash signature: mergeable Jaccard-similarity sketch.

A fourth sibling in the mergeable-UDAF family (SURVEY.md §2.4 scope
extension): the signature of a *set* of 64-bit item hashes under r
seeded permutations.  ``merge`` = elementwise min (associative,
commutative, idempotent), so per-partition signatures of a set union
combine exactly — the same shape as CMS table-sum / HLL register-max.

Permutations: ``pi_i(x) = (a_i * x + b_i) mod p`` with the Mersenne
prime p = 2**61 - 1 (Broder 1997 / standard MinHashLSH practice);
``E[matching rows / r] = Jaccard(A, B)``, stderr ~ 1/sqrt(r).

Per-document LSH signatures (dedup pipeline) use the vectorized
:func:`minhash_matrix` directly rather than one sketch object per doc.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import MERSENNE_PRIME_61

_P61 = np.uint64(MERSENNE_PRIME_61)


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_PRIME_61, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_PRIME_61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_matrix(
    hashes_per_row: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_rows, num_perm) signature matrix from per-row uint64 hash sets.

    Python loops only over rows; per-row work is one (num_perm, n_items)
    broadcasted modmul.  Values wrap mod 2**64 before mod p — a fixed,
    documented convention applied identically everywhere, so signatures
    remain comparable (collision behaviour is still uniform enough for
    the 1/sqrt(r) Jaccard estimator).
    """
    n = len(hashes_per_row)
    r = a.size
    out = np.full((n, r), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, h in enumerate(hashes_per_row):
        if h.size:
            out[i] = ((a[:, None] * h[None, :] + b[:, None]) % _P61).min(axis=1)
    return out


@base.register_sketch
class MinHashSignature:
    KIND = "minhash"

    def __init__(self, num_perm: int = 128, seed: int = 42):
        if num_perm < 2:
            raise ValueError("num_perm must be >= 2")
        self.num_perm = int(num_perm)
        self.seed = int(seed)
        self.a, self.b = perm_params(self.num_perm, self.seed)
        self.sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        self.n = 0  # items folded in (diagnostic only)

    _IDENTITY = ("num_perm", "seed")

    def empty_like(self) -> "MinHashSignature":
        return MinHashSignature(self.num_perm, self.seed)

    def update(self, items: np.ndarray, counts=None) -> None:
        """Fold a batch of 64-bit item hashes into the signature
        (multiplicity-insensitive, like HLL)."""
        h = np.asarray(items).astype(np.uint64, copy=False).ravel()
        if h.size == 0:
            return
        vals = ((self.a[:, None] * h[None, :] + self.b[:, None]) % _P61).min(axis=1)
        np.minimum(self.sig, vals, out=self.sig)
        self.n += int(h.size)

    def merge(self, other: "MinHashSignature") -> "MinHashSignature":
        base.check_compatible(self, other, self._IDENTITY)
        np.minimum(self.sig, other.sig, out=self.sig)
        self.n += other.n
        return self

    def jaccard(self, other: "MinHashSignature") -> float:
        base.check_compatible(self, other, self._IDENTITY)
        return float(np.count_nonzero(self.sig == other.sig)) / self.num_perm

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {"num_perm": self.num_perm, "seed": self.seed, "n": self.n},
            {"sig": self.sig},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "MinHashSignature":
        sk = cls(params["num_perm"], params["seed"])
        sk.sig = arrays["sig"].astype(np.uint64, copy=False)
        sk.n = int(params["n"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinHashSignature":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return f"MinHashSignature(num_perm={self.num_perm}, n~{self.n})"

    def describe(self) -> str:
        """Parameter + signature-prefix dump (pretty-printer surface)."""
        prefix = ", ".join(str(int(v)) for v in self.sig[:8])
        return "\n".join(
            [
                repr(self),
                f"  sig[0:8]: [{prefix}]",
                f"  items folded: {self.n}",
            ]
        )

