"""Bottom-k (KMV) sketch: mergeable uniform sample of DISTINCT keys
plus a k-minimum-values distinct-count estimator.

Seventh sibling in the mergeable-UDAF family (SURVEY.md §2.4 scope
extensions).  The training-data need it serves: "give me a uniform
sample of document ids out of 10^12 rows, computed in one pass, and
mergeable across partitions" — the sampling analogue of HLL's
counting.

Theory (Bar-Yossef et al. 2002, KMV / k-minimum values):

- hash every key with a fixed 64-bit avalanche hash (splitmix64 over
  the seeded key); keep the k SMALLEST distinct hash values and their
  keys;
- the kept keys are a uniform sample of the distinct-key population
  (each distinct key's hash is an iid uniform draw; the bottom-k of
  iid uniforms is an order-statistics sample independent of insertion
  order or multiplicity);
- distinct estimate: ``(k - 1) / U_(k)`` where ``U_(k)`` is the kth
  smallest hash mapped to (0, 1); relative stderr ~ 1/sqrt(k - 2);
- merge = bottom-k of the union of kept sets — associative,
  commutative, idempotent, and BIT-EXACT regardless of merge order
  (unlike KLL there is no randomness beyond the hash), so
  distributed == serial is asserted bitwise in tests.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import splitmix64


@base.register_sketch
class BottomKSketch:
    KIND = "kmv"

    def __init__(self, k: int = 1024, seed: int = 42):
        if k < 3:
            raise ValueError("k must be >= 3 (KMV estimate needs k-2 > 0)")
        self.k = int(k)
        self.seed = int(seed)
        self._seed_hash = splitmix64(np.array(seed, dtype=np.uint64))
        self.hashes = np.zeros(0, dtype=np.uint64)  # sorted ascending
        self.keys = np.zeros(0, dtype=np.int64)  # aligned with hashes
        self.n = 0  # total items folded (diagnostic)

    _IDENTITY = ("k", "seed")

    def empty_like(self) -> "BottomKSketch":
        return BottomKSketch(self.k, self.seed)

    def _hash(self, items: np.ndarray) -> np.ndarray:
        return splitmix64(items.astype(np.uint64) ^ self._seed_hash)

    def update(self, items: np.ndarray, counts=None) -> None:
        """Fold a batch of keys.  ``counts`` affects only the n tally —
        multiplicity cannot change a distinct-key sample (the hash of a
        repeated key is the same draw) — except that zero-count keys
        never occurred and are dropped before insertion (same rule as
        KLLSketch.update)."""
        items = np.asarray(items).astype(np.int64, copy=False).ravel()
        if items.size == 0:
            return
        if counts is not None:
            counts = base.check_counts(counts)
            self.n += int(counts.sum())
            items = items[np.asarray(counts).ravel() > 0]
            if items.size == 0:
                return
        else:
            self.n += int(items.size)
        h = self._hash(items)
        allh = np.concatenate([self.hashes, h])
        allk = np.concatenate([self.keys, items])
        order = np.argsort(allh, kind="stable")
        allh, allk = allh[order], allk[order]
        uniq = np.ones(allh.size, dtype=bool)
        uniq[1:] = allh[1:] != allh[:-1]  # distinct hashes (== distinct keys)
        self.hashes = allh[uniq][: self.k]
        self.keys = allk[uniq][: self.k]

    def merge(self, other: "BottomKSketch") -> "BottomKSketch":
        base.check_compatible(self, other, self._IDENTITY)
        n_other = other.n
        self.update(other.keys)  # bottom-k of the union
        self.n += n_other - int(other.keys.size)  # update() counted the keys
        return self

    # ---- queries ---------------------------------------------------------

    def sample(self) -> np.ndarray:
        """The uniform distinct-key sample (ascending hash order)."""
        return self.keys.copy()

    def estimate_distinct(self) -> float:
        """KMV estimator: (k-1)/U_(k); exact count when under-full."""
        if self.hashes.size < self.k:
            return float(self.hashes.size)
        u_k = (float(self.hashes[self.k - 1]) + 1.0) / 2.0**64
        return (self.k - 1) / u_k

    def relative_error(self) -> float:
        return 1.0 / np.sqrt(max(self.k - 2, 1))

    def set_estimates(self, other: "BottomKSketch") -> dict:
        """KMV set operations (Beyer et al. 2007, SIGMOD): union /
        intersection / Jaccard estimates between two same-identity
        sketches, WITHOUT merging either.

        Estimator: let K = bottom-k of the union of the two kept hash
        sets.  Every h in K that belongs to set A is necessarily in A's
        sample (h is among the k smallest of the union, hence among the
        k smallest of A), so membership tests against the samples are
        exact.  Then

        - ``jaccard = |K ∩ A-sample ∩ B-sample| / |K|`` (ratio
          estimator, stderr ~ sqrt(J(1-J)/k));
        - ``union = (k-1)/U_(k)`` over the combined bottom-k (exact
          when BOTH sketches are under-full — every key was kept);
        - ``intersection = jaccard * union``.
        """
        base.check_compatible(self, other, self._IDENTITY)
        allh = np.union1d(self.hashes, other.hashes)  # sorted distinct
        kept = allh[: self.k]
        if kept.size == 0:
            return {"union": 0.0, "intersection": 0.0, "jaccard": 0.0}
        in_a = np.isin(kept, self.hashes, assume_unique=True)
        in_b = np.isin(kept, other.hashes, assume_unique=True)
        k_inter = int((in_a & in_b).sum())
        exact = self.hashes.size < self.k and other.hashes.size < other.k
        if exact or allh.size < self.k:
            union_est = float(allh.size)
        else:
            u_k = (float(kept[-1]) + 1.0) / 2.0**64
            union_est = (self.k - 1) / u_k
        jaccard = k_inter / kept.size
        return {
            "union": union_est,
            "intersection": jaccard * union_est,
            "jaccard": jaccard,
        }

    def contains(self, key: int) -> bool:
        """Membership in the kept sample."""
        return bool(np.isin(np.int64(key), self.keys))

    # ---- serde / reporting ----------------------------------------------

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {"k": self.k, "seed": self.seed, "n": self.n},
            {"hashes": self.hashes, "keys": self.keys},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "BottomKSketch":
        sk = cls(params["k"], params["seed"])
        sk.hashes = arrays["hashes"].astype(np.uint64, copy=False)
        sk.keys = arrays["keys"].astype(np.int64, copy=False)
        sk.n = int(params["n"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "BottomKSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def error_bound(self) -> float:
        return self.relative_error()

    def describe(self) -> str:
        """Parameter + sample-state dump (pretty-printer surface)."""
        return "\n".join(
            [
                repr(self),
                f"  kept: {self.keys.size}/{self.k} distinct-key sample",
                f"  distinct estimate: {self.estimate_distinct():.1f} "
                f"(±{self.relative_error() * 100:.1f}%)",
            ]
        )

    def __repr__(self) -> str:
        return (
            f"BottomKSketch(k={self.k}, seed={self.seed}, "
            f"kept={self.keys.size}, n={self.n})"
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, BottomKSketch)
            and self.k == other.k
            and self.seed == other.seed
            and np.array_equal(self.hashes, other.hashes)
            and np.array_equal(self.keys, other.keys)
        )
