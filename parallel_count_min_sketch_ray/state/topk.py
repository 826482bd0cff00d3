"""Misra–Gries heavy-hitters sketch: mergeable top-k frequency summary.

Sixth sibling in the mergeable-UDAF family (SURVEY.md §2.4 notes the
reference has no top-k; CMS point queries over a probe set are its
only heavy-hitter tool).  Misra–Gries (1982) / SpaceSaving-style
summary with k counters:

- update: increment tracked keys; when full, decrement all (classic
  MG), realized batch-wise: fold exact batch counts, keep the top k
  after subtracting the (k+1)-th weight's overflow;
- guarantee: every true count N_x >= est_x >= N_x - N/k (estimates are
  one-sided LOW, the mirror of CMS's one-sided high);
- merge (Agarwal et al. 2013, mergeable summaries): sum counters
  pairwise, then re-truncate to k subtracting the (k+1)-th largest —
  preserves the N/k bound; associativity of the bound (not of exact
  counter values) is the contract, so tests assert bounds, not bits.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base


def _group_sum(inv: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Exact int64 segment sum: bincount's float64 weights are exact
    only while the TOTAL stays below 2**53 (a per-key sum is bounded by
    the grand total); fall back to np.add.at above that."""
    if weights.size == 0:
        return np.zeros(0, dtype=np.int64)
    if int(weights.sum()) < (1 << 53):
        return np.bincount(inv, weights=weights).astype(np.int64)
    out = np.zeros(int(inv.max()) + 1, dtype=np.int64)
    np.add.at(out, inv, weights)
    return out


@base.register_sketch
class TopKSketch:
    KIND = "topk"

    def __init__(self, k: int = 256, seed: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)  # unused; kept for uniform identity checks
        self.keys = np.zeros(0, dtype=np.int64)
        self.counts = np.zeros(0, dtype=np.int64)
        self.offset = 0  # total decremented mass (error bound term)
        self.n = 0

    _IDENTITY = ("k", "seed")

    def empty_like(self) -> "TopKSketch":
        return TopKSketch(self.k, self.seed)

    def _truncate(self) -> None:
        if self.keys.size <= self.k:
            return
        order = np.argsort(-self.counts, kind="stable")
        cutoff = int(self.counts[order[self.k]])
        keep = order[: self.k]
        self.offset += cutoff
        new_counts = self.counts[keep] - cutoff
        pos = new_counts > 0
        self.keys = self.keys[keep][pos]
        self.counts = new_counts[pos]

    def update(self, items: np.ndarray, counts: np.ndarray | None = None) -> None:
        items = np.asarray(items).astype(np.int64, copy=False).ravel()
        if items.size == 0:
            return
        if counts is None:
            uniq, c = np.unique(items, return_counts=True)
            self.n += int(items.size)
        else:
            counts = base.check_counts(counts)
            order = np.argsort(items, kind="stable")
            uniq, inv = np.unique(items[order], return_inverse=True)
            c = _group_sum(inv, counts[order])
            self.n += int(counts.sum())
        allk = np.concatenate([self.keys, uniq])
        allc = np.concatenate([self.counts, c])
        merged_k, inv = np.unique(allk, return_inverse=True)
        merged_c = _group_sum(inv, allc)
        self.keys, self.counts = merged_k, merged_c
        self._truncate()

    def merge(self, other: "TopKSketch") -> "TopKSketch":
        base.check_compatible(self, other, self._IDENTITY)
        allk = np.concatenate([self.keys, other.keys])
        allc = np.concatenate([self.counts, other.counts])
        merged_k, inv = np.unique(allk, return_inverse=True)
        merged_c = _group_sum(inv, allc)
        self.keys, self.counts = merged_k, merged_c
        self.offset += other.offset
        self.n += other.n
        self._truncate()
        return self

    def error_bound(self) -> int:
        """Max undercount of any estimate (<= N/k by the MG analysis)."""
        return int(self.offset)

    def topk(self, m: int | None = None) -> list[tuple[int, int, int]]:
        """[(key, est_lower, est_upper)] sorted by est desc, key asc.

        est_lower = counter; est_upper = counter + offset (true count is
        within [lower, upper]).
        """
        order = np.lexsort((self.keys, -self.counts))
        if m is not None:
            order = order[:m]
        return [
            (int(self.keys[i]), int(self.counts[i]), int(self.counts[i] + self.offset))
            for i in order
        ]

    def estimate(self, key: int) -> tuple[int, int]:
        """(lower, upper) bounds for one key's count."""
        idx = np.nonzero(self.keys == key)[0]
        lo = int(self.counts[idx[0]]) if idx.size else 0
        return lo, lo + self.offset

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {"k": self.k, "seed": self.seed, "offset": self.offset, "n": self.n},
            {"keys": self.keys, "counts": self.counts},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "TopKSketch":
        sk = cls(params["k"], params["seed"])
        sk.keys = arrays["keys"].astype(np.int64, copy=False)
        sk.counts = arrays["counts"].astype(np.int64, copy=False)
        sk.offset = int(params["offset"])
        sk.n = int(params["n"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "TopKSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return f"TopKSketch(k={self.k}, tracked={self.keys.size}, n={self.n}, offset={self.offset})"

    def describe(self, m: int = 10) -> str:
        """Parameter + top-m counter dump (pretty-printer surface)."""
        lines = [
            repr(self),
            f"  tracked={self.keys.size}/{self.k} offset={self.offset} n={self.n}",
        ]
        for key, lo, hi in self.topk(m):
            lines.append(f"  key={key}: [{lo}, {hi}]")
        return "\n".join(lines)

