"""Weighted reservoir sample (Efraimidis–Spirakis A-ES), mergeable.

Eighth sibling in the mergeable-UDAF family.  The training-data need:
"sample k documents with probability proportional to weight (tokens,
quality score) out of 10^12 rows, in one pass, mergeable across
partitions" — the weighted complement of the uniform bottom-k sample
(`state/kmv.py`).

Theory (Efraimidis & Spirakis 2006, "Weighted random sampling with a
reservoir"): draw u_i ~ U(0,1) per item and keep the k largest
priorities u_i^(1/w_i) — the kept set is a weighted sample without
replacement.  We compute in the log domain (score = ln(u)/w, larger is
better) for numerical range, and u derives from a seeded splitmix64 of
the KEY, which makes the sketch:

- deterministic (same corpus + seed → same sample, no RNG state);
- mergeable BIT-EXACTLY in any order/grouping: scores are pure
  functions of (key, weight), and merge = top-k of the union with
  per-key max-score dedup;
- duplicate-tolerant: re-seen keys collapse; the occurrence with the
  largest weight wins (same u, larger w → score closer to 0).

Weights must be > 0; zero/negative weights are rejected.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.functions.hashing import splitmix64
from parallel_count_min_sketch_ray.state import base


@base.register_sketch
class WeightedReservoir:
    KIND = "ares"

    def __init__(self, k: int = 64, seed: int = 42):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self._seed_hash = splitmix64(np.array(seed, dtype=np.uint64))
        self.keys = np.zeros(0, dtype=np.int64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.scores = np.zeros(0, dtype=np.float64)  # ln(u)/w, desc
        self.n = 0  # total items folded (diagnostic)

    _IDENTITY = ("k", "seed")

    def empty_like(self) -> "WeightedReservoir":
        return WeightedReservoir(self.k, self.seed)

    def _scores(self, keys: np.ndarray, weights: np.ndarray) -> np.ndarray:
        h = splitmix64(keys.astype(np.uint64) ^ self._seed_hash)
        # strictly inside (0,1): +0.5 keeps u<1 so ln(u)<0 and weight
        # ordering is strict even at the hash-space endpoints
        u = (h.astype(np.float64) + 0.5) * 2.0**-64
        return np.log(u) / weights

    def _fold(self, keys, weights, scores) -> None:
        allk = np.concatenate([self.keys, keys])
        allw = np.concatenate([self.weights, weights])
        alls = np.concatenate([self.scores, scores])
        # per-key dedup keeping the max score (== max weight for equal
        # keys): sort by (key, score), keep each key's last row
        order = np.lexsort((alls, allk))
        allk, allw, alls = allk[order], allw[order], alls[order]
        last = np.ones(allk.size, dtype=bool)
        last[:-1] = allk[1:] != allk[:-1]
        allk, allw, alls = allk[last], allw[last], alls[last]
        # top-k by score desc, key asc tiebreak — deterministic
        top = np.lexsort((allk, -alls))[: self.k]
        top.sort()  # keep (key-sorted within selection) stable layout
        sel = np.zeros(allk.size, dtype=bool)
        sel[top] = True
        self.keys, self.weights, self.scores = (
            allk[sel], allw[sel], alls[sel]
        )

    def update(self, keys: np.ndarray, weights: np.ndarray) -> None:
        keys = np.asarray(keys).astype(np.int64, copy=False).ravel()
        weights = np.asarray(weights).astype(np.float64, copy=False).ravel()
        if keys.size != weights.size:
            raise ValueError("keys and weights must align")
        if keys.size == 0:
            return
        if not np.all(weights > 0):
            raise ValueError("weights must be > 0")
        self.n += int(keys.size)
        self._fold(keys, weights, self._scores(keys, weights))

    def merge(self, other: "WeightedReservoir") -> "WeightedReservoir":
        base.check_compatible(self, other, self._IDENTITY)
        self.n += other.n
        if other.keys.size:
            self._fold(other.keys, other.weights, other.scores)
        return self

    # ---- queries ---------------------------------------------------------

    def sample(self) -> np.ndarray:
        """Sampled keys, best (highest-priority) first."""
        order = np.lexsort((self.keys, -self.scores))
        return self.keys[order]

    def sample_table(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, weights), best first."""
        order = np.lexsort((self.keys, -self.scores))
        return self.keys[order], self.weights[order]

    # ---- serde / reporting ----------------------------------------------

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {"k": self.k, "seed": self.seed, "n": self.n},
            {"keys": self.keys, "weights": self.weights, "scores": self.scores},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "WeightedReservoir":
        sk = cls(params["k"], params["seed"])
        sk.keys = arrays["keys"].astype(np.int64, copy=False)
        sk.weights = arrays["weights"].astype(np.float64, copy=False)
        sk.scores = arrays["scores"].astype(np.float64, copy=False)
        sk.n = int(params["n"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "WeightedReservoir":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def error_bound(self) -> float:
        """Sampling, not estimation: no numeric bound; kept for the
        MergeableSketch protocol (0.0 = the sample itself is exact)."""
        return 0.0

    def describe(self) -> str:
        keys, weights = self.sample_table()
        head = ", ".join(
            f"{k}:{w:g}" for k, w in zip(keys[:5].tolist(), weights[:5].tolist())
        )
        return "\n".join(
            [
                repr(self),
                f"  kept {self.keys.size}/{self.k} keys of {self.n} folded",
                f"  best: [{head}{', ...' if self.keys.size > 5 else ''}]",
            ]
        )

    def __repr__(self) -> str:
        return f"WeightedReservoir(k={self.k}, seed={self.seed}, n={self.n})"
