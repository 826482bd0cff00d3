"""KLL quantile sketch (Karnin–Lang–Liberty 2016): mergeable quantiles.

Extension per BASELINE.json north_star (``n_tok`` quantiles); no
reference implementation (SURVEY.md §2.4).  Contract: normalized rank
error O(1/k) — at the default k=200 the published bound is ~1.65%
rank error at 99% confidence (Apache DataSketches' characterization of
the same algorithm); tests assert a 3% rank-error envelope.

Structure: a ladder of levels; items at level i carry weight 2**i.
Level capacities shrink geometrically (factor c = 2/3) from the top.
When full, the lowest over-capacity level is *compacted*: sorted, and
alternate elements (random even/odd offset) promoted to the next
level.  Merge = concatenate levels pairwise, then compact while over
capacity.

Determinism: the compaction coin derives from ``(seed, n, level)`` via
splitmix, so a given operation sequence is reproducible without
carrying RNG state through serde.  Unlike the integer sketches, KLL
results are *not* bit-identical across merge orders (SURVEY.md §7.5) —
tests assert rank bounds, not bits.
"""

from __future__ import annotations

import math

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import splitmix64

_C = 2.0 / 3.0


@base.register_sketch
class KLLSketch:
    KIND = "kll"

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]

    _IDENTITY = ("k", "seed")

    def empty_like(self) -> "KLLSketch":
        return KLLSketch(self.k, self.seed)

    # ---- internals -------------------------------------------------------

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level  # distance from the top level
        return max(2, int(math.ceil(self.k * (_C ** depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(lv) for lv in range(len(self.levels)))

    def _size(self) -> int:
        return sum(a.size for a in self.levels)

    def _coin(self, level: int) -> int:
        x = np.uint64(self.seed) ^ np.uint64(self.n & 0xFFFFFFFFFFFF) ^ np.uint64(
            0x9E37 + level
        )
        return int(splitmix64(np.array([x]))[0] & np.uint64(1))

    def _compact(self) -> None:
        while self._size() > self._total_capacity():
            for lv in range(len(self.levels)):
                if self.levels[lv].size > self._capacity(lv):
                    buf = np.sort(self.levels[lv])
                    offset = self._coin(lv)
                    promoted = buf[offset::2]
                    self.levels[lv] = np.empty(0, dtype=np.float64)
                    if lv + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[lv + 1] = np.concatenate(
                        [self.levels[lv + 1], promoted]
                    )
                    break
            else:
                break  # nothing individually over capacity

    # ---- updates / merge -------------------------------------------------

    def update(self, items: np.ndarray, counts=None) -> None:
        """Add a batch of values.  ``counts`` (optional per-item repeat
        counts) folds exact multiplicities in; large counts are added at
        the highest power-of-two levels to stay O(log count)."""
        items = np.asarray(items, dtype=np.float64).ravel()
        if items.size == 0:
            return
        if counts is None:
            self.levels[0] = np.concatenate([self.levels[0], items])
            self.n += int(items.size)
            self._compact()
            return
        counts = base.check_counts(counts)
        pos = counts > 0
        if not pos.all():  # zero-count items contribute nothing
            items, counts = items[pos], counts[pos]
        if counts.size == 0:
            return
        # decompose counts into powers of two: weight-2^j item -> level j
        maxbit = int(counts.max()).bit_length()
        for j in range(maxbit):
            mask = (counts >> j) & 1 == 1
            if not mask.any():
                continue
            while len(self.levels) <= j:
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[j] = np.concatenate([self.levels[j], items[mask]])
        self.n += int(counts.sum())
        self._compact()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        base.check_compatible(self, other, self._IDENTITY)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for lv, buf in enumerate(other.levels):
            if buf.size:
                self.levels[lv] = np.concatenate([self.levels[lv], buf])
        self.n += other.n
        self._compact()
        return self

    # ---- queries ---------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for lv, buf in enumerate(self.levels):
            if buf.size:
                vals.append(buf)
                wts.append(np.full(buf.size, 1 << lv, dtype=np.int64))
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Value at normalized rank q in [0, 1]."""
        if self.n == 0:
            return float("nan")
        v, w = self._weighted()
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, v.size - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in np.atleast_1d(qs)])

    def rank(self, value: float) -> float:
        """Normalized rank of ``value`` (fraction of mass <= value)."""
        if self.n == 0:
            return float("nan")
        v, w = self._weighted()
        i = int(np.searchsorted(v, value, side="right"))
        return float(w[:i].sum() / w.sum())

    # ---- serde -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        arrays = {f"level_{i}": buf for i, buf in enumerate(self.levels)}
        return base.pack(
            self.KIND,
            {"k": self.k, "seed": self.seed, "n": self.n,
             "num_levels": len(self.levels)},
            arrays,
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "KLLSketch":
        sk = cls(params["k"], params["seed"])
        sk.n = int(params["n"])
        sk.levels = [
            arrays[f"level_{i}"].astype(np.float64, copy=False)
            for i in range(params["num_levels"])
        ]
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return f"KLLSketch(k={self.k}, n={self.n}, levels={len(self.levels)})"

    def describe(self) -> str:
        """Parameter + level-occupancy dump (pretty-printer surface)."""
        occ = " ".join(str(int(b.size)) for b in self.levels)
        lines = [repr(self), f"  level sizes: [{occ}]"]
        if self.n:
            qs = self.quantiles([0.5, 0.99])
            lines.append(f"  p50={qs[0]:.1f} p99={qs[1]:.1f}")
        return "\n".join(lines)

