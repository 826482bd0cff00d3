"""Dyadic-range Count-Min Sketch: O(log U) range queries.

The reference answers ``cms_range_query_int`` by summing a point query
per value in the range (``src/core/count_min_sketch.c:33-47`` — O(|R|)
work and O(|R|)·eps·N worst-case error; SURVEY.md §2.1 #8/#13 note the
"parallel range query" is the same naive Σ).  This is the textbook
upgrade (Cormode & Muthukrishnan 2005, §4.2): keep one CMS per dyadic
LEVEL — level ``l`` sketches the stream of ``item >> l`` — and answer
any ``[lo, hi]`` by decomposing it into at most ``2·levels`` dyadic
nodes, one point query each.  Cost: ``levels`` sketch updates per item
(vectorized shifts), error ≤ ``2·levels·eps·N`` ADDITIVE one-sided —
independent of range width, vs the naive bound's ``|R|·eps·N``.

Mergeable like every sibling: per-level CMS merges (same seeded family
per level), SKB1 serde nests the level blobs.  Domain: non-negative
items < 2**bits.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.state.cms import CountMinSketch


@base.register_sketch
class DyadicCMS:
    KIND = "dyadic_cms"

    def __init__(
        self,
        eps: float = 0.001,
        delta: float = 0.1,
        seed: int = 42,
        bits: int = 31,
    ):
        if not (1 <= bits <= 62):
            raise ValueError("bits must be in [1, 62]")
        self.eps = float(eps)
        self.delta = float(delta)
        self.seed = int(seed)
        self.bits = int(bits)
        # level l sketches item >> l; the top level (all items -> 0)
        # is just `total`, so levels run 0..bits-1
        self.levels = [
            CountMinSketch(eps, delta, seed=seed + 1000 * l) for l in range(bits)
        ]
        self.total = 0

    _IDENTITY = ("eps", "delta", "seed", "bits")

    def empty_like(self) -> "DyadicCMS":
        return DyadicCMS(self.eps, self.delta, self.seed, self.bits)

    # ---- updates / merge -------------------------------------------------

    def update(self, items: np.ndarray, counts: np.ndarray | None = None) -> None:
        items = np.asarray(items).astype(np.int64, copy=False).ravel()
        if items.size == 0:
            return
        if (items < 0).any() or (items >> self.bits).any():
            raise ValueError(f"items must lie in [0, 2**{self.bits})")
        if counts is not None:
            counts = base.check_counts(counts)
        for l, sk in enumerate(self.levels):
            sk.update(items >> l, counts)
        self.total += int(counts.sum()) if counts is not None else int(items.size)

    def merge(self, other: "DyadicCMS") -> "DyadicCMS":
        base.check_compatible(self, other, self._IDENTITY)
        for mine, theirs in zip(self.levels, other.levels):
            mine.merge(theirs)
        self.total += other.total
        return self

    # ---- queries ---------------------------------------------------------

    def query(self, items) -> np.ndarray:
        """Point estimates (level-0 CMS)."""
        return self.levels[0].query(items)

    def _nodes(self, lo: int, hi: int) -> list[tuple[int, int]]:
        """Canonical dyadic decomposition of [lo, hi] (inclusive) into
        ≤ 2·bits (level, prefix) nodes."""
        nodes: list[tuple[int, int]] = []
        lo, hi = int(lo), int(hi)
        while lo <= hi:
            # largest dyadic block starting at lo that fits in [lo, hi]
            l = (lo & -lo).bit_length() - 1 if lo else self.bits - 1
            while l > 0 and lo + (1 << l) - 1 > hi:
                l -= 1
            l = min(l, self.bits - 1)
            nodes.append((l, lo >> l))
            lo += 1 << l
        return nodes

    def range_query(self, lo: int, hi: int) -> int:
        """One-sided range-mass estimate for [lo, hi] inclusive:
        ≥ true mass, ≤ true + 2·bits·eps·N."""
        if hi < lo:
            raise ValueError("inverted range")
        lo = max(0, int(lo))
        hi = min((1 << self.bits) - 1, int(hi))
        est = 0
        for l, prefix in self._nodes(lo, hi):
            est += int(self.levels[l].query_one(prefix))
        return est

    def range_error_bound(self) -> int:
        """Additive error cap of :meth:`range_query` (any range width)."""
        return int(np.ceil(2 * self.bits * self.eps * self.total))

    # ---- serde -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        arrays = {
            f"level_{l}": np.frombuffer(sk.to_bytes(), dtype=np.uint8)
            for l, sk in enumerate(self.levels)
        }
        return base.pack(
            self.KIND,
            {
                "eps": self.eps,
                "delta": self.delta,
                "seed": self.seed,
                "bits": self.bits,
                "total": self.total,
            },
            arrays,
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "DyadicCMS":
        sk = cls(params["eps"], params["delta"], params["seed"], params["bits"])
        sk.levels = [
            CountMinSketch.from_bytes(arrays[f"level_{l}"].tobytes())
            for l in range(params["bits"])
        ]
        sk.total = int(params["total"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "DyadicCMS":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return (
            f"DyadicCMS(eps={self.eps}, delta={self.delta}, bits={self.bits}, "
            f"total={self.total})"
        )

    def describe(self) -> str:
        lines = [repr(self), f"  levels: {len(self.levels)}"]
        lines.append(f"  range_error_bound: {self.range_error_bound()}")
        return "\n".join(lines)
