"""Count-Sketch kernel: the SIGNED sibling of the Count-Min Sketch.

Charikar, Chen, Farach-Colton, "Finding Frequent Items in Data
Streams" (ICALP 2002).  Where the reference's CMS
(``/root/reference/src/core/count_min_sketch.c``) over-estimates with
a one-sided ``est >= true`` bias, Count-Sketch is UNBIASED:

- table ``d x w`` of *signed* int64 counters;
- per row r: bucket hash ``h_r(x) in [0, w)`` and sign hash
  ``s_r(x) in {-1, +1}``, both Carter-Wegman 2-universal (the same
  Mersenne-prime family as the CMS, one extra (a, b) pair per row for
  the sign);
- update:  ``table[r, h_r(x)] += s_r(x) * c``;
- point estimate: MEDIAN over rows of ``s_r(x) * table[r, h_r(x)]``
  — ``E[row est] = f_x`` exactly, ``Var <= F2 / w``, so the median of
  d rows lands within ``sqrt(3 * F2 / w)`` of the truth with
  probability ``>= 1 - exp(-d/5)`` (Chebyshev per row at sqrt(3)
  sigma, Chernoff across rows);
- F2 / AMS: each row's ``sum(cell^2)`` is an unbiased estimator of the
  second frequency moment ``F2 = sum_x f_x^2`` (Alon-Matias-Szegedy
  1996 — Count-Sketch IS the AMS sketch bucketed w ways), median over
  rows;
- inner product: per-row ``dot(table_A[r], table_B[r])`` is unbiased
  for ``<f, g>`` (vs the CMS's one-sided-high min-of-rows), median
  over rows;
- merge: elementwise signed sum — associative, commutative, and
  BIT-EXACT regardless of merge order (integer adds commute), so
  distributed == serial is asserted bitwise in tests.

Why it earns a place next to the CMS at 100 TB: CMS point estimates
carry additive ``eps * N`` error (N = stream length) — useless for
mid-tail items in trillion-token streams; Count-Sketch error scales
with ``sqrt(F2)`` (the L2 norm, far smaller than N on skewed token
streams), and it is the standard unbiased join-size / F2 estimator.
"""

from __future__ import annotations

import math

import numpy as np

from parallel_count_min_sketch_ray.state import base
from parallel_count_min_sketch_ray.functions.hashing import (
    MERSENNE_PRIME_31,
    djb2,
    universal_hash,
)

_check_counts = base.check_counts
# Same exactness guard as the CMS bincount fast path: float64 weights
# stay integer-exact while chunk (2**18) x max_count (2**31) < 2**53.
_SAFE_WEIGHT_MAX = 1 << 31


@base.register_sketch
class CountSketch:
    """Mergeable Count-Sketch over integer items.

    Defaults (``width=2048, depth=5``) give additive point error
    ``sqrt(3 * F2 / 2048)`` per estimate; raise ``depth`` for a
    smaller failure probability (it falls like ``exp(-depth/5)``).
    Depth must be ODD so the median of row estimates is itself an
    integer counter value.
    """

    KIND = "countsketch"

    def __init__(
        self,
        width: int = 2048,
        depth: int = 5,
        seed: int = 42,
        prime: int = MERSENNE_PRIME_31,
    ):
        if width < 2 or depth < 1:
            raise ValueError("width must be >= 2 and depth >= 1")
        if depth % 2 == 0:
            raise ValueError("depth must be odd (median of row estimates)")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.prime = int(prime)
        rng = np.random.default_rng(self.seed)
        # bucket family then sign family — one rng stream, stable order
        self.a = rng.integers(1, self.prime, size=self.depth, dtype=np.uint64)
        self.b = rng.integers(0, self.prime, size=self.depth, dtype=np.uint64)
        self.sa = rng.integers(1, self.prime, size=self.depth, dtype=np.uint64)
        self.sb = rng.integers(0, self.prime, size=self.depth, dtype=np.uint64)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0  # stream length N (diagnostic; error scales with F2)

    # ---- identity / lifecycle -------------------------------------------

    _IDENTITY = ("width", "depth", "seed", "prime")

    def empty_like(self) -> "CountSketch":
        return CountSketch(self.width, self.depth, self.seed, self.prime)

    # ---- hashing ---------------------------------------------------------

    def _indices(self, items: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices, the CMS's exact hash family."""
        return universal_hash(items, self.a, self.b, self.prime, self.width)

    def _signs(self, items: np.ndarray) -> np.ndarray:
        """(depth, n) signs in {-1, +1}: second universal family mod 2.

        ``prime`` is odd, so ``(sa*x + sb) % prime`` is unbiased mod 2
        up to O(1/prime) — negligible against the 2-universal analysis.
        """
        bit = universal_hash(items, self.sa, self.sb, self.prime, 2)
        return 1 - 2 * bit.astype(np.int64)  # 0 -> +1, 1 -> -1

    # Same cache-chunking rationale as CountMinSketch._CHUNK.
    _CHUNK = 262_144

    # ---- update ----------------------------------------------------------

    def update(self, items: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Vectorized signed batch update.

        Equivalent to the per-item loop ``table[r, h_r(x)] += s_r(x)*c``
        for every row r: per-row bincount with signed weights (integer
        sums commute, so chunking is a pure speedup).
        """
        items = np.asarray(items)
        if items.size == 0:
            return
        if counts is not None:
            counts = _check_counts(counts)
        if items.size > self._CHUNK:
            for i in range(0, items.size, self._CHUNK):
                self.update(
                    items[i : i + self._CHUNK],
                    None if counts is None else counts[i : i + self._CHUNK],
                )
            return
        idx = self._indices(items).astype(np.int64)
        sgn = self._signs(items)
        if counts is None:
            w = None
            self.total += int(items.size)
        else:
            w = counts
            self.total += int(counts.sum())
        if w is None or int(w.max(initial=0)) <= _SAFE_WEIGHT_MAX:
            # float64 bincount weights exact: |per-cell sum| < 2**53
            weights = sgn.astype(np.float64) if w is None else (
                sgn * w[None, :]
            ).astype(np.float64)
            for r in range(self.depth):
                self.table[r] += np.bincount(
                    idx[r], weights=weights[r], minlength=self.width
                ).astype(np.int64)
        else:
            signed = sgn * w[None, :]
            for r in range(self.depth):
                np.add.at(self.table[r], idx[r], signed[r])

    def update_strings(self, items, counts=None) -> None:
        """String adapter: djb2 pre-hash then the int path (the CMS's
        ``cms_update_str`` convention, src/core/count_min_sketch.c:24-27)."""
        hashed = np.fromiter(
            (djb2(s) for s in items), dtype=np.uint64, count=len(items)
        )
        self.update(hashed, counts)

    # ---- queries ---------------------------------------------------------

    def query(self, items) -> np.ndarray:
        """Unbiased point estimates: median over rows of the signed
        counter reads.  int64 (depth is odd, the median IS a counter
        value); may be negative — that is the price of unbiasedness."""
        items = np.atleast_1d(np.asarray(items))
        if items.size == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(items).astype(np.int64)
        sgn = self._signs(items)
        reads = self.table[np.arange(self.depth)[:, None], idx] * sgn
        return np.median(reads, axis=0).astype(np.int64)

    def query_one(self, item: int) -> int:
        return int(self.query(np.array([item]))[0])

    def query_string(self, s: str) -> int:
        return self.query_one(djb2(s))

    def estimate_f2(self) -> int:
        """AMS second-moment estimate: median over rows of sum(cell^2).

        Exact integer math (object dtype) — a row's sum of squares can
        exceed int64 at trillion-token scale.
        """
        sums = [
            int(np.dot(self.table[r].astype(object), self.table[r].astype(object)))
            for r in range(self.depth)
        ]
        sums.sort()
        return sums[self.depth // 2]

    def inner_product(self, other: "CountSketch") -> int:
        """Unbiased join-size estimate ``<f, g>``: median over rows of
        the per-row dots (contrast: the CMS's min-of-rows is one-sided
        HIGH, src/core/count_min_sketch.c:65-83)."""
        base.check_compatible(self, other, self._IDENTITY + ("a", "b", "sa", "sb"))
        dots = [
            int(np.dot(self.table[r].astype(object), other.table[r].astype(object)))
            for r in range(self.depth)
        ]
        dots.sort()
        return dots[self.depth // 2]

    # ---- merge -----------------------------------------------------------

    def merge(self, other: "CountSketch") -> "CountSketch":
        base.check_compatible(self, other, self._IDENTITY + ("a", "b", "sa", "sb"))
        self.table += other.table
        self.total += other.total
        return self

    def subtract(self, other: "CountSketch") -> "CountSketch":
        """Signed DIFFERENCE — the linearity the CMS cannot offer.

        Count-Sketch is a linear map of the frequency vector, so
        ``A.subtract(B)`` sketches ``f_A - f_B`` exactly as if the
        difference stream had been fed directly: point queries estimate
        per-item count differences (unbiased) and ``estimate_f2()``
        estimates ``||f_A - f_B||^2`` — the squared L2 distance between
        the two streams (the AMS distance estimator).  ``total``
        becomes the signed count difference.
        """
        base.check_compatible(self, other, self._IDENTITY + ("a", "b", "sa", "sb"))
        self.table -= other.table
        self.total -= other.total
        return self

    # ---- serde -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {
                "width": self.width,
                "depth": self.depth,
                "seed": self.seed,
                "prime": self.prime,
                "total": self.total,
            },
            {"table": self.table},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "CountSketch":
        sk = cls(params["width"], params["depth"], params["seed"], params["prime"])
        sk.table = arrays["table"].astype(np.int64, copy=False)
        sk.total = int(params["total"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    # ---- reporting -------------------------------------------------------

    def error_bound(self) -> float:
        """``sqrt(3 * F2_est / width)`` — the additive radius the median
        estimate holds within w.p. ``>= 1 - exp(-depth/5)`` (F2 taken
        from the sketch's own AMS estimate)."""
        return math.sqrt(3.0 * max(self.estimate_f2(), 0) / self.width)

    def describe(self) -> str:
        lines = [
            repr(self),
            f"  f2_estimate: {self.estimate_f2()}",
            f"  error_bound (sqrt(3*F2/w)): {self.error_bound():.1f}",
        ]
        for r in range(self.depth):
            row = self.table[r]
            lines.append(
                f"  row[{r}]: nonzero={int(np.count_nonzero(row))}/{self.width} "
                f"min={int(row.min())} max={int(row.max())} sum={int(row.sum())}"
            )
        return "\n".join(lines)

    def __repr__(self) -> str:
        return (
            f"CountSketch(width={self.width}, depth={self.depth}, "
            f"total={self.total}, seed={self.seed})"
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountSketch)
            and self.total == other.total
            and all(getattr(self, f) == getattr(other, f) for f in self._IDENTITY)
            and np.array_equal(self.table, other.table)
        )
