"""Count-Min Sketch kernel: numpy table, vectorized update/query/merge.

Semantics follow the reference (``/root/reference/src/core/count_min_sketch.c``):

- sizing ``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))`` (`.c:98-99`);
- hash family ``h(x) = ((a*x + b) % p) % w`` with ``p = 2**31 - 1``
  (`.c:136-138`, ``count_min_sketch.h:15``), ``a in [1, p-1]``,
  ``b in [0, p-1]`` (`.c:121-126`);
- point query = min over the d hashed cells (`.c:30-39`);
- range query = naive sum of point queries over ``[start, end]``
  inclusive (`.c:47-53`) — bias grows with range length, kept for parity;
- inner product = min over rows of the per-row dot product (`.c:65-83`);
- merge = elementwise table sum + ``total`` sum, valid only for an
  identical hash family (``src/mpi/mpiV2.c:163-175``).

Documented divergences from the C code (SURVEY.md §7.5):

- the reference computes ``a*val`` in ``uint32`` so it wraps mod 2**32
  *before* the mod-p; we compute in uint64 (textbook Carter-Wegman).
  Estimates still satisfy the published one-sided ``eps*N`` bound;
- counters and ``total`` are uint64, not uint32 (no silent overflow at
  4.3e9 updates — required at 10^12-token scale);
- hash params derive from a fixed ``seed`` instead of
  ``srand(time(NULL))`` + ``MPI_Bcast`` (``src/mpi/mpiV1.c:16-26``):
  every worker constructs the identical family independently.
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

_E = math.e

_check_counts = base.check_counts
# Above this per-item count the float64 bincount-weights fast path could
# lose integer exactness (2**18-item chunks × 2**31 < 2**53).
_SAFE_WEIGHT_MAX = 1 << 31


@base.register_sketch
class CountMinSketch:
    """Mergeable Count-Min Sketch over integer items.

    Defaults match the reference's compiled-in config
    (``EPSILON 0.001``, ``DELTA 0.1`` ->  3 x 2719 table,
    ``src/core/count_min_sketch.h:13-14``).
    """

    KIND = "cms"

    def __init__(
        self,
        eps: float = 0.001,
        delta: float = 0.1,
        seed: int = 42,
        prime: int = MERSENNE_PRIME_31,
    ):
        if not (0.0 < eps < 1.0) or not (0.0 < delta < 1.0):
            # mirrors cms_init's validation (src/core/count_min_sketch.c:88-95)
            raise ValueError("eps and delta must lie in (0, 1)")
        self.eps = float(eps)
        self.delta = float(delta)
        self.seed = int(seed)
        self.prime = int(prime)
        self.width = int(math.ceil(_E / eps))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        rng = np.random.default_rng(self.seed)
        self.a = rng.integers(1, self.prime, size=self.depth, dtype=np.uint64)
        self.b = rng.integers(0, self.prime, size=self.depth, dtype=np.uint64)
        self.table = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.total = 0

    # ---- identity / lifecycle -------------------------------------------

    _IDENTITY = ("eps", "delta", "seed", "prime", "width", "depth")

    def empty_like(self) -> "CountMinSketch":
        """Fresh zero-table sketch sharing this one's hash family
        (analogue of ``cms_init_private``)."""
        return CountMinSketch(self.eps, self.delta, self.seed, self.prime)

    # ---- update ----------------------------------------------------------

    def _indices(self, items: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for a batch of items, uint64 math.

        Delegates to the single definition of the hash family — any
        change there (e.g. to the documented uint64-wrap divergence)
        applies everywhere or merge compatibility breaks silently.
        (Imported at module scope: a deferred by-name import here would
        execute INSIDE Ray workers, which may not have this package on
        sys.path — the code reaches them pickled by value.)
        """
        return universal_hash(items, self.a, self.b, self.prime, self.width)

    # Hash+bincount over a ~2 MB working set stays in cache; measured
    # 28.5M tokens/s/core at 256Ki vs 1.0M at 5M-item chunks.
    _CHUNK = 262_144

    def update(self, items: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Vectorized batch of point updates (``cms_update_int`` semantics).

        ``counts`` gives per-item increments (default 1 each).  Equivalent
        to the serial per-item loop: per-row bincount preserves duplicate
        increments exactly (pure-speedup replacement for ``np.add.at``,
        SURVEY.md §7.5).  Large inputs are processed in cache-sized
        chunks (pure speedup, identical result — integer sums commute).
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
        if counts is None:
            for r in range(self.depth):
                self.table[r] += np.bincount(idx[r], minlength=self.width).astype(
                    np.uint64
                )
            self.total += int(items.size)
        elif int(counts.max(initial=0)) <= _SAFE_WEIGHT_MAX:
            # float64 bincount weights are exact here: per-cell sums stay
            # below 2**53 (chunk <= 2**18 items × counts <= 2**31)
            for r in range(self.depth):
                self.table[r] += (
                    np.bincount(idx[r], weights=counts.astype(np.float64),
                                minlength=self.width)
                    .astype(np.uint64)
                )
            self.total += int(counts.sum())
        else:
            # huge per-item counts: exact integer accumulation path
            for r in range(self.depth):
                np.add.at(self.table[r], idx[r], counts.astype(np.uint64))
            self.total += int(counts.sum())

    def update_strings(self, items, counts=None) -> None:
        """String adapter: djb2 pre-hash to uint32 then the int path
        (``cms_update_str``, src/core/count_min_sketch.c:24-27)."""
        hashed = np.fromiter(
            (djb2(s) for s in items), dtype=np.uint64, count=len(items)
        )
        self.update(hashed, counts)

    # ---- queries ---------------------------------------------------------

    def query(self, items) -> np.ndarray:
        """Vectorized point queries: min over the d hashed cells.

        Guarantees ``est >= true`` and ``P[est <= true + eps*N] >= 1-delta``
        (``cms_point_query_int``, src/core/count_min_sketch.c:30-39).
        """
        items = np.atleast_1d(np.asarray(items))
        if items.size == 0:
            return np.zeros(0, dtype=np.uint64)
        idx = self._indices(items).astype(np.int64)
        return self.table[np.arange(self.depth)[:, None], idx].min(axis=0)

    def query_one(self, item: int) -> int:
        return int(self.query(np.array([item]))[0])

    def query_string(self, s: str) -> int:
        return self.query_one(djb2(s))

    def range_query(self, start: int, end: int) -> int:
        """Naive inclusive range sum of point queries
        (``cms_range_query_int``, src/core/count_min_sketch.c:47-53)."""
        if end < start:
            return 0
        return int(self.query(np.arange(start, end + 1)).sum())

    def query_strings_sum(self, items) -> int:
        """Sum of string point queries (``cms_range_query_str``, .c:55-61)."""
        return sum(self.query_string(s) for s in items)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size / F2 estimate: min over rows of the row dot products
        (``cms_inner_product``, src/core/count_min_sketch.c:65-83).

        Exact integer math (Python ints) — no uint64 overflow at scale.
        """
        base.check_compatible(self, other, self._IDENTITY + ("a", "b"))
        dots = [
            int(np.dot(self.table[r].astype(object), other.table[r].astype(object)))
            for r in range(self.depth)
        ]
        return min(dots)

    # ---- merge -----------------------------------------------------------

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Elementwise table sum; associative & commutative (the property
        ``MPI_Reduce(MPI_SUM)`` gave the reference for free)."""
        base.check_compatible(self, other, self._IDENTITY + ("a", "b"))
        self.table += other.table
        self.total += other.total
        return self

    # ---- serde -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {
                "eps": self.eps,
                "delta": self.delta,
                "seed": self.seed,
                "prime": self.prime,
                "total": self.total,
            },
            {"table": self.table},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "CountMinSketch":
        sk = cls(params["eps"], params["delta"], params["seed"], params["prime"])
        sk.table = arrays["table"].astype(np.uint64, copy=False)
        sk.total = int(params["total"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    # ---- reporting -------------------------------------------------------

    def error_bound(self) -> int:
        """The additive bound eps*N the estimates hold within w.p. 1-delta."""
        return int(math.ceil(self.eps * self.total))

    def __repr__(self) -> str:  # cms_print_values analogue (.c:141-150)
        return (
            f"CountMinSketch(eps={self.eps}, delta={self.delta}, "
            f"width={self.width}, depth={self.depth}, total={self.total}, "
            f"seed={self.seed})"
        )

    def describe(self, verbose: bool = False) -> str:
        """Human-readable dump: params + hash family + per-row table
        stats (``cms_print_all`` surface,
        ``src/core/count_min_sketch.c:141-183``).  ``verbose=True`` adds
        the full cell dump ``cms_print_table`` emits; the default
        summarizes each row instead (a 100 TB build's table is still
        only d×w cells, but nobody reads 2719 columns)."""
        lines = [repr(self), f"  error_bound (eps*N): {self.error_bound()}"]
        for r in range(self.depth):  # cms_print_hashes parity (.c:152-160)
            lines.append(f"  hash[{r}]: a={int(self.a[r])} b={int(self.b[r])}")
        for r in range(self.depth):
            row = self.table[r]
            lines.append(
                f"  row[{r}]: nonzero={int(np.count_nonzero(row))}/{self.width} "
                f"max={int(row.max())} sum={int(row.sum())}"
            )
        if verbose:  # cms_print_table parity (.c:141-150)
            for r in range(self.depth):
                lines.append("  " + " ".join(str(int(v)) for v in self.table[r]))
        return "\n".join(lines)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, CountMinSketch)
            and self.total == other.total
            and all(getattr(self, f) == getattr(other, f) for f in self._IDENTITY)
            and np.array_equal(self.table, other.table)
        )
