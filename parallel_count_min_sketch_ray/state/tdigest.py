"""t-digest quantile sketch (Dunning & Ertl 2019): mergeable quantiles
for continuous values, tail-accurate.

Extension per BASELINE.json north_star, which names "t-digest/KLL" as
the quantile siblings; no reference implementation (SURVEY.md §2.4).
KLL (:mod:`.kll`) gives uniform rank-error guarantees; the t-digest's
k1 scale function concentrates centroids at the tails, so p99/p999 of
a skewed ``value`` column are much tighter at equal state size.

Variant: the *merging* digest with scale function
``k1(q) = (delta / 2pi) * asin(2q - 1)`` and a fully vectorized
compression — incoming values buffer, then one sort + one
``np.add.reduceat`` pass assigns each point to the cluster
``floor(k1(q_mid))``, bounding every cluster's k-span (and hence the
rank error contribution) by O(1) k-units.  No RNG: compression is a
pure function of the folded multiset, so (like KLL) results are
deterministic per input but not bit-identical across merge orders —
tests assert rank-error envelopes, not bits.

State is two float64 arrays of ≤ ~delta/2 + 2 centroids plus exact
min/max — a few KB riding Arrow ``binary`` columns through the same
merge tree as the other sketches (N-independent exchange volume).
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base


@base.register_sketch
class TDigest:
    KIND = "tdigest"

    def __init__(self, delta: int = 200):
        if delta < 20:
            raise ValueError("delta (compression) must be >= 20")
        self.delta = int(delta)
        self.n = 0
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = np.inf
        self.vmax = -np.inf
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self._buf_n = 0
        self._buf_limit = max(2048, 8 * self.delta)

    _IDENTITY = ("delta",)

    def empty_like(self) -> "TDigest":
        return TDigest(self.delta)

    # ---- internals -------------------------------------------------------

    def _k1(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)

    def _flush(self) -> None:
        """Fold buffered points into the centroid set (one vectorized
        sort + reduceat — no per-centroid Python loop)."""
        if self._buf_n == 0:
            return
        v = np.concatenate([self.means] + self._buf_v)
        w = np.concatenate([self.weights] + self._buf_w)
        self._buf_v, self._buf_w, self._buf_n = [], [], 0
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = np.clip((cum - 0.5 * w) / total, 0.0, 1.0)
        bucket = np.floor(self._k1(q_mid))
        starts = np.flatnonzero(np.diff(bucket)) + 1
        starts = np.concatenate([[0], starts])
        self.weights = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(v * w, starts) / self.weights

    # ---- updates / merge -------------------------------------------------

    def update(self, items: np.ndarray, counts=None) -> None:
        """Fold a batch of float values (optional exact multiplicities)."""
        items = np.asarray(items, dtype=np.float64).ravel()
        if items.size == 0:
            return
        if counts is None:
            w = np.ones(items.size, dtype=np.float64)
            self.n += int(items.size)
        else:
            counts = base.check_counts(counts)
            pos = counts > 0
            items, counts = items[pos], counts[pos]
            if items.size == 0:
                return
            w = counts.astype(np.float64)
            self.n += int(counts.sum())
        self.vmin = min(self.vmin, float(items.min()))
        self.vmax = max(self.vmax, float(items.max()))
        self._buf_v.append(items)
        self._buf_w.append(w)
        self._buf_n += items.size
        if self._buf_n >= self._buf_limit:
            self._flush()

    def merge(self, other: "TDigest") -> "TDigest":
        base.check_compatible(self, other, self._IDENTITY)
        other._flush()
        if other.means.size:
            self._buf_v.append(other.means)
            self._buf_w.append(other.weights)
            self._buf_n += other.means.size
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._flush()
        return self

    # ---- queries ---------------------------------------------------------

    def _knots(self) -> tuple[np.ndarray, np.ndarray]:
        """(quantile knots, value knots) for piecewise-linear interp:
        exact min/max endpoints + centroid midpoint quantiles."""
        self._flush()
        cum = np.cumsum(self.weights)
        mids = (cum - 0.5 * self.weights) / cum[-1]
        q = np.concatenate([[0.0], mids, [1.0]])
        vals = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return q, vals

    def quantile(self, q: float) -> float:
        """Value at normalized rank q in [0, 1]."""
        if self.n == 0:
            return float("nan")
        kq, kv = self._knots()
        return float(np.interp(q, kq, kv))

    def quantiles(self, qs) -> np.ndarray:
        if self.n == 0:
            return np.full(np.atleast_1d(qs).shape, np.nan)
        kq, kv = self._knots()
        return np.interp(np.atleast_1d(qs).astype(np.float64), kq, kv)

    def rank(self, value: float) -> float:
        """Normalized rank (fraction of mass <= value), the CDF."""
        if self.n == 0:
            return float("nan")
        kq, kv = self._knots()
        return float(np.interp(value, kv, kq))

    def num_centroids(self) -> int:
        self._flush()
        return int(self.means.size)

    # ---- serde -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._flush()
        return base.pack(
            self.KIND,
            {
                "delta": self.delta,
                "n": self.n,
                "vmin": self.vmin if np.isfinite(self.vmin) else None,
                "vmax": self.vmax if np.isfinite(self.vmax) else None,
            },
            {"means": self.means, "weights": self.weights},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "TDigest":
        sk = cls(params["delta"])
        sk.n = int(params["n"])
        sk.means = arrays["means"].astype(np.float64, copy=False)
        sk.weights = arrays["weights"].astype(np.float64, copy=False)
        sk.vmin = np.inf if params["vmin"] is None else float(params["vmin"])
        sk.vmax = -np.inf if params["vmax"] is None else float(params["vmax"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return (
            f"TDigest(delta={self.delta}, n={self.n}, "
            f"centroids={self.means.size + self._buf_n})"
        )

    def describe(self) -> str:
        """Parameter + centroid-occupancy dump (pretty-printer surface)."""
        self._flush()
        lines = [repr(self), f"  centroids: {self.means.size}"]
        if self.n:
            qs = self.quantiles([0.5, 0.99, 0.999])
            lines.append(
                f"  p50={qs[0]:.3f} p99={qs[1]:.3f} p999={qs[2]:.3f} "
                f"range=[{self.vmin:.3f}, {self.vmax:.3f}]"
            )
        return "\n".join(lines)
