"""DDSketch: fully-mergeable quantile sketch with RELATIVE-error
guarantees (Masson, Rim & Lee, "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees", VLDB 2019).

Extension per BASELINE.json north_star's quantile-sibling family; no
reference counterpart (SURVEY.md §2.4).  The existing quantile siblings
trade differently: KLL (:mod:`.kll`) bounds *rank* error uniformly,
the t-digest (:mod:`.tdigest`) concentrates accuracy at the tails but
its estimates depend on merge order.  DDSketch bounds *value* error:
every returned quantile x̂ satisfies ``|x̂ - x_q| <= alpha * x_q``
(x_q an actual element at that rank), and — uniquely in this family —
its state is a pure integer histogram over deterministic log-scale
bucket keys, so as long as no bucket collapse triggers (the common
case: bucket count grows with log of the value RANGE, not with N),
**merges are bit-exact in any order** (associative, commutative,
distributed == serial to the last bit), the same hard determinism
contract as the CMS/HLL/KMV kernels.  Once the ``max_bins`` collapse
engages, the alpha guarantee still holds above the collapsed mass but
the folded low-bucket layout may depend on merge order (the paper's
collapsing variant has the same property).

Construction: gamma = (1+alpha)/(1-alpha); a positive value x maps to
bucket key ``i = ceil(log_gamma(x))`` covering ``(gamma^(i-1),
gamma^i]``; the bucket's representative ``2*gamma^i/(gamma+1)`` is
within alpha relative error of every value in it.  Zeros count
separately; negatives mirror into a second store keyed over |x|.
State is sparse (sorted int64 keys + int64 counts); the collapsing
variant caps bucket count at ``max_bins`` by folding the lowest keys
into the smallest retained bucket (paper §2.3), preserving the
guarantee for all quantiles above the collapsed mass.

Rides the same SKB1 serde / merge-tree machinery as every other
sketch: N-independent exchange volume (<= max_bins buckets per store
regardless of input size).
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base


def _dedupe(keys: np.ndarray, cnts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sort keys and sum counts of duplicates (sparse-store canonical form)."""
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(uk.size, dtype=np.int64)
    np.add.at(summed, inv, cnts)
    return uk, summed


def _accumulate(
    keys_a: np.ndarray, cnts_a: np.ndarray, keys_b: np.ndarray, cnts_b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Merge two canonical (sorted unique keys, counts) stores by
    key-wise sum.  Inputs must already be deduped (all callers hold
    that invariant; the early returns rely on it)."""
    if keys_a.size == 0:
        return keys_b, cnts_b
    if keys_b.size == 0:
        return keys_a, cnts_a
    return _dedupe(
        np.concatenate([keys_a, keys_b]), np.concatenate([cnts_a, cnts_b])
    )


@base.register_sketch
class DDSketch:
    KIND = "ddsketch"

    def __init__(self, alpha: float = 0.01, max_bins: int = 2048):
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        if max_bins < 16:
            raise ValueError("max_bins must be >= 16")
        self.alpha = float(alpha)
        self.max_bins = int(max_bins)
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._log_gamma = np.log(self.gamma)
        # sparse stores: sorted int64 keys, positive int64 counts
        self.pos_keys = np.empty(0, dtype=np.int64)
        self.pos_cnts = np.empty(0, dtype=np.int64)
        self.neg_keys = np.empty(0, dtype=np.int64)  # keyed over |x|
        self.neg_cnts = np.empty(0, dtype=np.int64)
        self.zero_count = 0
        self.n = 0
        # lowest-key collapse floors (None until a collapse happens)
        self._pos_floor: int | None = None
        self._neg_floor: int | None = None

    _IDENTITY = ("alpha", "max_bins")

    def empty_like(self) -> "DDSketch":
        return DDSketch(self.alpha, self.max_bins)

    # ---- internals ---------------------------------------------------------

    def _bucket_keys(self, x: np.ndarray) -> np.ndarray:
        """ceil(log_gamma(x)) for strictly positive x (vectorized)."""
        return np.ceil(np.log(x) / self._log_gamma).astype(np.int64)

    def _collapse(self, which: str) -> None:
        """Fold lowest keys into the smallest retained bucket so the
        store holds <= max_bins keys (paper §2.3: quantiles above the
        collapsed mass keep the alpha guarantee)."""
        keys = getattr(self, which + "_keys")
        cnts = getattr(self, which + "_cnts")
        if keys.size <= self.max_bins:
            return
        cut = keys.size - self.max_bins  # keys[:cut+1] fold together
        folded = int(cnts[: cut + 1].sum())
        keys = keys[cut:].copy()
        cnts = cnts[cut:].copy()
        cnts[0] = folded
        setattr(self, which + "_keys", keys)
        setattr(self, which + "_cnts", cnts)
        floor_attr = "_" + which + "_floor"
        prev = getattr(self, floor_attr)
        newf = int(keys[0])
        setattr(self, floor_attr, newf if prev is None else max(prev, newf))

    def _clamp_to_floor(self, which: str) -> None:
        """Re-fold a store's own sub-floor keys into the floor bucket
        (needed when a merge RAISES this sketch's floor: without it,
        A.merge(B) and B.merge(A) would keep different sub-floor
        layouts and post-collapse merge would not commute)."""
        floor = getattr(self, "_" + which + "_floor")
        keys = getattr(self, which + "_keys")
        if floor is None or keys.size == 0 or keys[0] >= floor:
            return
        uk, summed = _dedupe(
            np.maximum(keys, floor), getattr(self, which + "_cnts")
        )
        setattr(self, which + "_keys", uk)
        setattr(self, which + "_cnts", summed)

    def _fold(self, which: str, keys: np.ndarray, cnts: np.ndarray) -> None:
        """Add (key, count) pairs into one store; clamp below any
        established collapse floor so merge stays associative."""
        floor = getattr(self, "_" + which + "_floor")
        if floor is not None:
            keys, cnts = _dedupe(np.maximum(keys, floor), cnts)
        mk, mc = _accumulate(
            getattr(self, which + "_keys"), getattr(self, which + "_cnts"), keys, cnts
        )
        setattr(self, which + "_keys", mk)
        setattr(self, which + "_cnts", mc)
        self._collapse(which)

    # ---- updates / merge ---------------------------------------------------

    def update(self, items: np.ndarray, counts=None) -> None:
        """Fold a batch of float values (optional exact multiplicities)."""
        items = np.asarray(items, dtype=np.float64).ravel()
        if items.size == 0:
            return
        if counts is None:
            w = np.ones(items.size, dtype=np.int64)
        else:
            w = base.check_counts(counts)
            pos = w > 0
            items, w = items[pos], w[pos]
            if items.size == 0:
                return
        if not np.all(np.isfinite(items)):
            raise ValueError("DDSketch requires finite values")
        mags = np.abs(items[items != 0.0])
        if mags.size and (mags.min() < 1e-300 or mags.max() > 1e300):
            # beyond this range gamma**key overflows/underflows float64
            # and the representative would silently violate the alpha
            # guarantee (inf or 0.0 estimates) — reject, don't corrupt
            raise ValueError(
                "DDSketch supports nonzero magnitudes in [1e-300, 1e300]"
            )
        self.n += int(w.sum())
        zm = items == 0.0
        if zm.any():
            self.zero_count += int(w[zm].sum())
        pm = items > 0.0
        if pm.any():
            self._fold("pos", *_dedupe(self._bucket_keys(items[pm]), w[pm]))
        nm = items < 0.0
        if nm.any():
            self._fold("neg", *_dedupe(self._bucket_keys(-items[nm]), w[nm]))

    def merge(self, other: "DDSketch") -> "DDSketch":
        base.check_compatible(self, other, self._IDENTITY)
        # adopt the max collapse floor, then clamp OUR OWN sub-floor
        # keys to it too — so operand order cannot leave different
        # sub-floor layouts (merge commutes even after a collapse)
        for attr, which in (("_pos_floor", "pos"), ("_neg_floor", "neg")):
            a, b = getattr(self, attr), getattr(other, attr)
            if b is not None:
                setattr(self, attr, b if a is None else max(a, b))
                self._clamp_to_floor(which)
        if other.pos_keys.size:
            self._fold("pos", other.pos_keys, other.pos_cnts)
        if other.neg_keys.size:
            self._fold("neg", other.neg_keys, other.neg_cnts)
        self.zero_count += other.zero_count
        self.n += other.n
        return self

    # ---- queries -----------------------------------------------------------

    def _ordered(self) -> tuple[np.ndarray, np.ndarray]:
        """(representative values ascending, counts) across all stores."""
        rep = 2.0 / (self.gamma + 1.0)
        vals: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        if self.neg_keys.size:  # most-negative first: descending |x| key
            vals.append(-rep * np.power(self.gamma, self.neg_keys[::-1].astype(np.float64)))
            cnts.append(self.neg_cnts[::-1])
        if self.zero_count:
            vals.append(np.zeros(1))
            cnts.append(np.array([self.zero_count], dtype=np.int64))
        if self.pos_keys.size:
            vals.append(rep * np.power(self.gamma, self.pos_keys.astype(np.float64)))
            cnts.append(self.pos_cnts)
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        return np.concatenate(vals), np.concatenate(cnts)

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        """Values at normalized ranks (paper's rank convention:
        the element at 0-based rank floor(q*(n-1)))."""
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if self.n == 0:
            return np.full(qs.shape, np.nan)
        vals, cnts = self._ordered()
        cum = np.cumsum(cnts)
        ranks = np.floor(qs * (self.n - 1)).astype(np.int64)
        pos = np.searchsorted(cum, ranks, side="right")
        return vals[np.minimum(pos, vals.size - 1)]

    def count_le(self, x: float) -> int:
        """Exact count of stored mass in buckets whose upper edge <= x
        (bucket-resolution CDF)."""
        vals, cnts = self._ordered()
        if vals.size == 0:
            return 0
        return int(cnts[: np.searchsorted(vals, x, side="right")].sum())

    def num_buckets(self) -> int:
        return int(self.pos_keys.size + self.neg_keys.size + (self.zero_count > 0))

    def collapsed(self) -> bool:
        """True if any low-bucket collapse has occurred (quantiles below
        the collapsed mass lose the alpha guarantee)."""
        return self._pos_floor is not None or self._neg_floor is not None

    # ---- serde ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return base.pack(
            self.KIND,
            {
                "alpha": self.alpha,
                "max_bins": self.max_bins,
                "zero_count": self.zero_count,
                "n": self.n,
                "pos_floor": self._pos_floor,
                "neg_floor": self._neg_floor,
            },
            {
                "pos_keys": self.pos_keys,
                "pos_cnts": self.pos_cnts,
                "neg_keys": self.neg_keys,
                "neg_cnts": self.neg_cnts,
            },
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "DDSketch":
        sk = cls(params["alpha"], params["max_bins"])
        sk.zero_count = int(params["zero_count"])
        sk.n = int(params["n"])
        sk._pos_floor = params["pos_floor"]
        sk._neg_floor = params["neg_floor"]
        sk.pos_keys = arrays["pos_keys"].astype(np.int64, copy=False)
        sk.pos_cnts = arrays["pos_cnts"].astype(np.int64, copy=False)
        sk.neg_keys = arrays["neg_keys"].astype(np.int64, copy=False)
        sk.neg_cnts = arrays["neg_cnts"].astype(np.int64, copy=False)
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        return (
            f"DDSketch(alpha={self.alpha}, max_bins={self.max_bins}, "
            f"n={self.n}, buckets={self.num_buckets()})"
        )

    def describe(self) -> str:
        """Parameter + bucket-occupancy dump (pretty-printer surface)."""
        lines = [repr(self), f"  gamma={self.gamma:.6f} collapsed={self.collapsed()}"]
        if self.n:
            qs = self.quantiles([0.5, 0.99, 0.999])
            lines.append(f"  p50={qs[0]:.4f} p99={qs[1]:.4f} p999={qs[2]:.4f}")
        return "\n".join(lines)
