"""Frequent Directions: mergeable MATRIX sketch (Liberty, KDD 2013;
Ghashami, Liberty, Phillips & Woodruff, SIAM J. Comput. 2016).

Extension per the task brief's training-data-pipeline tier (SURVEY.md
§2.4): the deterministic matrix analogue of Misra–Gries, over the
``embeddings`` table's ``list<float>`` column.  A sketch ``B`` of
``ell`` rows approximates the n×d row matrix ``A`` with the published
covariance guarantee

    0 <= x'(A'A)x - x'(B'B)x <= ||A||_F^2 / ell      for all unit x,

i.e. ``||A'A - B'B||_2 <= ||A||_F^2 / ell`` — so the top singular
directions / spectral energy of a 100 TB embedding corpus come out of
a fixed ``ell×d`` state.  Mergeable: stacking two sketches and
re-shrinking preserves the same bound (Ghashami et al. §3), so it
rides the identical merge-tree machinery as the counting sketches —
per-partition partials are ``ell×d`` float64 (N-independent exchange
volume), merged pairwise in any order.

Shrink step (vectorized, no per-row Python): buffer incoming rows;
when the stacked matrix exceeds ``2*ell`` rows take its SVD
``U S V'``, set ``S'_i = sqrt(max(S_i^2 - S_ell^2, 0))`` and keep
``B = diag(S') V'`` (at most ``ell-1`` non-zero rows).  Deterministic
given the input multiset up to the SVD's sign/degeneracy freedom;
tests assert the spectral-error bound and merge-order *bound*
invariance, not bit equality (same posture as t-digest/KLL).

Also tracks the exact ``||A||_F^2`` and row count, so the bound is
checkable post hoc and energy fractions are exact denominators.
"""

from __future__ import annotations

import numpy as np

from parallel_count_min_sketch_ray.state import base


@base.register_sketch
class FrequentDirections:
    KIND = "fd"

    def __init__(self, ell: int = 64, dim: int | None = None):
        if ell < 2:
            raise ValueError("ell (sketch rows) must be >= 2")
        self.ell = int(ell)
        self.dim = None if dim is None else int(dim)
        self.n = 0
        self.fro2 = 0.0  # exact ||A||_F^2
        self._B = None if dim is None else np.zeros((0, int(dim)))
        self._buf: list[np.ndarray] = []
        self._buf_rows = 0

    _IDENTITY = ("ell", "dim")

    def empty_like(self) -> "FrequentDirections":
        return FrequentDirections(self.ell, self.dim)

    # ---- internals ---------------------------------------------------------

    def _shrink(self) -> None:
        """Stack buffer onto B, SVD once, shrink singular values by the
        ell-th squared value (the Frequent Directions step)."""
        if self._buf_rows == 0:
            return
        mats = ([self._B] if self._B is not None and self._B.size else []) + self._buf
        M = np.concatenate(mats, axis=0)
        self._buf, self._buf_rows = [], 0
        if M.shape[0] <= self.ell:
            self._B = M
            return
        # full_matrices=False: S has min(rows, d) entries
        _, s, vt = np.linalg.svd(M, full_matrices=False)
        if s.size < self.ell:  # d < ell: exact, no shrink needed
            self._B = s[:, None] * vt
            return
        delta = s[self.ell - 1] ** 2
        s2 = np.sqrt(np.maximum(s[: self.ell] ** 2 - delta, 0.0))
        keep = s2 > 0
        self._B = s2[keep, None] * vt[: self.ell][keep]

    # ---- updates / merge ---------------------------------------------------

    def update(self, rows: np.ndarray, counts=None) -> None:
        """Fold a batch of embedding rows (2-D float array, n×d)."""
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim == 1:
            rows = rows[None, :]
        if rows.ndim != 2:
            raise ValueError("FrequentDirections expects a 2-D row batch")
        if rows.shape[0] == 0:
            return
        # validate EVERYTHING before mutating any state: a raising
        # update must leave the sketch exactly as it was (n consistent
        # with fro2/B), so callers that catch and continue stay sound
        if not np.all(np.isfinite(rows)):
            raise ValueError("FrequentDirections requires finite embeddings")
        if self.dim is not None and rows.shape[1] != self.dim:
            raise ValueError(f"dim mismatch: got {rows.shape[1]}, have {self.dim}")
        if counts is not None:
            w = base.check_counts(counts)
            pos = w > 0
            rows, w = rows[pos], w[pos]
            if rows.shape[0] == 0:
                return
            # weight c == c stacked copies == scale row by sqrt(c) in A'A
            rows = rows * np.sqrt(w.astype(np.float64))[:, None]
            self.n += int(w.sum())
        else:
            self.n += rows.shape[0]
        if self.dim is None:
            self.dim = rows.shape[1]
            self._B = np.zeros((0, self.dim))
        self.fro2 += float((rows * rows).sum())
        self._buf.append(rows)
        self._buf_rows += rows.shape[0]
        if self._buf_rows >= 2 * self.ell:
            self._shrink()

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """Fold ``other`` into self.  READ-ONLY on ``other`` (the
        repo-wide merge contract every kernel honors, so cached
        per-window sketches can merge into many accumulators): other's
        shrunk matrix and pending buffer rows are stacked into self's
        buffer as COPIES — never shrinking or aliasing other's state.
        Stacking unshrunk rows is exact (shrink-of-a-concatenation is
        the published merge; deferring other's shrink only tightens it,
        Ghashami et al. §3)."""
        # ell identity is checked UNCONDITIONALLY (an empty other must
        # not smuggle a mismatched proto through the merge tree); dim
        # may still be None on an empty side — reconcile, then check
        if type(other) is not type(self) or self.ell != other.ell:
            raise ValueError(
                f"incompatible FrequentDirections merge: ell {self.ell} vs "
                f"{getattr(other, 'ell', None)!r}"
            )
        if self.dim is None:
            self.dim = other.dim
            self._B = None if other.dim is None else np.zeros((0, other.dim))
        if other.dim is not None:
            base.check_compatible(self, other, self._IDENTITY)
        mats = (
            [other._B] if other._B is not None and other._B.size else []
        ) + other._buf
        for m in mats:
            self._buf.append(m.copy())
            self._buf_rows += m.shape[0]
        self.n += other.n
        self.fro2 += other.fro2
        if self._buf_rows >= 2 * self.ell:
            self._shrink()
        return self

    # ---- queries -----------------------------------------------------------

    def sketch_matrix(self) -> np.ndarray:
        """The current ell'×d sketch B (ell' <= ell rows)."""
        self._shrink()
        return np.zeros((0, 0)) if self._B is None else self._B

    def covariance(self) -> np.ndarray:
        """B'B — the d×d covariance estimate with the published
        spectral bound vs A'A."""
        B = self.sketch_matrix()
        return B.T @ B

    def singular_values(self) -> np.ndarray:
        """Singular values of B (descending) — lower estimates of A's."""
        B = self.sketch_matrix()
        if B.size == 0:
            return np.empty(0)
        return np.linalg.svd(B, compute_uv=False)

    def top_directions(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(top-k singular values of B, k×d right singular vectors) —
        the approximate principal directions of the row corpus."""
        B = self.sketch_matrix()
        if B.size == 0:
            return np.empty(0), np.empty((0, 0))
        _, s, vt = np.linalg.svd(B, full_matrices=False)
        return s[:k], vt[:k]

    def error_bound(self) -> float:
        """||A'A - B'B||_2 <= this (the ||A||_F^2 / ell guarantee)."""
        return self.fro2 / self.ell

    # ---- serde ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        B = self.sketch_matrix()
        return base.pack(
            self.KIND,
            {"ell": self.ell, "dim": self.dim, "n": self.n, "fro2": self.fro2},
            {"B": B},
        )

    @classmethod
    def _from_state(cls, params, arrays) -> "FrequentDirections":
        sk = cls(params["ell"], params["dim"])
        sk.n = int(params["n"])
        sk.fro2 = float(params["fro2"])
        if params["dim"] is not None:
            sk._B = arrays["B"].astype(np.float64, copy=False).reshape(-1, params["dim"])
        return sk

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirections":
        kind, params, arrays = base.unpack(data)
        if kind != cls.KIND:
            raise ValueError(f"expected {cls.KIND} blob, got {kind}")
        return cls._from_state(params, arrays)

    def __repr__(self) -> str:
        rows = 0 if self._B is None else self._B.shape[0]
        return (
            f"FrequentDirections(ell={self.ell}, dim={self.dim}, n={self.n}, "
            f"rows={rows + self._buf_rows})"
        )

    def describe(self) -> str:
        """Parameter + spectrum dump (pretty-printer surface)."""
        lines = [repr(self), f"  error_bound(spectral)={self.error_bound():.4f}"]
        s = self.singular_values()
        if s.size:
            lines.append(f"  top singular values: {np.round(s[:5], 4).tolist()}")
        return "\n".join(lines)
