"""Accuracy validation report: the ``test_cms_accuracy`` contract as a
public API (``/root/reference/src/core/count_min_sketch.c:205-242``).

Given a sketch and an exact frequency oracle, produce the same summary
the reference prints: hard one-sidedness check (estimate >= true for
EVERY value — a violated invariant raises), avg/max absolute error,
% exact matches, % within ``eps*N``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class AccuracyReport:
    n_values: int
    total: int
    error_bound: int
    avg_abs_error: float
    max_abs_error: int
    pct_exact: float
    pct_within_bound: float
    one_sided_ok: bool

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def validate_cms(cms, values: np.ndarray, exact_counts: np.ndarray,
                 strict: bool = True) -> AccuracyReport:
    """Compare point estimates against exact counts.

    ``strict=True`` raises AssertionError if any estimate < true count
    (the reference's hard error path, count_min_sketch.c:222-225).
    """
    values = np.asarray(values)
    exact = np.asarray(exact_counts, dtype=np.int64)
    ests = cms.query(values).astype(np.int64)
    diff = ests - exact
    one_sided = bool((diff >= 0).all())
    if strict and not one_sided:
        bad = values[diff < 0][:5]
        raise AssertionError(
            f"one-sidedness violated: estimate < true for values {bad.tolist()}"
        )
    bound = cms.error_bound()
    return AccuracyReport(
        n_values=int(values.size),
        total=int(cms.total),
        error_bound=int(bound),
        avg_abs_error=float(np.abs(diff).mean()) if values.size else 0.0,
        max_abs_error=int(np.abs(diff).max()) if values.size else 0,
        pct_exact=float((diff == 0).mean() * 100) if values.size else 100.0,
        pct_within_bound=float((np.abs(diff) <= bound).mean() * 100)
        if values.size
        else 100.0,
        one_sided_ok=one_sided,
    )
