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


def validate_cms_distributed(cms, counts_ds, token_col: str = "token",
                             cnt_col: str = "cnt", strict: bool = True) -> AccuracyReport:
    """The same accuracy sweep as :func:`validate_cms`, but over a Ray
    Dataset of exact (token, count) rows — per-batch partial error
    stats aggregate distributed, so the vocabulary is never
    materialized on the driver (it only receives seven scalars).

    The sketch rides the object store once (``ray.put``); each task
    deserializes its ~65 KB blob, hashes its batch's tokens and
    compares estimates to exact counts.
    """
    import pyarrow as pa

    import ray
    from ray.data.aggregate import Max, Min, Sum

    from parallel_count_min_sketch_ray.functions.hashing import djb2_array
    from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

    bound = cms.error_bound()
    blob_ref = ray.put(cms.to_bytes())

    def partial(batch: pa.Table) -> pa.Table:
        sk = sketch_from_bytes(ray.get(blob_ref))
        toks = batch[token_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = (djb2_array(toks.to_pylist()) & np.uint64(0x7FFFFFFF)).astype(np.int64)
        exact = batch[cnt_col].to_numpy(zero_copy_only=False).astype(np.int64)
        diff = sk.query(ids).astype(np.int64) - exact
        return pa.table(
            {
                "n": pa.array([np.int64(diff.size)]),
                "sum_abs": pa.array([np.int64(np.abs(diff).sum())]),
                "max_abs": pa.array([np.int64(np.abs(diff).max() if diff.size else 0)]),
                "min_diff": pa.array([np.int64(diff.min() if diff.size else 0)]),
                "n_exact": pa.array([np.int64((diff == 0).sum())]),
                "n_within": pa.array([np.int64((np.abs(diff) <= bound).sum())]),
            }
        )

    agg = counts_ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_abs", alias_name="sum_abs"),
        Max("max_abs", alias_name="max_abs"),
        Min("min_diff", alias_name="min_diff"),
        Sum("n_exact", alias_name="n_exact"),
        Sum("n_within", alias_name="n_within"),
    )
    n = int(agg["n"] or 0)
    one_sided = int(agg["min_diff"] or 0) >= 0
    if strict and not one_sided:
        raise AssertionError(
            "one-sidedness violated: estimate < true for at least one value "
            f"(min diff {int(agg['min_diff'])})"
        )
    return AccuracyReport(
        n_values=n,
        total=int(cms.total),
        error_bound=int(bound),
        avg_abs_error=float(agg["sum_abs"]) / n if n else 0.0,
        max_abs_error=int(agg["max_abs"]) if n else 0,
        pct_exact=float(agg["n_exact"]) / n * 100 if n else 100.0,
        pct_within_bound=float(agg["n_within"]) / n * 100 if n else 100.0,
        one_sided_ok=one_sided,
    )
