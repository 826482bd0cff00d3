"""Distributed iterative model training over a Dataset.

The reference is a one-pass sketch builder; a training-data engine
also runs ITERATIVE optimization over the same tables (the k-means
quantizer in ``ann.py`` is the clustering instance; this is the
supervised one).  ``train_event_model`` fits a logistic regression
(purchase-vs-rest from time-of-day and value) by full-batch gradient
descent:

- the feature table is column-pruned, transformed once, and
  materialized (3 doubles + a label per event — tiny next to the
  source table);
- every iteration is ONE ``map_batches`` pass emitting a per-block
  gradient partial (k+1 doubles) tagged with the block's min event_id;
- the driver sorts partials by that tag before summing, so float
  association is FIXED: rerunning the whole pipeline reproduces the
  weights bit-for-bit (asserted in tests) even though Ray returns
  blocks in nondeterministic order;
- weights broadcast back via ``ray.put`` each step — the only
  driver↔cluster traffic is (num_blocks × (k+2)) doubles per
  iteration, independent of N.

This is the classic "broadcast parameters / reduce gradients" loop
(parameter-server with one server) expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from parallel_count_min_sketch_ray.pipelines.analytics import _cents, read

NUM_FEATURES = 3  # bias, hour/24, log1p(cents)/10


def _features(batch: pa.Table) -> pa.Table:
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    hour = ((ts_us // 3_600_000_000) % 24).astype(np.float64) / 24.0
    cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
    x2 = np.log1p(cents.astype(np.float64)) / 10.0
    et = batch["event_type"]
    if isinstance(et, pa.ChunkedArray):
        et = et.combine_chunks()
    y = (et.to_numpy(zero_copy_only=False) == "purchase").astype(np.float64)
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "x1": pa.array(hour, pa.float64()),
            "x2": pa.array(x2, pa.float64()),
            "y": pa.array(y, pa.float64()),
        }
    )


def _grad_stage(w_ref):
    def grad(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"tag": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 **{f"g{j}": pa.array([], pa.float64())
                    for j in range(NUM_FEATURES)},
                 "loss": pa.array([], pa.float64())}
            )
        x = np.column_stack(
            [
                np.ones(n),
                batch["x1"].to_numpy(zero_copy_only=False),
                batch["x2"].to_numpy(zero_copy_only=False),
            ]
        )
        y = batch["y"].to_numpy(zero_copy_only=False)
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = x.T @ (p - y)  # un-normalized gradient sum
        # log-loss sum, numerically stable form
        loss = float(np.sum(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y))
        tag = int(batch["event_id"].to_numpy(zero_copy_only=False).min())
        return pa.table(
            {
                "tag": pa.array([tag], pa.int64()),
                "n": pa.array([n], pa.int64()),
                **{f"g{j}": pa.array([float(g[j])], pa.float64())
                   for j in range(NUM_FEATURES)},
                "loss": pa.array([loss], pa.float64()),
            }
        )

    return grad


def train_event_model(
    sf_dir: str, iters: int = 8, lr: float = 2.0
) -> pd.DataFrame:
    """Fit purchase-vs-rest logistic regression; returns one row per
    iteration — each row pairs ``mean_loss`` with the SAME weights it
    was evaluated at (pre-update), and a final row carries the
    post-training weights with their loss — deterministic bit-for-bit
    across reruns."""
    feats = (
        read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
        .map_batches(_features, batch_format="pyarrow")
        .materialize()
    )
    w = np.zeros(NUM_FEATURES)
    trace = []
    # iters+1 gradient passes: row t records loss(w_t) alongside w_t;
    # the last pass only evaluates (no update), so the final row is
    # the trained weights with their own loss
    for it in range(iters + 1):
        w_ref = ray.put(w)
        parts = feats.map_batches(
            _grad_stage(w_ref), batch_size=None, batch_format="pyarrow"
        ).take_all()
        parts.sort(key=lambda r: r["tag"])  # fixed float association
        n = sum(r["n"] for r in parts)
        grad = np.array(
            [sum(r[f"g{j}"] for r in parts) for j in range(NUM_FEATURES)]
        )
        loss = sum(r["loss"] for r in parts) / n
        trace.append((it, loss, *w.tolist()))
        if it < iters:
            w = w - lr * grad / n
    cols = ["iteration", "mean_loss"] + [f"w{j}" for j in range(NUM_FEATURES)]
    return pd.DataFrame(trace, columns=cols)
