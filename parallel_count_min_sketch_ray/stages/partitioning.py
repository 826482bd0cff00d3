"""Partitioning / skew handling utilities.

The reference never needed skew handling (equal-size chunks of a
uniform-cost update loop, SURVEY.md §4); our input is row-skewed
(``source`` is heavy-hitter-skewed and heavy sources have longer
token arrays), which matters whenever a *keyed* operation co-locates
rows.  BASELINE.json names the remedy: salted repartition of
heavy-hitter sources.

- :func:`add_salted_key` — ``key_salted = key + '#' + hash(doc) % salts``
  splits a hot key across ``salts`` sub-partitions.  Grouped sketch
  builds then run on the salted key, and the per-key result is the
  *merge* of its salt shards (sketches are mergeable — the salt is
  free).  :func:`build_sketches_by_key_salted` packages that.
- :func:`repartition_by_tokens` — rebalances blocks by token COUNT
  (work), not rows, before an actor-pool stage: equal rows are not
  equal work when n_tok varies 256x.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from parallel_count_min_sketch_ray.functions.hashing import hash64_strings, splitmix64
from parallel_count_min_sketch_ray.pipelines.sketch_build import SketchSpec
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes


def num_shuffle_buckets(per_cpu: int = 2, floor: int = 16, cap: int = 4096) -> int:
    """Coarse-bucket count for keyed shuffles (sessions/lag/joins/pair
    scoring), derived from the cluster's CPU count: ``per_cpu`` groups
    per core gives every core work with a little over-decomposition for
    stragglers, floored so tiny test clusters still spread load and
    capped so the group count never explodes scheduling overhead.
    Falls back to 64 (the old fixed constant) when Ray is not up."""
    import ray

    if not ray.is_initialized():
        return 64
    cpus = int(ray.cluster_resources().get("CPU", 32))
    return int(np.clip(per_cpu * cpus, floor, cap))


def add_salted_key(
    ds, key: str, salt_col: str, num_salts: int = 8, out_col: str = "__salted_key"
):
    """Append ``key#salt`` where salt = splitmix64(hash(salt_col)) % num_salts."""

    def salt(batch: pa.Table) -> pa.Table:
        keys = batch[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        basis = batch[salt_col]
        if isinstance(basis, pa.ChunkedArray):
            basis = basis.combine_chunks()
        if pa.types.is_integer(basis.type):
            h = splitmix64(basis.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hash64_strings(basis.to_pylist())
        salts = (h % np.uint64(num_salts)).astype(np.int64)
        salted = pc.binary_join_element_wise(
            keys.cast(pa.string()),
            pa.array(salts.astype(str), pa.string()),
            "#",
        )
        return batch.append_column(out_col, salted)

    return ds.map_batches(salt, batch_format="pyarrow")


def build_sketches_by_key_salted(
    ds,
    key: str,
    specs: list[SketchSpec],
    *,
    salt_col: str = "doc_id",
    num_salts: int = 8,
) -> dict[Any, dict[str, Any]]:
    """Per-key sketches with salted shuffle keys: each exchange row is
    one of ``num_salts`` partials per hot key instead of funnelling the
    whole key through one reducer; the final per-key merge happens
    driver-side (sketch merges are associative, so salting cannot
    change results — asserted in tests).  Uses the same keyed
    partial-blob merge tree as :func:`build_sketches_by_key` (the
    grouped-AggregateFn spelling it replaced measured 2.5x slower in
    Ray 2.49)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )

    salted = add_salted_key(ds, key, salt_col, num_salts)
    by_salted = build_sketches_by_key(salted, "__salted_key", specs)
    result: dict[Any, dict[str, Any]] = {}
    for salted_key, sketches in by_salted.items():
        base_key = salted_key.rsplit("#", 1)[0]
        bucket = result.setdefault(base_key, {})
        for name, sk in sketches.items():
            if name in bucket:
                bucket[name].merge(sk)
            else:
                bucket[name] = sk
    return result


def token_bounded_slices(
    batch: pa.Table, tokens_col: str = "tokens", target_tokens: int = 2_000_000
):
    """Yield zero-copy slices of ``batch`` holding <= ~target_tokens
    tokens each (a slice may exceed the target only by its final row —
    a single row is never split)."""
    lens = pc.list_value_length(batch[tokens_col]).to_numpy(zero_copy_only=False)
    csum = np.cumsum(lens.astype(np.int64))
    start = 0
    while start < batch.num_rows:
        base = csum[start - 1] if start else 0
        # last row index whose cumulative count stays within target,
        # inclusive — hence side="right" WITHOUT the off-by-one bump
        end = int(np.searchsorted(csum, base + target_tokens, side="right"))
        end = min(max(end, start + 1), batch.num_rows)
        yield batch.slice(start, end - start)
        start = end


def repartition_by_tokens(ds, tokens_col: str = "tokens", target_tokens: int = 2_000_000):
    """Re-slice the stream so each emitted batch holds ~target_tokens of
    WORK (rows vary 256x in n_tok, so row-balanced != work-balanced).

    Implemented as a generator UDF: each input block is yielded as
    token-bounded slices.  NOTE Ray Data may coalesce yielded batches
    into larger blocks up to ``DataContext.target_max_block_size``
    bytes; the guarantee this function provides is that no *emitted
    batch* exceeds the token budget (downstream ``map_batches`` with
    ``batch_size=None`` sees work-bounded batches after this stage's
    own slicing).  The per-slice bound is unit-tested directly via
    :func:`token_bounded_slices`.
    """

    def rechunk(batch: pa.Table):
        yield from token_bounded_slices(batch, tokens_col, target_tokens)

    return ds.map_batches(rechunk, batch_format="pyarrow", batch_size=None)
