"""Mergeable-sketch UDAF adapters for ``ray.data``.

Two spellings of the reference's build→reduce lifecycle
(``/root/reference/src/mpi/mpiV2.c``: per-rank local build at
:128-140, ``MPI_Reduce(MPI_SUM)`` merge at :150-175):

1. :func:`sketch_aggregate` — a ``ray.data.aggregate.AggregateFn`` so a
   sketch rides ``ds.aggregate(...)`` / ``ds.groupby(key).aggregate(...)``
   natively: Ray Data accumulates per block and tree-merges the
   partials, exactly the mpiV2 topology.  Finalized value = SKB1 bytes
   (Arrow-storable for grouped results).

2. :func:`combine_partials` / :func:`merge_partial_rows` — the
   single-sketch merge-tree pieces over the ``{sketch, rows, items}``
   row schema (PARTIAL_SCHEMA), used where a hand-rolled partial stage
   is wanted (e.g. fault-injection tests).  The production multi-sketch
   stage is ``pipelines.sketch_build.MultiPartialBatcher`` +
   ``_combine_level`` — one implementation, not two.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
from ray.data.aggregate import AggregateFn

from parallel_count_min_sketch_ray.functions.extract import make_extractor
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

PARTIAL_SCHEMA = pa.schema(
    [("sketch", pa.binary()), ("rows", pa.int64()), ("items", pa.int64())]
)


def sketch_aggregate(
    proto, column: str, kind: str = "auto", name: str | None = None
) -> AggregateFn:
    """AggregateFn building ``proto.empty_like()`` sketches over ``column``.

    ``proto`` carries the sketch identity (eps/delta/seed/...); every
    accumulator starts from ``empty_like()`` — the analogue of
    ``cms_init_private`` sharing the broadcast hash family
    (``src/core/count_min_sketch_hybridV1.c:79-109``).
    """
    extractor = make_extractor(column, kind)
    agg_name = name or f"{type(proto).KIND}({column})"

    # AggType is SKB1 *bytes*, not the sketch object: Ray Data stores
    # accumulators in intermediate blocks between the partial and final
    # merge, and a binary column stays zero-copy Arrow (an object-typed
    # accumulator triggers the pickled-object fallback path).
    def accumulate_block(blob: bytes, block) -> bytes:
        sk = sketch_from_bytes(blob)
        sk.update(extractor(block))
        return sk.to_bytes()

    def merge(a: bytes, b: bytes) -> bytes:
        return sketch_from_bytes(a).merge(sketch_from_bytes(b)).to_bytes()

    return AggregateFn(
        init=lambda k: proto.empty_like().to_bytes(),
        merge=merge,
        accumulate_block=accumulate_block,
        finalize=lambda blob: blob,
        name=agg_name,
    )


def combine_partials(batch: pa.Table) -> pa.Table:
    """Fold a batch of partial-sketch rows into one row (merge tree level).

    Associativity+commutativity of ``merge`` (asserted in tests) makes
    the result independent of Ray's nondeterministic block order.
    """
    blobs = batch["sketch"].to_pylist()
    if not blobs:
        return batch
    acc = sketch_from_bytes(blobs[0])
    for blob in blobs[1:]:
        acc.merge(sketch_from_bytes(blob))
    rows = int(pa.compute.sum(batch["rows"]).as_py() or 0)
    items = int(pa.compute.sum(batch["items"]).as_py() or 0)
    return pa.Table.from_arrays(
        [
            pa.array([acc.to_bytes()], pa.binary()),
            pa.array([rows], pa.int64()),
            pa.array([items], pa.int64()),
        ],
        schema=PARTIAL_SCHEMA,
    )


def merge_partial_rows(rows: list[dict[str, Any]]):
    """Driver-side final merge of collected partial rows -> (sketch, rows, items)."""
    if not rows:
        raise ValueError("no partials to merge")
    acc = sketch_from_bytes(rows[0]["sketch"])
    n_rows = int(rows[0]["rows"])
    n_items = int(rows[0]["items"])
    for r in rows[1:]:
        acc.merge(sketch_from_bytes(r["sketch"]))
        n_rows += int(r["rows"])
        n_items += int(r["items"])
    return acc, n_rows, n_items
