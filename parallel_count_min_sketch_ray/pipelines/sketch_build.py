"""Distributed sketch builds over ``ray.data.Dataset``.

The Ray-Data restatement of the reference's flagship pipeline
(``/root/reference/src/mpi/mpiV2.c``, SURVEY.md §3.1):

    read_parquet → map_batches(flatten + per-block partial sketch)
                 → hierarchical combine (map_batches merge tree)
                 → driver final merge → query/validate on the sketch

Key property at 100 TB: the only "wide" step is a fixed-size sketch
reduction — data volume is ``num_blocks × sketch_bytes``, independent
of N.  The merge tree's fan-in is explicit (``combine_fanin``,
``combine_levels``) so the driver only ever sees
``num_blocks / fanin**levels`` partials (the thread→rank→global
hierarchy of hybridV1, ``src/hybrid/hybridV1.c:156-227``).

:func:`build_sketches` scans the input ONCE for any number of sketch
specs (e.g. CMS over tokens + HLL distinct tokens + KLL over n_tok +
Bloom over doc_id in a single pass).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from parallel_count_min_sketch_ray.functions.extract import make_extractor
from parallel_count_min_sketch_ray.stages.udaf import sketch_aggregate
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to build: a prototype (identity carrier) + input column."""

    name: str
    proto: Any
    column: str
    kind: str = "auto"  # extractor kind: list | numeric | string_hash | matrix | auto


@dataclass
class SketchReport:
    """Result of a distributed build: merged sketches + run metrics."""

    sketches: dict[str, Any]
    rows: int
    items: dict[str, int]
    wall_time: float
    num_partials: int
    ray_stats: str = ""  # ds.stats() per-stage breakdown (wall/cpu/mem)

    def __getitem__(self, name: str):
        return self.sketches[name]

    def tokens_per_sec(self, name: str | None = None) -> float:
        key = name or next(iter(self.items))
        return self.items[key] / self.wall_time if self.wall_time else 0.0


class MultiPartialBatcher:
    """map_batches callable: one row of serialized partials per block.

    Runs as an actor pool (``concurrency=N``) so per-sketch setup
    (hash families, MinHash permutations) happens once per actor.
    """

    def __init__(self, specs: tuple[SketchSpec, ...]):
        self._specs = specs
        self._protos = [s.proto.empty_like() for s in specs]
        self._extractors = [make_extractor(s.column, s.kind) for s in specs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        arrays, names = [], []
        item_counts = []
        for spec, proto, extract in zip(self._specs, self._protos, self._extractors):
            sk = proto.empty_like()
            vals = extract(batch)
            sk.update(vals)
            arrays.append(pa.array([sk.to_bytes()], pa.binary()))
            names.append(spec.name)
            item_counts.append(int(np.asarray(vals).size))
        arrays.append(pa.array([batch.num_rows], pa.int64()))
        names.append("__rows")
        arrays.append(pa.array([item_counts], pa.list_(pa.int64())))
        names.append("__items")
        return pa.Table.from_arrays(arrays, names=names)


def _combine_level(specs: tuple[SketchSpec, ...]):
    """A merge-tree level: fold a batch of partial rows into one row."""

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 1:
            return batch
        arrays, names = [], []
        for spec in specs:
            blobs = batch[spec.name].to_pylist()
            acc = sketch_from_bytes(blobs[0])
            for blob in blobs[1:]:
                acc.merge(sketch_from_bytes(blob))
            arrays.append(pa.array([acc.to_bytes()], pa.binary()))
            names.append(spec.name)
        rows = int(pa.compute.sum(batch["__rows"]).as_py() or 0)
        items = np.array(batch["__items"].to_pylist(), dtype=np.int64).sum(axis=0)
        arrays.append(pa.array([rows], pa.int64()))
        names.append("__rows")
        arrays.append(pa.array([items.tolist()], pa.list_(pa.int64())))
        names.append("__items")
        return pa.Table.from_arrays(arrays, names=names)

    return combine


def build_sketches(
    ds,
    specs: list[SketchSpec],
    *,
    batch_size: int | None = 65536,
    concurrency: int | tuple[int, int] | None = None,
    combine_fanin: int = 64,
    combine_levels: int = 2,
) -> SketchReport:
    """One streaming pass over ``ds`` building every spec's sketch.

    ``combine_levels`` merge-tree stages with fan-in ``combine_fanin``
    bound the driver's final fan-in to
    ``ceil(num_blocks / combine_fanin**combine_levels)`` partials —
    at 800k blocks (100 TB / 128 MB) and the defaults, ~196 rows of a
    few hundred KB reach the driver.
    """
    t0 = time.perf_counter()
    specs = tuple(specs)
    if concurrency is None:
        # stateless tasks: the (tiny) batcher instance ships with each task
        partials = ds.map_batches(
            MultiPartialBatcher(specs),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    else:
        # actor pool: per-sketch setup runs once per actor (__init__)
        partials = ds.map_batches(
            MultiPartialBatcher,
            fn_constructor_args=(specs,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        )
    combine = _combine_level(specs)
    for _ in range(max(0, combine_levels)):
        partials = partials.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_fanin
        )
    rows = partials.take_all()
    try:
        stats = partials.stats()  # per-stage wall/cpu/memory breakdown
    except Exception:
        stats = ""

    merged = {s.name: s.proto.empty_like() for s in specs}
    total_rows = 0
    items = np.zeros(len(specs), dtype=np.int64)
    for r in rows:
        for s in specs:
            merged[s.name].merge(sketch_from_bytes(r[s.name]))
        total_rows += int(r["__rows"])
        items += np.asarray(r["__items"], dtype=np.int64)
    return SketchReport(
        sketches=merged,
        rows=total_rows,
        items={s.name: int(n) for s, n in zip(specs, items)},
        wall_time=time.perf_counter() - t0,
        num_partials=len(rows),
        ray_stats=stats,
    )


class _DirectPartitionBuilder:
    """map_batches callable over a control dataset of partition specs
    (file × row-group range): reads its fragment with pyarrow directly
    and emits one partial-sketch row per partition.

    Why this exists alongside the Dataset-read path: Ray Data does not
    fuse ReadParquet with downstream map_batches here, so every decoded
    block round-trips the object store — at 32-way concurrency on
    fault-constrained hosts that shm churn dominates.  Reading inside
    the map task keeps raw data worker-local; ONLY the ~65 KB partials
    enter the object store (the mpiV2 topology exactly: local build,
    tiny reduce — src/mpi/mpiV2.c:128-175).
    """

    def __init__(self, specs: tuple[SketchSpec, ...], columns: list[str]):
        self._specs = specs
        self._extractors = [make_extractor(s.column, s.kind) for s in specs]
        self._columns = columns

    def __call__(self, batch) -> pa.Table:
        import pyarrow.parquet as pq

        sketches = [s.proto.empty_like() for s in self._specs]
        rows = 0
        items = [0] * len(self._specs)
        n = len(batch["path"])
        for i in range(n):
            pf = pq.ParquetFile(str(batch["path"][i]))
            for rb in pf.iter_batches(
                batch_size=32768,
                row_groups=list(range(int(batch["rg_start"][i]), int(batch["rg_end"][i]))),
                columns=self._columns,
            ):
                tbl = pa.Table.from_batches([rb])
                rows += tbl.num_rows
                for j, (sk, ex) in enumerate(zip(sketches, self._extractors)):
                    vals = ex(tbl)
                    sk.update(vals)
                    items[j] += int(np.asarray(vals).size)
        arrays = [pa.array([sk.to_bytes()], pa.binary()) for sk in sketches]
        names = [s.name for s in self._specs]
        arrays.append(pa.array([rows], pa.int64()))
        names.append("__rows")
        arrays.append(pa.array([items], pa.list_(pa.int64())))
        names.append("__items")
        return pa.Table.from_arrays(arrays, names=names)


def build_sketches_direct(
    paths: list[str],
    specs: list[SketchSpec],
    *,
    rows_per_partition: int = 500_000,
    combine_fanin: int = 64,
    combine_levels: int = 1,
    concurrency=None,
) -> SketchReport:
    """Sketch build with worker-local reads (see _DirectPartitionBuilder).

    Partitions come from :func:`..state.checkpoint.plan_partitions`
    (deterministic file × row-group ranges).  Scheduling, retries and
    the merge tree remain Ray Data (`from_items` control dataset).
    """
    import ray.data

    from parallel_count_min_sketch_ray.state.checkpoint import plan_partitions

    t0 = time.perf_counter()
    specs = tuple(specs)
    parts = plan_partitions(paths, rows_per_partition)
    columns = sorted({s.column for s in specs})
    control = ray.data.from_items(parts)
    kwargs = {"batch_size": 1, "batch_format": "numpy"}
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        partials = control.map_batches(
            _DirectPartitionBuilder,
            fn_constructor_args=(specs, columns),
            **kwargs,
        )
    else:
        partials = control.map_batches(
            _DirectPartitionBuilder(specs, columns), **kwargs
        )
    combine = _combine_level(specs)
    for _ in range(max(0, combine_levels)):
        partials = partials.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_fanin
        )
    rows = partials.take_all()
    merged = {s.name: s.proto.empty_like() for s in specs}
    total_rows = 0
    items = np.zeros(len(specs), dtype=np.int64)
    for r in rows:
        for s in specs:
            merged[s.name].merge(sketch_from_bytes(r[s.name]))
        total_rows += int(r["__rows"])
        items += np.asarray(r["__items"], dtype=np.int64)
    return SketchReport(
        sketches=merged,
        rows=total_rows,
        items={s.name: int(x) for s, x in zip(specs, items)},
        wall_time=time.perf_counter() - t0,
        num_partials=len(rows),
    )


def build_sketch(ds, proto, column: str, kind: str = "auto", **kwargs):
    """Single-sketch convenience wrapper -> (sketch, SketchReport)."""
    report = build_sketches(ds, [SketchSpec("sketch", proto, column, kind)], **kwargs)
    return report.sketches["sketch"], report


def build_sketch_via_aggregate(ds, proto, column: str, kind: str = "auto"):
    """The ``ds.aggregate(AggregateFn)`` spelling: Ray Data owns the
    partial-accumulate + merge topology.  Returns the merged sketch."""
    agg = sketch_aggregate(proto, column, kind, name="sketch")
    out = ds.aggregate(agg)
    return sketch_from_bytes(out["sketch"])


class KeyedPartialBatcher:
    """map_batches stage: one row of serialized partials per (block,
    key) — the grouped sibling of :class:`MultiPartialBatcher`.

    The block sorts by key once (Arrow kernel), each key's row range
    slices zero-copy, and every spec's sketch accumulates over the
    slice.  Downstream merge stages (keyed combine tree, or a groupby
    for high-cardinality keys) therefore move at most one
    ~sketch-sized row per key per block, never raw rows — and the
    merge is a plain blob fold, not Ray's grouped-AggregateFn inner
    loop (measured 2.5x query-time overhead in Ray 2.49).
    """

    def __init__(self, key: str, specs: tuple[SketchSpec, ...]):
        self._key = key
        self._specs = specs
        self._protos = [s.proto.empty_like() for s in specs]
        self._extractors = [make_extractor(s.column, s.kind) for s in specs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_arr = batch[self._key]
        if isinstance(key_arr, pa.ChunkedArray):
            key_arr = key_arr.combine_chunks()
        if batch.num_rows == 0:
            arrays = [key_arr] + [pa.array([], pa.binary())] * len(self._specs)
            return pa.Table.from_arrays(
                arrays, names=[self._key] + [s.name for s in self._specs]
            )
        batch = batch.sort_by(self._key)
        keys = batch[self._key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kn = keys.to_numpy(zero_copy_only=False)
        change = np.flatnonzero(kn[1:] != kn[:-1]) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(kn)]]).astype(np.int64)
        blobs: list[list[bytes]] = [[] for _ in self._specs]
        for s0, e0 in zip(starts, ends):
            sub = batch.slice(int(s0), int(e0 - s0))
            for j, (proto, ex) in enumerate(zip(self._protos, self._extractors)):
                sk = proto.empty_like()
                sk.update(ex(sub))
                blobs[j].append(sk.to_bytes())
        arrays = [keys.take(pa.array(starts))]
        names = [self._key]
        for s, bl in zip(self._specs, blobs):
            arrays.append(pa.array(bl, pa.binary()))
            names.append(s.name)
        return pa.Table.from_arrays(arrays, names=names)


def _keyed_combine_level(key: str, specs: tuple[SketchSpec, ...]):
    """A keyed merge-tree level: fold a coalesced batch of (key,
    partial-blob) rows into one row PER KEY — the grouped sibling of
    :func:`_combine_level`.  ``map_batches(batch_size=fanin)`` bundles
    rows across upstream blocks, so each level divides the per-key
    partial count by ~fanin/num_keys without any all-to-all."""

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 1:
            return batch
        batch = batch.sort_by(key)
        keys = batch[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kn = keys.to_numpy(zero_copy_only=False)
        change = np.flatnonzero(kn[1:] != kn[:-1]) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(kn)]]).astype(np.int64)
        arrays = [keys.take(pa.array(starts))]
        names = [key]
        for s in specs:
            col = batch[s.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_blobs = []
            for s0, e0 in zip(starts, ends):
                acc = sketch_from_bytes(col[int(s0)].as_py())
                for i in range(int(s0) + 1, int(e0)):
                    acc.merge(sketch_from_bytes(col[i].as_py()))
                out_blobs.append(acc.to_bytes())
            arrays.append(pa.array(out_blobs, pa.binary()))
            names.append(s.name)
        return pa.Table.from_arrays(arrays, names=names)

    return combine


def build_sketches_by_key(
    ds,
    key: str,
    specs: list[SketchSpec],
    *,
    combine_fanin: int = 64,
    combine_levels: int = 2,
    via: str = "fold",
) -> dict[Any, dict[str, Any]]:
    """Per-group sketches: per-(block, key) partial blobs
    (:class:`KeyedPartialBatcher`) → keyed merge-tree → driver fold.

    ``via="fold"`` (default) runs the SAME merge-tree topology as the
    ungrouped :func:`build_sketches`: no shuffle at all — each combine
    level coalesces ~``combine_fanin`` partial rows (across blocks) and
    folds them per key, so the driver's fan-in is bounded at
    ``num_keys × ceil(num_partial_rows / fanin**levels)``.  Right for
    LOW/MODERATE key cardinality (sources, languages, shards): Ray's
    Sort-based groupby costs ~2-3 s of fixed all-to-all overhead that
    dominated these queries in round 2 (5.0 s → ~1 s here).

    ``via="shuffle"`` keeps the groupby spelling for HIGH-cardinality
    keys, where per-batch folding cannot reduce row count (every batch
    already has ~one row per key) and a hash exchange is the right
    topology.  Both paths shuffle only sketch-sized partials, never raw
    rows, so heavy-hitter keys are safe either way (the "salted
    repartition" concern of BASELINE.json reduces to block sizing).
    """
    specs = tuple(specs)
    partials = ds.map_batches(KeyedPartialBatcher(key, specs), batch_format="pyarrow")

    if via == "shuffle":

        def merge_group(g: pa.Table) -> pa.Table:
            arrays = [g[key].slice(0, 1)]
            names = [key]
            for s in specs:
                blobs = g[s.name].to_pylist()
                acc = sketch_from_bytes(blobs[0])
                for blob in blobs[1:]:
                    acc.merge(sketch_from_bytes(blob))
                arrays.append(pa.array([acc.to_bytes()], pa.binary()))
                names.append(s.name)
            return pa.Table.from_arrays(arrays, names=names)

        out = partials.groupby(key).map_groups(merge_group, batch_format="pyarrow")
        return {
            row[key]: {s.name: sketch_from_bytes(row[s.name]) for s in specs}
            for row in out.take_all()
        }

    combine = _keyed_combine_level(key, specs)
    for _ in range(max(0, combine_levels)):
        partials = partials.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_fanin
        )
    result: dict[Any, dict[str, Any]] = {}
    for row in partials.take_all():
        bucket = result.setdefault(row[key], {})
        for s in specs:
            sk = sketch_from_bytes(row[s.name])
            if s.name in bucket:
                bucket[s.name].merge(sk)
            else:
                bucket[s.name] = sk
    return result
