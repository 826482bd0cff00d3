"""Distributed ordered prefix sum (the parallel scan primitive).

``keyed_prefix_sum`` computes, for every row,

    SUM(value) OVER (PARTITION BY part ORDER BY order
                     ROWS UNBOUNDED PRECEDING)

without ``map_groups`` — a partition larger than any single worker's
memory still streams.  The reference has no windowed operators at all
(SURVEY §2.4); this is the scale-shaped building block for the ones a
training-data pipeline needs (sequence packing, running totals).

Topology (two block-aligned passes over the globally sorted table):

1. ``sort([part, order])`` fixes a total order; ``materialize()`` pins
   the block boundaries so both passes see identical blocks (only the
   pruned scan columns are materialized, never payload columns).
2. Pass 1 emits **at most two rows per block**: the in-block sum of
   the block's *first* partition and of its *last* partition.  Any
   partition strictly interior to a block cannot appear in any other
   block (the table is sorted), so its cross-block offset is zero and
   it never has to be exchanged.  Driver fan-in is O(blocks),
   independent of the number of partitions.
3. The driver walks blocks in key order keeping running totals for
   edge partitions only, and derives one offset per block: the mass
   of the block's first partition in earlier blocks.  The offset map
   (≤ one entry per block) is broadcast via ``ray.put``.
4. Pass 2 computes the in-block running sum per partition (one
   ``cumsum`` with segment resets — no per-row Python) and adds the
   block's offset to rows of its first partition.

Determinism requires ``(part, order)`` to be unique per row (the
block's first key doubles as its identity across the two passes);
callers use natural keys (``doc_id``, ``event_id``).  Integer values
sum exactly in any association; float values would make the
offset+local association observable and are rejected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _first_scalar(col):
    v = col[0].as_py()
    return v


def _block_edge_sums(part_col: str, order_col: str, value_col: str):
    def summarize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = {
            "blk_part": pa.array([], pa.string()),
            "blk_order": pa.array([], pa.int64()),
            "part": pa.array([], pa.string()),
            "edge_sum": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        parts = batch[part_col]
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        first_part = _first_scalar(parts)
        last_part = parts[n - 1].as_py()
        blk_order = int(batch[order_col][0].as_py())
        # sorted block: rows of the first/last partition are contiguous
        # prefixes/suffixes — find the boundaries without a group-by.
        np_parts = parts.to_numpy(zero_copy_only=False)
        first_len = int(np.searchsorted(np_parts, first_part, side="right"))
        rows = {
            "blk_part": [str(first_part)],
            "blk_order": [blk_order],
            "part": [str(first_part)],
            "edge_sum": [int(vals[:first_len].sum())],
        }
        if last_part != first_part:
            last_start = int(np.searchsorted(np_parts, last_part, side="left"))
            rows["blk_part"].append(str(first_part))
            rows["blk_order"].append(blk_order)
            rows["part"].append(str(last_part))
            rows["edge_sum"].append(int(vals[last_start:].sum()))
        return pa.table(
            {
                "blk_part": pa.array(rows["blk_part"], pa.string()),
                "blk_order": pa.array(rows["blk_order"], pa.int64()),
                "part": pa.array(rows["part"], pa.string()),
                "edge_sum": pa.array(rows["edge_sum"], pa.int64()),
            }
        )

    return summarize


def _block_offsets(edge_rows: list[dict]) -> dict[tuple, int]:
    """Walk blocks in key order; offset of a block = running total of
    its first partition so far.  Running state holds edge partitions
    only (≤ 2 per block)."""
    by_block: dict[tuple, list[dict]] = {}
    for r in edge_rows:
        by_block.setdefault((r["blk_part"], r["blk_order"]), []).append(r)
    running: dict[str, int] = {}
    offsets: dict[tuple, int] = {}
    for key in sorted(by_block):
        rows = by_block[key]
        first_part = key[0]
        off = running.get(first_part, 0)
        if off:
            offsets[key] = off
        for r in rows:
            running[r["part"]] = running.get(r["part"], 0) + r["edge_sum"]
    return offsets


def keyed_prefix_sum(
    ds: "ray.data.Dataset",
    part_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
) -> "ray.data.Dataset":
    """Inclusive per-partition running sum of an int64 column, ordered
    by ``order_col``; returns the sorted table plus ``out_col``."""
    sorted_ds = ds.sort([part_col, order_col]).materialize()

    edges = sorted_ds.map_batches(
        _block_edge_sums(part_col, order_col, value_col),
        batch_size=None,
        batch_format="pyarrow",
    ).take_all()  # ≤ 2 rows per block
    offsets_ref = ray.put(_block_offsets(edges))

    def add_cum(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        parts = batch[part_col]
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        np_parts = parts.to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(vals)
        # reset at partition boundaries: subtract the cumulative total
        # reached just before each segment start
        seg_start = np.flatnonzero(
            np.concatenate(([True], np_parts[1:] != np_parts[:-1]))
        )
        seg_lens = np.diff(np.concatenate((seg_start, [len(cum)])))
        seg_base = np.concatenate(([0], cum[seg_start[1:] - 1]))
        cum = cum - np.repeat(seg_base, seg_lens)
        offsets = ray.get(offsets_ref)
        key = (str(np_parts[0]), int(batch[order_col][0].as_py()))
        off = offsets.get(key, 0)
        if off:
            first_len = int(
                np.searchsorted(np_parts, np_parts[0], side="right")
            )
            cum[:first_len] += off
        return batch.append_column(out_col, pa.array(cum, pa.int64()))

    return sorted_ds.map_batches(
        add_cum, batch_size=None, batch_format="pyarrow"
    )
