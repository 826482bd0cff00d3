"""Zero-copy extraction of sketchable values from Arrow batches.

The reference's "item stream" is the flattened concatenation of all
rows' ``tokens`` arrays (SURVEY.md §1.4); these helpers produce that
flat numpy view from a ``pyarrow.Table`` / ``pandas.DataFrame`` block
without per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parallel_count_min_sketch_ray.functions.hashing import hash64_strings


def _as_arrow_column(batch, column: str) -> pa.ChunkedArray | pa.Array:
    if isinstance(batch, pa.Table):
        return batch[column]
    # pandas block (groupby map paths) — round-trip through Arrow
    return pa.array(batch[column])


def flatten_tokens(batch, column: str = "tokens") -> np.ndarray:
    """Flat int64-view of a list<int> column, zero-copy where possible.

    ``ListArray.flatten()`` respects slice offsets, so a sliced block
    yields exactly its own rows' tokens.
    """
    col = _as_arrow_column(batch, column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    return flat.to_numpy(zero_copy_only=False)


def numeric_column(batch, column: str) -> np.ndarray:
    """Flat numpy view of a scalar numeric column."""
    col = _as_arrow_column(batch, column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def matrix_column(batch, column: str) -> np.ndarray:
    """2-D float64 (rows × dim) view of a fixed-width list<float>
    column — the embedding-matrix shape for matrix sketches
    (:mod:`..state.fd`).  Vectorized reshape off the flat child
    buffer; raises on nulls or ragged row widths (a divisibility
    check alone would silently shear rows across boundaries when
    dropped/short rows happen to keep the total divisible)."""
    col = _as_arrow_column(batch, column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    if col.null_count:
        raise ValueError(f"list column {column!r} has nulls: not a matrix")
    lens = pa.compute.list_value_length(col).to_numpy(zero_copy_only=False)
    if lens.min() != lens.max():
        raise ValueError(f"ragged list column {column!r}: not a matrix")
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, int(lens[0]))


def hashed_string_column(batch, column: str) -> np.ndarray:
    """uint64 content hashes of a string column (FNV-1a, vectorized)."""
    col = _as_arrow_column(batch, column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return hash64_strings(col.to_pylist())


def make_extractor(column: str, kind: str = "auto"):
    """Return ``fn(batch) -> np.ndarray`` for the given column.

    kind: 'list' (flatten list column), 'numeric', 'string_hash', or
    'auto' (inspect the first batch's Arrow type).
    """
    if kind == "list":
        return lambda b: flatten_tokens(b, column)
    if kind == "numeric":
        return lambda b: numeric_column(b, column)
    if kind == "string_hash":
        return lambda b: hashed_string_column(b, column)
    if kind == "matrix":
        return lambda b: matrix_column(b, column)
    if kind != "auto":
        raise ValueError(f"unknown extractor kind {kind!r}")

    def auto(batch):
        col = _as_arrow_column(batch, column)
        typ = col.type
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return flatten_tokens(batch, column)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return hashed_string_column(batch, column)
        return numeric_column(batch, column)

    return auto
