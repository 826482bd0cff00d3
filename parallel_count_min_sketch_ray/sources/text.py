"""Reader for the reference's native input format: newline-delimited
ASCII uint32 items, one per line (``/root/reference/data/dataset_*.txt``;
parsing at ``src/mpi/mpiV2.c:117-121``, serial ``cms_linear.c:33-36``).

Ray Data's ``read_text`` already does the byte-range + newline
re-alignment that mpiV2 hand-rolls with MPI-I/O (``mpiV2.c:39-83``) —
the platform provides operator #26 of SURVEY.md §2.3.  This module adds
the parse step and the ground-truth (``val count`` pairs) loader
(``load_count``, ``src/core/count_min_sketch.c:186-202``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def read_uint32_stream(paths):
    """.txt item stream -> Dataset[{item: int64}] (vectorized parse)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        vals = batch["text"].cast(pa.int64())
        return pa.table({"item": vals})

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def load_count(path: str) -> pa.Table:
    """Ground-truth 'val count' pairs -> (val:int64, count:int64)."""
    vals = np.loadtxt(path, dtype=np.int64, ndmin=2)
    if vals.size == 0:
        return pa.table({"val": pa.array([], pa.int64()), "count": pa.array([], pa.int64())})
    return pa.table({"val": vals[:, 0], "count": vals[:, 1]})


def write_uint32_stream(items: np.ndarray, path: str) -> None:
    """Write the reference text format (for round-trip tests)."""
    np.savetxt(path, np.asarray(items, dtype=np.int64), fmt="%d")
