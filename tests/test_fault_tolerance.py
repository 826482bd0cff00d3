"""Fault tolerance: a map task that crashes once is retried by Ray and
the final sketch is exactly the no-failure result (the partial-sketch
pipeline is pure task outputs — retries cannot double count).

The reference had no story here (any failure → MPI_Abort,
src/mpi/mpiV1.c:21); this is the Ray-platform win SURVEY.md §4 claims,
so it must be demonstrated, not assumed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.stages.udaf import (
    combine_partials,
    merge_partial_rows,
)


def test_retry_does_not_double_count(ray_session, tokens_fixture, tmp_path):
    import ray.data

    marker = str(tmp_path / "crashed-once")
    proto = CountMinSketch(seed=42)

    # defined inside the test so cloudpickle ships it BY VALUE to
    # workers (test modules are not importable there)
    from parallel_count_min_sketch_ray.functions.extract import flatten_tokens
    from parallel_count_min_sketch_ray.stages.udaf import PARTIAL_SCHEMA

    def flaky_partial(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            # claim the crash slot atomically, then die like a REAL fault
            # (worker process death — Ray retries system failures by
            # default; user exceptions would surface instead)
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
        sk = proto.empty_like()
        vals = flatten_tokens(batch)
        sk.update(vals)
        return pa.Table.from_arrays(
            [
                pa.array([sk.to_bytes()], pa.binary()),
                pa.array([batch.num_rows], pa.int64()),
                pa.array([int(np.asarray(vals).size)], pa.int64()),
            ],
            schema=PARTIAL_SCHEMA,
        )

    ds = ray.data.read_parquet(tokens_fixture["paths"])
    partials = ds.map_batches(flaky_partial, batch_format="pyarrow").map_batches(
        combine_partials, batch_format="pyarrow", batch_size=64
    )
    rows = partials.take_all()
    sk, n_rows, n_items = merge_partial_rows(rows)

    assert os.path.exists(marker), "fault was never injected"
    serial = proto.empty_like()
    for p in tokens_fixture["paths"]:
        serial.update(pq.read_table(p)["tokens"].combine_chunks().flatten().to_numpy())
    assert sk == serial  # bit-identical despite the injected crash
    assert n_rows == tokens_fixture["num_rows"]
    assert n_items == tokens_fixture["total_tokens"]


def test_scan_pass2_retry_is_pure(ray_session, tmp_path):
    """keyed_prefix_sum pass 2 is a pure function of (materialized
    block, broadcast offsets): a worker that dies once mid-pass is
    retried by Ray and the running sums come out identical to the
    no-failure run."""
    import pandas as pd

    import ray.data

    from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame(
        {
            "part": [f"p{int(x)}" for x in rng.integers(0, 9, n)],
            "order": np.arange(n, dtype=np.int64),
            "val": rng.integers(-20, 40, n).astype(np.int64),
        }
    )
    clean = (
        keyed_prefix_sum(
            ray.data.from_pandas(df).repartition(12), "part", "order", "val"
        )
        .to_pandas()
        .sort_values(["part", "order"])
        .reset_index(drop=True)
    )

    marker = str(tmp_path / "scan-crashed-once")

    def crash_once(batch: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
        return batch

    faulty = (
        keyed_prefix_sum(
            ray.data.from_pandas(df).repartition(12), "part", "order", "val"
        )
        .map_batches(crash_once, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["part", "order"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(clean, faulty)
