"""Checkpoint/resume tests: kill after k partitions, resume, bit-identical
final sketch (SURVEY.md §5 / north_rule resumability contract)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from parallel_count_min_sketch_ray.pipelines.sketch_build import SketchSpec
from parallel_count_min_sketch_ray.state.checkpoint import (
    CheckpointStore,
    build_sketches_checkpointed,
    plan_partitions,
)
from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog


@pytest.fixture()
def specs():
    return [
        SketchSpec("cms", CountMinSketch(seed=42), "tokens"),
        SketchSpec("hll", HyperLogLog(p=12, seed=42), "tokens"),
    ]


def test_plan_partitions_deterministic(tokens_fixture):
    p1 = plan_partitions(tokens_fixture["paths"], rows_per_partition=200)
    p2 = plan_partitions(tokens_fixture["paths"], rows_per_partition=200)
    assert p1 == p2
    assert sum(p["planned_rows"] for p in p1) == tokens_fixture["num_rows"]
    assert len({p["partition_id"] for p in p1}) == len(p1)  # unique ids


def test_checkpointed_build_matches_plain(ray_session, tokens_fixture, specs, tmp_path):
    full = build_sketches_checkpointed(
        tokens_fixture["paths"], specs, str(tmp_path / "ckpt"), rows_per_partition=300
    )
    serial = CountMinSketch(seed=42)
    for p in tokens_fixture["paths"]:
        serial.update(pq.read_table(p)["tokens"].combine_chunks().flatten().to_numpy())
    assert full["cms"] == serial
    assert full.rows == tokens_fixture["num_rows"]
    assert full.partitions_resumed == 0
    assert full.partitions_built == full.partitions_total
    assert len(full.lineage) == full.partitions_total


def test_resume_after_partial_run(ray_session, tokens_fixture, specs, tmp_path):
    """Simulate a crash: checkpoint only the first k partitions, then run
    the full build — done partitions are skipped, result is identical."""
    ckpt = str(tmp_path / "ckpt2")
    parts = plan_partitions(tokens_fixture["paths"], rows_per_partition=300)
    k = len(parts) // 2
    assert k >= 1

    # "first run" that dies after k partitions: a real run writes the
    # manifest BEFORE any partition, so the crash leaves manifest + k
    # partials (a manifest-less dir with partials is refused — see
    # test_manifestless_dir_with_partials_refused)
    from parallel_count_min_sketch_ray.state.checkpoint import (
        _BuildPartition,
        spec_fingerprint,
    )

    CheckpointStore(ckpt).check_or_write_manifest(spec_fingerprint(specs, 300))
    builder = _BuildPartition(tuple(specs), ckpt, ["tokens"])
    batch = {key: np.array([p[key] for p in parts[:k]]) for key in parts[0]}
    builder(batch)
    store = CheckpointStore(ckpt)
    assert len(store.completed()) == k

    # resumed run
    resumed = build_sketches_checkpointed(
        tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
    )
    assert resumed.partitions_resumed == k
    assert resumed.partitions_built == len(parts) - k

    # fresh run in a clean dir for comparison
    fresh = build_sketches_checkpointed(
        tokens_fixture["paths"], specs, str(tmp_path / "ckpt3"), rows_per_partition=300
    )
    assert resumed["cms"] == fresh["cms"]
    assert np.array_equal(resumed["hll"].registers, fresh["hll"].registers)
    assert resumed.rows == fresh.rows


def test_incremental_append_recomputes_only_new_fragments(
    ray_session, tokens_fixture, specs, tmp_path
):
    """Append new parquet fragments to a checkpointed corpus: the
    re-run resumes EVERY pre-existing fragment's partitions (only the
    appended files are built), and the merged sketch is bit-identical
    to a from-scratch build over the full corpus — the delta-recompute
    contract (VERDICT r4 directive #3)."""
    paths = sorted(tokens_fixture["paths"])
    assert len(paths) >= 2
    initial, appended = paths[:-1], paths[-1:]
    ckpt = str(tmp_path / "ckpt-incr")

    rep1 = build_sketches_checkpointed(
        initial, specs, ckpt, rows_per_partition=300
    )
    rep2 = build_sketches_checkpointed(
        initial + appended, specs, ckpt, rows_per_partition=300
    )
    new_parts = plan_partitions(appended, rows_per_partition=300)
    assert rep2.partitions_resumed == rep1.partitions_total
    assert rep2.partitions_built == len(new_parts)
    # only the appended fragments' partitions were built this run
    built_ids = {r["partition_id"] for r in rep2.lineage if not r["resumed"]}
    assert built_ids == {p["partition_id"] for p in new_parts}

    fresh = build_sketches_checkpointed(
        initial + appended, specs, str(tmp_path / "ckpt-fresh"),
        rows_per_partition=300,
    )
    assert rep2["cms"] == fresh["cms"]
    assert np.array_equal(rep2["hll"].registers, fresh["hll"].registers)
    assert rep2.rows == fresh.rows == tokens_fixture["num_rows"]


def test_incremental_append_driver_query(ray_session):
    """The driver-surface spelling over the real documents table."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        incremental_append_build,
    )

    out = incremental_append_build("/root/testdata/sf0.001")
    assert len(out) == 1
    r = out.iloc[0]
    assert bool(r["delta_only"])
    assert bool(r["cms_bit_identical_to_fresh"])
    assert bool(r["hll_bit_identical_to_fresh"])
    assert int(r["append_resumed"]) == int(r["initial_partitions"]) >= 1
    assert int(r["append_built"]) >= 1


def test_partial_write_is_invisible(tmp_path):
    """A .tmp file (simulated crash mid-write) is not seen as complete."""
    store = CheckpointStore(str(tmp_path / "c"))
    with open(store._ckpt("px") + ".tmp", "wb") as f:
        f.write(b"partial garbage")
    assert not store.is_done("px")
    assert store.completed() == []
    store.write("px", {"cms": b"blob"}, {"rows": 1, "items": {"cms": 1}, "wall_time": 0})
    assert store.is_done("px")
    assert store.read("px") == {"cms": b"blob"}


def test_spec_change_fails_fast_on_reused_ckpt_dir(
    ray_session, tokens_fixture, specs, tmp_path
):
    """Reusing a ckpt_dir with a changed spec (same names, different
    column/kind) must raise, not silently merge stale partials."""
    ckpt = str(tmp_path / "ckpt_fp")
    build_sketches_checkpointed(
        tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
    )
    changed = [
        SketchSpec("cms", CountMinSketch(seed=42), "n_tok"),  # column changed
        SketchSpec("hll", HyperLogLog(p=12, seed=42), "tokens"),
    ]
    with pytest.raises(ValueError, match="different .*spec"):
        build_sketches_checkpointed(
            tokens_fixture["paths"], changed, ckpt, rows_per_partition=300
        )
    # identical specs still resume cleanly
    again = build_sketches_checkpointed(
        tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
    )
    assert again.partitions_resumed == again.partitions_total


def test_lineage_records_carry_fingerprint(
    ray_session, tokens_fixture, specs, tmp_path
):
    from parallel_count_min_sketch_ray.state.checkpoint import spec_fingerprint

    ckpt = str(tmp_path / "ckpt_lin")
    rep = build_sketches_checkpointed(
        tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
    )
    fp = spec_fingerprint(specs, 300)
    store = CheckpointStore(ckpt)
    for p in store.completed():
        assert store.read_lineage(p)["spec_fingerprint"] == fp
    assert rep.partitions_total == len(store.completed())


def test_manifestless_dir_with_partials_refused(
    ray_session, tokens_fixture, specs, tmp_path
):
    """Partials without a manifest (pre-manifest build or crashed
    writer) must NOT be silently adopted under the current specs."""
    import os

    ckpt = str(tmp_path / "ckpt_orphan")
    build_sketches_checkpointed(
        tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
    )
    os.remove(os.path.join(ckpt, CheckpointStore.MANIFEST))
    with pytest.raises(ValueError, match="no[ \n]*manifest"):
        build_sketches_checkpointed(
            tokens_fixture["paths"], specs, ckpt, rows_per_partition=300
        )
