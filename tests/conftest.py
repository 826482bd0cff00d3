"""Shared pytest fixtures.  Ray is initialised ONCE per session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Allocator tuning (see bench.py top-of-file note): keeps pages
# resident across batches on this VM; must be set before ray.init so
# workers inherit it.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

SF_UNIT = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tokens_fixture(tmp_path_factory):
    """Deterministic (doc_id, tokens, n_tok, source) parquet + oracles."""
    from parallel_count_min_sketch_ray.sources.fixture import generate_tokens_table

    out = tmp_path_factory.mktemp("fixture")
    return generate_tokens_table(str(out), num_rows=2000, seed=42)
