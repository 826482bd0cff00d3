"""End-to-end Ray Data sketch-build tests on the deterministic fixture
(SURVEY.md §5 'End-to-end Ray tests')."""

from __future__ import annotations

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.kll import KLLSketch
from parallel_count_min_sketch_ray.state.bloom import BloomFilter
from parallel_count_min_sketch_ray.pipelines.sketch_build import (
    SketchSpec,
    build_sketch,
    build_sketch_via_aggregate,
    build_sketches,
    build_sketches_by_key,
)


@pytest.fixture(scope="module")
def fixture_ds(ray_session, tokens_fixture):
    import ray.data

    return ray.data.read_parquet(tokens_fixture["paths"]), tokens_fixture


def test_fixture_determinism(tokens_fixture):
    """Same seed => byte-identical tokens (per-row invariant, input_hint)."""
    from parallel_count_min_sketch_ray.sources.fixture import build_tokens_table

    again = build_tokens_table(tokens_fixture["num_rows"], seed=tokens_fixture["seed"])
    disk = pq.read_table(tokens_fixture["paths"][0])
    first = again.slice(0, disk.num_rows)
    assert disk.equals(first)  # per-row token-array equality


def test_distributed_equals_serial(fixture_ds):
    """Distributed build == single-process build, bit-identical tables."""
    ds, fx = fixture_ds
    proto = CountMinSketch(seed=42)
    sk, report = build_sketch(ds, proto, "tokens")
    serial = proto.empty_like()
    for p in fx["paths"]:
        flat = pq.read_table(p)["tokens"].combine_chunks().flatten().to_numpy()
        serial.update(flat)
    assert sk == serial
    assert report.rows == fx["num_rows"]
    assert report.items["sketch"] == fx["total_tokens"]
    assert sk.total == fx["total_tokens"]


def test_accuracy_vs_oracle(fixture_ds):
    """test_cms_accuracy semantics over the Ray-built sketch."""
    ds, fx = fixture_ds
    sk, _ = build_sketch(ds, CountMinSketch(seed=42), "tokens")
    oracle = pq.read_table(fx["oracle_token_counts"])
    vals = oracle["token"].to_numpy()
    exact = oracle["count"].to_numpy()
    ests = sk.query(vals)
    assert (ests >= exact).all()
    assert ((ests - exact) <= sk.error_bound()).mean() >= 1 - sk.delta
    # probe parity (the reference's inline checks, src/mpi/mpiV2.c:131-140)
    probes = fx["oracle_stats"]["probe_counts"]
    assert sk.query_one(123) >= probes["123"]
    assert sk.query_one(456) >= probes["456"]
    assert sk.range_query(100, 110) >= probes["range_100_110"]


def test_aggregate_spelling_matches_map_batches(fixture_ds):
    ds, _ = fixture_ds
    proto = CountMinSketch(seed=42)
    via_agg = build_sketch_via_aggregate(ds, proto, "tokens")
    via_mb, _ = build_sketch(ds, proto, "tokens")
    assert via_agg == via_mb


def test_single_pass_multi_sketch(fixture_ds):
    """CMS + HLL + KLL + Bloom in one scan; each within its bound."""
    ds, fx = fixture_ds
    report = build_sketches(
        ds,
        [
            SketchSpec("cms", CountMinSketch(seed=42), "tokens"),
            SketchSpec("hll_tokens", HyperLogLog(p=12, seed=42), "tokens"),
            SketchSpec("kll_ntok", KLLSketch(k=200, seed=42), "n_tok"),
            SketchSpec(
                "bloom_docs",
                BloomFilter(capacity=fx["num_rows"] * 2, fp_rate=0.01, seed=42),
                "doc_id",
                kind="string_hash",
            ),
        ],
        combine_fanin=8,
        combine_levels=2,
    )
    stats = fx["oracle_stats"]
    hll = report["hll_tokens"]
    assert (
        abs(hll.estimate() - stats["distinct_tokens"])
        <= 4 * hll.relative_error() * stats["distinct_tokens"]
    )
    kll = report["kll_ntok"]
    assert kll.n == fx["num_rows"]
    for q, true_val in stats["ntok_quantiles"].items():
        est = kll.quantile(float(q))
        # rank-error bound: est's true rank within 3% of q
        ntoks = np.sort(
            np.concatenate(
                [pq.read_table(p)["n_tok"].to_numpy() for p in fx["paths"]]
            )
        )
        rank = np.searchsorted(ntoks, est, side="right") / ntoks.size
        assert abs(rank - float(q)) <= 0.03 + 1.0 / ntoks.size
    # bloom: every real doc_id present
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings

    bloom = report["bloom_docs"]
    ids = hash64_strings([f"doc-{i:08d}" for i in range(0, fx["num_rows"], 97)])
    assert bloom.contains(ids).all()
    absent = hash64_strings([f"nope-{i}" for i in range(2000)])
    assert bloom.contains(absent).mean() <= 0.02


def test_grouped_sketches_by_source(fixture_ds):
    """Per-source CMS via groupby-aggregate == per-source serial build."""
    ds, fx = fixture_ds
    proto = CountMinSketch(eps=0.01, delta=0.1, seed=42)
    grouped = build_sketches_by_key(
        ds, "source", [SketchSpec("cms", proto, "tokens")]
    )
    import pyarrow as pa

    whole = pa.concat_tables(pq.read_table(p) for p in fx["paths"])
    for source in ("web", "code", "books", "wiki"):
        mask = pa.compute.equal(whole["source"], source)
        sub = whole.filter(mask)
        serial = proto.empty_like()
        serial.update(sub["tokens"].combine_chunks().flatten().to_numpy())
        assert grouped[source]["cms"] == serial, source


def test_empty_dataset(ray_session):
    import ray.data
    from parallel_count_min_sketch_ray.sources.fixture import build_tokens_table

    empty = ray.data.from_arrow(build_tokens_table(0, seed=1))
    sk, report = build_sketch(empty, CountMinSketch(seed=1), "tokens")
    assert sk.total == 0
    assert report.rows == 0


def test_direct_build_matches_dataset_path(fixture_ds):
    """Worker-local-read build == Dataset-read build, bit-identical."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_direct,
    )

    ds, fx = fixture_ds
    proto = CountMinSketch(seed=42)
    via_ds, _ = build_sketch(ds, proto, "tokens")
    rep = build_sketches_direct(
        fx["paths"],
        [SketchSpec("cms", proto, "tokens")],
        rows_per_partition=300,
    )
    assert rep["cms"] == via_ds
    assert rep.rows == fx["num_rows"]


def test_weighted_build_from_counts_equals_stream_build(ray_session):
    """Building a CMS from the aggregated (token, count) table with
    weighted updates must be bit-identical to building it from the raw
    token stream — integer bincount weights are exact and the hash
    family is shared (the 'pre-aggregated ingest' path a pipeline uses
    when the vocabulary table already exists)."""
    from parallel_count_min_sketch_ray.functions.hashing import djb2_array
    from parallel_count_min_sketch_ray.pipelines.analytics import token_counts
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import build_all
    from parallel_count_min_sketch_ray.state.cms import CountMinSketch

    sf = "/root/testdata/sf0.001"
    stream_cms = build_all(sf)["cms"]
    vocab = token_counts(sf).to_pandas()
    ids = (
        djb2_array(vocab["token"].tolist()) & np.uint64(0x7FFFFFFF)
    ).astype(np.int64)
    weighted = CountMinSketch(eps=0.001, delta=0.1, seed=42)
    weighted.update(ids, vocab["cnt"].to_numpy())
    assert weighted == stream_cms


def test_driver_contract_from_foreign_cwd(tmp_path):
    """The driver may init Ray from any cwd: package code must reach
    workers pickled by value — a runtime by-name import inside a worker
    path breaks exactly here (regression test for the cms._indices
    deferred-import bug)."""
    import subprocess
    import sys

    script = tmp_path / "driver.py"
    script.write_text(
        "import ray\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False,\n"
        "         logging_level='ERROR')\n"
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import __ray_entry__ as e\n"
        "out = e.queries()['cms_word_estimates']('/root/testdata/sf0.001')\n"
        "assert len(out) == 10\n"
        "print('FOREIGN-CWD-OK')\n"
        "ray.shutdown()\n"
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=240,
        env={k: v for k, v in __import__("os").environ.items()
             if k not in ("PYTHONPATH", "RAY_ADDRESS")},
    )
    assert "FOREIGN-CWD-OK" in proc.stdout, proc.stderr[-2000:]


def test_job_cli_entrypoint(tmp_path):
    """The ``ray job submit`` surface: ``python -m
    parallel_count_min_sketch_ray <query>`` owns its OWN Ray session in
    a subprocess, writes parquet, and prints one machine-parseable JSON
    line — both for a small pandas result and for a Dataset result
    (streamed via write_parquet)."""
    import json
    import os
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    from tests.conftest import SF_UNIT

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # standalone: the CLI starts local Ray
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo

    out_small = str(tmp_path / "tt")
    r = subprocess.run(
        [sys.executable, "-m", "parallel_count_min_sketch_ray",
         "token_totals", "--sf-dir", SF_UNIT, "--output", out_small],
        env=env, capture_output=True, text=True, check=True, cwd=repo,
    )
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["rows"] == 1
    got = pd.read_parquet(rec["output"])
    want = duckdb.sql(
        "SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM "
        f"read_parquet('{SF_UNIT}/documents.parquet')"
    ).fetchone()[0]
    assert int(got["total_tokens"].iloc[0]) == int(want)

    out_ds = str(tmp_path / "cc")
    r2 = subprocess.run(
        [sys.executable, "-m", "parallel_count_min_sketch_ray",
         "clean_corpus", "--sf-dir", SF_UNIT, "--output", out_ds],
        env=env, capture_output=True, text=True, check=True, cwd=repo,
    )
    rec2 = json.loads(r2.stdout.strip().splitlines()[-1])
    files = [f for f in os.listdir(out_ds) if f.endswith(".parquet")]
    assert files, "Dataset result must stream to partitioned parquet"
    assert len(pd.read_parquet(out_ds)) == rec2["rows"] > 0
