"""Tests: salted grouped builds, token-balanced repartition, multimodal
stages, reference text-format round trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parallel_count_min_sketch_ray.pipelines.sketch_build import (
    SketchSpec,
    build_sketches_by_key,
)
from parallel_count_min_sketch_ray.state.cms import CountMinSketch


def test_salted_grouped_equals_unsalted(ray_session, tokens_fixture):
    """Salting cannot change grouped-sketch results (merge associativity)."""
    import ray.data

    from parallel_count_min_sketch_ray.stages.partitioning import (
        build_sketches_by_key_salted,
    )

    ds = ray.data.read_parquet(tokens_fixture["paths"])
    specs = [SketchSpec("cms", CountMinSketch(eps=0.01, seed=42), "tokens")]
    plain = build_sketches_by_key(ds, "source", specs)
    salted = build_sketches_by_key_salted(
        ds, "source", specs, salt_col="doc_id", num_salts=4
    )
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k]["cms"] == salted[k]["cms"], k


def test_repartition_by_tokens_balances_work(ray_session, tokens_fixture):
    import ray.data

    from parallel_count_min_sketch_ray.stages.partitioning import (
        repartition_by_tokens,
    )

    ds = ray.data.read_parquet(tokens_fixture["paths"])
    out = repartition_by_tokens(ds, target_tokens=10_000)
    # row content preserved exactly
    total = out.map_batches(
        lambda t: pa.table(
            {"n": [int(pa.compute.sum(pa.compute.list_value_length(t["tokens"])).as_py() or 0)]}
        ),
        batch_format="pyarrow",
    ).to_pandas()["n"].sum()
    assert int(total) == tokens_fixture["total_tokens"]


def test_multimodal_decode_stage(ray_session):
    import ray.data

    from parallel_count_min_sketch_ray.pipelines.multimodal import (
        ImageDecodeStage,
        decode_pipeline,
        frame_sample_pipeline,
        synthesize_media_table,
    )

    media = synthesize_media_table(64, seed=3)
    ds = ray.data.from_arrow([media.slice(i, 16) for i in range(0, 64, 16)])
    out = decode_pipeline(ds, batch_size=16, concurrency=2).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {"media_id", "pixel_mean", "pixel_std", "embedding"}
    assert all(len(e) == 64 for e in out["embedding"])
    # deterministic: same payload -> same stats
    out2 = decode_pipeline(
        ray.data.from_arrow([media.slice(i, 16) for i in range(0, 64, 16)]),
        batch_size=16,
    ).to_pandas()
    assert np.allclose(
        out.sort_values("media_id")["pixel_mean"].to_numpy(),
        out2.sort_values("media_id")["pixel_mean"].to_numpy(),
    )

    frames = frame_sample_pipeline(ds, frames_per_video=4).to_pandas()
    assert (frames.groupby("media_id").size() <= 4).all()
    assert frames["frame_hash"].ge(0).all()

    # strict mode is the honest no-codec posture
    stage = ImageDecodeStage(strict=True)
    with pytest.raises(NotImplementedError):
        stage(media.slice(0, 2))


def test_reference_text_format_roundtrip(ray_session, tmp_path):
    from parallel_count_min_sketch_ray.sources.text import (
        load_count,
        read_uint32_stream,
        write_uint32_stream,
    )
    from parallel_count_min_sketch_ray.sources.fixture import mixture_tokens

    rng = np.random.default_rng(9)
    items = mixture_tokens(5000, rng)
    p = tmp_path / "dataset_5000.txt"
    write_uint32_stream(items, str(p))
    ds = read_uint32_stream([str(p)])
    got = np.sort(ds.to_pandas()["item"].to_numpy())
    assert np.array_equal(got, np.sort(items.astype(np.int64)))

    # ground-truth file ('val count' lines, load_count parity)
    vals, counts = np.unique(items, return_counts=True)
    gt = tmp_path / "total_dataset_5000.txt"
    with open(gt, "w") as f:
        for v, c in zip(vals, counts):
            f.write(f"{v} {c}\n")
    t = load_count(str(gt))
    assert np.array_equal(t["val"].to_numpy(), vals.astype(np.int64))
    assert np.array_equal(t["count"].to_numpy(), counts.astype(np.int64))

    # end-to-end: sketch the .txt stream exactly like the reference
    from parallel_count_min_sketch_ray.pipelines.sketch_build import build_sketch

    sk, _ = build_sketch(ds, CountMinSketch(eps=0.01, seed=7), "item", kind="numeric")
    assert sk.total == 5000
    truth = dict(zip(vals.tolist(), counts.tolist()))
    for v in (123, 456):
        assert sk.query_one(v) >= truth.get(v, 0)


def test_write_partitioned_resumable(ray_session, tmp_path):
    from parallel_count_min_sketch_ray.pipelines.io import (
        completed_partitions,
        write_partitioned,
    )

    out = str(tmp_path / "out")

    def produce(pid: str) -> pa.Table:
        n = int(pid) + 1
        return pa.table({"pid": [pid] * n, "x": list(range(n))})

    pids = [str(i) for i in range(6)]
    r1 = write_partitioned(pids[:3], produce, out)
    assert r1["written"] == 3 and r1["skipped"] == 0
    assert completed_partitions(out) == {"0", "1", "2"}
    # resume: only the remaining partitions are produced
    r2 = write_partitioned(pids, produce, out)
    assert r2["written"] == 3 and r2["skipped"] == 3
    import ray.data

    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == sum(range(1, 7))


def test_token_bounded_slices_respect_budget(tokens_fixture):
    """Each slice stays within target_tokens (+ at most its last row)."""
    from parallel_count_min_sketch_ray.stages.partitioning import (
        token_bounded_slices,
    )

    batch = pq.read_table(tokens_fixture["paths"][0])
    target = 5000
    total = 0
    for sl in token_bounded_slices(batch, target_tokens=target):
        ntok = int(pa.compute.sum(pa.compute.list_value_length(sl["tokens"])).as_py())
        last_row = int(pa.compute.list_value_length(sl["tokens"])[-1].as_py())
        assert ntok <= target + last_row
        assert sl.num_rows >= 1
        total += ntok
    whole = int(pa.compute.sum(pa.compute.list_value_length(batch["tokens"])).as_py())
    assert total == whole


def test_plan_partitions_distinct_for_same_basename(tmp_path):
    """Same-named files in different dirs must not collide (checkpoint
    ids are content-addressed by full path)."""
    from parallel_count_min_sketch_ray.state.checkpoint import plan_partitions
    from parallel_count_min_sketch_ray.sources.fixture import build_tokens_table

    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(build_tokens_table(50, seed=1), str(d / "data.parquet"))
    parts = plan_partitions(
        [str(tmp_path / "a" / "data.parquet"), str(tmp_path / "b" / "data.parquet")]
    )
    assert len(parts) == 2
    assert len({p["partition_id"] for p in parts}) == 2


def test_multimodal_resize_stage(ray_session):
    """Resize plumbing: binary in -> fixed-size binary out, metadata
    rewritten; strict mode raises the honest no-codec error."""
    import ray.data

    from parallel_count_min_sketch_ray.pipelines.multimodal import (
        ResizeStage,
        resize_pipeline,
        synthesize_media_table,
    )

    media = ray.data.from_arrow(synthesize_media_table(32, seed=1))
    out = resize_pipeline(media, out_w=16, out_h=16, batch_size=8).take_all()
    assert len(out) == 32
    assert all(len(r["payload"]) == 16 * 16 for r in out)
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
    # deterministic: same seed -> same thumbnails
    out2 = resize_pipeline(
        ray.data.from_arrow(synthesize_media_table(32, seed=1)),
        out_w=16, out_h=16, batch_size=8,
    ).take_all()
    assert [r["payload"] for r in sorted(out, key=lambda r: r["media_id"])] == [
        r["payload"] for r in sorted(out2, key=lambda r: r["media_id"])
    ]
    with pytest.raises(NotImplementedError, match="resize requires"):
        ResizeStage(strict=True)._resize(b"xx", 2, 1)


def test_multimodal_audio_windows(ray_session):
    from parallel_count_min_sketch_ray.pipelines.multimodal import (
        audio_window_pipeline,
        synthesize_media_table,
    )
    import ray.data

    media = ray.data.from_arrow(synthesize_media_table(16, seed=2))
    rows = audio_window_pipeline(media, window_bytes=512, batch_size=8).take_all()
    assert len(rows) > 16  # exploded: multiple windows per clip
    assert all(r["rms"] >= 0.0 and r["peak"] >= r["rms"] for r in rows)


def test_corpus_write_lineage_resumes(ray_session, tmp_path):
    from parallel_count_min_sketch_ray.pipelines.io import corpus_write_lineage

    out_root = str(tmp_path / "writes")
    first = corpus_write_lineage("/root/testdata/sf0.001", out_root=out_root)
    assert first["rows"].sum() > 0 and (first["bytes"] > 0).all()
    again = corpus_write_lineage("/root/testdata/sf0.001", out_root=out_root)
    assert first.equals(again)  # rerun skips completed partitions


def test_grouped_fold_equals_shuffle(ray_session, tokens_fixture):
    """The no-shuffle keyed merge tree (via='fold') and the groupby
    spelling (via='shuffle') produce identical per-key sketches for
    order-invariant merges (CMS adds, HLL maxes), and identical counts
    for KLL."""
    import ray.data

    from parallel_count_min_sketch_ray.state.hll import HyperLogLog
    from parallel_count_min_sketch_ray.state.kll import KLLSketch

    ds = ray.data.read_parquet(tokens_fixture["paths"])
    specs = [
        SketchSpec("cms", CountMinSketch(eps=0.01, seed=42), "tokens"),
        SketchSpec("hll", HyperLogLog(p=12, seed=42), "tokens"),
        SketchSpec("kll", KLLSketch(k=200, seed=42), "n_tok"),
    ]
    fold = build_sketches_by_key(ds, "source", specs, combine_fanin=8)
    shuf = build_sketches_by_key(ds, "source", specs, via="shuffle")
    assert set(fold) == set(shuf)
    for k in fold:
        assert fold[k]["cms"] == shuf[k]["cms"], k
        assert fold[k]["hll"].estimate() == shuf[k]["hll"].estimate(), k
        assert fold[k]["kll"].n == shuf[k]["kll"].n, k


def test_md5_digests_arrow_matches_pylist():
    """Buffer-sliced digests == str-roundtrip digests, for plain,
    sliced (non-zero offset), chunked, and null-bearing columns."""
    from parallel_count_min_sketch_ray.functions.textops import (
        md5_digests,
        md5_digests_arrow,
    )

    texts = ["", "a", "hello world", "émoji ✨ utf8", "x" * 10_000]
    plain = pa.array(texts, pa.string())
    assert md5_digests_arrow(plain).to_pylist() == md5_digests(texts)
    sliced = plain.slice(1, 3)
    assert md5_digests_arrow(sliced).to_pylist() == md5_digests(texts[1:4])
    chunked = pa.chunked_array([texts[:2], texts[2:]], pa.string())
    assert md5_digests_arrow(chunked).to_pylist() == md5_digests(texts)
    with_null = pa.array(["a", None, "b"], pa.string())
    assert md5_digests_arrow(with_null).to_pylist() == md5_digests(["a", "", "b"])
    empty = pa.array([], pa.string())
    assert md5_digests_arrow(empty).to_pylist() == []
    large = pa.array(texts, pa.large_string())
    assert md5_digests_arrow(large).to_pylist() == md5_digests(texts)
    assert md5_digests_arrow(large.slice(2, 2)).to_pylist() == md5_digests(texts[2:4])


def test_corpus_write_invalidates_on_input_change(ray_session, tmp_path):
    """Regenerating documents.parquet in place must NOT serve stale
    partition lineage from the skip-completed path (the checkpoint
    manifest's stale-reuse guard, applied to partitioned output)."""
    import shutil as _sh

    import pyarrow.parquet as _pq

    from parallel_count_min_sketch_ray.pipelines.io import corpus_write_lineage

    sf = tmp_path / "sf"
    sf.mkdir()
    _sh.copy("/root/testdata/sf0.001/documents.parquet", sf / "documents.parquet")
    out_root = str(tmp_path / "writes")
    first = corpus_write_lineage(str(sf), out_root=out_root)

    # regenerate the input IN PLACE: keep only the first half of rows
    t = _pq.read_table(sf / "documents.parquet")
    _pq.write_table(t.slice(0, t.num_rows // 2), sf / "documents.parquet")

    second = corpus_write_lineage(str(sf), out_root=out_root)
    assert second["rows"].sum() == t.num_rows // 2  # rebuilt, not stale
    assert first["rows"].sum() == t.num_rows
    # unchanged input -> rerun skips and returns identical lineage
    third = corpus_write_lineage(str(sf), out_root=out_root)
    assert second.equals(third)


def test_image_decode_codec_plugpoint(ray_session, monkeypatch):
    """A real decoder injected through the plug-point yields REAL pixel
    stats (not the fake hash-pixels), via both the auto-resolve path
    (direct call) and fn_constructor_kwargs (through Ray actors)."""
    import numpy as np
    import ray.data

    from parallel_count_min_sketch_ray.pipelines import multimodal as mm

    def _tiny_codec(payload: bytes, width: int, height: int):
        # a 'real' codec: payload IS a raw uint8 row-major pixel grid
        # (closure, so cloudpickle ships it by VALUE to Ray workers)
        import numpy as _np

        # skip the 4-byte magic header (what a real codec does and
        # the fake byte-tiling decoder does not)
        body = _np.frombuffer(payload, dtype=_np.uint8)[4 : 4 + width * height]
        return body.reshape(height, width)

    # a 4x4 'image' whose pixels we control exactly
    grid = np.arange(16, dtype=np.uint8).reshape(4, 4)
    table = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([b"IMG!" + grid.tobytes()], pa.binary()),
            "mime": pa.array(["image/raw"]),
            "width": pa.array([4], pa.int32()),
            "height": pa.array([4], pa.int32()),
            "n_frames": pa.array([1], pa.int32()),
        }
    )
    # 1) auto-resolution path: monkeypatch the resolver (same process)
    monkeypatch.setattr(mm, "resolve_image_codec", lambda: _tiny_codec)
    stage = mm.ImageDecodeStage(out_size=4)
    out = stage(table)
    assert out["pixel_mean"][0].as_py() == pytest.approx(float(grid.mean()))
    assert out["pixel_std"][0].as_py() == pytest.approx(float(grid.std()))
    monkeypatch.undo()

    # 2) through Ray actors: decoder ships via fn_constructor_kwargs
    ds = ray.data.from_arrow(table)
    out2 = mm.decode_pipeline(
        ds, batch_size=1, concurrency=1, decoder=_tiny_codec
    ).to_pandas()
    direct = mm.ImageDecodeStage(decoder=_tiny_codec)(table)
    assert out2["pixel_mean"][0] == pytest.approx(direct["pixel_mean"][0].as_py())
    assert out2["pixel_std"][0] == pytest.approx(direct["pixel_std"][0].as_py())

    # 3) default (no codec in this container): fake decoder, NOT the
    # real pixel stats — proves the plug-point changes the kernel only
    fake = mm.ImageDecodeStage(out_size=4)(table)
    assert fake["pixel_mean"][0].as_py() != out["pixel_mean"][0].as_py()

    # 4) strict with no codec raises
    with pytest.raises(NotImplementedError):
        mm.ImageDecodeStage(out_size=4, strict=True)(table)


def test_range_partitioned_write_invariants(ray_session, tmp_path):
    """Sketch-derived range partitioner: global order across parts,
    balanced mass, internally sorted files, idempotent rerun."""
    import glob

    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.io import range_partitioned_write

    out_root = str(tmp_path / "range-write")
    df = range_partitioned_write("/root/testdata/sf0.001", out_root=out_root,
                                 num_parts=8)
    import duckdb

    n = duckdb.sql(
        "SELECT COUNT(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert df["rows"].sum() == n
    vmin, vmax = df["value_min"].to_numpy(), df["value_max"].to_numpy()
    assert (vmax[:-1] < vmin[1:]).all()  # ranges strictly ordered
    assert df["rows"].max() <= 2.0 * df["rows"].mean()  # digest-balanced
    files = sorted(glob.glob(f"{out_root}/*/part=*/*.parquet"))
    assert len(files) == len(df)
    v = pq_.read_table(files[0])["value"].to_numpy()
    assert (np.diff(v) >= 0).all()  # local sort
    again = range_partitioned_write("/root/testdata/sf0.001", out_root=out_root,
                                    num_parts=8)
    assert df.equals(again)


def test_quality_model_scores_actor_pool_deterministic(ray_session):
    """Actor-pool inference: distributed scores are bit-identical to a
    single-process recompute (seeded weights, no call-time RNG), and
    the pool path (concurrency tuple -> actors) actually runs."""
    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.textpipe import (
        QualityModelStage,
        quality_model_scores,
    )

    sf = "/root/testdata/sf0.001"
    df = (
        quality_model_scores(sf, concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert ((df.model_score > 0) & (df.model_score < 1)).all()
    t = pq_.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    local = (
        QualityModelStage()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert np.array_equal(df.model_score.to_numpy(), local.model_score.to_numpy())
    # different seed -> different model
    other = QualityModelStage(seed=7)(t).to_pandas()
    assert not np.array_equal(
        df.model_score.to_numpy(),
        other.sort_values("doc_id").model_score.to_numpy(),
    )


def test_embedding_clusters_distributed_equals_local(ray_session):
    """K-means cluster profile: distributed partial-reduction equals a
    local recompute (same seeded centroids), all vectors covered."""
    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.ann import (
        _sq_dists,
        embedding_clusters,
        kmeans_centroids,
    )

    sf = "/root/testdata/sf0.001"
    df = embedding_clusters(sf, num_clusters=4)
    t = pq_.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    assert df["n"].sum() == len(mat)
    cent = kmeans_centroids(mat, 4, 42)  # n <= max_train: sample == full table
    d2 = _sq_dists(mat, cent)
    a = d2.argmin(axis=1)
    n = np.bincount(a, minlength=4)
    assert np.array_equal(df["n"].to_numpy(), n[n > 0])
    dist = np.sqrt(d2[np.arange(len(a)), a])
    expect = np.array(
        [dist[a == c].mean() for c in np.flatnonzero(n > 0)], dtype=np.float64
    )
    assert np.allclose(df["mean_dist"].to_numpy(), expect)


def test_per_source_cap_across_many_blocks(ray_session, tmp_path):
    """The local-prune step keeps K per (block, source); correctness
    requires the FINAL rank to pick the global K smallest when a
    source's rows are scattered across many blocks — force that layout
    with a multi-file documents 'table' and check vs the SQL oracle."""
    import duckdb

    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.analytics import per_source_cap

    sf = tmp_path / "sf"
    docdir = sf / "documents.parquet"
    docdir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    ids = rng.permutation(600)  # doc_ids shuffled so files interleave ranks
    for i in range(4):
        chunk = ids[i * 150 : (i + 1) * 150]
        t = pa.table(
            {
                "doc_id": pa.array(chunk, pa.int64()),
                "source": pa.array([f"s{d % 3}" for d in chunk], pa.string()),
                "text": pa.array(["x"] * len(chunk), pa.string()),
            }
        )
        pq_.write_table(t, docdir / f"part-{i}.parquet")
    got = (
        per_source_cap(str(sf), cap=5)
        .to_pandas()
        .sort_values(["source", "rnk"])
        .reset_index(drop=True)
    )
    ora = duckdb.sql(
        "SELECT doc_id, source, rnk FROM (SELECT doc_id, source, ROW_NUMBER() "
        f"OVER (PARTITION BY source ORDER BY doc_id) AS rnk FROM "
        f"read_parquet('{docdir}/*.parquet')) t WHERE rnk <= 5 "
        "ORDER BY source, rnk"
    ).df()
    assert got["doc_id"].tolist() == ora["doc_id"].tolist()
    assert got["rnk"].astype(int).tolist() == ora["rnk"].astype(int).tolist()


def test_media_near_dup_finds_planted_duplicates(ray_session):
    """The composed multimodal chain (decode actor pool → features →
    cosine pairs) must recover every planted byte-identical duplicate:
    identical payloads decode to identical pixels on any codec path."""
    from parallel_count_min_sketch_ray.pipelines.multimodal import media_near_dup

    out = media_near_dup("unused", num_rows=128, dup_fraction=0.125)
    assert int(out["n_planted"].iloc[0]) >= 1
    assert float(out["planted_recall"].iloc[0]) == 1.0
    # every planted pair is also a reported pair
    assert int(out["n_pairs"].iloc[0]) >= int(out["n_planted"].iloc[0])


def test_csv_and_json_sink_roundtrip(ray_session, tmp_path):
    """Source/sink format breadth beyond parquet: a query result
    written as CSV and JSONL reads back value-identical (the reference
    writes benchmark CSVs, mpi_benchmark.py:186-207)."""
    import ray.data

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        source_token_totals,
    )
    from tests.conftest import SF_UNIT

    res = source_token_totals(SF_UNIT)
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "jsonl")
    res.write_csv(csv_dir)
    source_token_totals(SF_UNIT).write_json(json_dir)

    base = res.to_pandas().sort_values("source").reset_index(drop=True)
    for back in (ray.data.read_csv(csv_dir), ray.data.read_json(json_dir)):
        df = back.to_pandas().sort_values("source").reset_index(drop=True)
        assert list(df["source"]) == list(base["source"])
        assert list(df["n_tokens"]) == list(base["n_tokens"])
        assert list(df["n_docs"]) == list(base["n_docs"])


def test_broadcast_sketch_ref_cache_deserializes_once(ray_session):
    """state/broadcast.sketch_from_ref: same ObjectRef → same sketch
    OBJECT (no per-call from_bytes), different refs → different
    entries."""
    import ray as _ray

    from parallel_count_min_sketch_ray.state.bloom import BloomFilter
    from parallel_count_min_sketch_ray.state.broadcast import sketch_from_ref

    bf = BloomFilter(capacity=1024, fp_rate=0.01, seed=3)
    import numpy as np

    bf.update(np.arange(100, dtype=np.int64))
    ref1 = _ray.put(bf.to_bytes())
    ref2 = _ray.put(bf.to_bytes())
    a, b = sketch_from_ref(ref1), sketch_from_ref(ref1)
    assert a is b  # cached instance, not a fresh deserialize
    c = sketch_from_ref(ref2)
    assert c is not a
    assert c.contains(np.array([5], dtype=np.int64)).all()


def test_scan_spool_dirs_registered_for_cleanup(ray_session):
    """Every spool the scan creates is queued for atexit removal."""
    import pandas as pd

    import ray.data

    from parallel_count_min_sketch_ray.stages import scan as scan_mod

    before = len(scan_mod._SPOOL_DIRS)
    df = pd.DataFrame({"part": ["a", "b"], "order": [0, 1], "val": [1, 2]})
    out = scan_mod.keyed_prefix_sum(
        ray.data.from_pandas(df), "part", "order", "val", "cum"
    ).to_pandas()
    assert len(out) == 2
    assert len(scan_mod._SPOOL_DIRS) == before + 1
    import os

    assert os.path.isdir(scan_mod._SPOOL_DIRS[-1])


def test_broadcast_cache_lru_eviction_and_reserve(ray_session):
    """Past capacity the cache evicts the single LEAST-RECENTLY-USED
    ref — a hit refreshes recency, so a hot working set stays resident
    (a full clear, or FIFO under cyclic access, would re-pay from_bytes
    per batch); reserve(n) raises capacity for stages that cycle over
    a known ref set (the sharded-Bloom prefilter)."""
    import ray as _ray

    from parallel_count_min_sketch_ray.state import broadcast as bc
    from parallel_count_min_sketch_ray.state.hll import HyperLogLog

    bc._REF_CACHE.clear()
    cap = bc._capacity
    refs = []
    for i in range(cap + 1):
        h = HyperLogLog(p=10, seed=i)
        h.update(np.arange(10))
        refs.append(_ray.put(h.to_bytes()))
    for r in refs[:cap]:
        bc.sketch_from_ref(r)
    bc.sketch_from_ref(refs[0])  # hit: refs[0] becomes most-recent
    bc.sketch_from_ref(refs[cap])  # insert past capacity
    assert len(bc._REF_CACHE) == cap
    assert refs[1].hex() not in bc._REF_CACHE  # LRU evicted
    assert refs[0].hex() in bc._REF_CACHE  # refreshed entry survives
    assert refs[-1].hex() in bc._REF_CACHE
    # reserve: cyclic access over reserved-size set never misses
    bc._REF_CACHE.clear()
    bc.reserve(cap + 4)
    try:
        for r in refs:
            bc.sketch_from_ref(r)
        held = [bc.sketch_from_ref(r) for r in refs]
        for r, sk in zip(refs, held):
            assert bc.sketch_from_ref(r) is sk  # no re-deserialize
    finally:
        bc._capacity = cap
        bc._REF_CACHE.clear()


def test_scan_spool_cap_evicts_oldest(ray_session, monkeypatch, tmp_path):
    """Beyond GRAFT_SCAN_SPOOL_KEEP live spools the oldest directory is
    deleted (with a warning) so long-lived processes stay disk-bounded."""
    import os
    import warnings as _warnings

    from parallel_count_min_sketch_ray.stages import scan as scan_mod

    monkeypatch.setattr(scan_mod, "_SPOOL_KEEP", 2)
    dirs = []
    for i in range(3):
        d = tmp_path / f"spool{i}"
        d.mkdir()
        dirs.append(str(d))
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        for d in dirs:
            scan_mod._register_spool(d)
    assert not os.path.exists(dirs[0])  # oldest deleted
    assert os.path.exists(dirs[1]) and os.path.exists(dirs[2])
    assert any("spool cap" in str(x.message) for x in w)
    for d in dirs[1:]:
        scan_mod._SPOOL_DIRS.remove(d)


def test_scan_spool_falls_back_to_pin_on_multinode(ray_session, monkeypatch):
    """With >1 alive Ray node and no shared spool dir, the spool path
    must not write to driver-local /tmp (invisible to other nodes) —
    it reroutes to via='pin' and still returns exact sums."""
    import ray as _ray
    import ray.data as _rd

    from parallel_count_min_sketch_ray.stages import scan as scan_mod

    monkeypatch.setattr(
        scan_mod.ray, "nodes",
        lambda: [{"Alive": True}, {"Alive": True}],
    )
    made_spools = len(scan_mod._SPOOL_DIRS)
    ds = _rd.from_items(
        [{"k": i % 3, "o": i, "v": i} for i in range(30)]
    )
    out = scan_mod.keyed_prefix_sum(ds, "k", "o", "v", "cum").to_pandas()
    assert len(scan_mod._SPOOL_DIRS) == made_spools  # no spool written
    expect = out.sort_values(["k", "o"]).groupby("k")["v"].cumsum()
    assert (out.sort_values(["k", "o"])["cum"].to_numpy()
            == expect.to_numpy()).all()


def test_chunk_documents_edge_corpus(ray_session, tmp_path):
    """Adversarial chunking corpus vs the DuckDB oracle: empty docs,
    whitespace-only, boundary lengths around the 48-token stride and
    64-token window, multi-space runs."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.textpipe import chunk_documents

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": [
                "",                      # empty → no chunks
                " ",                     # whitespace-only → no chunks
                "solo",                  # 1 token → 1 chunk
                words(47, "a"),          # < stride
                words(48, "b"),          # == stride → 1 chunk
                words(49, "c"),          # stride+1 → 2 chunks
                words(64, "d"),          # == window → 2 chunks (tail)
                words(96, "e"),          # 2 strides
                words(97, "f"),          # 2 strides + 1
                "x  y   z",              # multi-space runs collapse
            ],
        }
    )
    p = tmp_path / "edge"
    p.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), p / "documents.parquet")

    got = (
        chunk_documents(str(p))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '),
            x -> x <> '') AS ws FROM read_parquet('{p}/documents.parquet')),
            st AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 48)) AS start
                   FROM ws)
            SELECT doc_id, CAST((start - 1) / 48 AS BIGINT) AS chunk_idx,
            CAST(len(list_slice(ws, start, least(start + 63, len(ws))))
            AS BIGINT) AS n_tok,
            ws[start] AS first_token,
            ws[least(start + 63, len(ws))] AS last_token
            FROM st ORDER BY doc_id, chunk_idx"""
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # empty/whitespace docs emit nothing; the rest emit ceil(len/48)
    assert set(got["doc_id"]) == {2, 3, 4, 5, 6, 7, 8, 9}
