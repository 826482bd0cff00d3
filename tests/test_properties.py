"""Hypothesis property tests: the sketch-algebra invariants hold for
arbitrary streams and partitionings, not just the seeded fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.topk import TopKSketch
from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

items_strategy = st.lists(st.integers(min_value=0, max_value=1 << 31), max_size=300)


@settings(max_examples=50, deadline=None)
@given(items=items_strategy, cut=st.integers(min_value=0, max_value=300))
def test_cms_split_merge_equals_whole(items, cut):
    """sketch(A) ⊕ sketch(B) == sketch(A++B) for ANY split point."""
    cut = min(cut, len(items))
    arr = np.array(items, dtype=np.int64)
    proto = CountMinSketch(eps=0.01, delta=0.2, seed=7)
    whole = proto.empty_like()
    whole.update(arr)
    a, b = proto.empty_like(), proto.empty_like()
    a.update(arr[:cut])
    b.update(arr[cut:])
    assert a.merge(b) == whole


@settings(max_examples=50, deadline=None)
@given(items=items_strategy)
def test_cms_one_sided_for_any_stream(items):
    arr = np.array(items, dtype=np.int64)
    cms = CountMinSketch(eps=0.01, delta=0.2, seed=11)
    cms.update(arr)
    if arr.size:
        vals, counts = np.unique(arr, return_counts=True)
        assert (cms.query(vals).astype(np.int64) >= counts).all()
    assert cms.total == arr.size


@settings(max_examples=30, deadline=None)
@given(items=items_strategy)
def test_cms_serde_identity(items):
    cms = CountMinSketch(eps=0.05, delta=0.3, seed=3)
    cms.update(np.array(items, dtype=np.int64))
    assert sketch_from_bytes(cms.to_bytes()) == cms


@settings(max_examples=30, deadline=None)
@given(items=items_strategy, cut=st.integers(min_value=0, max_value=300))
def test_hll_merge_union_bit_identical(items, cut):
    cut = min(cut, len(items))
    arr = np.array(items, dtype=np.int64)
    proto = HyperLogLog(p=8, seed=5)
    whole = proto.empty_like()
    whole.update(arr)
    a, b = proto.empty_like(), proto.empty_like()
    a.update(arr[:cut])
    b.update(arr[cut:])
    a.merge(b)
    assert np.array_equal(a.registers, whole.registers)


@settings(max_examples=30, deadline=None)
@given(items=st.lists(st.integers(min_value=0, max_value=50), max_size=300),
       cut=st.integers(min_value=0, max_value=300))
def test_topk_bounds_survive_any_split(items, cut):
    """After any split+merge, every tracked estimate brackets the truth
    and the offset respects N/k."""
    import collections

    cut = min(cut, len(items))
    arr = np.array(items, dtype=np.int64)
    proto = TopKSketch(k=16)
    a, b = proto.empty_like(), proto.empty_like()
    a.update(arr[:cut])
    b.update(arr[cut:])
    a.merge(b)
    truth = collections.Counter(arr.tolist())
    assert a.n == arr.size
    for key, lo, hi in a.topk():
        assert lo <= truth[key] <= hi
    # untracked keys: true count <= offset (else MG would have kept them)
    tracked = {k for k, _, _ in a.topk()}
    for key, cnt in truth.items():
        if key not in tracked:
            assert cnt <= a.offset


# --- vectorized text kernels == their per-doc reference loops ----------

texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    ),
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy, k=st.integers(min_value=1, max_value=5))
def test_shingle_hashes_vectorized_equals_loop(texts, k):
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        shingle_hashes,
        word_shingles,
    )

    vec = shingle_hashes(texts, k)
    for t, got in zip(texts, vec):
        sh = word_shingles(t, k)
        want = np.unique(hash64_strings(sh)) if sh else np.zeros(0, np.uint64)
        assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy)
def test_simhash_vectorized_equals_loop(texts):
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
    from parallel_count_min_sketch_ray.pipelines.dedup import simhash_signatures

    got = simhash_signatures(texts)
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            assert got[i] == 0
            continue
        uniq, counts = np.unique(np.array(ws, dtype=object), return_counts=True)
        h = hash64_strings(list(uniq))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        want = np.packbits(
            (votes > 0).astype(np.uint8)[::-1], bitorder="little"
        ).view(np.uint64)[0]
        assert got[i] == want


@settings(max_examples=40, deadline=None)
@given(texts=texts_strategy, window=st.integers(min_value=1, max_value=10))
def test_rolling_fingerprint_vectorized_equals_loop(texts, window):
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
    from parallel_count_min_sketch_ray.functions.textops import rolling_fingerprint

    got = rolling_fingerprint(texts, window)
    for i, s in enumerate(texts):
        ws = s.split()
        if len(ws) <= window:
            want = hash64_strings([" ".join(ws)])[0]
        else:
            sh = [" ".join(ws[j : j + window]) for j in range(len(ws) - window + 1)]
            want = hash64_strings(sh).min()
        assert got[i] == want


floats_strategy = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    max_size=400,
)


@settings(max_examples=50, deadline=None)
@given(items=floats_strategy, cut=st.integers(min_value=0, max_value=400))
def test_tdigest_split_merge_rank_envelope(items, cut):
    """digest(A) ⊕ digest(B) preserves exact n/min/max for ANY split,
    and every quantile's true rank stays inside the k1 envelope (wide
    slack: measured worst case is ~0.1% at delta=200)."""
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    cut = min(cut, len(items))
    arr = np.array(items, dtype=np.float64)
    a, b = TDigest(delta=200), TDigest(delta=200)
    a.update(arr[:cut])
    b.update(arr[cut:])
    merged = a.merge(TDigest.from_bytes(b.to_bytes()))
    assert merged.n == arr.size
    if arr.size == 0:
        assert np.isnan(merged.quantile(0.5))
        return
    assert merged.quantile(0.0) == arr.min()
    assert merged.quantile(1.0) == arr.max()
    s = np.sort(arr)
    for q in (0.1, 0.5, 0.9):
        v = merged.quantile(q)
        lo = np.searchsorted(s, v, side="left") / s.size
        hi = np.searchsorted(s, v, side="right") / s.size
        # true rank interval of v must intersect [q - eps, q + eps];
        # tiny streams are exact up to 1/n granularity
        eps = 0.02 + 1.0 / s.size
        assert lo - eps <= q <= hi + eps


# --- distributed scan kernels (pure, Ray-free): random tables split at
# random block boundaries must reproduce the sequential prefix sum ---

import pandas as pd
import pyarrow as pa

from parallel_count_min_sketch_ray.stages.scan import (
    _apply_block_cumsum,
    _block_edge_sums,
    _block_offsets,
)


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),      # part
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1,
        max_size=200,
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=199), max_size=8),
)
def test_scan_block_decomposition_matches_sequential(data, cuts):
    df = pd.DataFrame(
        {
            "part": [f"p{p}" for p, _ in data],
            "order": range(len(data)),
            "val": [v for _, v in data],
        }
    ).sort_values(["part", "order"]).reset_index(drop=True)
    n = len(df)
    bounds = sorted({c for c in cuts if c < n} | {0, n})
    blocks = [
        pa.Table.from_pandas(
            df.iloc[a:b].reset_index(drop=True), preserve_index=False
        )
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    summarize = _block_edge_sums("part", ["order"], ["val"])
    edge_rows = [
        r for blk in blocks for r in summarize(blk).to_pylist()
    ]
    offsets = _block_offsets(edge_rows, 1, 1)
    got = pd.concat(
        [
            _apply_block_cumsum(
                blk, "part", ["order"], ["val"], ["cum"], offsets
            ).to_pandas()
            for blk in blocks
        ],
        ignore_index=True,
    )
    exp = df.copy()
    exp["cum"] = exp.groupby("part")["val"].cumsum()
    pd.testing.assert_frame_equal(
        got[["part", "order", "val", "cum"]],
        exp[["part", "order", "val", "cum"]],
        check_dtype=False,
    )
    # coordination bound: the exchange is ≤ 2 rows per block
    assert len(edge_rows) <= 2 * len(blocks)


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.one_of(  # zero or magnitudes in DDSketch's supported range
            st.just(0.0),
            st.floats(min_value=1e-9, max_value=1e9),
            st.floats(min_value=-1e9, max_value=-1e-9),
        ),
        max_size=300,
    ),
    cut=st.integers(min_value=0, max_value=300),
)
def test_ddsketch_split_merge_bit_exact_and_quantile_envelope(vals, cut):
    """For ANY value stream and split point: sketch(A) ⊕ sketch(B) is
    bit-identical to sketch(A++B) (uncollapsed integer histogram), and
    every quantile is within alpha relative error of an actual
    element."""
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    cut = min(cut, len(vals))
    arr = np.array(vals, dtype=np.float64)
    whole = DDSketch(alpha=0.02)
    whole.update(arr)
    a, b = whole.empty_like(), whole.empty_like()
    a.update(arr[:cut])
    b.update(arr[cut:])
    assert a.merge(b).to_bytes() == whole.to_bytes()
    if arr.size:
        assert not whole.collapsed()
        for q in (0.0, 0.25, 0.5, 0.9, 1.0):
            exact = np.quantile(arr, q, method="lower")
            est = whole.quantile(q)
            assert abs(est - exact) <= 0.02 * abs(exact) + 1e-12, (q, est, exact)


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=0, max_value=120),
    d=st.integers(min_value=1, max_value=12),
    cut=st.integers(min_value=0, max_value=120),
)
def test_fd_split_merge_preserves_covariance_bound(data, n, d, cut):
    """For ANY row matrix and split point, both the whole-stream sketch
    and the merged-halves sketch satisfy ||A'A - B'B||_2 <= ||A||_F^2/ell
    with exact n and Frobenius mass."""
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    A = rng.normal(scale=10.0, size=(n, d))
    cut = min(cut, n)
    whole = FrequentDirections(ell=8)
    whole.update(A)
    a, b = whole.empty_like(), whole.empty_like()
    a.update(A[:cut])
    b.update(A[cut:])
    merged = a.merge(b)
    exact = A.T @ A
    for sk in (whole, merged):
        assert sk.n == n
        if n:
            err = np.linalg.norm(exact - sk.covariance(), 2)
            assert err <= sk.error_bound() + 1e-6 * sk.fro2 + 1e-9
