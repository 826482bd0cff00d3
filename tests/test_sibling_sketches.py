"""HLL / Bloom / KLL / MinHash kernel tests vs exact oracles (no Ray)."""

from __future__ import annotations

import numpy as np
import pytest

from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.bloom import BloomFilter
from parallel_count_min_sketch_ray.state.kll import KLLSketch
from parallel_count_min_sketch_ray.state.minhash import MinHashSignature
from parallel_count_min_sketch_ray.functions.hashing import hash64_strings


# ---- HyperLogLog ---------------------------------------------------------


@pytest.mark.parametrize("true_n", [100, 10_000, 200_000])
def test_hll_estimate_within_bound(true_n):
    hll = HyperLogLog(p=14, seed=42)
    rng = np.random.default_rng(7)
    vals = rng.choice(10 * true_n, size=true_n, replace=False).astype(np.int64)
    # feed with duplicates: multiplicity must not matter
    hll.update(np.concatenate([vals, vals[: true_n // 2]]))
    est = hll.estimate()
    tol = 4 * hll.relative_error()  # 4 sigma ≈ 1.04/sqrt(m)
    assert abs(est - true_n) <= tol * true_n


def test_hll_merge_equals_union_and_is_idempotent():
    a, b = HyperLogLog(p=12, seed=1), HyperLogLog(p=12, seed=1)
    xs = np.arange(0, 60_000)
    ys = np.arange(30_000, 90_000)
    a.update(xs)
    b.update(ys)
    merged = a.empty_like().merge(a).merge(b)
    full = HyperLogLog(p=12, seed=1)
    full.update(np.concatenate([xs, ys]))
    assert np.array_equal(merged.registers, full.registers)  # bit-identical
    again = merged.empty_like().merge(merged).merge(merged)  # idempotent
    assert np.array_equal(again.registers, merged.registers)


def test_hll_incompatible_merge_raises():
    with pytest.raises(ValueError):
        HyperLogLog(p=12).merge(HyperLogLog(p=13))
    with pytest.raises(ValueError):
        HyperLogLog(p=12, seed=1).merge(HyperLogLog(p=12, seed=2))


def test_hll_serde_roundtrip():
    h = HyperLogLog(p=10, seed=5)
    h.update(np.arange(1000))
    back = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(back.registers, h.registers)
    assert back.estimate() == h.estimate()


def test_hll_small_range_uses_linear_counting():
    h = HyperLogLog(p=14, seed=2)
    h.update(np.arange(50))
    assert abs(h.estimate() - 50) <= 5


# ---- Bloom ---------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_bound():
    bf = BloomFilter(capacity=10_000, fp_rate=0.01, seed=42)
    rng = np.random.default_rng(11)
    present = rng.choice(1 << 40, size=10_000, replace=False)
    bf.update(present)
    assert bf.contains(present).all()  # zero false negatives, hard
    absent = present.max() + 1 + np.arange(20_000)
    fp = bf.contains(absent).mean()
    assert fp <= 0.02  # 2x configured bound headroom at full capacity


def test_bloom_merge_is_union():
    a = BloomFilter(capacity=1000, fp_rate=0.01, seed=3)
    b = a.empty_like()
    xs, ys = np.arange(500), np.arange(400, 900)
    a.update(xs)
    b.update(ys)
    m = a.empty_like().merge(a).merge(b)
    full = a.empty_like()
    full.update(np.concatenate([xs, ys]))
    assert np.array_equal(m.bits, full.bits)
    assert m.contains(np.arange(900)).all()


def test_bloom_incompatible_and_serde():
    with pytest.raises(ValueError):
        BloomFilter(capacity=100).merge(BloomFilter(capacity=200))
    bf = BloomFilter(capacity=500, fp_rate=0.05, seed=9)
    bf.update(np.arange(100))
    back = BloomFilter.from_bytes(bf.to_bytes())
    assert np.array_equal(back.bits, bf.bits)
    assert back.contains(np.arange(100)).all()


# ---- KLL -----------------------------------------------------------------


def test_kll_exact_when_under_capacity():
    k = KLLSketch(k=200, seed=42)
    vals = np.arange(100, dtype=np.float64)
    k.update(vals)
    assert k.n == 100
    assert k.quantile(0.0) == 0.0
    assert k.quantile(1.0) == 99.0
    assert abs(k.quantile(0.5) - 49.0) <= 1.0


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_kll_rank_error_bound(dist):
    rng = np.random.default_rng(17)
    n = 200_000
    vals = rng.random(n) if dist == "uniform" else rng.lognormal(0, 2, n)
    k = KLLSketch(k=200, seed=42)
    # feed in chunks like a batch pipeline would
    for chunk in np.array_split(vals, 37):
        k.update(chunk)
    assert k.n == n
    svals = np.sort(vals)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = k.quantile(q)
        true_rank = np.searchsorted(svals, est, side="right") / n
        assert abs(true_rank - q) <= 0.03  # 3% rank-error envelope at k=200


def test_kll_merge_bound_and_count():
    rng = np.random.default_rng(5)
    parts = [rng.normal(0, 1, 50_000) for _ in range(4)]
    sks = []
    for part in parts:
        s = KLLSketch(k=200, seed=42)
        s.update(part)
        sks.append(s)
    merged = sks[0]
    for s in sks[1:]:
        merged.merge(s)
    allv = np.concatenate(parts)
    assert merged.n == allv.size
    svals = np.sort(allv)
    for q in [0.1, 0.5, 0.9, 0.99]:
        est = merged.quantile(q)
        true_rank = np.searchsorted(svals, est, side="right") / allv.size
        assert abs(true_rank - q) <= 0.04


def test_kll_weighted_update_and_serde():
    k = KLLSketch(k=128, seed=1)
    k.update(np.array([1.0, 2.0, 3.0]), counts=np.array([10, 20, 70]))
    assert k.n == 100
    assert k.quantile(0.05) == 1.0
    assert k.quantile(0.5) == 3.0 or k.quantile(0.5) == 2.0
    assert k.quantile(0.99) == 3.0
    back = KLLSketch.from_bytes(k.to_bytes())
    assert back.n == k.n
    assert back.quantile(0.5) == k.quantile(0.5)
    with pytest.raises(ValueError):
        k.merge(KLLSketch(k=64, seed=1))


# ---- MinHash -------------------------------------------------------------


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(3)
    universe = rng.choice(1 << 50, size=3000, replace=False).astype(np.uint64)
    a_items, b_items = universe[:2000], universe[1000:]  # |inter|/|union| = 1/3
    a = MinHashSignature(num_perm=256, seed=42)
    b = a.empty_like()
    a.update(a_items)
    b.update(b_items)
    est = a.jaccard(b)
    assert abs(est - 1 / 3) <= 4 / np.sqrt(256)  # 4 sigma


def test_minhash_merge_is_set_union():
    a = MinHashSignature(num_perm=64, seed=9)
    b = a.empty_like()
    a.update(np.arange(100, dtype=np.uint64))
    b.update(np.arange(50, 150, dtype=np.uint64))
    m = a.empty_like().merge(a).merge(b)
    full = a.empty_like()
    full.update(np.arange(150, dtype=np.uint64))
    assert np.array_equal(m.sig, full.sig)


def test_minhash_serde_and_guards():
    s = MinHashSignature(num_perm=32, seed=4)
    s.update(hash64_strings(["a", "b", "c"]))
    back = MinHashSignature.from_bytes(s.to_bytes())
    assert np.array_equal(back.sig, s.sig)
    with pytest.raises(ValueError):
        s.merge(MinHashSignature(num_perm=16, seed=4))


def test_hash64_strings_stable_and_distinct():
    h1 = hash64_strings(["foo", "bar", "foo", ""])
    h2 = hash64_strings(["foo", "bar", "foo", ""])
    assert np.array_equal(h1, h2)
    assert h1[0] == h1[2]
    assert h1[0] != h1[1]
    assert len(set(hash64_strings([f"tok{i}" for i in range(10_000)]).tolist())) == 10_000


# ---- TopK (Misra-Gries) --------------------------------------------------


def test_topk_bounds_vs_exact():
    from parallel_count_min_sketch_ray.state.topk import TopKSketch
    import collections

    rng = np.random.default_rng(8)
    items = rng.zipf(1.3, size=200_000)
    items = items[items < 100_000].astype(np.int64)
    sk = TopKSketch(k=256)
    for chunk in np.array_split(items, 23):
        sk.update(chunk)
    truth = collections.Counter(items.tolist())
    assert sk.n == items.size
    assert sk.error_bound() <= items.size // 256 + 1
    for key, lo, hi in sk.topk(20):
        assert lo <= truth[key] <= hi, key
    # the true top-10 must all be tracked (their counts >> N/k)
    top_true = [k for k, _ in truth.most_common(10)]
    tracked = {k for k, _, _ in sk.topk()}
    assert set(top_true) <= tracked


def test_topk_merge_preserves_bounds():
    from parallel_count_min_sketch_ray.state.topk import TopKSketch
    import collections

    rng = np.random.default_rng(9)
    parts = [rng.zipf(1.5, size=50_000).astype(np.int64) for _ in range(4)]
    sks = []
    for p in parts:
        s = TopKSketch(k=128)
        s.update(p)
        sks.append(s)
    merged = sks[0]
    for s in sks[1:]:
        merged.merge(s)
    allitems = np.concatenate(parts)
    truth = collections.Counter(allitems.tolist())
    assert merged.n == allitems.size
    assert merged.error_bound() <= allitems.size // 128 + 4
    for key, lo, hi in merged.topk(10):
        assert lo <= truth[key] <= hi
    with pytest.raises(ValueError):
        merged.merge(TopKSketch(k=64))


def test_topk_serde_and_weighted():
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    sk = TopKSketch(k=8)
    sk.update(np.array([1, 2, 3]), counts=np.array([100, 50, 1]))
    assert sk.n == 151
    lo, hi = sk.estimate(1)
    assert lo <= 100 <= hi
    back = TopKSketch.from_bytes(sk.to_bytes())
    assert back.topk() == sk.topk()
    assert back.n == sk.n


def test_kll_topk_reject_bad_counts():
    import pytest

    from parallel_count_min_sketch_ray.state.kll import KLLSketch
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    for sk in (KLLSketch(seed=1), TopKSketch(k=8)):
        with pytest.raises(ValueError, match="nonnegative"):
            sk.update(np.array([1, 2]), np.array([1, -1]))
        with pytest.raises(ValueError, match="integer"):
            sk.update(np.array([1, 2]), np.array([1.0, 2.0]))

    kll = KLLSketch(seed=1)
    kll.update(np.array([5.0, 6.0]), np.array([0, 3]))  # zero-count dropped
    assert kll.n == 3


def test_describe_all_sketches():
    """Pretty-printer surface (SURVEY.md §2.1 #16,
    src/core/count_min_sketch.c:141-183): every sketch dumps params +
    state; CMS verbose mode dumps the full table like cms_print_table."""
    from parallel_count_min_sketch_ray.state.bloom import BloomFilter
    from parallel_count_min_sketch_ray.state.cms import CountMinSketch
    from parallel_count_min_sketch_ray.state.hll import HyperLogLog
    from parallel_count_min_sketch_ray.state.kll import KLLSketch
    from parallel_count_min_sketch_ray.state.minhash import MinHashSignature
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch
    from parallel_count_min_sketch_ray.state.tdigest import TDigest
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    data = np.arange(1000) % 37
    for sk in (
        CountMinSketch(seed=1),
        HyperLogLog(p=10),
        BloomFilter(capacity=1000),
        KLLSketch(),
        TopKSketch(k=8),
        TDigest(),
        DDSketch(),
    ):
        sk.update(data)
        out = sk.describe()
        assert type(sk).__name__ in out and "\n" in out
    mh = MinHashSignature()
    mh.update(data.astype(np.uint64))
    assert "sig[0:8]" in mh.describe()
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    ares = WeightedReservoir(k=8, seed=1)
    ares.update(data[:100] + 1, (data[:100] + 1).astype(np.float64))
    out = ares.describe()
    assert "WeightedReservoir" in out and "kept" in out
    cms = CountMinSketch(seed=1)
    cms.update(data)
    verbose = cms.describe(verbose=True)
    assert "hash[0]" in verbose
    assert len(verbose.splitlines()) > 10  # includes the cell dump rows


def test_kmv_merge_is_bottom_k_of_union_bit_exact():
    """Any split of the stream merges to the identical sketch (no
    randomness beyond the key hash -> bitwise order-independence)."""
    from parallel_count_min_sketch_ray.state.kmv import BottomKSketch

    rng = np.random.default_rng(3)
    items = rng.integers(0, 500_000, size=30_000)
    whole = BottomKSketch(k=256, seed=9)
    whole.update(items)
    for cut in (1, 1000, 15_000, 29_999):
        a, b = BottomKSketch(k=256, seed=9), BottomKSketch(k=256, seed=9)
        a.update(items[:cut])
        b.update(items[cut:])
        merged = a.merge(b)
        assert merged == whole
        assert merged.n == whole.n == items.size


def test_kmv_distinct_estimate_and_sample_properties():
    from parallel_count_min_sketch_ray.state.kmv import BottomKSketch
    from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

    rng = np.random.default_rng(4)
    true_distinct = 20_000
    keys = np.arange(true_distinct)
    stream = rng.choice(keys, size=100_000)  # heavy duplication
    sk = BottomKSketch(k=1024, seed=1)
    sk.update(stream)
    est = sk.estimate_distinct()
    # 4 sigma of the 1/sqrt(k-2) relative stderr
    assert abs(est - true_distinct) / true_distinct <= 4 * sk.relative_error()
    # the sample holds k distinct true keys, unaffected by multiplicity
    sample = sk.sample()
    assert sample.size == 1024 == np.unique(sample).size
    assert np.isin(sample, keys).all()
    # duplication-invariance: the stream's distinct-key set alone gives
    # the SAME sample (multiplicity cannot affect bottom-k)
    sk2 = BottomKSketch(k=1024, seed=1)
    sk2.update(np.unique(stream))
    assert np.array_equal(np.sort(sample), np.sort(sk2.sample()))
    # serde round-trip
    assert sketch_from_bytes(sk.to_bytes()) == sk
    # under-full sketch reports the exact count
    small = BottomKSketch(k=1024, seed=1)
    small.update(np.arange(10))
    assert small.estimate_distinct() == 10.0
    assert "distinct estimate" in sk.describe()
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        BottomKSketch(k=2)


# ---- Count-Sketch (signed / unbiased CMS sibling) ------------------------


def test_countsketch_unbiased_estimates_within_f2_bound():
    """Every point estimate lands within sqrt(3*F2/w) of the truth and
    the signed errors center on zero (the unbiasedness contract the
    CMS cannot offer)."""
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(0)
    items = (rng.zipf(1.3, size=200_000) % 50_000).astype(np.int64)
    sk = CountSketch(width=4096, depth=7, seed=1)
    sk.update(items)
    uniq, cnt = np.unique(items, return_counts=True)
    est = sk.query(uniq)
    f2 = int(np.dot(cnt.astype(object), cnt.astype(object)))
    bound = np.sqrt(3.0 * f2 / sk.width)
    err = est - cnt
    assert np.abs(err).max() <= bound
    # unbiased: mean signed error is tiny relative to the bound
    assert abs(err.mean()) <= 0.05 * bound
    # one-sided is specifically NOT guaranteed: some estimates undershoot
    assert (err < 0).any() and (err > 0).any()


def test_countsketch_f2_and_inner_product_vs_exact():
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(5)
    a_items = rng.integers(0, 5_000, size=80_000)
    b_items = rng.integers(2_500, 7_500, size=80_000)
    a = CountSketch(width=8192, depth=7, seed=2)
    b = a.empty_like()
    a.update(a_items)
    b.update(b_items)
    ua, ca = np.unique(a_items, return_counts=True)
    ub, cb = np.unique(b_items, return_counts=True)
    f2 = int(np.dot(ca.astype(object), ca.astype(object)))
    assert abs(a.estimate_f2() - f2) / f2 <= 0.05  # AMS concentration
    # exact <f, g> via aligned counts
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    ip = int(np.dot(ca[ia].astype(object), cb[ib].astype(object)))
    # unbiased join-size estimate: within sqrt(3*F2a*F2b)/w-ish radius;
    # use a generous 10% relative tolerance on this synthetic overlap
    assert abs(a.inner_product(b) - ip) / ip <= 0.10


def test_countsketch_merge_bit_exact_serde_and_guards():
    from parallel_count_min_sketch_ray.state.base import sketch_from_bytes
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(9)
    items = rng.integers(0, 10_000, size=50_000)
    whole = CountSketch(width=1024, depth=5, seed=3)
    whole.update(items)
    for cut in (1, 7_777, 49_999):
        a, b = whole.empty_like(), whole.empty_like()
        a.update(items[:cut])
        b.update(items[cut:])
        assert a.merge(b) == whole  # signed integer adds commute: bit-exact
    # weighted update == repeated stream
    uniq, cnt = np.unique(items, return_counts=True)
    w = whole.empty_like()
    w.update(uniq, cnt.astype(np.int64))
    assert w == whole
    # serde
    assert sketch_from_bytes(whole.to_bytes()) == whole
    # guards
    with pytest.raises(ValueError, match="odd"):
        CountSketch(depth=4)
    with pytest.raises(ValueError, match="incompatible|cannot merge"):
        CountSketch(seed=1).merge(CountSketch(seed=2))
    with pytest.raises(ValueError, match="integer"):
        whole.update(np.array([1]), np.array([1.5]))
    assert "f2_estimate" in whole.describe()
    # string adapter matches the int path on djb2-hashed ids
    s = CountSketch(width=512, depth=5, seed=4)
    s.update_strings(["alpha", "beta", "alpha"])
    assert s.query_string("alpha") >= 1 or s.total == 3


def test_kmv_set_estimates_vs_exact():
    """Union / intersection / Jaccard estimates (Beyer et al. 2007)
    track the exact set relations within 4x the sampling stderr, on
    both the over-full (estimating) and under-full (exact) paths."""
    from parallel_count_min_sketch_ray.state.kmv import BottomKSketch

    rng = np.random.default_rng(12)
    universe = rng.choice(10_000_000, size=60_000, replace=False)
    a_keys = universe[:40_000]
    b_keys = universe[20_000:]  # overlap = 20_000, union = 60_000
    k = 2048
    a, b = BottomKSketch(k=k, seed=6), BottomKSketch(k=k, seed=6)
    a.update(a_keys)
    b.update(np.repeat(b_keys, 2))  # multiplicity must not matter
    est = a.set_estimates(b)
    true_j = 20_000 / 60_000
    sigma_j = np.sqrt(true_j * (1 - true_j) / k)
    assert abs(est["jaccard"] - true_j) <= 4 * sigma_j
    assert abs(est["union"] - 60_000) / 60_000 <= 4 / np.sqrt(k - 2)
    assert abs(est["intersection"] - 20_000) / 20_000 <= 0.1
    # symmetric
    rev = b.set_estimates(a)
    assert rev == est
    # under-full: exact
    sa, sb = BottomKSketch(k=k, seed=6), BottomKSketch(k=k, seed=6)
    sa.update(np.arange(100))
    sb.update(np.arange(50, 150))
    ex = sa.set_estimates(sb)
    assert ex["union"] == 150.0 and ex["jaccard"] == 50 / 150
    assert abs(ex["intersection"] - 50.0) < 1e-9
    # identity guard
    with pytest.raises(ValueError):
        a.set_estimates(BottomKSketch(k=k, seed=7))
    # disjoint sets -> zero overlap
    d1, d2 = BottomKSketch(k=64, seed=1), BottomKSketch(k=64, seed=1)
    d1.update(np.arange(0, 1000))
    d2.update(np.arange(1_000_000, 1_001_000))
    dz = d1.set_estimates(d2)
    assert dz["jaccard"] == 0.0 and dz["intersection"] == 0.0


# ---- t-digest (Dunning & Ertl 2019; BASELINE.json north_star names it
# as the KLL sibling for continuous-value quantiles) -------------------


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "pareto", "bimodal"])
def test_tdigest_rank_error_bound(dist):
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    rng = np.random.default_rng(7)
    n = 150_000
    data = {
        "uniform": lambda: rng.uniform(0, 1, n),
        "lognormal": lambda: rng.lognormal(0, 2, n),
        "pareto": lambda: rng.pareto(1.5, n),
        "bimodal": lambda: np.concatenate(
            [rng.normal(0, 1, n // 2), rng.normal(100, 1, n // 2)]
        ),
    }[dist]()
    td = TDigest(delta=200)
    for chunk in np.array_split(data, 23):
        td.update(chunk)
    s = np.sort(data)
    # k1 scale: rank error shrinks toward the tails; 0.5% uniform
    # envelope is ~10x the measured worst case at delta=200
    for q in [0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        v = td.quantile(q)
        rank = np.searchsorted(s, v, side="right") / s.size
        assert abs(rank - q) <= 0.005, (q, rank)
    # exact endpoints
    assert td.quantile(0.0) == s[0] and td.quantile(1.0) == s[-1]
    # bounded state
    assert td.num_centroids() <= 200


def test_tdigest_merge_matches_single_and_is_associative():
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    rng = np.random.default_rng(11)
    data = rng.lognormal(0, 1, 120_000)
    parts = np.array_split(data, 16)
    digs = []
    for p in parts:
        t = TDigest(delta=200)
        t.update(p)
        digs.append(t)
    # left fold
    left = digs[0].empty_like()
    for d in digs:
        left.merge(TDigest.from_bytes(d.to_bytes()))
    # pairwise tree fold
    level = [TDigest.from_bytes(d.to_bytes()) for d in digs]
    while len(level) > 1:
        level = [
            level[i].merge(level[i + 1]) if i + 1 < len(level) else level[i]
            for i in range(0, len(level), 2)
        ]
    tree = level[0]
    assert left.n == tree.n == data.size
    s = np.sort(data)
    for td in (left, tree):
        for q in [0.01, 0.5, 0.99]:
            rank = np.searchsorted(s, td.quantile(q), side="right") / s.size
            assert abs(rank - q) <= 0.005


def test_tdigest_weighted_zero_counts_serde_and_guards():
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    td = TDigest(delta=100)
    vals = np.arange(1000, dtype=np.float64)
    counts = np.full(1000, 5, dtype=np.int64)
    counts[::4] = 0  # never-occurring values must not contribute
    td.update(vals, counts)
    assert td.n == int(counts.sum())
    assert td.vmin >= 1.0  # value 0 had count 0
    # rank of the weighted median ~ 0.5
    assert abs(td.rank(td.quantile(0.5)) - 0.5) <= 0.02
    back = TDigest.from_bytes(td.to_bytes())
    assert back.n == td.n and back.vmin == td.vmin and back.vmax == td.vmax
    assert np.allclose(back.quantiles([0.1, 0.9]), td.quantiles([0.1, 0.9]))
    with pytest.raises(ValueError):
        td.merge(TDigest(delta=200))
    with pytest.raises(ValueError):
        TDigest(delta=5)
    empty = TDigest()
    assert np.isnan(empty.quantile(0.5)) and np.isnan(empty.rank(1.0))
    assert "TDigest" in td.describe() and "p999" in td.describe()


# ---- dyadic-range CMS (Cormode & Muthukrishnan 2005 §4.2: the
# O(log U) range query the reference's naive Σ lacks) -----------------


def test_dyadic_cms_range_bounds_and_decomposition():
    from collections import Counter

    from parallel_count_min_sketch_ray.state.dyadic import DyadicCMS

    rng = np.random.default_rng(2)
    d = DyadicCMS(eps=0.01, delta=0.1, bits=12)
    data = rng.integers(0, 4096, 150_000)
    d.update(data)
    cnt = Counter(data.tolist())
    for lo, hi in [(0, 4095), (100, 110), (0, 0), (2048, 4095), (7, 1234)]:
        true = sum(v for k, v in cnt.items() if lo <= k <= hi)
        est = d.range_query(lo, hi)
        assert true <= est <= true + d.range_error_bound(), (lo, hi)
    # decomposition covers exactly, disjointly
    for lo, hi in [(0, 4095), (7, 1234), (3, 3), (1023, 1025)]:
        cover = []
        for l, p in d._nodes(lo, hi):
            cover.extend(range(p << l, (p + 1) << l))
        assert sorted(cover) == list(range(lo, hi + 1))
    assert "DyadicCMS" in d.describe()


def test_dyadic_cms_merge_serde_and_guards():
    from parallel_count_min_sketch_ray.state.dyadic import DyadicCMS

    rng = np.random.default_rng(3)
    data = rng.integers(0, 1 << 12, 80_000)
    whole = DyadicCMS(eps=0.01, delta=0.1, bits=12)
    whole.update(data)
    a = DyadicCMS(eps=0.01, delta=0.1, bits=12)
    b = DyadicCMS(eps=0.01, delta=0.1, bits=12)
    a.update(data[:40_000])
    b.update(data[40_000:], np.ones(40_000, dtype=np.int64))
    merged = a.merge(DyadicCMS.from_bytes(b.to_bytes()))
    assert merged.total == whole.total
    for lo, hi in [(0, 100), (5, 4000)]:
        assert merged.range_query(lo, hi) == whole.range_query(lo, hi)
    with pytest.raises(ValueError):
        merged.merge(DyadicCMS(eps=0.01, delta=0.1, bits=13))
    with pytest.raises(ValueError):
        DyadicCMS(bits=0)
    with pytest.raises(ValueError):
        d = DyadicCMS(bits=8)
        d.update(np.array([256]))  # out of domain
    with pytest.raises(ValueError):
        merged.range_query(10, 5)


# --- weighted reservoir (A-ES) ------------------------------------------


def test_ares_merge_bitexact_any_split():
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    rng = np.random.default_rng(5)
    keys = rng.permutation(np.arange(500, dtype=np.int64))
    weights = rng.uniform(0.1, 50.0, 500)
    single = WeightedReservoir(k=32, seed=7)
    single.update(keys, weights)
    for splits in (2, 3, 7):
        parts = []
        for idx in np.array_split(np.arange(500), splits):
            p = WeightedReservoir(k=32, seed=7)
            p.update(keys[idx], weights[idx])
            parts.append(p)
        rng.shuffle(parts)
        merged = WeightedReservoir(k=32, seed=7)
        for p in parts:
            merged.merge(p)
        assert np.array_equal(merged.sample(), single.sample())
        assert np.array_equal(
            merged.sample_table()[1], single.sample_table()[1]
        )
        # serde roundtrip preserves the exact state
        rt = WeightedReservoir.from_bytes(merged.to_bytes())
        assert np.array_equal(rt.sample(), single.sample())


def test_ares_duplicate_keys_keep_max_weight():
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    sk = WeightedReservoir(k=8, seed=1)
    sk.update(np.array([1, 2, 3]), np.array([1.0, 1.0, 1.0]))
    sk.update(np.array([2]), np.array([10.0]))
    keys, weights = sk.sample_table()
    assert dict(zip(keys.tolist(), weights.tolist()))[2] == 10.0


def test_ares_inclusion_probability_tracks_weight():
    """k=1 over items with weights 1:2:3:4 → selection frequency over
    many seeds approaches w_i / Σw (A-ES first-order property)."""
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    keys = np.array([10, 20, 30, 40], dtype=np.int64)
    weights = np.array([1.0, 2.0, 3.0, 4.0])
    counts = {int(k): 0 for k in keys}
    trials = 3000
    for seed in range(trials):
        sk = WeightedReservoir(k=1, seed=seed)
        sk.update(keys, weights)
        counts[int(sk.sample()[0])] += 1
    total_w = weights.sum()
    for k, w in zip(keys.tolist(), weights.tolist()):
        p_expected = w / total_w
        p_seen = counts[k] / trials
        # binomial 4-sigma: sqrt(p(1-p)/n) ≤ 0.0091 at n=3000
        assert abs(p_seen - p_expected) < 4.5 * np.sqrt(
            p_expected * (1 - p_expected) / trials
        ), (k, p_seen, p_expected)


def test_ares_rejects_bad_weights():
    import pytest as _pytest

    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    sk = WeightedReservoir(k=4, seed=0)
    with _pytest.raises(ValueError):
        sk.update(np.array([1]), np.array([0.0]))
    with _pytest.raises(ValueError):
        sk.update(np.array([1, 2]), np.array([1.0]))


# ---- DDSketch (relative-error quantiles, Masson et al. VLDB 2019) ---------


@pytest.mark.parametrize("dist", ["lognormal", "pareto", "uniform", "mixed_sign"])
def test_ddsketch_relative_error_bound(dist):
    """Published guarantee: every returned quantile is within
    alpha relative error of an actual element at that rank."""
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    rng = np.random.default_rng(7)
    if dist == "lognormal":
        data = rng.lognormal(3, 2, 200_000)
    elif dist == "pareto":
        data = (rng.pareto(1.5, 200_000) + 1) * 10
    elif dist == "uniform":
        data = rng.uniform(0.5, 1e6, 200_000)
    else:  # negatives + zeros exercise all three stores
        data = np.concatenate([rng.normal(0, 100, 100_000), np.zeros(500)])
    sk = DDSketch(alpha=0.01)
    sk.update(data)
    assert not sk.collapsed()
    qs = np.array([0.01, 0.25, 0.5, 0.9, 0.99, 0.999])
    est = sk.quantiles(qs)
    exact = np.quantile(data, qs, method="lower")
    rel = np.abs(est - exact) / np.maximum(np.abs(exact), 1e-12)
    assert (rel <= 0.01 + 1e-9).all(), (dist, rel)
    assert sk.n == data.size


def test_ddsketch_merge_bit_exact_any_split():
    """Integer bucket counts over deterministic keys: while no collapse
    triggers, every merge order yields the IDENTICAL byte blob — the
    same hard determinism contract as CMS/HLL/KMV (distributed ==
    serial to the last bit)."""
    import itertools

    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    rng = np.random.default_rng(3)
    data = rng.lognormal(3, 2, 50_000)
    serial = DDSketch(0.01)
    serial.update(data)
    parts = np.array_split(data, 7)
    blobs = set()
    for perm in itertools.islice(itertools.permutations(range(7)), 6):
        m = DDSketch(0.01)
        for i in perm:
            p = DDSketch(0.01)
            p.update(parts[i])
            m.merge(p)
        blobs.add(m.to_bytes())
    assert len(blobs) == 1
    assert blobs.pop() == serial.to_bytes()


def test_ddsketch_collapse_preserves_upper_quantiles():
    """The max_bins collapse folds the LOWEST buckets (paper §2.3);
    quantiles above the collapsed mass keep the alpha guarantee."""
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    rng = np.random.default_rng(11)
    data = 10.0 ** rng.uniform(-30, 30, 50_000)  # ~14k raw buckets
    sk = DDSketch(alpha=0.01, max_bins=256)
    sk.update(data)
    assert sk.collapsed() and sk.num_buckets() <= 257
    # 256 bins at alpha=0.01 retain ~2.2 of the 60 decades -> only the
    # top ~3.5% of mass keeps the guarantee; probe inside that region
    for q in (0.99, 0.999):
        exact = np.quantile(data, q, method="lower")
        assert abs(sk.quantile(q) - exact) / exact <= 0.01 + 1e-9
    # below the collapse floor the estimate degrades but stays one
    # bucket: everything folded reports the floor's representative
    assert sk.quantile(0.5) == sk.quantile(0.01)


def test_ddsketch_weighted_zero_negative_serde_and_guards():
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    vals = np.array([-5.0, 0.0, 3.0, 3.0, 7.5])
    a = DDSketch(0.02)
    a.update(vals)
    b = DDSketch(0.02)
    b.update(np.array([-5.0, 0.0, 3.0, 7.5]), np.array([1, 1, 2, 1]))
    assert a.to_bytes() == b.to_bytes()  # weighted == repeated, bit-exact
    rt = DDSketch.from_bytes(a.to_bytes())
    assert rt.to_bytes() == a.to_bytes() and rt.n == 5 and rt.zero_count == 1
    assert rt.count_le(0.0) == 2  # the -5 and the zero
    with pytest.raises(ValueError):
        a.merge(DDSketch(0.01))  # identity mismatch
    with pytest.raises(ValueError):
        a.update(np.array([np.inf]))
    with pytest.raises(ValueError):
        a.update(np.array([1.0]), np.array([-1]))
    assert np.isnan(DDSketch(0.01).quantile(0.5))
    assert "DDSketch" in a.describe()


# ---- Frequent Directions (matrix sketch, Liberty 2013) ---------------------


def test_fd_covariance_spectral_bound_and_directions():
    """Published guarantee: ||A'A - B'B||_2 <= ||A||_F^2 / ell; on a
    low-rank-plus-noise corpus the top directions are near-exact."""
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    rng = np.random.default_rng(5)
    n, d, ell = 20_000, 64, 32
    A = rng.normal(size=(n, 4)) @ rng.normal(size=(4, d)) * 3
    A += rng.normal(size=(n, d)) * 0.3
    fd = FrequentDirections(ell=ell)
    for chunk in np.array_split(A, 37):
        fd.update(chunk)
    err = np.linalg.norm(A.T @ A - fd.covariance(), 2)
    assert err <= fd.error_bound()
    assert fd.n == n and abs(fd.fro2 - (A * A).sum()) < 1e-6 * fd.fro2
    s_est, vt = fd.top_directions(4)
    _, s_ex, vt_ex = np.linalg.svd(A, full_matrices=False)
    # top singular values within 1% (noise floor shrinks, signal stays)
    assert np.allclose(s_est, s_ex[:4], rtol=0.01)
    # estimated top-4 subspace aligns with the true one
    overlap = np.linalg.svd(vt @ vt_ex[:4].T, compute_uv=False)
    assert overlap.min() > 0.99


def test_fd_merge_preserves_bound_any_order():
    """Stack-and-shrink merging keeps the covariance guarantee in any
    merge order (Ghashami et al. §3) and exact n / ||A||_F^2."""
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    rng = np.random.default_rng(9)
    A = rng.normal(size=(6_000, 16))
    parts = np.array_split(A, 8)
    for order in (range(8), reversed(range(8))):
        m = FrequentDirections(ell=24)
        for i in order:
            p = FrequentDirections(ell=24)
            p.update(parts[i])
            m.merge(FrequentDirections.from_bytes(p.to_bytes()))
        err = np.linalg.norm(A.T @ A - m.covariance(), 2)
        assert err <= m.error_bound()
        assert m.n == A.shape[0]
        assert abs(m.fro2 - (A * A).sum()) < 1e-6 * m.fro2


def test_fd_weighted_serde_and_guards():
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    fd = FrequentDirections(ell=8)
    fd.update(np.ones((2, 3)), np.array([3, 2]))
    assert fd.n == 5 and abs(fd.fro2 - 15.0) < 1e-9
    rt = FrequentDirections.from_bytes(fd.to_bytes())
    assert rt.n == 5 and rt.dim == 3
    assert np.allclose(rt.covariance(), fd.covariance())
    with pytest.raises(ValueError):
        fd.update(np.ones((1, 4)))  # dim mismatch
    with pytest.raises(ValueError):
        fd.update(np.array([[np.nan, 0, 0]]))
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(ell=9, dim=3))
    # merging into an empty (dim-less) sketch adopts the other's dim
    empty = FrequentDirections(ell=8)
    empty.merge(rt)
    assert empty.dim == 3 and empty.n == 5
    assert "FrequentDirections" in fd.describe()


def test_countsketch_subtract_is_linear_and_estimates_distance():
    """Linearity: A.subtract(B) must be BIT-IDENTICAL to a sketch fed
    the signed difference stream, its point estimates track per-item
    count diffs, and estimate_f2 tracks ||f_A - f_B||^2 (the AMS
    distance estimator) within the published envelopes."""
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    rng = np.random.default_rng(13)
    zipf_a = rng.zipf(1.4, 120_000) % 5000
    zipf_b = rng.zipf(1.4, 100_000) % 5000
    a = CountSketch(width=4096, depth=7, seed=1)
    b = a.empty_like()
    a.update(zipf_a)
    b.update(zipf_b)
    a.subtract(b)
    # bit-identity vs feeding +A and -B into one sketch
    direct = CountSketch(width=4096, depth=7, seed=1)
    direct.update(zipf_a)
    items_b, cnts_b = np.unique(zipf_b, return_counts=True)
    # negative counts are rejected by update() by design: emulate the
    # difference stream through subtract of a positively-fed sketch
    negb = direct.empty_like()
    negb.update(items_b, cnts_b)
    direct.subtract(negb)
    assert np.array_equal(a.table, direct.table)
    assert a.total == zipf_a.size - zipf_b.size
    # point estimates: within sqrt(3*F2_diff/w) of the true diff
    ca = np.bincount(zipf_a, minlength=5000).astype(np.int64)
    cb = np.bincount(zipf_b, minlength=5000).astype(np.int64)
    true_diff = ca - cb
    f2_true = int((true_diff.astype(object) ** 2).sum())
    bound = np.sqrt(3.0 * f2_true / 4096)
    probes = np.array([0, 1, 2, 10, 100, 999, 4999], dtype=np.int64)
    est = a.query(probes)
    assert (np.abs(est - true_diff[probes]) <= bound + 1).all()
    # AMS distance estimate: generous 4/sqrt(w)-ish relative envelope
    assert abs(a.estimate_f2() - f2_true) <= 0.15 * f2_true
    with pytest.raises(ValueError):
        a.subtract(CountSketch(width=4096, depth=7, seed=2))


def test_ddsketch_collapsed_merge_commutes_and_range_guard():
    """Post-collapse merges commute (the adopted floor re-clamps BOTH
    operands' sub-floor keys), and out-of-range magnitudes are rejected
    rather than silently returning inf/0 representatives."""
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    rng = np.random.default_rng(21)
    wide = 10.0 ** rng.uniform(-30, 30, 30_000)
    low = 10.0 ** rng.uniform(-40, -20, 5_000)  # all below A's floor
    a = DDSketch(alpha=0.01, max_bins=256)
    a.update(wide)
    assert a.collapsed()
    b = DDSketch(alpha=0.01, max_bins=256)
    b.update(low)
    ab = DDSketch.from_bytes(a.to_bytes()).merge(DDSketch.from_bytes(b.to_bytes()))
    ba = DDSketch.from_bytes(b.to_bytes()).merge(DDSketch.from_bytes(a.to_bytes()))
    assert ab.to_bytes() == ba.to_bytes()
    assert ab.n == 35_000
    with pytest.raises(ValueError):
        DDSketch().update(np.array([1e301]))
    with pytest.raises(ValueError):
        DDSketch().update(np.array([5e-324]))
    DDSketch().update(np.array([0.0, 1e300, -1e-300]))  # boundary values OK


def test_fd_update_validates_before_mutating_and_checks_ell_on_empty():
    """A raising update leaves n/fro2/B untouched; an EMPTY sketch with
    a mismatched ell is still rejected by merge."""
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    fd = FrequentDirections(ell=8)
    fd.update(np.ones((3, 4)))
    n0, f0 = fd.n, fd.fro2
    for bad in (np.ones((2, 5)), np.array([[np.nan, 0, 0, 0]])):
        with pytest.raises(ValueError):
            fd.update(bad)
        assert fd.n == n0 and fd.fro2 == f0
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(ell=9))  # empty other, wrong ell


def test_matrix_column_rejects_nulls_and_raggedness():
    """Divisible-but-ragged and null rows must raise, not shear rows
    across boundaries."""
    import pyarrow as pa

    from parallel_count_min_sketch_ray.functions.extract import matrix_column

    ok = pa.table({"e": pa.array([[1.0, 2.0], [3.0, 4.0]])})
    out = matrix_column(ok, "e")
    assert out.shape == (2, 2) and out[1, 0] == 3.0
    ragged = pa.table({"e": pa.array([[1.0, 2.0, 3.0], [4.0]])})  # 4 % 2 == 0
    with pytest.raises(ValueError):
        matrix_column(ragged, "e")
    nulls = pa.table({"e": pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                                    pa.list_(pa.float64()))})
    with pytest.raises(ValueError):
        matrix_column(nulls, "e")


def test_source_topk_words_containment(ray_session):
    """Grouped MG: each per-source [lower, upper] must contain the
    exact per-source count of the hashed token (DuckDB ground truth)."""
    import duckdb

    from parallel_count_min_sketch_ray.functions.hashing import djb2
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        source_topk_words,
    )

    sf = "/root/testdata/sf0.001"
    out = source_topk_words(sf, m=5)
    assert len(out) > 0 and set(out["source"]) > set()
    exact = duckdb.sql(
        f"""SELECT source, token, COUNT(*) AS cnt FROM (
            SELECT source, unnest(list_filter(string_split(text, ' '),
            x -> x <> '')) AS token
            FROM read_parquet('{sf}/documents.parquet')) GROUP BY 1, 2"""
    ).df()
    exact["tid"] = [djb2(t) & 0x7FFFFFFF for t in exact["token"]]
    truth = exact.groupby(["source", "tid"])["cnt"].sum()
    for _, r in out.iterrows():
        true_cnt = int(truth.get((r["source"], int(r["token"])), 0))
        assert r["count_lower"] <= true_cnt <= r["count_upper"], (
            r["source"], r["token"], true_cnt, r["count_lower"], r["count_upper"]
        )
    # ranks are 1..m per source, counts non-increasing within a source
    for src, g in out.groupby("source"):
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["count_upper"].to_numpy()) <= 0).all()


def test_weekly_top_users_containment(ray_session):
    """Windowed MG: each (window, user) [lower, upper] must contain the
    exact event count of that user within the window's calendar days,
    and windows must span exactly 7 calendar days."""
    import duckdb

    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        weekly_top_users,
    )

    sf = "/root/testdata/sf0.001"
    out = weekly_top_users(sf, window_days=7, m=5)
    assert len(out) > 0
    spans = np.array(out["window_end"], dtype="datetime64[D]") - np.array(
        out["window_start"], dtype="datetime64[D]"
    )
    assert (spans == np.timedelta64(6, "D")).all()
    exact = duckdb.sql(
        f"""SELECT CAST(ts AS DATE) AS day, user_id, COUNT(*) AS cnt
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2"""
    ).df()
    exact["day"] = np.array(exact["day"], dtype="datetime64[D]")
    for (ws, we), g in out.groupby(["window_start", "window_end"]):
        lo_d = np.datetime64(ws, "D")
        hi_d = np.datetime64(we, "D")
        in_win = exact[(exact["day"] >= lo_d) & (exact["day"] <= hi_d)]
        truth = in_win.groupby("user_id")["cnt"].sum()
        for _, r in g.iterrows():
            true_cnt = int(truth.get(int(r["user_id"]), 0))
            assert r["count_lower"] <= true_cnt <= r["count_upper"], (
                ws, we, r["user_id"], true_cnt,
                r["count_lower"], r["count_upper"],
            )


def test_calendar_window_merges_gap_days():
    """A day with no state must still advance the calendar window (gap
    days never widen the window) — fabricated per-day MG dicts with a
    3-day hole."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        _calendar_window_merges,
    )
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    def day_sketch(items):
        sk = TopKSketch(k=8)
        sk.update(np.array(items, dtype=np.int64))
        return {"topk": sk}

    grouped = {
        "2020-01-01": day_sketch([1, 1, 2]),
        "2020-01-05": day_sketch([2, 3]),
    }
    wins = list(_calendar_window_merges(grouped, "topk", 3))
    # first window ends at first+2 = 01-03; last at 01-05
    assert [(w[0], w[1]) for w in wins] == [
        ("2020-01-01", "2020-01-03"),
        ("2020-01-02", "2020-01-04"),
        ("2020-01-03", "2020-01-05"),
    ]
    # window 1 sees only day 1; window 2 sees NO days (all counts
    # empty); window 3 sees only day 5
    def counts(acc):
        return {t: lo for t, lo, _ in acc.topk()}

    assert counts(wins[0][2]) == {1: 2, 2: 1}
    assert counts(wins[1][2]) == {}
    assert counts(wins[2][2]) == {2: 1, 3: 1}


def test_ddsketch_type_value_quantiles_envelope(ray_session):
    """Grouped DDSketch: each event_type's quantile estimates hold the
    alpha=0.01 RELATIVE-error envelope vs the exact per-group
    distribution, and each group's n equals the exact row count —
    through the keyed merge tree, not a serial build."""
    import duckdb

    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        ddsketch_type_value_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    out = ddsketch_type_value_quantiles(sf)
    assert len(out) > 0
    ev = duckdb.sql(
        f"SELECT event_type, value FROM read_parquet('{sf}/events.parquet')"
    ).df()
    for _, r in out.iterrows():
        vals = np.sort(ev[ev["event_type"] == r["event_type"]]["value"].to_numpy())
        assert r["n"] == len(vals)
        for q, est in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"]),
                       (0.999, r["p999"])):
            exact = vals[min(int(np.ceil(q * len(vals))) - 1, len(vals) - 1)]
            # DDSketch guarantee: |est - x| <= alpha * |x| for an actual
            # element x within rank-slack of q; allow one-rank slack
            lo_i = max(int(np.floor(q * len(vals))) - 2, 0)
            hi_i = min(int(np.ceil(q * len(vals))) + 1, len(vals) - 1)
            window = vals[lo_i : hi_i + 1]
            ok = np.any(np.abs(est - window) <= 0.011 * np.abs(window) + 1e-12)
            assert ok, (r["event_type"], q, est, exact)


def test_label_principal_directions_envelope(ray_session):
    """Keyed Frequent Directions: per-label sketch covariance within
    the published ||A||_F²/ell spectral bound of the exact per-label
    Gram matrix, with exact n and fro2 riding the merge tree."""
    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        SketchSpec,
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        label_principal_directions,
    )
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    sf = "/root/testdata/sf0.001"
    ell = 32
    out = label_principal_directions(sf, ell=ell, k=4)
    assert len(out) > 0
    t = pq_.read_table(f"{sf}/embeddings.parquet", columns=["label", "embedding"])
    labels = t["label"].to_numpy()
    flat = t["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    mat = flat.reshape(len(labels), -1)
    import ray.data

    grouped = build_sketches_by_key(
        ray.data.read_parquet(
            f"{sf}/embeddings.parquet", columns=["label", "embedding"]
        ),
        "label",
        [SketchSpec("fd", FrequentDirections(ell=ell), "embedding", kind="matrix")],
    )
    for label in np.unique(labels):
        g = mat[labels == label]
        fd = grouped[label]["fd"]
        assert fd.n == g.shape[0]
        assert abs(fd.fro2 - float((g * g).sum())) <= 1e-6 * max(fd.fro2, 1.0)
        gap = np.linalg.norm(g.T @ g - fd.covariance(), 2)
        assert gap <= fd.error_bound() + 1e-9
        # the query surface agrees with the sketch it reports
        sub = out[out["label"] == int(label)].sort_values("rank")
        s, _ = fd.top_directions(4)
        assert np.allclose(sub["singular_value"].to_numpy(), np.round(s, 6))


def test_weekly_value_quantiles_envelope(ray_session):
    """Windowed t-digest: each window's p50/p90/p99 estimates must sit
    within a 5% rank-error envelope of the exact per-window value
    distribution, and merged n must equal the exact window row count."""
    import duckdb

    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        weekly_value_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    out = weekly_value_quantiles(sf, window_days=7)
    assert len(out) > 0
    ev = duckdb.sql(
        f"SELECT CAST(ts AS DATE) AS day, value "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).df()
    ev["day"] = np.array(ev["day"], dtype="datetime64[D]")
    for _, r in out.iterrows():
        lo = np.datetime64(r["window_start"], "D")
        hi = np.datetime64(r["window_end"], "D")
        vals = np.sort(
            ev[(ev["day"] >= lo) & (ev["day"] <= hi)]["value"].to_numpy()
        )
        assert r["n"] == len(vals)
        if not len(vals):
            continue
        for q, est in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
            rank = np.searchsorted(vals, est, side="right") / len(vals)
            assert abs(rank - q) <= 0.05, (r["window_start"], q, est, rank)
