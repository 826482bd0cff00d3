"""CMS kernel property tests (no Ray) — SURVEY.md §5 test plan.

Ports the reference's embedded validation (micro demos at
``src/core/count_min_sketch.c:246-328``, accuracy harness at
``.c:205-242``) plus the merge-algebra properties MPI_SUM gave the
reference implicitly.
"""

from __future__ import annotations

import collections

import numpy as np
import pytest

from parallel_count_min_sketch_ray.state.cms import CountMinSketch


def mixture_stream(n: int, seed: int) -> np.ndarray:
    """The reference generator's mixture (scripts/gen_datasets.py:4-19):
    10% x=123, 10% x=456, 10% U[100,110], 70% U[1000,9999]."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    out = np.empty(n, dtype=np.int64)
    out[u < 0.10] = 123
    out[(u >= 0.10) & (u < 0.20)] = 456
    m = (u >= 0.20) & (u < 0.30)
    out[m] = rng.integers(100, 111, size=int(m.sum()))
    m = u >= 0.30
    out[m] = rng.integers(1000, 10000, size=int(m.sum()))
    return out


def serial_reference_update(cms: CountMinSketch, items) -> None:
    """The serial C semantics (cms_update_int loop, one item at a time) —
    the in-test reference for batch-kernel equivalence."""
    for it in items:
        x = np.uint64(it)
        for r in range(cms.depth):
            idx = int(((cms.a[r] * x + cms.b[r]) % np.uint64(cms.prime)) % np.uint64(cms.width))
            cms.table[r, idx] += np.uint64(1)
        cms.total += 1


def test_sizing_matches_reference_defaults():
    cms = CountMinSketch()  # eps=0.001, delta=0.1
    assert cms.width == 2719  # ceil(e/0.001), count_min_sketch.c:98
    assert cms.depth == 3  # ceil(ln(1/0.1)), count_min_sketch.c:99
    assert cms.table.shape == (3, 2719)


def test_invalid_params_rejected():
    for eps, delta in [(0, 0.1), (1.5, 0.1), (0.01, 0), (0.01, 1.0), (-1, 0.5)]:
        with pytest.raises(ValueError):
            CountMinSketch(eps=eps, delta=delta)


def test_basic_update_query_demo():
    """Port of test_basic_update_query_demo (count_min_sketch.c:274-299)."""
    cms = CountMinSketch(eps=0.01, delta=0.05, seed=7)
    cms.update(np.full(10, 123))
    cms.update(np.full(5, 456))
    assert cms.query_one(123) >= 10
    assert cms.query_one(456) >= 5
    assert cms.query_one(999) <= cms.error_bound()
    assert cms.total == 15


def test_range_query_demo():
    """Port of test_range_query_demo (count_min_sketch.c:301-328)."""
    cms = CountMinSketch(eps=0.001, delta=0.05, seed=3)
    cms.update(np.repeat([100, 105, 110], [5, 3, 2]))
    cms.update(np.array([50, 200]))  # outside the range
    est = cms.range_query(100, 110)
    assert est >= 10
    # naive range bias: each of the 11 point queries over-counts <= eps*N whp
    assert est <= 10 + 11 * cms.error_bound() + 11


def test_inner_product_demo():
    """Port of test_inner_product_demo (count_min_sketch.c:246-272):
    hand-set tables with a known row-dot minimum."""
    a = CountMinSketch(eps=0.5, delta=0.3, seed=1)
    b = a.empty_like()
    a.table[:] = 0
    b.table[:] = 0
    a.table[:, 0] = [1, 2, 1][: a.depth]
    b.table[:, 0] = [4, 2, 4][: a.depth]
    assert a.inner_product(b) == 4


def test_inner_product_estimates_join_size():
    """inner_product(sketch(A), sketch(B)) >= sum_x fA(x)*fB(x)."""
    sa = CountMinSketch(seed=11)
    sb = sa.empty_like()
    xs = mixture_stream(20000, seed=1)
    ys = mixture_stream(20000, seed=2)
    sa.update(xs)
    sb.update(ys)
    ca, cb = collections.Counter(xs.tolist()), collections.Counter(ys.tolist())
    exact = sum(ca[k] * cb.get(k, 0) for k in ca)
    est = sa.inner_product(sb)
    assert est >= exact
    assert est <= exact + sa.error_bound() * sb.total  # eps * Na * Nb bound


def test_inner_product_incompatible_raises():
    a = CountMinSketch(eps=0.01, delta=0.1, seed=1)
    b = CountMinSketch(eps=0.02, delta=0.1, seed=1)
    with pytest.raises(ValueError):
        a.inner_product(b)
    c = CountMinSketch(eps=0.01, delta=0.1, seed=2)  # different hash family
    with pytest.raises(ValueError):
        a.merge(c)


def test_batch_kernel_equals_serial_loop():
    """Vectorized bincount accumulate == sequential cms_update_int loop."""
    items = mixture_stream(3000, seed=5)
    fast = CountMinSketch(eps=0.01, delta=0.1, seed=9)
    slow = fast.empty_like()
    fast.update(items)
    serial_reference_update(slow, items)
    assert np.array_equal(fast.table, slow.table)
    assert fast.total == slow.total


def test_weighted_update_equals_repeated():
    cms1 = CountMinSketch(eps=0.01, delta=0.1, seed=9)
    cms2 = cms1.empty_like()
    vals = np.array([123, 456, 789])
    cnts = np.array([7, 3, 2])
    cms1.update(vals, cnts)
    cms2.update(np.repeat(vals, cnts))
    assert np.array_equal(cms1.table, cms2.table)
    assert cms1.total == cms2.total == 12


def test_accuracy_one_sided_and_bounded():
    """test_cms_accuracy semantics (count_min_sketch.c:205-242):
    estimate >= true for EVERY value (hard), within eps*N for >=1-delta."""
    items = mixture_stream(100_000, seed=21)
    cms = CountMinSketch()  # eps=1e-3, delta=0.1
    cms.update(items)
    truth = collections.Counter(items.tolist())
    vals = np.array(list(truth.keys()))
    ests = cms.query(vals)
    exact = np.array([truth[int(v)] for v in vals])
    assert (ests >= exact).all()  # one-sidedness, hard invariant
    within = (ests - exact) <= cms.error_bound()
    assert within.mean() >= 1 - cms.delta


def test_merge_associative_commutative_identity():
    parts = [mixture_stream(5000, seed=s) for s in range(4)]
    base_sk = CountMinSketch(eps=0.005, delta=0.1, seed=13)

    def sk(items=None):
        s = base_sk.empty_like()
        if items is not None:
            s.update(items)
        return s

    a, b, c = sk(parts[0]), sk(parts[1]), sk(parts[2])
    left = sk(parts[0]).merge(sk(parts[1])).merge(sk(parts[2]))
    right = sk(parts[1]).merge(sk(parts[2])).merge(sk(parts[0]))  # permuted
    assert left == right
    nested = sk(parts[0]).merge(sk(parts[1]).merge(sk(parts[2])))
    assert left == nested
    # identity: merging an empty sketch is a no-op
    assert sk(parts[0]).merge(sk()) == sk(parts[0])
    # distributed == serial: merge of per-part sketches == one-shot build
    merged = sk(parts[0]).merge(sk(parts[1])).merge(sk(parts[2])).merge(sk(parts[3]))
    allitems = np.concatenate(parts)
    assert merged == sk(allitems)


def test_serde_roundtrip():
    cms = CountMinSketch(eps=0.01, delta=0.2, seed=17)
    cms.update(mixture_stream(1000, seed=3))
    blob = cms.to_bytes()
    back = CountMinSketch.from_bytes(blob)
    assert back == cms
    from parallel_count_min_sketch_ray.state.base import sketch_from_bytes

    assert sketch_from_bytes(blob) == cms


def test_string_adapter():
    """djb2 pre-hash parity path (cms_update_str / cms_point_query_str)."""
    cms = CountMinSketch(eps=0.01, delta=0.1, seed=23)
    cms.update_strings(["alpha"] * 4 + ["beta"] * 2)
    assert cms.query_string("alpha") >= 4
    assert cms.query_string("beta") >= 2
    assert cms.query_string("gamma") <= cms.error_bound()
    assert cms.query_strings_sum(["alpha", "beta"]) >= 6


def test_weighted_update_rejects_bad_counts():
    """Negative or float counts must raise (ADVICE: a negative count
    wrapping to uint64 would break the one-sided est >= true bound)."""
    import pytest

    sk = CountMinSketch(seed=1)
    items = np.array([1, 2, 3], dtype=np.int64)
    with pytest.raises(ValueError, match="nonnegative"):
        sk.update(items, np.array([1, -2, 3]))
    with pytest.raises(ValueError, match="integer"):
        sk.update(items, np.array([1.5, 2.0, 3.0]))
    assert sk.total == 0  # rejected before any accumulation


def test_weighted_update_huge_counts_exact():
    """Counts above the float64-weights fast-path bound take the exact
    integer path: estimate equals the true sum."""
    sk = CountMinSketch(seed=1)
    big = np.int64(1) << 40
    sk.update(np.array([7, 7], dtype=np.int64), np.array([big, 3], dtype=np.int64))
    assert sk.query_one(7) >= int(big) + 3
    assert sk.total == int(big) + 3
