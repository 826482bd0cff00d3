"""Hot-bucket guards under dup-heavy skew (the 100-TB norm).

Round-3 scale-killer class: a band/bucket shared by thousands of
near-identical docs must NOT trigger an unguarded O(n²) in-group
verify.  These tests plant exactly that corpus shape and assert
(a) correctness is preserved (identical-signature pairs are exact,
capped runs stay subsets of uncapped runs) and (b) the guarded paths
run in bounded time/memory (unique-collapse means the planted corpus
costs one signature, not millions of Hamming evals).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def hot_corpus(tmp_path_factory):
    """documents corpus: 600 IDENTICAL docs (one simhash cluster, one
    md5 digest) + 40 distinct docs, some near the duplicate text."""
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(80)]
    base_words = list(rng.choice(vocab, size=50))
    base = " ".join(base_words)
    texts = [base] * 600
    for i in range(40):
        if i < 10:  # near-dup of the hot cluster: 2/50 words changed
            w = base_words.copy()
            for j in rng.choice(50, size=2, replace=False):
                w[j] = str(rng.choice(vocab))
            texts.append(" ".join(w))
        else:
            texts.append(" ".join(rng.choice(vocab, size=50)))
    ids = list(range(len(texts)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["src0"] * len(ids)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("hotcorpus")
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d), t


def test_simhash_planted_hot_bucket(ray_session, hot_corpus):
    """600 identical docs in one bucket: all C(600,2) Hamming-0 pairs
    come out via the unique-collapse path (no 600²/2 hamming64 evals)."""
    from parallel_count_min_sketch_ray.pipelines.dedup import simhash_pairs

    d, _ = hot_corpus
    out = simhash_pairs(d, max_hamming=4)
    zero = out[out["hamming"] == 0]
    n_dup = 600
    got = set(zip(zero["doc_a"].astype(int), zero["doc_b"].astype(int)))
    expect = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert expect <= got  # every identical pair found, at hamming 0


def test_simhash_cap_is_subset_and_keeps_identical(ray_session, hot_corpus):
    """A tiny max_unique_sigs forces the sub-band split: the result is
    a subset of the uncapped pairs, and identical-signature pairs
    (the dup-heavy payload) survive the cap untouched."""
    from parallel_count_min_sketch_ray.pipelines.dedup import simhash_pairs

    d, _ = hot_corpus
    full = simhash_pairs(d, max_hamming=6)
    capped = simhash_pairs(d, max_hamming=6, max_unique_sigs=2)
    fp = set(zip(full["doc_a"].astype(int), full["doc_b"].astype(int)))
    cp = set(zip(capped["doc_a"].astype(int), capped["doc_b"].astype(int)))
    assert cp <= fp
    zero_full = full[full["hamming"] == 0]
    zero_cap = capped[capped["hamming"] == 0]
    assert len(zero_cap) == len(zero_full)  # intra-cluster pairs uncapped


def test_unique_sig_pairs_cap_matches_uncapped_subset():
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        _unique_sig_pairs,
        hamming64,
    )

    rng = np.random.default_rng(3)
    # unique signatures clustered near a few patterns so some pairs are close
    bases = rng.integers(0, 2**63, size=5, dtype=np.int64).astype(np.uint64)
    sigs = []
    for b in bases:
        for _ in range(40):
            flip = np.uint64(0)
            for bit in rng.integers(0, 64, size=rng.integers(0, 6)):
                flip ^= np.uint64(1) << np.uint64(bit)
            sigs.append(b ^ flip)
    uniq = np.unique(np.array(sigs, dtype=np.uint64))
    ua, ub, ham = _unique_sig_pairs(uniq, 8, max_unique=10**9, exclude_chunk=0, level=1)
    # uncapped equals a brute triu
    ia, ib = np.triu_indices(uniq.size, 1)
    ref_ham = hamming64(uniq[ia], uniq[ib])
    ref = {(i, j) for i, j, h in zip(ia, ib, ref_ham) if h <= 8}
    assert {(int(i), int(j)) for i, j in zip(ua, ub)} == ref
    # capped is a subset with correct hamming values
    ua2, ub2, ham2 = _unique_sig_pairs(uniq, 8, max_unique=16, exclude_chunk=0, level=1)
    capped = {(int(i), int(j)) for i, j in zip(ua2, ub2)}
    assert capped <= ref
    assert (hamming64(uniq[ua2], uniq[ub2]) == ham2).all()


@pytest.fixture(scope="module")
def hot_embeddings(tmp_path_factory):
    """embeddings corpus: 300 IDENTICAL vectors + 100 random ones."""
    rng = np.random.default_rng(13)
    dim = 16
    base = rng.standard_normal(dim).astype(np.float32)
    vecs = np.vstack(
        [np.tile(base, (300, 1)), rng.standard_normal((100, dim)).astype(np.float32)]
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    d = tmp_path_factory.mktemp("hotemb")
    pq.write_table(t, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_embedding_lsh_hot_bucket_identical_vectors(ray_session, hot_embeddings):
    """300 identical embeddings: every C(300,2) pair found at sim 1.0
    through the unique-collapse path, and a tiny max_bucket (sub-plane
    split) cannot lose them (identical vectors never split)."""
    from parallel_count_min_sketch_ray.pipelines.ann import embedding_near_dup_lsh

    for kwargs in ({}, {"max_bucket": 8}):
        out = embedding_near_dup_lsh(hot_embeddings, threshold=0.9, **kwargs)
        dup = out[(out["vec_id_a"] < 300) & (out["vec_id_b"] < 300)]
        assert len(dup) == 300 * 299 // 2
        assert (dup["sim"] >= 0.9999).all()


def test_embedding_lsh_cap_subset(ray_session, hot_embeddings):
    from parallel_count_min_sketch_ray.pipelines.ann import embedding_near_dup_lsh

    full = embedding_near_dup_lsh(hot_embeddings, threshold=0.4)
    capped = embedding_near_dup_lsh(hot_embeddings, threshold=0.4, max_bucket=8)
    fp = set(zip(full["vec_id_a"].astype(int), full["vec_id_b"].astype(int)))
    cp = set(zip(capped["vec_id_a"].astype(int), capped["vec_id_b"].astype(int)))
    assert cp <= fp


def test_semantic_dedup_planted_paraphrases(ray_session, tmp_path):
    """SemDeDup recall 1.0 on planted paraphrase pairs: each pair is a
    base vector + tiny perturbation (cos > 0.999); unrelated vectors
    are random in d=64 (near-orthogonal, cos << threshold).  Exactly
    the min-vec_id member of each pair survives; every single does."""
    from parallel_count_min_sketch_ray.pipelines.ann import semantic_dedup

    rng = np.random.default_rng(5)
    dim, n_pairs, n_single = 64, 15, 40
    vecs, ids = [], []
    vid = 0
    pair_ids = []
    for _ in range(n_pairs):
        base = rng.standard_normal(dim)
        para = base + 0.001 * rng.standard_normal(dim)
        pair_ids.append((vid, vid + 1))
        vecs += [base, para]
        ids += [vid, vid + 1]
        vid += 2
    single_ids = list(range(vid, vid + n_single))
    for _ in range(n_single):
        vecs.append(rng.standard_normal(dim))
        ids.append(vid)
        vid += 1
    # guard the fixture itself: no accidental cross-pair near-dup
    m = np.asarray(vecs)
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = u @ u.T
    np.fill_diagonal(sims, 0.0)
    for a, b in pair_ids:
        assert sims[a, b] > 0.999
        sims[a, b] = sims[b, a] = 0.0
    assert sims.max() < 0.95, "fixture: unrelated cos must be below threshold"
    t = pa.table(
        {
            "vec_id": pa.array(np.array(ids, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = (
        semantic_dedup(str(tmp_path), num_clusters=1, threshold=0.95)
        .to_pandas().set_index("vec_id")["keep"]
    )
    assert len(out) == len(ids)
    for a, b in pair_ids:
        assert bool(out[a]) and not bool(out[b])
    assert all(bool(out[s]) for s in single_ids)


def test_semantic_dedup_identical_capped(ray_session, hot_embeddings):
    """300 identical vectors survive as exactly ONE representative (the
    min vec_id) even when max_cluster forces sub-plane re-splits —
    identical vectors always land on the same side of every plane, so
    the cap cannot separate a duplicate group."""
    from parallel_count_min_sketch_ray.pipelines.ann import semantic_dedup

    out = (
        semantic_dedup(hot_embeddings, num_clusters=2, max_cluster=32)
        .to_pandas()
    )
    assert len(out) == 400
    dup = out[out["vec_id"] < 300]
    assert int(dup["keep"].sum()) == 1
    assert int(dup.loc[dup["keep"], "vec_id"].iloc[0]) == 0


def test_lsh_auto_params_occupancy_bound():
    """Planes grow with n so expected bucket occupancy stays bounded;
    tables hold the recall target until the clamp."""
    from parallel_count_min_sketch_ray.pipelines.ann import lsh_auto_params

    for n in (10**3, 10**5, 10**7, 10**9):
        planes, tables = lsh_auto_params(n, threshold=0.4, target_bucket=256)
        assert n / 2**planes <= 256
        assert 1 <= tables <= 32
        if tables < 32:  # below the clamp the recall bound must hold
            p = (1 - np.arccos(0.4) / np.pi) ** planes
            assert 1 - (1 - p) ** tables >= 0.8


def test_minhash_distributed_verify_jaccard_parity(ray_session, hot_corpus):
    """The pair-bucket distributed verify returns the same exact
    Jaccard values as the brute-force oracle (no approximation crept in
    with the distribution)."""
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs_exact,
    )

    d, t = hot_corpus
    found = minhash_lsh_pairs(d, threshold=0.5)
    exact = ngram_jaccard_pairs_exact(
        t["text"].to_pylist(), t["doc_id"].to_numpy(), threshold=0.5
    )
    ex = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(exact["doc_a"], exact["doc_b"], exact["jaccard"])
    }
    got = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(found["doc_a"], found["doc_b"], found["jaccard"])
    }
    assert set(got) <= set(ex)  # precision 1.0 vs the same oracle
    assert all(abs(got[k] - ex[k]) < 1e-12 for k in got)
    # dup-heavy recall: the 600-identical cluster must be fully found
    dup_pairs = {k for k in ex if k[0] < 600 and k[1] < 600}
    assert dup_pairs <= set(got)
