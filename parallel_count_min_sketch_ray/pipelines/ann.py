"""Similarity search over an embedding column (list<float>).

Two tiers, per the scale plan:

- :func:`ann_topk` — brute-force cosine top-k against a *broadcast*
  query matrix: the query side rides ``ray.put`` once; each batch does
  one f64 matmul and emits only its local top-k per query (partial
  top-k), so the driver merges ``num_blocks × k`` candidate rows, not
  the corpus.  This is the exact baseline the oracle checks.
- :func:`ann_lsh_topk` — the scale path: random-hyperplane (SimHash)
  bucketing; only vectors sharing a bucket with the query are scored.
  Approximate (recall < 1), rows-only check + recall asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from parallel_count_min_sketch_ray.pipelines.analytics import read


def _matrix(batch_col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, via the flat
    values buffer (zero-copy up to the f32→f64 widening)."""
    col = batch_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """The fixed probe set: embeddings with vec_id < num_queries.

    Predicate pushdown: the filter rides ``pq.read_table(filters=...)``
    so row groups whose vec_id stats exclude the probe range are never
    read — the driver materializes ~num_queries rows, not the table.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", num_queries)],
    )
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    return ids[order], _matrix(t["embedding"])[order]


class _TopKScorer:
    """map_batches task stage: holds the normalized query matrix (tiny;
    ships once in the serialized function), emits per-batch top-k rows."""

    def __init__(self, qids, qmat, k: int):
        self._qids = qids
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        self._q = qmat / np.maximum(norms, 1e-30)
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _matrix(batch["embedding"])
        if mat.size == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "vec_id": pa.array([], pa.int64()),
                 "dot": pa.array([], pa.float64()),
                 "norm": pa.array([], pa.float64())}
            )
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        dots = mat @ self._q.T  # (n, q) — raw dot vs normalized queries
        norms = np.linalg.norm(mat, axis=1)
        sims = dots / np.maximum(norms, 1e-30)[:, None]
        k = min(self._k, mat.shape[0])
        out_q, out_v, out_dot, out_norm = [], [], [], []
        for j, qid in enumerate(self._qids):
            idx = np.argpartition(-sims[:, j], k - 1)[:k]
            out_q.append(np.full(k, qid, dtype=np.int64))
            out_v.append(vec_ids[idx].astype(np.int64))
            out_dot.append(dots[idx, j])
            out_norm.append(norms[idx])
        return pa.table(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "dot": np.concatenate(out_dot),
                "norm": np.concatenate(out_norm),
            }
        )


def ann_topk(sf_dir: str, k: int = 10, num_queries: int = 5) -> pd.DataFrame:
    """Exact cosine top-k: (query_id, vec_id, rank, sim), sim in f64,
    ties broken by vec_id ascending."""
    qids, qmat = load_queries(sf_dir, num_queries)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # task-based stage: the scorer instance (tiny normalized query
    # matrix) serializes once into the function export; tasks reuse
    # warm workers instead of paying actor-pool process startup
    cands = ds.map_batches(
        _TopKScorer(qids, qmat, k), batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    # driver-side final merge of the (num_blocks × k) candidates
    cands["sim"] = cands["dot"] / np.maximum(cands["norm"], 1e-30)
    cands = cands.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["sim"] = np.round(top["sim"], 4)  # oracle parity (f64 path both sides)
    return top[["query_id", "vec_id", "rank", "sim"]].reset_index(drop=True)


def embedding_norms(sf_dir: str):
    """Per-vector L2 norm in f64, rounded to 4 decimals (oracle parity)."""

    def norms(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch["embedding"])
        n = np.sqrt(np.einsum("ij,ij->i", mat, mat)) if mat.size else np.zeros(0)
        return pa.table(
            {"vec_id": batch["vec_id"], "norm": np.round(n, 4)}
        )

    return read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        norms, batch_format="pyarrow"
    )


def hyperplane_signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """SimHash bucket ids: sign pattern of projections onto ``planes``
    (b, d) → packed int64 bucket per row."""
    bits = (mat @ planes.T) > 0  # (n, b)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def ann_lsh_topk(
    sf_dir: str, k: int = 10, num_queries: int = 5, num_planes: int = 8, seed: int = 42
) -> pd.DataFrame:
    """LSH-bucketed ANN: score only vectors whose hyperplane bucket
    matches a query's bucket.  At scale the bucket column becomes the
    partitioning key (groupby('bucket')); here the filter happens
    inside the same scan.  Approximate: recall measured in tests."""
    qids, qmat = load_queries(sf_dir, num_queries)
    rng = np.random.default_rng(seed)
    d = qmat.shape[1]
    planes = rng.standard_normal((num_planes, d))
    qbuckets = hyperplane_signatures(qmat, planes)

    class BucketScorer:
        def __init__(self, qids_, qmat, planes_, qb, k):
            self._qids, self._planes, self._qb = qids_, planes_, qb
            norms = np.linalg.norm(qmat, axis=1, keepdims=True)
            self._q = qmat / np.maximum(norms, 1e-30)
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _matrix(batch["embedding"])
            out = {"query_id": [], "vec_id": [], "sim": []}
            if mat.size:
                vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
                buckets = hyperplane_signatures(mat, self._planes)
                norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
                for j, qid in enumerate(self._qids):
                    m = buckets == self._qb[j]
                    if not m.any():
                        continue
                    sims = (mat[m] @ self._q[j]) / norms[m]
                    kk = min(self._k, sims.size)
                    idx = np.argpartition(-sims, kk - 1)[:kk]
                    out["query_id"].append(np.full(kk, qid, dtype=np.int64))
                    out["vec_id"].append(vec_ids[m][idx].astype(np.int64))
                    out["sim"].append(sims[idx])
            return pa.table(
                {
                    "query_id": np.concatenate(out["query_id"]) if out["query_id"] else np.array([], np.int64),
                    "vec_id": np.concatenate(out["vec_id"]) if out["vec_id"] else np.array([], np.int64),
                    "sim": np.concatenate(out["sim"]) if out["sim"] else np.array([], np.float64),
                }
            )

    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cands = ds.map_batches(
        BucketScorer(qids, qmat, planes, qbuckets, k),
        batch_format="pyarrow", batch_size=65536,
    ).to_pandas()
    cands = cands.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank", "sim"]].reset_index(drop=True)


def _sq_dists(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via ||x||² − 2x·c + ||c||² — one
    matmul, O(n·k) memory (never the (n, k, d) broadcast tensor)."""
    x2 = np.einsum("ij,ij->i", x, x)
    c2 = np.einsum("ij,ij->i", cent, cent)
    return x2[:, None] - 2.0 * (x @ cent.T) + c2[None, :]


def kmeans_centroids(
    mat: np.ndarray, k: int, seed: int = 42, iters: int = 8
) -> np.ndarray:
    """Deterministic mini k-means (seeded init, fixed iterations) for
    the IVF coarse quantizer.  Runs driver-side on a bounded sample
    (the caller caps it); O(n·k) memory via :func:`_sq_dists`."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(mat.shape[0], size=min(k, mat.shape[0]), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = _sq_dists(mat, cent).argmin(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
    return cent


def ann_ivf_topk(
    sf_dir: str,
    k: int = 10,
    num_queries: int = 5,
    num_centroids: int | None = 16,
    nprobe: int | None = 4,
    seed: int = 42,
    max_train: int = 65536,
) -> pd.DataFrame:
    """IVF-bucketed ANN: vectors are assigned to their nearest k-means
    centroid; a query scores only vectors in its ``nprobe`` closest
    inverted lists.  At scale the centroid id is the partitioning key;
    here the probe-filter runs inside the scan.  Approximate — recall
    measured in tests against :func:`ann_topk`.

    ``num_centroids=None`` derives the list count from the corpus
    size (≈√n, the standard IVF sizing, clamped to [16, 4096] — free
    from parquet metadata), and ``nprobe=None`` then probes ~1/4 of
    the lists; the driver query keeps the explicit small-corpus
    defaults (16/4) so results stay comparable across rounds.

    The coarse quantizer trains on a bounded ``max_train``-row SAMPLE:
    a seeded ``Dataset.random_sample`` over the whole table (uniform —
    representative even when the input is sorted/clustered on disk),
    topped by ``limit(max_train)`` as the hard driver-memory bound.
    Never a full-table driver read."""
    import pyarrow.parquet as pq_

    n_rows = pq_.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if num_centroids is None:
        num_centroids = int(min(max(16, round(n_rows ** 0.5)), 4096))
    if nprobe is None:
        nprobe = max(2, num_centroids // 4)
    emb = read(sf_dir, "embeddings", ["embedding"])
    if n_rows > max_train:
        # oversample 20% so the post-sample limit() rarely truncates a
        # biased prefix; metadata row count is free (no scan)
        emb = emb.random_sample(min(1.0, 1.2 * max_train / n_rows), seed=seed)
    sample_rows = emb.limit(max_train).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, num_centroids, seed)
    qids, qmat = load_queries(sf_dir, num_queries)
    qprobes = np.argsort(_sq_dists(qmat, cent), axis=1)[:, :nprobe]

    class IVFScorer:
        def __init__(self, qids_, qmat, cent_, qprobes_, k):
            self._qids, self._cent, self._qprobes = qids_, cent_, qprobes_
            norms = np.linalg.norm(qmat, axis=1, keepdims=True)
            self._q = qmat / np.maximum(norms, 1e-30)
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _matrix(batch["embedding"])
            out_q, out_v, out_s = [], [], []
            if mat.size:
                ids = batch["vec_id"].to_numpy(zero_copy_only=False)
                assign = _sq_dists(mat, self._cent).argmin(axis=1)
                norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
                for j, qid in enumerate(self._qids):
                    m = np.isin(assign, self._qprobes[j])
                    if not m.any():
                        continue
                    sims = (mat[m] @ self._q[j]) / norms[m]
                    kk = min(self._k, sims.size)
                    idx = np.argpartition(-sims, kk - 1)[:kk]
                    out_q.append(np.full(kk, qid, dtype=np.int64))
                    out_v.append(ids[m][idx].astype(np.int64))
                    out_s.append(sims[idx])
            empty = (np.array([], np.int64), np.array([], np.int64), np.array([], np.float64))
            return pa.table(
                {
                    "query_id": np.concatenate(out_q) if out_q else empty[0],
                    "vec_id": np.concatenate(out_v) if out_v else empty[1],
                    "sim": np.concatenate(out_s) if out_s else empty[2],
                }
            )

    cands = read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        IVFScorer(qids, qmat, cent, qprobes, k),
        batch_format="pyarrow", batch_size=65536,
    ).to_pandas()
    cands = cands.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank", "sim"]].reset_index(drop=True)


def embedding_near_dup(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Exact near-duplicate pairs by cosine >= threshold (a < b).

    The corpus-side matrix is broadcast once; each batch scores itself
    against the full corpus and keeps only above-threshold pairs with
    a < b (no duplicate pairs across blocks).  At 100 TB this becomes
    LSH-bucket-then-verify; the exact version is the oracle.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full_ids = t["vec_id"].to_numpy()
    full = _matrix(t["embedding"])
    fnorm = np.maximum(np.linalg.norm(full, axis=1), 1e-30)
    ref = ray.put((full_ids, full / fnorm[:, None]))

    # task-based stage; the corpus-sized unit matrix stays in the
    # object store (ray.get is plasma-cached + zero-copy per worker)
    def pair_finder(batch: pa.Table) -> pa.Table:
        corpus_ids, corpus_unit = ray.get(ref)
        mat = _matrix(batch["embedding"])
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({"vec_id_a": pa.array([], pa.int64()),
                             "vec_id_b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        sims = unit @ corpus_unit.T  # (n_batch, n_corpus)
        ai, bi = np.nonzero(sims >= threshold)
        a_ids, b_ids = ids[ai], corpus_ids[bi]
        keep = a_ids < b_ids
        return pa.table(
            {
                "vec_id_a": a_ids[keep].astype(np.int64),
                "vec_id_b": b_ids[keep].astype(np.int64),
                "sim": sims[ai[keep], bi[keep]],
            }
        )

    out = read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        pair_finder, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"vec_id_a": pd.Series(dtype=np.int64),
             "vec_id_b": pd.Series(dtype=np.int64),
             "sim": pd.Series(dtype=np.float64)}
        )
    out["sim"] = np.round(out["sim"], 4)  # oracle parity
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def lsh_auto_params(
    n_rows: int,
    threshold: float,
    target_bucket: int = 256,
    target_recall: float = 0.8,
    min_planes: int = 4,
    max_tables: int = 32,
) -> tuple[int, int]:
    """Hyperplane-LSH sizing from the corpus row count.

    Planes: enough that the *expected* bucket occupancy ``n / 2^planes``
    stays at or under ``target_bucket`` (keeps in-bucket exact scoring
    sub-quadratic in the corpus).  Tables: enough that a pair at
    ``sim == threshold`` is bucketed together in at least one table with
    probability ``target_recall`` (``p = (1 - acos(s)/pi)^planes`` per
    table; ``1-(1-p)^T >= target_recall``), clamped to ``max_tables``
    (shuffle volume is ``n × tables`` rows).
    """
    n_rows = max(int(n_rows), 1)
    planes = max(min_planes, int(np.ceil(np.log2(max(n_rows / target_bucket, 1.0)))))
    p_match = (1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi) ** planes
    if p_match >= 1.0:
        tables = 1
    else:
        tables = int(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p_match)))
    return planes, int(np.clip(tables, 1, max_tables))


def embedding_near_dup_lsh(
    sf_dir: str,
    threshold: float = 0.4,
    num_planes: int | None = None,
    num_tables: int | None = None,
    seed: int = 7,
    max_bucket: int = 4096,
) -> pd.DataFrame:
    """Scale path for :func:`embedding_near_dup`: multi-table
    random-hyperplane LSH bucketing instead of an all-pairs broadcast.

    Each vector is hashed into ``num_tables`` independent hyperplane
    buckets; candidate pairs are scored exactly (cosine) WITHIN each
    bucket group only, then deduplicated across tables.  The shuffle
    moves each embedding ``num_tables`` times keyed by bucket — rows
    proportional to the corpus, never pairs; no stage holds the full
    corpus.  Approximate: a pair is found only if some table buckets it
    together (recall vs the exact oracle asserted in tests).

    Sizing is automatic by default (:func:`lsh_auto_params`): planes
    grow with the corpus so expected bucket occupancy ``n/2^planes``
    stays bounded, and tables grow to hold recall at the chosen
    threshold.  Hot-bucket guards for the dup-heavy norm:

    - identical vectors collapse before scoring (one unique row per
      duplicate cluster; member pairs expand via vectorized merges with
      the identical-pair sim computed from the same unit row — bit-equal
      to the uncollapsed path);
    - a bucket whose *unique*-vector count exceeds ``max_bucket``
      re-splits by extra shared hyperplanes, so no group scores more
      than ~``max_bucket``² sims (pairs split apart by every table's
      sub-split are the documented recall trade).
    """
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_rows = pf.metadata.num_rows
    auto_planes, auto_tables = lsh_auto_params(n_rows, threshold)
    if num_planes is None:
        num_planes = auto_planes
    if num_tables is None:
        num_tables = auto_tables

    # plane matrices derive from the seed; dim probed from one row
    rng = np.random.default_rng(seed)
    probe = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(probe["embedding"][0])
    planes = rng.standard_normal((num_tables, num_planes, dim))
    # shared sub-split planes for hot buckets (same for every bucket so
    # the split is deterministic and consistent across groups)
    sub_planes = np.random.default_rng(seed + 1).standard_normal((16, dim))

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch["embedding"])
        n = mat.shape[0]
        if n == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch["embedding"],
                }
            )
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = []
        for t in range(num_tables):
            b = hyperplane_signatures(mat, planes[t])
            key = (np.int64(t) << np.int64(num_planes)) | b
            parts.append(
                pa.table({"bucket": key, "vec_id": ids, "embedding": col})
            )
        return pa.concat_tables(parts)

    _EMPTY_PAIRS = pa.table(
        {
            "vec_id_a": pa.array([], pa.int64()),
            "vec_id_b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def score_subset(unit: np.ndarray, idx: np.ndarray, depth: int):
        """Exact sims over unique rows ``idx``, sub-splitting hot sets
        by the shared extra planes.  Yields (ua, ub, sim) index pairs."""
        if idx.size < 2:
            return
        if idx.size > max_bucket and depth < sub_planes.shape[0]:
            bits = (unit[idx] @ sub_planes[depth]) > 0
            yield from score_subset(unit, idx[bits], depth + 1)
            yield from score_subset(unit, idx[~bits], depth + 1)
            return
        sims = unit[idx] @ unit[idx].T
        ia, ib = np.triu_indices(idx.size, 1)
        keep = sims[ia, ib] >= threshold
        if keep.any():
            yield idx[ia[keep]], idx[ib[keep]], sims[ia[keep], ib[keep]]

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return _EMPTY_PAIRS
        mat = _matrix(g["embedding"])
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        inv = inv.ravel()
        unit = uniq / np.maximum(np.linalg.norm(uniq, axis=1), 1e-30)[:, None]
        members = pd.DataFrame({"c": inv, "id": ids})
        frames = []
        # intra-cluster: identical vectors; sim = the unit row's self-dot
        # (exactly what the uncollapsed path computes for that pair)
        counts = np.bincount(inv)
        if (counts > 1).any():
            self_sim = np.einsum("ij,ij->i", unit, unit)
            dup = members[counts[inv] > 1]
            m = dup.merge(dup, on="c", suffixes=("_a", "_b"))
            m = m[m["id_a"] < m["id_b"]]
            s = self_sim[m["c"].to_numpy()]
            keep = s >= threshold
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id_a": m["id_a"].to_numpy()[keep],
                            "vec_id_b": m["id_b"].to_numpy()[keep],
                            "sim": s[keep],
                        }
                    )
                )
        # inter-cluster: guarded exact scoring over unique rows, then
        # expand qualifying cluster pairs to member pairs via merges
        parts = list(score_subset(unit, np.arange(uniq.shape[0]), 0))
        if parts:
            ua = np.concatenate([p[0] for p in parts])
            ub = np.concatenate([p[1] for p in parts])
            ss = np.concatenate([p[2] for p in parts])
            sp = pd.DataFrame({"ca": ua, "cb": ub, "sim": ss})
            m = sp.merge(members.rename(columns={"c": "ca", "id": "id_a"}), on="ca")
            m = m.merge(members.rename(columns={"c": "cb", "id": "id_b"}), on="cb")
            a = m["id_a"].to_numpy()
            b = m["id_b"].to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id_a": np.minimum(a, b),
                        "vec_id_b": np.maximum(a, b),
                        "sim": m["sim"].to_numpy(),
                    }
                )
            )
        if not frames:
            return _EMPTY_PAIRS
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "vec_id_a": out["vec_id_a"].to_numpy().astype(np.int64),
                "vec_id_b": out["vec_id_b"].to_numpy().astype(np.int64),
                "sim": out["sim"].to_numpy().astype(np.float64),
            }
        )

    out = (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "vec_id_a": pd.Series(dtype=np.int64),
                "vec_id_b": pd.Series(dtype=np.int64),
                "sim": pd.Series(dtype=np.float64),
            }
        )
    out = out.drop_duplicates(subset=["vec_id_a", "vec_id_b"]).astype(
        {"vec_id_a": np.int64, "vec_id_b": np.int64, "sim": np.float64}
    )
    out["sim"] = np.round(out["sim"], 4)
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def embedding_clusters(
    sf_dir: str,
    num_clusters: int = 8,
    seed: int = 42,
    max_train: int = 65536,
) -> pd.DataFrame:
    """K-means cluster profile of the embedding corpus — the iterative
    clustering pattern as a first-class query: per cluster, member
    count and mean distance-to-centroid (the per-cluster inertia).

    Same scale topology as :func:`ann_ivf_topk`'s quantizer: the
    trainer sees a bounded seeded ``random_sample`` (never a full-table
    driver read); assignment + per-cluster partial (count, Σdist)
    reduce inside ``map_batches`` with the centroid matrix shipped in
    the task closure, so the shuffle is ``num_clusters`` rows per block
    — N-independent.  Deterministic (seeded init, fixed iteration
    count) → rows-only driver check; distributed == local recompute is
    asserted in pytest.
    """
    import pyarrow.parquet as pq_

    from ray.data.aggregate import Sum

    n_rows = pq_.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    emb = read(sf_dir, "embeddings", ["embedding"])
    if n_rows > max_train:
        emb = emb.random_sample(min(1.0, 1.2 * max_train / n_rows), seed=seed)
    sample_rows = emb.limit(max_train).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, num_clusters, seed)

    def assign_partial(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch["embedding"])
        if not mat.size:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "dist_sum": pa.array([], pa.float64()),
                }
            )
        d2 = _sq_dists(mat, cent)
        assign = d2.argmin(axis=1)
        dist = np.sqrt(d2[np.arange(len(assign)), assign])
        n = np.bincount(assign, minlength=num_clusters)
        s = np.bincount(assign, weights=dist, minlength=num_clusters)
        keep = n > 0
        return pa.table(
            {
                "cluster": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "n": pa.array(n[keep].astype(np.int64)),
                "dist_sum": pa.array(s[keep]),
            }
        )

    agg = (
        read(sf_dir, "embeddings", ["embedding"])
        .map_batches(assign_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("dist_sum", alias_name="dist_sum"))
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    agg["mean_dist"] = agg["dist_sum"] / agg["n"]
    return agg[["cluster", "n", "mean_dist"]]


def semantic_dedup(
    sf_dir: str,
    num_clusters: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    max_train: int = 65536,
    max_cluster: int = 4096,
):
    """Semantic deduplication, SemDeDup shape (Abbas et al. 2023,
    arXiv:2303.09540): k-means cluster the embedding corpus, then prune
    near-duplicates WITHIN each cluster by cosine — the
    cluster-then-prune pattern large corpora use where MinHash misses
    paraphrases (paraphrases share embedding direction, not shingles).

    Keep rule (deterministic): scan each (sub-)cluster in ``vec_id``
    order and keep a vector iff its cosine to every ALREADY-KEPT member
    is below ``threshold`` — the greedy maximal independent set, so
    exactly one representative (the min vec_id) survives per duplicate
    group.

    Scale topology: the quantizer trains on a bounded seeded sample
    (identical to :func:`embedding_clusters` / :func:`ann_ivf_topk`);
    assignment is one vectorized ``map_batches`` pass with the centroid
    matrix in the task closure; pruning runs per cluster group under
    ``groupby("cluster").map_groups``.  Per-cluster work is CAPPED: a
    cluster larger than ``max_cluster`` re-splits recursively on shared
    seeded hyperplanes (the :func:`embedding_near_dup_lsh` guard), so
    no group ever scores more than ~``max_cluster``² sims — duplicate
    pairs split across sub-buckets are the documented recall trade at
    that tier.  Only (vec_id, cluster, keep) rows move in the shuffle.

    Deterministic (seeded init, fixed iterations, id-ordered scan) →
    rows-only driver check; planted-paraphrase recall is asserted in
    pytest."""
    import pyarrow.parquet as pq_

    n_rows = pq_.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    emb = read(sf_dir, "embeddings", ["embedding"])
    if n_rows > max_train:
        emb = emb.random_sample(min(1.0, 1.2 * max_train / n_rows), seed=seed)
    sample_rows = emb.limit(max_train).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    cent = kmeans_centroids(sample, num_clusters, seed)
    probe = next(
        pq_.ParquetFile(f"{sf_dir}/embeddings.parquet").iter_batches(
            batch_size=1, columns=["embedding"]
        )
    )
    dim = len(probe["embedding"][0])
    sub_planes = np.random.default_rng(seed + 1).standard_normal((16, dim))

    def assign(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch["embedding"])
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not mat.size:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": col,
                }
            )
        return pa.table(
            {
                "cluster": pa.array(_sq_dists(mat, cent).argmin(axis=1)),
                "vec_id": batch["vec_id"],
                "embedding": col,
            }
        )

    def prune_subset(unit: np.ndarray, idx: np.ndarray, depth: int, keep: np.ndarray):
        """Greedy id-ordered keep over members ``idx`` (already sorted
        by vec_id), sub-splitting oversized sets on shared planes."""
        if idx.size == 0:
            return
        if idx.size > max_cluster and depth < sub_planes.shape[0]:
            bits = (unit[idx] @ sub_planes[depth]) > 0
            prune_subset(unit, idx[bits], depth + 1, keep)
            prune_subset(unit, idx[~bits], depth + 1, keep)
            return
        sims = unit[idx] @ unit[idx].T
        kept_local = np.zeros(idx.size, dtype=bool)
        for j in range(idx.size):
            prior = kept_local[:j]
            if not prior.any() or sims[:j][prior, j].max() < threshold:
                kept_local[j] = True
        keep[idx[kept_local]] = True

    def prune_cluster(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        mat = _matrix(g["embedding"])[order]
        ids = ids[order]
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-30)[:, None]
        keep = np.zeros(ids.size, dtype=bool)
        prune_subset(unit, np.arange(ids.size), 0, keep)
        cluster = g["cluster"][0].as_py()
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(np.full(ids.size, cluster, dtype=np.int64)),
                "keep": pa.array(keep),
            }
        )

    return (
        read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune_cluster, batch_format="pyarrow")
    )


def embedding_principal_directions(
    sf_dir: str, ell: int = 64, k: int = 8
) -> pd.DataFrame:
    """Top-k principal directions / spectral energy of the embedding
    corpus via a distributed Frequent Directions matrix sketch
    (:mod:`..state.fd`, Liberty 2013 / Ghashami et al. 2016) — the
    deterministic matrix analogue of Misra–Gries, riding the same
    merge-tree machinery as the counting sketches.

    Each partition folds its rows into an ``ell×d`` partial; partials
    merge by stack-and-shrink with the published covariance guarantee
    ``||A'A - B'B||_2 <= ||A||_F^2 / ell``, so a 100 TB corpus's top
    singular structure reaches the driver as a few KB.  The exact
    ``||A||_F^2`` rides alongside, making ``energy_fraction`` an exact
    denominator and the spectral bound checkable post hoc (asserted vs
    a full SVD in pytest at test scale; rows-only driver check)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        SketchSpec,
        build_sketches,
    )
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    ds = read(sf_dir, "embeddings", ["embedding"])
    rep = build_sketches(
        ds,
        [SketchSpec("fd", FrequentDirections(ell=ell), "embedding", kind="matrix")],
    )
    fd = rep["fd"]
    s, _ = fd.top_directions(k)
    # an all-zero corpus has fro2 == 0 with zero singular values:
    # energy fractions are 0, not 0/0
    energy = s**2 / fd.fro2 if fd.fro2 > 0 else np.zeros_like(s)
    return pd.DataFrame(
        {
            "rank": np.arange(1, s.size + 1, dtype=np.int64),
            "singular_value": np.round(s, 6),
            "energy_fraction": np.round(energy, 8),
            "n_rows": np.int64(fd.n),
            "spectral_error_bound": np.float64(round(fd.error_bound(), 6)),
        }
    )
