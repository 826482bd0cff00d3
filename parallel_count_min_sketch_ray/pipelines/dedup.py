"""Near-duplicate detection over the documents table.

The large-scale training-data dedup family, each expressed Ray-Data-
first:

- exact dedup: content digest + groupby → ``analytics.dedup_exact``
- MinHash + LSH banding (this module): shingle → minhash → band rows →
  ``groupby(band)`` → candidate pairs → exact-Jaccard verify
- SimHash: 64-bit signatures, banded by 16-bit chunks, Hamming verify
- n-gram Jaccard: exact all-pairs similarity (the oracle for MinHash;
  O(n²) — only run on small corpora / within LSH buckets)

Shuffle discipline: the only all-to-all moves (band_hash → doc_ids)
rows — one small row per (doc, band), never document text.  Candidate
verification re-reads only candidate docs via a broadcast id set.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
from parallel_count_min_sketch_ray.pipelines.analytics import read
from parallel_count_min_sketch_ray.state.minhash import minhash_matrix, perm_params


def word_shingles(text: str, k: int = 3) -> list[str]:
    ws = text.split()
    if len(ws) < k:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


def shingle_hashes(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc uint64 shingle-hash sets (deduplicated)."""
    out = []
    for t in texts:
        sh = word_shingles(t, k)
        out.append(np.unique(hash64_strings(sh)) if sh else np.zeros(0, np.uint64))
    return out


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


class _MinHashBander:
    """map_batches stage: text → (band_id, band_hash, doc_id) rows.

    Permutation params build once per actor (__init__), signatures are
    one vectorized modmul per doc (minhash_matrix).
    """

    def __init__(self, num_perm: int, bands: int, shingle_k: int, seed: int):
        assert num_perm % bands == 0
        self._a, self._b = perm_params(num_perm, seed)
        self._bands = bands
        self._rows_per_band = num_perm // bands
        self._k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = minhash_matrix(shingle_hashes(texts, self._k), self._a, self._b)
        n = sigs.shape[0]
        band_mats = sigs.reshape(n, self._bands, self._rows_per_band)
        # hash each band slice to one uint64 via FNV over its bytes
        band_hash = np.empty((n, self._bands), dtype=np.uint64)
        for bidx in range(self._bands):
            sl = np.ascontiguousarray(band_mats[:, bidx, :])
            band_hash[:, bidx] = _rows_fnv(sl)
        return pa.table(
            {
                "band_id": np.repeat(np.arange(self._bands, dtype=np.int64), n),
                "band_hash": band_hash.T.reshape(-1).astype(np.int64),
                "doc_id": np.tile(doc_ids, self._bands).astype(np.int64),
            }
        )


def _rows_fnv(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over each row of a uint64 matrix."""
    h = np.full(mat.shape[0], np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    for c in range(mat.shape[1]):
        col = mat[:, c]
        for shift in (0, 16, 32, 48):  # fold 16 bits at a time
            h = (h ^ ((col >> np.uint64(shift)) & np.uint64(0xFFFF))) * prime
    return h


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard-verified.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold.  Candidates come from LSH banding (recall
    controlled by bands/rows-per-band); verification recomputes exact
    shingle Jaccard for candidate docs only.
    """

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    band_rows = ds.map_batches(
        _MinHashBander,
        fn_constructor_args=(num_perm, bands, shingle_k, seed),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one call per band_id (few, large groups); the per-bucket pair
        # expansion is a vectorized self-merge on band_hash — avoids
        # thousands of per-tiny-group Python calls
        m = g.merge(g, on="band_hash", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m[["doc_id_a", "doc_id_b"]].rename(
            columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
        )

    cand = (
        band_rows.groupby("band_id")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
        )
    cand = cand.drop_duplicates().astype(np.int64)

    # verify candidates: fetch only candidate docs (broadcast id set)
    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    need_set = set(need.tolist())
    docs = {}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
        if int(did) in need_set:
            docs[int(did)] = text
    sh = {d: shingle_hashes([docs[d]], shingle_k)[0] for d in docs}
    jac = np.array(
        [exact_jaccard(sh[a], sh[b]) for a, b in zip(cand["doc_a"], cand["doc_b"])]
    )
    out = cand.assign(jaccard=jac)
    out = out[out["jaccard"] >= threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per text from word hashes (Charikar 2002):
    sign of the per-bit sum of ±1 votes weighted by term frequency."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        ws = t.split()
        if not ws:
            out[i] = 0
            continue
        uniq, counts = np.unique(np.array(ws, dtype=object), return_counts=True)
        h = hash64_strings(list(uniq))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
        out[i] = np.packbits(
            (votes > 0).astype(np.uint8)[::-1], bitorder="little"
        ).view(np.uint64)[0]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_pairs(sf_dir: str, max_hamming: int = 8) -> pd.DataFrame:
    """SimHash near-dup pairs: (doc_a, doc_b, hamming <= max_hamming).

    Candidates via 16-bit chunk banding (a pair within Hamming<=3 of 64
    bits shares at least one exact 16-bit chunk by pigeonhole; wider
    radii trade recall) then exact Hamming verify.
    """

    def signatures(batch: pa.Table) -> pa.Table:
        sigs = simhash_signatures(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": sigs.astype(np.int64),  # bit-preserving view
            }
        )

    sig = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        signatures, batch_format="pyarrow"
    )
    rows = sig.to_pandas()
    sigs = rows["simhash"].to_numpy().astype(np.uint64)
    ids = rows["doc_id"].to_numpy()
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for chunk in range(4):
        part = ((sigs >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)).astype(np.int64)
        for i, p in enumerate(part):
            buckets[(chunk, int(p))].append(i)
    cand = set()
    for members in buckets.values():
        if len(members) > 1:
            for ii in range(len(members)):
                for jj in range(ii + 1, len(members)):
                    a, b = members[ii], members[jj]
                    cand.add((min(a, b), max(a, b)))
    if not cand:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64}
        )
    ai = np.array([c[0] for c in cand])
    bi = np.array([c[1] for c in cand])
    ham = hamming64(sigs[ai], sigs[bi])
    keep = ham <= max_hamming
    out = pd.DataFrame(
        {
            "doc_a": ids[ai[keep]],
            "doc_b": ids[bi[keep]],
            "hamming": ham[keep],
        }
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str, k: int = 3, threshold: float = 0.2
) -> pd.DataFrame:
    """Distributed exact all-pairs k-shingle Jaccard >= threshold.

    The full corpus's per-doc shingle-hash sets are broadcast once
    (small relative to text); each batch scores its docs against docs
    with larger ids.  O(n^2) by design — the exact oracle tier; LSH
    (:func:`minhash_lsh_pairs`) is the scale path.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy()
    sh = shingle_hashes(t["text"].to_pylist(), k)
    ref = ray.put((ids, sh))

    class PairScorer:
        def __init__(self, r, thr):
            self._ids, self._sh = ray.get(r)
            self._pos = {int(d): i for i, d in enumerate(self._ids)}
            self._thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for d in batch["doc_id"].to_numpy(zero_copy_only=False):
                i = self._pos[int(d)]
                a = self._sh[i]
                for j_idx in range(len(self._ids)):
                    if int(self._ids[j_idx]) <= int(d):
                        continue
                    jac = exact_jaccard(a, self._sh[j_idx])
                    if jac >= self._thr:
                        out_a.append(int(d))
                        out_b.append(int(self._ids[j_idx]))
                        out_j.append(jac)
            return pa.table(
                {
                    "doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "jaccard": pa.array(out_j, pa.float64()),
                }
            )

    out = read(sf_dir, "documents", ["doc_id"]).map_batches(
        PairScorer, fn_constructor_args=(ref, threshold), batch_format="pyarrow",
        concurrency=(1, 4), batch_size=64,
    ).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs_exact(
    texts: list[str], doc_ids: np.ndarray, k: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Brute-force exact k-shingle Jaccard for all pairs — the oracle
    MinHash-LSH recall is measured against (test/small-corpus use)."""
    sh = shingle_hashes(texts, k)
    rows = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = exact_jaccard(sh[i], sh[j])
            if jac >= threshold:
                rows.append((int(doc_ids[i]), int(doc_ids[j]), jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
