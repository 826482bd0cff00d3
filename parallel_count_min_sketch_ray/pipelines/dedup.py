"""Near-duplicate detection over the documents table.

The large-scale training-data dedup family, each expressed Ray-Data-
first:

- exact dedup: content digest + groupby → ``analytics.dedup_exact``
- MinHash + LSH banding (this module): shingle → minhash → band rows →
  ``groupby(band)`` → candidate pairs → exact-Jaccard verify over the
  candidate docs only (broadcast id set, distributed re-shingle)
- SimHash: 64-bit signatures, banded by 16-bit chunks into a
  distributed ``groupby(bucket)``, Hamming-verified inside each group
- n-gram Jaccard: exact all-pairs similarity via a distributed
  inverted shingle index — co-occurrence counting, never an O(n²)
  corpus scan

Shuffle discipline: every all-to-all moves small derived rows — one
row per (doc, band) / (doc, shingle-hash) — never document text.  No
stage reads the full corpus on the driver; driver-side work is always
proportional to the candidate/output set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
from parallel_count_min_sketch_ray.functions.textops import word_windows
from parallel_count_min_sketch_ray.pipelines.analytics import read
from parallel_count_min_sketch_ray.state.minhash import minhash_matrix, perm_params


def word_shingles(text: str, k: int = 3) -> list[str]:
    ws = text.split()
    if len(ws) < k:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


def shingle_hashes(texts: list[str], k: int = 3) -> list[np.ndarray]:
    """Per-doc uint64 shingle-hash sets (deduplicated).

    Vectorized batch-wise: shingle strings come from offset slices of
    the space-normalized text (no per-shingle ``join``), the whole
    batch hashes in ONE (chunked) :func:`hash64_strings` call, and
    per-doc dedup is a numpy ``unique`` over each doc's hash segment.
    Identical output to hashing :func:`word_shingles` per doc."""
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    all_windows: list[str] = []
    for i, s in enumerate(texts):
        wins = word_windows(s.split(), k)
        all_windows.extend(wins)
        counts[i] = len(wins)
    h = hash64_strings(all_windows)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return [
        np.unique(h[off[i] : off[i + 1]]) if counts[i] else np.zeros(0, np.uint64)
        for i in range(n)
    ]


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def _shingle_list_array(sh: list[np.ndarray]) -> pa.ListArray:
    """list<uint64> column from per-doc shingle-hash arrays (offsets +
    one concatenated values buffer — no per-element Python)."""
    lens = np.fromiter((s.size for s in sh), dtype=np.int64, count=len(sh))
    off = np.zeros(len(sh) + 1, dtype=np.int32)
    np.cumsum(lens, out=off[1:])
    flat = np.concatenate(sh) if len(sh) else np.zeros(0, np.uint64)
    return pa.ListArray.from_arrays(pa.array(off), pa.array(flat, pa.uint64()))


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


class _CandidateShingler:
    """map_batches verify stage: re-shingle ONLY the candidate docs and
    replicate each candidate's shingle set to its pair-buckets.

    The candidate id set and the (doc → pair-bucket) multimap are
    candidate-proportional, so they ship once inside the serialized
    task function (no object-store round-trip needed); each batch keeps
    only its candidate rows via a sorted-array membership test, so the
    full corpus streams through workers and only candidates' shingle
    sets (one row per (pair_bucket, doc)) leave the stage.
    """

    _SCHEMA = pa.schema(
        [
            ("pair_bucket", pa.int64()),
            ("doc_id", pa.int64()),
            ("size", pa.int64()),
            ("shingles", pa.list_(pa.uint64())),
        ]
    )

    def __init__(self, bucket_docs: np.ndarray, bucket_ids: np.ndarray, shingle_k: int):
        order = np.argsort(bucket_docs, kind="stable")
        self._bd_doc = np.asarray(bucket_docs, dtype=np.int64)[order]
        self._bd_bucket = np.asarray(bucket_ids, dtype=np.int64)[order]
        self._need = np.unique(self._bd_doc)
        self._k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if self._need.size:
            pos = np.clip(np.searchsorted(self._need, ids), 0, self._need.size - 1)
            mask = self._need[pos] == ids
        else:
            mask = np.zeros(ids.size, dtype=bool)
        if not mask.any():
            return self._SCHEMA.empty_table()
        ids_m = ids[mask]
        texts = batch.filter(pa.array(mask))["text"].to_pylist()
        sh = shingle_hashes(texts, self._k)
        sizes = np.fromiter((s.size for s in sh), dtype=np.int64, count=len(sh))
        sets = _shingle_list_array(sh)
        # replicate each doc's row to every pair-bucket it appears in
        lo = np.searchsorted(self._bd_doc, ids_m, side="left")
        hi = np.searchsorted(self._bd_doc, ids_m, side="right")
        take = np.concatenate(
            [np.arange(l, h) for l, h in zip(lo, hi)]
        ) if ids_m.size else np.zeros(0, np.int64)
        reps = hi - lo
        row_idx = np.repeat(np.arange(ids_m.size), reps)
        return pa.table(
            {
                "pair_bucket": self._bd_bucket[take],
                "doc_id": ids_m[row_idx],
                "size": sizes[row_idx],
                "shingles": sets.take(pa.array(row_idx, pa.int64())),
            }
        )


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
    controlled by bands/rows-per-band); verification is FULLY
    distributed: candidate docs re-shingle inside the corpus scan
    (:class:`_CandidateShingler`), each candidate's shingle set is
    replicated to its pair-buckets, and per-pair exact Jaccard is
    computed by a vectorized inverted-index merge INSIDE each
    ``groupby(pair_bucket)`` group (the same pattern as
    :func:`ngram_jaccard_pairs`).  The driver holds only the candidate
    pair list and receives only the thresholded pairs — no per-pair
    driver loop, no corpus on the driver.
    """

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    # task-based stage: the bander's state (permutation params) is a
    # few KB and serializes once into the function export — no actor
    # pool spin-up per query
    band_rows = ds.map_batches(
        _MinHashBander(num_perm, bands, shingle_k, seed), batch_format="pyarrow"
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

    # distributed verify: each pair gets a pair_bucket; candidate docs
    # re-shingle inside the scan and replicate to their pair-buckets;
    # exact Jaccard is a vectorized inverted-index merge per group
    from parallel_count_min_sketch_ray.stages.partitioning import num_shuffle_buckets

    num_buckets = num_shuffle_buckets()
    a = cand["doc_a"].to_numpy()
    b = cand["doc_b"].to_numpy()
    pb = ((a * np.int64(0x9E3779B9)) ^ b) % np.int64(num_buckets)
    doc_bucket = np.unique(
        np.stack([np.concatenate([a, b]), np.concatenate([pb, pb])], axis=1), axis=0
    )
    set_rows = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _CandidateShingler(doc_bucket[:, 0], doc_bucket[:, 1], shingle_k),
        batch_format="pyarrow",
    )
    pair_rows = ray.data.from_arrow(
        pa.table(
            {
                "pair_bucket": pb,
                "doc_id": np.full(pb.size, -1, dtype=np.int64),
                "size": np.full(pb.size, -1, dtype=np.int64),
                "shingles": pa.ListArray.from_arrays(
                    pa.array(np.zeros(pb.size + 1, dtype=np.int32)),
                    pa.array(np.zeros(0, np.uint64), pa.uint64()),
                ),
                "doc_a": a,
                "doc_b": b,
            }
        )
    )

    def add_pair_cols(batch: pa.Table) -> pa.Table:
        neg = np.full(batch.num_rows, -1, dtype=np.int64)
        return batch.append_column("doc_a", pa.array(neg)).append_column(
            "doc_b", pa.array(neg)
        )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        # per-pair exact Jaccard over EXACTLY the requested pairs in
        # this bucket — work is pairs-proportional (an inverted-index
        # self-merge here would recompute every co-bucket pair in every
        # bucket, which is quadratic under dup-heavy replication)
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype=np.int64),
                "doc_b": pd.Series(dtype=np.int64),
                "jaccard": pd.Series(dtype=np.float64),
            }
        )
        pairs = g[g["doc_a"] >= 0]
        sets = g[g["doc_a"] < 0]
        if pairs.empty:
            return empty
        sh = {
            int(d): np.asarray(s, dtype=np.uint64)
            for d, s in zip(sets["doc_id"], sets["shingles"])
        }
        a = pairs["doc_a"].to_numpy().astype(np.int64)
        b = pairs["doc_b"].to_numpy().astype(np.int64)
        jac = np.fromiter(
            (exact_jaccard(sh[x], sh[y]) for x, y in zip(a, b)),
            dtype=np.float64,
            count=a.size,
        )
        keep = jac >= threshold
        return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep], "jaccard": jac[keep]})

    out = (
        set_rows.map_batches(add_pair_cols, batch_format="pyarrow")
        .union(pair_rows)
        .groupby("pair_bucket")
        .map_groups(score, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
        )
    return (
        out.astype({"doc_a": np.int64, "doc_b": np.int64})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per text from word hashes (Charikar 2002):
    sign of the per-bit sum of ±1 votes weighted by term frequency.

    Vectorized batch-wise: summing ±1 votes weighted by term frequency
    over *unique* words equals summing over every word instance, so the
    whole batch's words hash in one (chunked) :func:`hash64_strings`
    call, the (words, 64) ±1 bit matrix reduces per doc with
    ``np.add.reduceat``, and the sign rows pack into uint64 in one
    ``packbits``.  Bit-identical to the per-doc loop (asserted in
    tests)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    words_per_doc = [t.split() for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=n)
    flat: list[str] = []
    for ws in words_per_doc:
        flat.extend(ws)
    if not flat:
        return out
    # hash the batch VOCABULARY once and gather — repeats are free
    arr = pa.array(flat, pa.string())
    uniq = pa.compute.unique(arr)
    uhash = hash64_strings(uniq.to_pylist())
    idx = pa.compute.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False)
    h = uhash[idx]
    nonempty = lens > 0
    # ±1 votes per bit, summed per doc via offsets (reduceat)
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    # sum raw 0/1 bits (small dtype, cache-friendly) and rescale:
    # Σ(2b-1) == 2Σb − len; the int64 (words, 64) ±1 matrix costs ~50x
    bit_sums = np.add.reduceat(
        ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32), offsets, axis=0
    )
    votes = 2 * bit_sums - lens[nonempty][:, None]
    # column order reversed to preserve the original per-doc packing
    # convention (vote j lands in signature bit 63-j)
    sig_bits = (votes > 0).astype(np.uint8)[:, ::-1]
    packed = np.packbits(sig_bits, axis=1, bitorder="little")  # (docs, 8) LE bytes
    out[nonempty] = packed.view(np.uint64).ravel()
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit Hamming distance: byte-LUT popcount (8 table
    gathers per element vs the naive 64 shift-and-mask passes)."""
    x = np.ascontiguousarray(np.asarray(a, dtype=np.uint64) ^ b)
    return (
        _POP8[x.view(np.uint8)]
        .reshape(x.shape + (8,))
        .sum(axis=-1, dtype=np.int64)
    )


_EMPTY_HAMMING = pd.DataFrame(
    {
        "doc_a": pd.Series(dtype=np.int64),
        "doc_b": pd.Series(dtype=np.int64),
        "hamming": pd.Series(dtype=np.int64),
    }
)


def _unique_sig_pairs(
    uniq: np.ndarray, max_hamming: int, max_unique: int, exclude_chunk: int, level: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hamming-verified pairs over *unique* signatures with a hot-bucket
    guard: if more than ``max_unique`` distinct signatures share one
    band, re-split them by the next 16-bit chunk (recursively through
    the other three chunks) instead of running an unguarded O(u²) triu.

    Each recursion level keeps only pairs that ALSO agree on the split
    chunk — the documented recall trade under adversarial skew (a pair
    lost here is still found via any of its other three chunk views).
    Distinct signatures must differ in some chunk, so three levels
    always terminate with singleton groups.  Returns (ua_idx, ub_idx,
    hamming) as indices into ``uniq``.
    """
    u = uniq.size
    if u < 2:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    if u <= max_unique or level > 3:
        ia, ib = np.triu_indices(u, 1)
        ham = hamming64(uniq[ia], uniq[ib])
        keep = ham <= max_hamming
        return ia[keep], ib[keep], ham[keep]
    chunk = (exclude_chunk + level) % 4
    sub = ((uniq >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)).astype(np.int64)
    order = np.argsort(sub, kind="stable")
    sub_sorted = sub[order]
    bounds = np.flatnonzero(np.diff(sub_sorted)) + 1
    outs_a, outs_b, outs_h = [], [], []
    for lo, hi in zip(
        np.concatenate([[0], bounds]), np.concatenate([bounds, [u]])
    ):
        if hi - lo < 2:
            continue
        idx = order[lo:hi]
        ia, ib, ham = _unique_sig_pairs(
            uniq[idx], max_hamming, max_unique, exclude_chunk, level + 1
        )
        outs_a.append(idx[ia])
        outs_b.append(idx[ib])
        outs_h.append(ham)
    if not outs_a:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return np.concatenate(outs_a), np.concatenate(outs_b), np.concatenate(outs_h)


def simhash_pairs(
    sf_dir: str, max_hamming: int = 8, max_unique_sigs: int = 4096
) -> pd.DataFrame:
    """SimHash near-dup pairs: (doc_a, doc_b, hamming <= max_hamming).

    Candidates via 16-bit chunk banding (a pair within Hamming<=3 of 64
    bits shares at least one exact 16-bit chunk by pigeonhole; wider
    radii trade recall), realized as a distributed
    ``groupby(chunk·2¹⁶ + band)`` — the same band-bucket shuffle as
    MinHash-LSH, one small row per (doc, chunk).  Hamming verification
    runs vectorized inside each bucket group; the driver only sees
    verified pairs (deduplicated across the 4 chunk views).

    Hot-bucket guards (the dup-heavy-corpus norm at 100 TB):

    - identical signatures collapse FIRST — a bucket of d duplicate
      docs costs one unique signature plus an output-proportional pair
      expansion (vectorized self-merge), never d²/2 Hamming evals;
    - buckets with more than ``max_unique_sigs`` *distinct* signatures
      re-split by the remaining 16-bit chunks
      (:func:`_unique_sig_pairs`) so no group is ever O(u²) beyond the
      cap; pairs disagreeing on every split chunk of every hot view are
      the documented recall trade.
    """

    def band_rows(batch: pa.Table) -> pa.Table:
        sigs = simhash_signatures(batch["text"].to_pylist())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = ids.size
        bucket = np.empty(4 * n, dtype=np.int64)
        for c in range(4):
            band = ((sigs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
            bucket[c * n : (c + 1) * n] = (np.int64(c) << np.int64(16)) | band
        return pa.table(
            {
                "bucket": bucket,
                "doc_id": np.tile(ids, 4),
                "simhash": np.tile(sigs.astype(np.int64), 4),  # bit-preserving
            }
        )

    def emit_verified(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return _EMPTY_HAMMING
        sig = g["simhash"].to_numpy().astype(np.uint64)  # bit-preserving view
        ids = g["doc_id"].to_numpy().astype(np.int64)
        uniq, inv = np.unique(sig, return_inverse=True)
        members = pd.DataFrame({"c": inv, "id": ids})
        frames = []
        # intra-cluster: identical signatures pair at Hamming 0 — one
        # vectorized self-merge, no hamming64 at all
        counts = np.bincount(inv)
        if (counts > 1).any():
            dup = members[counts[inv] > 1]
            m = dup.merge(dup, on="c", suffixes=("_a", "_b"))
            m = m[m["id_a"] < m["id_b"]]
            if len(m):
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_a": m["id_a"].to_numpy(),
                            "doc_b": m["id_b"].to_numpy(),
                            "hamming": np.zeros(len(m), dtype=np.int64),
                        }
                    )
                )
        # inter-cluster: Hamming over unique signatures (guarded), then
        # expand qualifying signature pairs to member pairs via merges
        exclude_chunk = int(g["bucket"].iat[0]) >> 16
        ua, ub, ham = _unique_sig_pairs(
            uniq, max_hamming, max_unique_sigs, exclude_chunk, 1
        )
        if ua.size:
            sp = pd.DataFrame({"ca": ua, "cb": ub, "hamming": ham})
            m = sp.merge(members.rename(columns={"c": "ca", "id": "id_a"}), on="ca")
            m = m.merge(members.rename(columns={"c": "cb", "id": "id_b"}), on="cb")
            a = m["id_a"].to_numpy()
            b = m["id_b"].to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": np.minimum(a, b),
                        "doc_b": np.maximum(a, b),
                        "hamming": m["hamming"].to_numpy(),
                    }
                )
            )
        if not frames:
            return _EMPTY_HAMMING
        return pd.concat(frames, ignore_index=True)

    pairs = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_verified, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return _EMPTY_HAMMING.copy()
    out = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64}
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via distributed inverted shingle index
# ---------------------------------------------------------------------------

_EMPTY_PARTIAL = pd.DataFrame(
    {
        "doc_a": pd.Series(dtype=np.int64),
        "doc_b": pd.Series(dtype=np.int64),
        "size_a": pd.Series(dtype=np.int64),
        "size_b": pd.Series(dtype=np.int64),
        "inter": pd.Series(dtype=np.int64),
    }
)


_ngram_pairs_cache: dict[tuple, pd.DataFrame] = {}


def ngram_jaccard_pairs(
    sf_dir: str,
    k: int = 3,
    threshold: float = 0.2,
    num_buckets: int = 64,
    max_df: int | None = None,
) -> pd.DataFrame:
    """Exact all-pairs k-shingle Jaccard >= threshold, distributed.

    Algorithm (inverted shingle index — no O(n²) corpus scan and no
    driver-side corpus read):

    1. explode each doc into (bucket, shingle_hash, doc_id, set_size)
       rows — one row per *unique* shingle per doc, bucketed by
       ``shingle_hash % num_buckets`` so groups are coarse;
    2. ``groupby(bucket)`` → vectorized self-merge on shingle_hash
       inside each group emits per-bucket partial co-occurrence counts
       (doc_a, doc_b, inter_partial) with both docs' set sizes carried
       along;
    3. pair-bucketed ``groupby(pair_bucket)`` sums partials into exact
       intersection sizes (vectorized pandas inside each coarse group —
       a fine-grained groupby(doc_a, doc_b) would shuffle the same rows
       but pay per-tiny-group overhead); jaccard = inter / (size_a +
       size_b - inter), thresholded inside the group.

    Work is Σ_shingle df² (co-occurring docs only) instead of n²; for
    corpora without degenerate hot shingles that is ~linear.  ``max_df``
    optionally drops shingles whose within-bucket document frequency
    exceeds it (an explicit approximation knob for adversarial corpora
    where one shingle appears in a large fraction of docs; ``None`` =
    exact).  Docs with zero shingles (empty text) pair at jaccard 1.0,
    matching :func:`exact_jaccard`'s both-empty convention, via a
    sentinel bucket.

    The (small, candidate-proportional) pair table is memoized per
    (sf_dir, Ray job, params) — ``neardup_components`` consumes the
    same pairs, and recomputing the heaviest shuffle in the suite for
    each downstream view is the anti-pattern ``token_counts`` already
    documents.
    """
    from parallel_count_min_sketch_ray.pipelines.analytics import _cache_key

    memo_key = (*_cache_key(sf_dir), "ngram_pairs", k, threshold,
                num_buckets, max_df)
    cached = _ngram_pairs_cache.get(memo_key)
    if cached is not None:
        return cached.copy()

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = shingle_hashes(texts, k)
        lens = np.fromiter((s.size for s in sh), dtype=np.int64, count=len(sh))
        flat = np.concatenate(sh) if len(sh) else np.zeros(0, np.uint64)
        doc_rep = np.repeat(ids, lens)
        size_rep = np.repeat(lens, lens)
        bucket = (flat % np.uint64(num_buckets)).astype(np.int64)
        empty = lens == 0  # sentinel rows so empty docs still pair (jac 1.0)
        if empty.any():
            bucket = np.concatenate([bucket, np.full(int(empty.sum()), -1)])
            flat = np.concatenate([flat, np.zeros(int(empty.sum()), np.uint64)])
            doc_rep = np.concatenate([doc_rep, ids[empty]])
            size_rep = np.concatenate([size_rep, np.zeros(int(empty.sum()), np.int64)])
        return pa.table(
            {
                "bucket": bucket,
                "shingle": flat.astype(np.int64),  # bit-preserving view
                "doc_id": doc_rep,
                "size": size_rep,
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            df_counts = g["shingle"].value_counts()
            hot = df_counts[df_counts > max_df].index
            if len(hot):
                g = g[~g["shingle"].isin(hot)]
        m = g.merge(g, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if m.empty:
            return _EMPTY_PARTIAL
        part = (
            m.groupby(["doc_id_a", "doc_id_b", "size_a", "size_b"])
            .size()
            .reset_index(name="inter")
        )
        return part.rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}).astype(
            {
                "doc_a": np.int64,
                "doc_b": np.int64,
                "size_a": np.int64,
                "size_b": np.int64,
                "inter": np.int64,
            }
        )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        pb = ((a * np.int64(0x9E3779B9)) ^ b) % np.int64(num_buckets)
        return batch.append_column("pair_bucket", pa.array(pb, pa.int64()))

    def sum_and_threshold(g: pd.DataFrame) -> pd.DataFrame:
        part = g.groupby(["doc_a", "doc_b", "size_a", "size_b"], as_index=False)[
            "inter"
        ].sum()
        inter = part["inter"].to_numpy().astype(np.float64)
        sa = part["size_a"].to_numpy().astype(np.float64)
        sb = part["size_b"].to_numpy().astype(np.float64)
        both_empty = (sa == 0) & (sb == 0)
        jac = np.where(both_empty, 1.0, inter / np.maximum(sa + sb - inter, 1.0))
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "doc_a": part["doc_a"].to_numpy()[keep],
                "doc_b": part["doc_b"].to_numpy()[keep],
                "jaccard": jac[keep],
            }
        )

    out = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(sum_and_threshold, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        out = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
        )
    else:
        out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    _ngram_pairs_cache[memo_key] = out
    return out.copy()


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


def union_find_components(pairs: "pd.DataFrame") -> dict[int, int]:
    """Connected components over a (doc_a, doc_b) edge list: map of
    doc_id -> component representative (the component's min doc_id).

    Runs driver-side: the edge list is the OUTPUT of a near-dup pass
    (candidate-proportional, thresholded), not the corpus.  At 100 TB
    the same contract holds — pairs are rare by construction — but if a
    corpus ever produced an edge list too big for one machine, the
    replacement is iterative hash-min label propagation (groupby(min)
    over labels joined to edges until fixpoint), same result.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the smaller doc_id becomes the root, so the
            # final representative needs no second pass
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def neardup_components_ds(
    sf_dir: str, k: int = 3, threshold: float = 0.2
):
    """Near-dup dedup as a CORPUS operation: exact k-shingle Jaccard
    pairs (:func:`ngram_jaccard_pairs`, distributed inverted index) →
    connected components → one representative (min doc_id) per
    component; every document gets a ``rep_id`` (its own id when it has
    no near-dup).  ``rep_id == doc_id`` is the keep-set of a transitive
    near-dedup pass — the step LLM-corpus pipelines actually run on the
    pair output.

    Distribution shape: pair generation is the existing distributed
    pass; components run on the driver over the thresholded pair list
    (output-proportional); the rep assignment is a broadcast-dict
    map_batches over the doc_id column only (no text re-read).

    Oracle: DuckDB recursive CTE (min-label reachability closure) over
    the same shingle self-join — see ``entry.oracle_sql``.
    """
    pairs = ngram_jaccard_pairs(sf_dir, k=k, threshold=threshold)
    rep = union_find_components(pairs)
    # broadcast as sorted parallel arrays: one searchsorted per batch
    # instead of a per-row Python dict probe
    keys = np.fromiter(rep.keys(), dtype=np.int64, count=len(rep))
    order = np.argsort(keys)
    rep_ref = ray.put((keys[order],
                       np.fromiter(rep.values(), dtype=np.int64,
                                   count=len(rep))[order]))

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k_sorted, v_sorted = ray.get(rep_ref)
        reps = ids.copy()
        if k_sorted.size:
            pos = np.searchsorted(k_sorted, ids)
            pos[pos == k_sorted.size] = 0
            hit = k_sorted[pos] == ids
            reps[hit] = v_sorted[pos[hit]]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "rep_id": pa.array(reps, pa.int64())})

    return (
        read(sf_dir, "documents", ["doc_id"])
        .map_batches(assign, batch_format="pyarrow")
    )


def neardup_components(
    sf_dir: str, k: int = 3, threshold: float = 0.2
) -> pd.DataFrame:
    """Driver/oracle surface of :func:`neardup_components_ds` — the
    materialized (doc_id, rep_id) table, sorted."""
    out = neardup_components_ds(sf_dir, k=k, threshold=threshold).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def label_propagation_components(
    pairs: "pd.DataFrame", max_iters: int = 64
) -> dict[int, int]:
    """Distributed connected components: iterative hash-min label
    propagation over Ray Data — the scale path :func:`union_find_components`'s
    docstring names, for edge lists too large to fold on one machine.

    Each round: every node offers its current label to its neighbors
    (one join-shaped map over the edge list), then ``groupby(node).min``
    adopts the smallest label seen.  Converges in O(component diameter)
    rounds; each round shuffles only (node, label) int64 pairs.  The
    edge list is iterated as a Dataset so nothing here requires the
    pairs to fit in worker memory — only the driver-side return does
    (use the per-node Dataset directly at true scale).

    Returns the same doc_id -> min-doc-of-component map as
    :func:`union_find_components` (asserted in tests).
    """
    import ray.data
    from ray.data.aggregate import Min

    if len(pairs) == 0:
        return {}
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    # symmetric edge table, one block per ~64k edges
    edges = pa.table(
        {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
    )
    nodes = np.unique(edges["src"].to_numpy())
    labels = {int(n): int(n) for n in nodes}

    edges_ref = ray.put(edges)

    for _ in range(max_iters):
        labels_ref = ray.put(labels)

        def offer(batch: pa.Table) -> pa.Table:
            lab = ray.get(labels_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            offered = np.array([lab[int(s)] for s in src], dtype=np.int64)
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "label": pa.array(offered, pa.int64())})

        offers = (
            ray.data.from_arrow(ray.get(edges_ref))
            .map_batches(offer, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label"))
            .take_all()
        )
        changed = 0
        for row in offers:
            node, lab = int(row["node"]), int(row["min(label)"])
            if lab < labels[node]:
                labels[node] = lab
                changed += 1
        if not changed:
            break
    return labels
