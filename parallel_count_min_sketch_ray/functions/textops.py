"""Vectorized text operators over Arrow string columns.

Used by the text-analysis pipelines (language-ID, quality scoring,
token counting, fingerprinting) and by the tokenizer that turns the
``documents`` table into the reference's item-stream shape.  Every
kernel is pyarrow.compute / numpy; no per-row Python in hot paths
except C-backed hashlib digests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from parallel_count_min_sketch_ray.functions.hashing import djb2_array, hash64_strings

# A small English stopword list for the language-ID / quality heuristics.
EN_STOPWORDS = (
    "the a an and or of to in is are was be on at for with that this it as by",
)
EN_STOP_SET = frozenset(EN_STOPWORDS[0].split())


def split_words(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """list<string> of space-separated words (duckdb ``string_split(text,' ')``
    parity; empty tokens removed on both sides)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern(col, pattern=" ")
    # drop empty strings defensively (double spaces); keeps SQL parity
    # with list_filter(..., x -> x <> '')
    flat = lists.flatten()
    keep = pc.not_equal(flat, "")
    if not pc.all(keep).as_py():
        np_off = np.asarray(lists.offsets, dtype=np.int64)
        keep_np = keep.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(keep_np)])
        counts = csum[np_off[1:]] - csum[np_off[:-1]]
        new_off = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=new_off[1:])
        return pa.ListArray.from_arrays(pa.array(new_off), flat.filter(keep))
    return lists


def word_count(col) -> np.ndarray:
    """Words per document (int64)."""
    return pc.list_value_length(split_words(col)).to_numpy(zero_copy_only=False).astype(np.int64)


def flat_words(col) -> pa.Array:
    """All words of a batch, flattened in row order (the item stream)."""
    return split_words(col).flatten()


def tokens_int32_from_text(col) -> tuple[pa.ListArray, np.ndarray]:
    """Tokenize text into int32 token ids via the djb2 string adapter
    (the reference's string path, ``cms_hashstr`` →
    ``src/core/count_min_sketch.c:14-27``): returns (tokens list array,
    flat int32 numpy).

    Vectorization: hash each batch's *unique* words once (vocabulary is
    tiny relative to the stream), then gather — O(vocab) Python, O(n)
    numpy.
    """
    lists = split_words(col)
    flat = lists.flatten()
    uniq = pc.unique(flat)
    uvals = uniq.to_pylist()
    uhash = (djb2_array(uvals) & np.uint64(0x7FFFFFFF)).astype(np.int32)
    idx = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
    flat_ids = uhash[idx]
    toks = pa.ListArray.from_arrays(lists.offsets, pa.array(flat_ids, pa.int32()))
    return toks, flat_ids


def quality_metrics(batch: pa.Table, text_col: str = "text") -> dict[str, np.ndarray]:
    """Deterministic per-doc quality scores (length / word / stopword
    ratios) — the 'quality scoring' stage of a training-data pipeline."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    words = split_words(col)
    n_words = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    off = np.asarray(words.offsets, dtype=np.int64)
    # segment sums via prefix sums — robust to empty rows, O(n) numpy
    csum_wlen = np.concatenate([[0], np.cumsum(wlen, dtype=np.int64)])
    sum_wlen = csum_wlen[off[1:]] - csum_wlen[off[:-1]]
    stop_mask = pc.is_in(
        flat, value_set=pa.array(sorted(EN_STOP_SET))
    ).to_numpy(zero_copy_only=False)
    csum_stop = np.concatenate([[0], np.cumsum(stop_mask.astype(np.int64))])
    n_stop = csum_stop[off[1:]] - csum_stop[off[:-1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        avg_word_len = np.where(n_words > 0, sum_wlen / np.maximum(n_words, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": avg_word_len,
        "stop_ratio": stop_ratio,
        "n_stopwords": n_stop,
    }


def split_buckets(ids, mod: int = 100) -> np.ndarray:
    """Deterministic content-independent split bucket per id:
    ``int(md5(str(id))[:8], 16) % mod`` — any node, any rerun, and the
    SQL oracle (``CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,8) AS
    BIGINT) % mod``) derive the identical assignment with no stored
    split table and no RNG state.  ``mod`` sets the rate granularity
    (100 for percent splits, 10_000 for basis-point sampling)."""
    digests = md5_digests([str(i) for i in ids])
    return np.fromiter(
        (int(d[:8], 16) % mod for d in digests), dtype=np.int64, count=len(digests)
    )


def language_id(batch: pa.Table, text_col: str = "text") -> np.ndarray:
    """n-gram-free heuristic language ID: stopword-hit ratio → 'en',
    else 'other'.  Deterministic; a stand-in for a fasttext-style model
    (which would load in an actor's __init__)."""
    m = quality_metrics(batch, text_col)
    return np.where(m["stop_ratio"] > 0.08, "en", "other")


def md5_digests(strings) -> list[str]:
    """Content digests (C-backed hashlib; matches duckdb ``md5(text)``)."""
    return [hashlib.md5(s.encode("utf-8")).hexdigest() for s in strings]


def md5_digests_arrow(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Content digests straight off a string column's Arrow buffers.

    The UTF-8 bytes already sit contiguous in the array's data buffer;
    hashing memoryview slices (offsets from the offsets buffer) skips
    the ``to_pylist`` str-decode + re-encode round trip of
    :func:`md5_digests`.  Identical output (asserted in tests)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.array([], pa.string())
    if col.null_count:  # documents text is non-null; fall back if not
        return pa.array(md5_digests(col.fill_null("").to_pylist()), pa.string())
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    buf_off = col.buffers()[1]
    buf_dat = col.buffers()[2]
    off = np.frombuffer(buf_off, dtype=off_dtype, count=n + 1 + col.offset)[
        col.offset :
    ]
    data = memoryview(buf_dat) if buf_dat is not None else memoryview(b"")
    return pa.array(
        [hashlib.md5(data[off[i] : off[i + 1]]).hexdigest() for i in range(n)],
        pa.string(),
    )


def word_windows(ws: list[str], k: int) -> list[str]:
    """All k-word windows of a word list as space-joined strings,
    sliced by offset from ONE normalized join (no per-window ``join`` —
    cumulative word lengths give each window's [start, end) in the
    joined string).  0 < len(ws) <= k yields the single whole-doc
    window; [] for no words.  Shared by shingling and fingerprinting —
    the offset arithmetic lives in exactly one place.
    """
    if not ws:
        return []
    if len(ws) <= k:
        return [" ".join(ws)]
    ns = " ".join(ws)
    lens = np.fromiter((len(w) for w in ws), dtype=np.int64, count=len(ws))
    ends = np.cumsum(lens + 1) - 1  # word i ends at ns[ends[i]] (excl.)
    starts = ends - lens
    n_win = len(ws) - k + 1
    return [ns[a:b] for a, b in zip(starts[:n_win], ends[k - 1 :])]


def rolling_fingerprint(strings, window: int = 8) -> np.ndarray:
    """Document fingerprint: min of rolling FNV hashes over word
    ``window``-shingles (winnowing-style); uint64 per doc.  Stable
    across runs; used for cheap near-dup pre-screening.

    Vectorized batch-wise: window substrings come from offset slices of
    the space-normalized text (cumulative word lengths — no per-window
    ``join``), ALL windows of the batch hash in ONE
    :func:`hash64_strings` call, and the per-doc min is a single
    ``np.minimum.reduceat`` over the window offsets."""
    n = len(strings)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    all_windows: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, s in enumerate(strings):
        wins = word_windows(s.split(), window) or [""]  # empty doc -> hash("")
        all_windows.extend(wins)
        counts[i] = len(wins)
    h = hash64_strings(all_windows)
    off = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=off[1:])
    return np.minimum.reduceat(h, off)
