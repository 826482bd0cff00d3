"""Text-analysis pipelines over documents: language ID, quality
scoring, regex token counting, fingerprinting, cross-split n-gram
decontamination — the per-document stages a training-data pipeline
runs before/alongside the sketches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from parallel_count_min_sketch_ray.functions import textops
from parallel_count_min_sketch_ray.functions.hashing import hash64_strings, splitmix64
from parallel_count_min_sketch_ray.pipelines.analytics import _group_sum, read
from parallel_count_min_sketch_ray.state.broadcast import (
    reserve as _broadcast_reserve,
    sketch_from_ref,
)

# BPE-ish word/number/punct tokens; RE2 syntax valid for both pyarrow
# and DuckDB's regexp_extract_all (oracle parity).
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def lang_quality(sf_dir: str):
    """Per-doc heuristic language ID + quality metrics (deterministic;
    the model-based version would be an actor-pool stage)."""

    def score(batch: pa.Table) -> pa.Table:
        m = textops.quality_metrics(batch)
        # derive the prediction from the already-computed metrics rather
        # than calling language_id() (which would recompute them)
        lang_pred = np.where(m["stop_ratio"] > 0.08, "en", "other")
        # ratios stay unrounded: both sides divide the same exact ints,
        # so the float64 results are bit-identical with the SQL oracle
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(lang_pred, pa.string()),
                "n_words": m["n_words"],
                "n_stopwords": m["n_stopwords"],
                "stop_ratio": m["stop_ratio"],
                "avg_word_len": m["avg_word_len"],
            }
        )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def token_count_regex(sf_dir: str, pattern: str = BPE_ISH_PATTERN):
    """Per-doc count of regex token matches (BPE-ish tokenizer stand-in;
    vectorized RE2 via pyarrow, SQL oracle via regexp_extract_all)."""

    def count(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = pc.count_substring_regex(col, pattern)
        return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": n.cast(pa.int64())})

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


# PII patterns in the RE2 subset shared by pyarrow and DuckDB (no
# lookaround); replacement ORDER is part of the contract (email → ip →
# phone) so scrubbed output is identical on both sides.  Detection
# counts are taken on the ORIGINAL text, so they are order-independent.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}"


def pii_scrub(sf_dir: str):
    """Per-doc PII redaction (the C4/RefinedWeb-style scrub step):
    count emails / IPv4s / international phone numbers, replace each
    with a typed placeholder, and report the scrubbed length.

    Stays a single vectorized ``map_batches`` pass — RE2 kernels
    (`count_substring_regex`, `replace_substring_regex`) over the Arrow
    string column, no per-row Python — so at 100 TB it is a pure map
    stage with zero shuffle.  `scrub_text` returns the full redacted
    column for composition into a write pipeline; the `queries()` entry
    returns the compact per-doc audit table (counts + scrubbed length),
    which is what the DuckDB oracle checks.
    """
    return _pii_table(sf_dir, keep_text=False)


def pii_scrub_text(sf_dir: str):
    """`pii_scrub` variant that keeps the redacted ``text`` column —
    the stage a curate-and-write pipeline would insert before the sink."""
    return _pii_table(sf_dir, keep_text=True)


def _pii_table(sf_dir: str, keep_text: bool):
    def scrub(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols = {
            "doc_id": batch["doc_id"],
            "n_emails": pc.count_substring_regex(col, PII_EMAIL).cast(pa.int64()),
            "n_ips": pc.count_substring_regex(col, PII_IP).cast(pa.int64()),
            "n_phones": pc.count_substring_regex(col, PII_PHONE).cast(pa.int64()),
        }
        red = pc.replace_substring_regex(col, PII_EMAIL, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_IP, "<IP>")
        red = pc.replace_substring_regex(red, PII_PHONE, "<PHONE>")
        cols["scrubbed_len"] = pc.utf8_length(red).cast(pa.int64())
        if keep_text:
            cols["text"] = red
        return pa.table(cols)

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow"
    )


def doc_fingerprints(sf_dir: str, window: int = 8):
    """Per-doc rolling-hash fingerprint (winnowing-style min-hash of
    word 8-shingles) as hex — cheap near-dup pre-screen key."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        prints = textops.rolling_fingerprint(texts, window)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array([f"{p:016x}" for p in prints], pa.string()),
            }
        )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# cross-split n-gram decontamination (Bloom prefilter + exact verify)
# ---------------------------------------------------------------------------


_WIN_C = np.uint64(0x100000001B3)  # FNV prime: odd -> bijective per step


def _window_key_stream(
    text_col, w: int, doc_mask: np.ndarray
) -> tuple["pa.Array", np.ndarray, np.ndarray]:
    """Vectorized w-gram keys WITHOUT materializing window strings.

    Hashes each batch's *unique* words once (``hash64_strings`` over
    the vocabulary, gathered back via ``index_in``), then combines each
    full in-document window of ``w`` word hashes with a polynomial
    rolling scheme (``key = key * C + h`` per step, uint64 wraparound)
    — O(w·N) numpy adds/multiplies instead of O(bytes·w) string
    construction + rehashing.  The key function is shared by both
    splits so Bloom membership is consistent; exactness never rests on
    it (the final verify joins on the window *strings*, built lazily
    for hits only).

    Returns ``(flat_words, win_start, win_doc)`` implicitly keyed:
    flat word array of the batch, plus per-valid-window (global start
    index into ``flat_words``, doc index, key) as
    ``(flat, starts, docs, keys)``.
    """
    lists = textops.split_words(text_col)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    flat = lists.flatten()
    n = len(flat)
    if n < w:
        return flat, np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(
            0, np.uint64
        )
    uniq = pc.unique(flat)
    uh = hash64_strings(uniq.to_pylist())
    wh = uh[pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)]
    with np.errstate(over="ignore"):
        keys = wh[: n - w + 1].copy()
        for t in range(1, w):
            keys *= _WIN_C
            keys += wh[t : n - w + 1 + t]
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    valid = (doc_of[: n - w + 1] == doc_of[w - 1 :]) & doc_mask[
        doc_of[: n - w + 1]
    ]
    starts = np.flatnonzero(valid)
    return flat, starts, doc_of[starts], keys[starts]


def _window_strings(flat: "pa.Array", starts: np.ndarray, w: int) -> list[str]:
    """Materialize the (few) window strings at ``starts`` — space-joined
    ``w`` words from the flat batch word array."""
    return [" ".join(flat.slice(int(j), w).to_pylist()) for j in starts]


def _full_windows(texts: list[str], w: int) -> tuple[list[str], np.ndarray]:
    """All FULL w-word windows per doc (docs with < w words emit none —
    matching the oracle's ``len(words) >= w`` gate).  Returns (flat
    window list, per-doc window counts)."""
    wins: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = t.split()
        if len(ws) >= w:
            win = textops.word_windows(ws, w)
            wins.extend(win)
            counts[i] = len(win)
    return wins, counts


def _bloom_from_ref(ref) -> "object":
    """Per-worker-process deserialize-once cache for a broadcast Bloom
    (the shared :func:`..state.broadcast.sketch_from_ref` cache).

    ``sketch_from_ref`` is bound at MODULE level (not imported inside
    this body): this function executes on workers, and a by-name
    package import there fails whenever the driver's cwd/sys.path
    doesn't expose the repo — the module-level binding ships by value
    with the closure (see :mod:`..shipping`)."""
    return sketch_from_ref(ref)


_contamination_cache: dict[tuple, object] = {}


def _contamination_candidates(
    sf_dir: str, w: int = 8, train_pct: int = 90, shards: int = 1
):
    """EXACT verified cross-split overlaps as a Dataset of
    (doc_id, source, sh) rows — the shared core of
    :func:`decontaminate_ngram` (per-source counts) and
    :func:`curate_corpus` (contamination mask).  The result is
    memoized materialized per (sf_dir, Ray job, w, train_pct) — it is
    contamination-proportional (tiny), and both consumers ask for the
    identical table, so the corpus-wide Bloom prefilter scan runs once
    per session, not once per query (same policy as
    ``sketch_queries.tokenized_documents``).

    Stages:

    1. one scan emits the val side's per-batch-distinct shingles — a
       *dataset* (never driver state);
    2. a Bloom filter over the val shingle hashes is built with the
       bounded-fan-in merge tree (``build_sketches``) and broadcast
       ONCE via ``ray.put``;
    3. the train side prefilters its shingles against the Bloom inside
       ``map_batches`` — only Bloom-hit (doc, shingle) rows survive
       (true overlaps + <= fp_rate of the stream, zero false
       negatives);
    4. an exact hash-join of the candidates against the distinct val
       shingles removes the Bloom false positives — output is exact.

    Scale shape: the train-side shingle stream (≈ the corpus token
    count) never enters a shuffle — only candidates do (∝ true
    contamination + 1%), so the all-to-all volume is contamination-
    proportional, not corpus-proportional.  The val side (10% of the
    corpus) pays one groupby to dedupe the join build side; a hot
    boilerplate shingle therefore joins once, not once per val doc.

    ``shards`` is the extreme-scale path: with ``shards > 1`` the val
    keys route to ``key % shards`` and one Bloom per shard is built
    through the KEYED merge tree (``build_sketches_by_key``), so no
    single filter need hold the whole val shingle set — each worker
    probes the shard its key hashes to.  Output is bit-identical to
    the single-filter path (the exact join strips false positives
    either way); asserted in pytest.
    """
    from ray.data.aggregate import Count, Min, Sum

    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        SketchSpec,
        build_sketches,
    )
    from parallel_count_min_sketch_ray.state.bloom import BloomFilter

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    memo_key = (sf_dir, job, w, train_pct, shards)
    cached = _contamination_cache.get(memo_key)
    if cached is not None:
        return cached

    def val_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = textops.split_buckets(ids) >= train_pct
        # prune to the val split BEFORE any Python string conversion —
        # only ~10% of the corpus pays the window-string construction
        texts = pc.filter(batch["text"], pa.array(mask)).to_pylist()
        wins, _ = _full_windows(texts, w)
        uniq = pc.unique(pa.array(wins, pa.string()))
        # Bloom keys use the train side's polynomial word-hash scheme,
        # recomputed here FROM the distinct strings (each sh_v is itself
        # a w-word doc -> exactly one window each, order-aligned), so
        # membership is consistent across splits while the val string
        # set stays exactly deduped (exactness never rests on the key).
        _f, _s, _d, keys = _window_key_stream(
            uniq, w, np.ones(len(uniq), dtype=bool)
        )
        t = pa.table({"sh_v": uniq, "key": pa.array(keys)})
        if shards > 1:
            t = t.append_column(
                "shard", pa.array((keys % np.uint64(shards)).astype(np.int64))
            )
        return t

    docs = read(sf_dir, "documents", ["doc_id", "text", "source"])
    val_ds = docs.map_batches(val_shingles, batch_format="pyarrow").materialize()
    # capacity from the materialized count (cross-batch dupes only
    # inflate it, which only lowers the realized fp rate)
    n_val = max(1024, val_ds.count())
    if shards == 1:
        spec = SketchSpec(
            "bloom", BloomFilter(capacity=n_val, fp_rate=0.01, seed=42), "key",
            kind="numeric",
        )
        bloom = build_sketches(val_ds, [spec])["bloom"]
        blob_refs = [ray.put(bloom.to_bytes())]
    else:
        from parallel_count_min_sketch_ray.pipelines.sketch_build import (
            build_sketches_by_key,
        )

        # one filter per shard through the keyed merge tree: no single
        # Bloom holds the whole val set.  Per-shard capacity ~n/shards;
        # skew only raises that shard's realized fp rate (the exact
        # join strips false positives regardless).
        cap = max(1024, n_val // shards + 1)
        spec = SketchSpec(
            "bloom", BloomFilter(capacity=cap, fp_rate=0.01, seed=42), "key",
            kind="numeric",
        )
        grouped = {
            int(k): v for k, v in build_sketches_by_key(val_ds, "shard", [spec]).items()
        }
        empty = BloomFilter(capacity=cap, fp_rate=0.01, seed=42)
        blob_refs = [
            ray.put(
                (grouped[s]["bloom"] if s in grouped else empty).to_bytes()
            )
            for s in range(shards)
        ]

    def prefilter(batch: pa.Table) -> pa.Table:
        # the 90% side: window keys stream straight from per-word hashes
        # (no window-string construction); strings materialize only for
        # the (few) Bloom hits that the exact join then verifies
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = textops.split_buckets(ids) < train_pct
        flat, starts, docs, keys = _window_key_stream(batch["text"], w, mask)
        if len(blob_refs) == 1:
            hit = _bloom_from_ref(blob_refs[0]).contains(keys)
        else:
            # every shard's filter is probed per batch: size this
            # worker's deserialize-once cache to the full shard set, or
            # cyclic access over > capacity refs would miss on every
            # probe (LRU or not)
            _broadcast_reserve(len(blob_refs) + 4)
            hit = np.zeros(keys.size, dtype=bool)
            sh_of = (keys % np.uint64(len(blob_refs))).astype(np.int64)
            for s in np.unique(sh_of):
                m = sh_of == s
                hit[m] = _bloom_from_ref(blob_refs[s]).contains(keys[m])
        starts, docs = starts[hit], docs[hit]
        # hits are sparse (true overlaps + <= fp_rate of the stream):
        # build their strings and dedupe (doc, STRING) exactly so the
        # join sees each candidate pair once and exactness never rests
        # on the 64-bit key
        strings = np.array(_window_strings(flat, starts, w), dtype=object)
        if strings.size:
            order = np.lexsort((strings, docs))
            docs, strings = docs[order], strings[order]
            first = np.r_[
                True, (docs[1:] != docs[:-1]) | (strings[1:] != strings[:-1])
            ]
            docs, strings = docs[first], strings[first]
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False)[docs]
                ),
                "source": pa.array(
                    batch["source"].to_numpy(zero_copy_only=False)[docs],
                    pa.string(),
                ),
                "sh": pa.array(strings, pa.string()),
            }
        )

    cand = docs.map_batches(prefilter, batch_format="pyarrow")
    val_distinct = (
        val_ds.groupby("sh_v")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["sh_v"])
    )
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    num_partitions = max(2, min(4 * cpus, 1 + n_val // 2_000_000))
    joined = cand.join(
        val_distinct,
        join_type="inner",
        num_partitions=num_partitions,
        on=("sh",),
        right_on=("sh_v",),
    ).materialize()  # contamination-proportional: tiny, safe to pin
    _contamination_cache[memo_key] = joined
    return joined


def decontaminate_ngram(
    sf_dir: str, w: int = 8, train_pct: int = 90, shards: int = 1
):
    """Cross-split n-gram decontamination, EXACT: train-split documents
    sharing any full ``w``-gram with any val-split document, counted
    per source (the production eval-decontamination report).  All the
    machinery lives in :func:`_contamination_candidates`; ``shards > 1``
    selects the sharded-Bloom extreme-scale path (bit-identical
    output)."""
    from ray.data.aggregate import Min, Sum

    joined = _contamination_candidates(sf_dir, w, train_pct, shards)

    def per_source(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch["source"],
                "contaminated_docs": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        return _group_sum(t, ["source"])

    return (
        joined.groupby("doc_id")
        .aggregate(Min("source", alias_name="source"))  # distinct doc
        .map_batches(per_source, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("contaminated_docs", alias_name="contaminated_docs"))
    )


def dup_ngram_coverage(sf_dir: str, w: int = 8, n_buckets: int = 64):
    """Corpus-duplicated n-gram coverage per source — the
    substring-level duplication measurement of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (2022):
    for every FULL ``w``-word window occurrence, is that exact window
    present in >= 2 distinct documents anywhere in the corpus?
    Reports per source: total window occurrences, duplicated
    occurrences, and the duplicated fraction (EXACT, string-equality
    semantics — hashes are routing only).

    Scale shape (the repo's coarse-bucket exact-aggregate pattern):

    1. one scan emits PER-BATCH-DISTINCT ``(sh, source)`` partials
       (``occ`` = in-batch occurrences, ``ndocs`` = in-batch distinct
       docs; a doc never straddles batches, so both SUM exactly
       across batches);
    2. partials shuffle on ``hash64(sh) % n_buckets`` — exchange
       volume is distinct shingle strings per batch, not occurrences
       (duplicated text collapses before the wire), and identical
       strings always co-locate, so in-bucket string grouping is
       globally exact;
    3. in-bucket numpy segment sums give each shingle's global
       distinct-doc count and fold immediately to per-(bucket, source)
       sums — the final shuffle is ``n_buckets x sources`` rows.

    Extreme-scale upgrade (documented, not needed at this size): the
    :func:`_contamination_candidates` polynomial-key prefilter —
    first pass ships 8-byte window keys to find dup-candidate keys,
    second pass ships strings for candidates only.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        wins, counts = _full_windows(texts, w)
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "sh": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
                "ndocs": pa.array([], pa.int64()),
            }
        )
        if not wins:
            return empty
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        src = batch["source"].take(pa.array(doc_idx))
        t = pa.table(
            {
                "sh": pa.array(wins, pa.string()),
                "source": src,
                "doc": pa.array(doc_idx),
            }
        )
        g = t.group_by(["sh", "source"]).aggregate(
            [("doc", "count"), ("doc", "count_distinct")]
        )
        keys = hash64_strings(g["sh"].to_pylist())
        return pa.table(
            {
                "bucket": pa.array(
                    (keys % np.uint64(n_buckets)).astype(np.int64)
                ),
                "sh": g["sh"],
                "source": g["source"],
                "occ": g["doc_count"].cast(pa.int64()),
                "ndocs": g["doc_count_distinct"].cast(pa.int64()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        occ = g["occ"].to_numpy(dtype=np.int64)
        nd = g["ndocs"].to_numpy(dtype=np.int64)
        order = np.argsort(sh, kind="stable")
        sh_s = sh[order]
        starts = np.r_[0, np.flatnonzero(sh_s[1:] != sh_s[:-1]) + 1]
        seg = np.diff(np.r_[starts, len(sh_s)])
        nd_tot = np.add.reduceat(nd[order], starts)
        dup_row = np.empty(len(sh), dtype=bool)
        dup_row[order] = np.repeat(nd_tot >= 2, seg)
        out = pd.DataFrame(
            {
                "source": g["source"],
                "n_shingles": occ,
                "dup_shingles": np.where(dup_row, occ, np.int64(0)),
            }
        )
        return out.groupby("source", as_index=False).sum()

    def frac(batch: pa.Table) -> pa.Table:
        n = batch["n_shingles"].to_numpy(zero_copy_only=False)
        d = batch["dup_shingles"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dup_fraction",
            pa.array(d.astype(np.float64) / n.astype(np.float64)),
        )

    return (
        read(sf_dir, "documents", ["source", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("n_shingles", alias_name="n_shingles"),
            Sum("dup_shingles", alias_name="dup_shingles"),
        )
        .map_batches(frac, batch_format="pyarrow")
    )


def doc_dup_stats(sf_dir: str, w: int = 8, threshold: float = 0.5,
                  n_buckets: int = 64):
    """Per-DOCUMENT duplicated-window fraction — the granularity a
    curation pipeline actually filters on (drop docs that are mostly
    boilerplate shared with other docs; the doc-level view of
    :func:`dup_ngram_coverage`).  For each doc with >= ``w`` words:
    total window occurrences, occurrences whose exact window appears
    in >= 2 distinct docs corpus-wide, their ratio, and a
    ``flagged`` bit at ``ratio > threshold``.

    Scale shape: per-batch rows are already-distinct ``(sh, doc)``
    pairs with occurrence counts (a doc never straddles batches, so
    pairs are globally distinct and each shingle's distinct-doc count
    is a plain in-bucket segment COUNT).  Pairs shuffle once on
    ``hash64(sh) % n_buckets``; each bucket folds to per-doc partials
    before the small final per-doc sum — identical exchange class to
    :func:`dup_ngram_coverage`, output one row per eligible doc.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        wins, counts = _full_windows(texts, w)
        if not wins:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "occ": pa.array([], pa.int64()),
                }
            )
        idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        t = pa.table(
            {
                "sh": pa.array(wins, pa.string()),
                "doc_id": batch["doc_id"].take(pa.array(idx)),
            }
        )
        g = t.group_by(["sh", "doc_id"]).aggregate([("doc_id", "count")])
        keys = hash64_strings(g["sh"].to_pylist())
        return pa.table(
            {
                "bucket": pa.array(
                    (keys % np.uint64(n_buckets)).astype(np.int64)
                ),
                "sh": g["sh"],
                "doc_id": g["doc_id"],
                "occ": g["doc_id_count"].cast(pa.int64()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        occ = g["occ"].to_numpy(dtype=np.int64)
        order = np.argsort(sh, kind="stable")
        sh_s = sh[order]
        starts = np.r_[0, np.flatnonzero(sh_s[1:] != sh_s[:-1]) + 1]
        seg = np.diff(np.r_[starts, len(sh_s)])
        dup_row = np.empty(len(sh), dtype=bool)
        dup_row[order] = np.repeat(seg >= 2, seg)  # rows ARE distinct docs
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_windows": occ,
                "dup_windows": np.where(dup_row, occ, np.int64(0)),
            }
        )
        return out.groupby("doc_id", as_index=False).sum()

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_windows"].to_numpy(zero_copy_only=False)
        d = batch["dup_windows"].to_numpy(zero_copy_only=False)
        frac = d.astype(np.float64) / n.astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_windows": batch["n_windows"],
                "dup_windows": batch["dup_windows"],
                "dup_fraction": pa.array(frac),
                "flagged": pa.array(frac > threshold),
            }
        )

    return (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("n_windows", alias_name="n_windows"),
            Sum("dup_windows", alias_name="dup_windows"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def repetition_stats(sf_dir: str, threshold: float = 0.75):
    """Intra-document repetition quality signal (the Gopher-rule
    shape): per doc, the duplicate-word fraction
    ``1 - distinct_words / words`` and a flag above ``threshold``.
    Highly repetitive documents are the classic low-quality stratum of
    web corpora.

    Embarrassingly parallel — one scan, no shuffle: the per-doc
    distinct count is an Arrow ``group_by([doc, token])`` inside the
    batch (C++ hash-agg, no per-row Python), scattered back to row
    order.  A document's words never split across blocks.
    """

    def stats(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        n_words = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        n = len(n_words)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_words)
        pairs = pa.table({"d": pa.array(doc_of), "w": lists.flatten()})
        distinct_pairs = pairs.group_by(["d", "w"]).aggregate([])
        per_doc = (
            distinct_pairs.group_by(["d"]).aggregate([("w", "count")])
        )
        n_distinct = np.zeros(n, dtype=np.int64)
        n_distinct[per_doc["d"].to_numpy(zero_copy_only=False)] = per_doc[
            "w_count"
        ].to_numpy(zero_copy_only=False)
        dup_frac = np.where(
            n_words > 0,
            1.0 - n_distinct / np.maximum(n_words, 1).astype(np.float64),
            0.0,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_distinct": pa.array(n_distinct),
                "dup_frac": pa.array(dup_frac),
                "flagged": pa.array(dup_frac > threshold),
            }
        )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def clean_corpus(sf_dir: str):
    """Training-data cleaning chain: quality filter → exact dedup →
    per-(lang, source) rollup, in ONE distributed pipeline.

    The dedup keeps each distinct text's minimum-doc_id row *with its
    metadata* via an argmin-by-packed-key aggregate: pack
    ``(zero-padded doc_id | n_words | lang | source)`` into one sortable
    string and take ``Min`` per digest — no second corpus pass, no
    broadcast keep-set, no per-group Python.  (Assumes '|' never occurs
    in lang/source values; zero-padding makes lexicographic order equal
    numeric doc_id order.)

    Quality gate (deterministic): n_words >= 10 and 2 <= avg word
    length <= 12 — the shape of a real corpus filter, checkable in SQL.
    """
    from ray.data.aggregate import Min, Sum

    def prep(batch: pa.Table) -> pa.Table:
        m = textops.quality_metrics(batch)
        keep = (m["n_words"] >= 10) & (m["avg_word_len"] >= 2.0) & (
            m["avg_word_len"] <= 12.0
        )
        kept = batch.filter(pa.array(keep))
        if kept.num_rows == 0:
            return pa.table(
                {"digest": pa.array([], pa.string()),
                 "packed": pa.array([], pa.string())}
            )
        dg = textops.md5_digests_arrow(kept["text"])
        ids = kept["doc_id"].to_numpy(zero_copy_only=False)
        nw = m["n_words"][keep]
        # vectorized packing: zero-padded id | n_words | lang | source
        id_str = pc.utf8_lpad(
            pc.cast(pa.array(ids), pa.string()), width=20, padding="0"
        )
        packed = pc.binary_join_element_wise(
            id_str,
            pc.cast(pa.array(nw), pa.string()),
            kept["lang"].combine_chunks()
            if isinstance(kept["lang"], pa.ChunkedArray) else kept["lang"],
            kept["source"].combine_chunks()
            if isinstance(kept["source"], pa.ChunkedArray) else kept["source"],
            "|",
        )
        return pa.table({"digest": dg, "packed": packed})

    reps = (
        read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("digest")
        .aggregate(Min("packed", alias_name="packed"))
    )

    def unpack(batch: pa.Table) -> pa.Table:
        col = batch["packed"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, pattern="|")
        flat = parts.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        mat = flat.reshape(n, 4) if n else np.zeros((0, 4), object)
        return pa.table(
            {
                "lang": pa.array(mat[:, 2], pa.string()),
                "source": pa.array(mat[:, 3], pa.string()),
                "n_docs": pa.array(np.ones(n, dtype=np.int64)),
                "n_tokens": pa.array(mat[:, 1].astype(np.int64) if n else np.zeros(0, np.int64)),
            }
        )

    return (
        reps.map_batches(unpack, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )


class QualityModelStage:
    """Actor-pool inference stage: hashed bag-of-words features → a
    deterministic linear quality score — the batched-model-scoring
    pattern (the real-model siblings swap the weight vector for loaded
    checkpoint tensors; the Ray plumbing is identical).

    Model "load" happens ONCE per actor in ``__init__`` (the seeded
    weight vector here; a multi-GB checkpoint in production — exactly
    why this is a callable CLASS on an actor pool, not a task fn).
    Per batch: one vectorized feature pass (unique-word hashing +
    ``np.add.at`` scatter into an (n_docs, dim) count matrix) and one
    matmul + sigmoid.  No RNG at call time: scores are a pure function
    of (text, dim, seed).
    """

    def __init__(self, dim: int = 256, seed: int = 42):
        self.dim = int(dim)
        # seeded deterministic weights in [-1, 1): splitmix64 of the
        # feature index — any worker builds the identical "model"
        with np.errstate(over="ignore"):  # intentional uint64 wraparound
            idx = np.arange(self.dim, dtype=np.uint64) + np.uint64(
                seed
            ) * np.uint64(0x9E3779B97F4A7C15)
        h = splitmix64(idx)
        self.weights = (h.astype(np.float64) / 2**63) - 1.0
        self.bias = float(self.weights.mean())

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        n_words = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        n = len(n_words)
        flat = lists.flatten()
        uniq = pc.unique(flat)
        ub = hash64_strings(uniq.to_pylist()) % np.uint64(self.dim)
        buckets = ub[pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)]
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_words)
        x = np.zeros((n, self.dim), dtype=np.float64)
        np.add.at(x, (doc_of, buckets.astype(np.int64)), 1.0)
        x /= np.maximum(n_words, 1)[:, None]  # length-normalized tf
        logits = x @ self.weights + self.bias
        score = 1.0 / (1.0 + np.exp(-logits))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "model_score": pa.array(score),
            }
        )


def quality_model_scores(sf_dir: str, dim: int = 256, concurrency=(1, 4)):
    """Batched model inference over the corpus on an ACTOR POOL —
    per-actor setup in ``__init__``, vectorized scoring per batch.
    Deterministic (seeded weights), so reruns and the pytest
    single-process recompute agree bit-for-bit."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        QualityModelStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )


def curated_survivor_rows(
    sf_dir: str,
    w: int = 8,
    train_pct: int = 90,
    rep_threshold: float = 0.75,
    mask_broadcast_limit: int = 2_000_000,
):
    """The curation chain's SURVIVING documents as a Dataset of
    (doc_id, lang, source, n_tokens) rows — the shared core of
    :func:`curate_corpus` (per-(lang, source) rollup) and
    :func:`curate_and_write` (resumable partitioned output):

        train-split selection (md5 buckets, :func:`..analytics.doc_split_stats`)
        → quality gate (length / avg-word-len, :func:`clean_corpus`)
        → repetition gate (dup-word fraction, :func:`repetition_stats`)
        → exact dedup keeping min-doc_id WITH metadata (argmin-packed-key)
        → n-gram decontamination mask (:func:`_contamination_candidates`).

    Scale notes: the gates and packing are one vectorized scan; dedup
    shuffles digests.  The contamination mask is TIERED on the size of
    the candidate set (the ``bloom_semijoin_count`` policy): at or
    below ``mask_broadcast_limit`` candidate rows, the DISTINCT
    contaminated train doc_ids broadcast via ``ray.put`` and mask in a
    vectorized batch filter (zero extra shuffle); above it, the dedup
    survivors ANTI-JOIN the candidate doc_ids on ``doc_id``
    (``Dataset.join(join_type="left_anti")`` — duplicate right-side
    keys cannot multiply an anti-join, so the candidate table needs no
    pre-dedup pass) and NOTHING corpus- or contamination-proportional
    ever materializes on the driver.  Both branches produce identical
    rows (asserted in pytest with a planted high-contamination corpus
    forcing the anti-join tier).
    """
    from ray.data.aggregate import Min

    cand = _contamination_candidates(sf_dir, w, train_pct)
    # cand is memoized-materialized (contamination-proportional), so
    # count() is a metadata read, not a pass
    broadcast_mask = cand.count() <= mask_broadcast_limit
    if broadcast_mask:
        cont_ids = np.sort(
            np.unique(
                cand.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy()
            )
        )
        cont_ref = ray.put(cont_ids)

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = textops.quality_metrics(batch)
        # repetition: per-doc distinct-word count via Arrow hash-agg
        lists = textops.split_words(batch["text"])
        n_words = m["n_words"]
        doc_of = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
        pairs = pa.table({"d": pa.array(doc_of), "w": lists.flatten()})
        per_doc = (
            pairs.group_by(["d", "w"]).aggregate([]).group_by(["d"]).aggregate(
                [("w", "count")]
            )
        )
        n_distinct = np.zeros(len(n_words), dtype=np.int64)
        n_distinct[per_doc["d"].to_numpy(zero_copy_only=False)] = per_doc[
            "w_count"
        ].to_numpy(zero_copy_only=False)
        dup_frac = np.where(
            n_words > 0,
            1.0 - n_distinct / np.maximum(n_words, 1).astype(np.float64),
            0.0,
        )
        keep = (
            (textops.split_buckets(ids) < train_pct)
            & (n_words >= 10)
            & (m["avg_word_len"] >= 2.0)
            & (m["avg_word_len"] <= 12.0)
            & (dup_frac <= rep_threshold)
        )
        kept = batch.filter(pa.array(keep))
        if kept.num_rows == 0:
            return pa.table(
                {"digest": pa.array([], pa.string()),
                 "packed": pa.array([], pa.string())}
            )
        dg = textops.md5_digests_arrow(kept["text"])
        id_str = pc.utf8_lpad(
            pc.cast(kept["doc_id"], pa.string()), width=20, padding="0"
        )
        packed = pc.binary_join_element_wise(
            id_str,
            pc.cast(pa.array(n_words[keep]), pa.string()),
            kept["lang"].combine_chunks()
            if isinstance(kept["lang"], pa.ChunkedArray) else kept["lang"],
            kept["source"].combine_chunks()
            if isinstance(kept["source"], pa.ChunkedArray) else kept["source"],
            "|",
        )
        return pa.table({"digest": dg, "packed": packed})

    reps = (
        read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("digest")
        .aggregate(Min("packed", alias_name="packed"))
    )

    def unpack_rows(batch: pa.Table) -> pa.Table:
        """(doc_id, lang, source, n_tokens) from the packed argmin keys."""
        col = batch["packed"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, pattern="|")
        flat = parts.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        mat = flat.reshape(n, 4) if n else np.zeros((0, 4), object)
        ids = mat[:, 0].astype(np.int64) if n else np.zeros(0, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "lang": pa.array(mat[:, 2], pa.string()),
                "source": pa.array(mat[:, 3], pa.string()),
                "n_tokens": pa.array(
                    mat[:, 1].astype(np.int64) if n else np.zeros(0, np.int64)
                ),
            }
        )

    rows = reps.map_batches(unpack_rows, batch_format="pyarrow")

    if broadcast_mask:

        def mask(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, ray.get(cont_ref))))

        return rows.map_batches(mask, batch_format="pyarrow")

    # extreme-contamination tier: distributed anti-join on doc_id —
    # the mask never touches the driver
    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized() else 4
    )
    return rows.join(
        cand.select_columns(["doc_id"]),
        join_type="left_anti",
        num_partitions=max(2, min(4 * cpus, 1 + cand.count() // 2_000_000)),
        on=("doc_id",),
    )


def curate_corpus(
    sf_dir: str,
    w: int = 8,
    train_pct: int = 90,
    rep_threshold: float = 0.75,
    mask_broadcast_limit: int = 2_000_000,
):
    """FLAGSHIP curation chain — the full LLM training-data assembly
    composed as one program (see :func:`curated_survivor_rows` for the
    stages and the tiered contamination mask), reduced to the
    per-(lang, source) rollup — SQL-checkable END-TO-END (one CTE
    chain oracle)."""
    from ray.data.aggregate import Sum

    rows = curated_survivor_rows(
        sf_dir, w, train_pct, rep_threshold, mask_broadcast_limit
    )

    def rollup(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": batch["lang"],
                "source": batch["source"],
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "n_tokens": batch["n_tokens"],
            }
        )
        return _group_sum(t, ["lang", "source"])

    return (
        rows.map_batches(rollup, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


def curate_and_write(
    sf_dir: str,
    out_root: str = "/tmp/pcmr-curate-write",
    w: int = 8,
    train_pct: int = 90,
    rep_threshold: float = 0.75,
):
    """END-TO-END curate-and-write flagship: the curation chain
    (:func:`curated_survivor_rows`) → NEAR-DUP drop (one representative
    per n-gram-Jaccard connected component, via
    :func:`..dedup.neardup_components`) → resumable atomic partitioned
    Parquet write of the SURVIVING corpus (one ``part=<source>/`` dir
    per source, ``_SUCCESS`` manifest each, input-fingerprint guarded).
    Returns the written manifest (partition, n_docs, n_tokens, bytes).

    Near-dup rule (deterministic): among curation survivors sharing a
    connected component, only the MIN doc_id survivor is written — so a
    component whose representative failed curation still contributes
    its best remaining member.

    Scale shape: three hash joins (survivors ⋈ components;
    keep-set ⋈ survivors; keep-set ⋈ documents for text), all
    key-partitioned with nothing corpus-proportional on the driver; the
    write runs per source group under ``groupby("source").map_groups``
    with the atomic-rename + skip-completed machinery of
    :mod:`..pipelines.io` — a rerun recomputes the (cheap) keep-set but
    skips every completed partition's (expensive) write, returning the
    stored lineage instead.  Idempotent rerun asserted in pytest.  The
    output dir is driver-local /tmp by default (single-node); a real
    cluster points ``out_root`` at shared storage.
    """
    import hashlib
    import json as _json
    import os

    from ray.data.aggregate import Min

    from parallel_count_min_sketch_ray.pipelines.dedup import (
        neardup_components_ds,
    )
    from parallel_count_min_sketch_ray.pipelines.io import (
        _check_input_manifest,
        _partition_dir,
        input_fingerprint,
        write_partition_atomic,
    )

    doc_path = f"{sf_dir}/documents.parquet"
    tag = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    out_dir = os.path.join(out_root, tag)
    os.makedirs(out_dir, exist_ok=True)
    _check_input_manifest(out_dir, input_fingerprint(doc_path))

    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized() else 4
    )
    nparts = max(2, min(4 * cpus, 8))
    surv = curated_survivor_rows(sf_dir, w, train_pct, rep_threshold)
    comp = neardup_components_ds(sf_dir)  # (doc_id, rep_id), every doc
    # min surviving doc_id per component = the written representative
    keep = (
        surv.select_columns(["doc_id"])
        .join(comp, join_type="inner", num_partitions=nparts, on=("doc_id",))
        .groupby("rep_id")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )
    docs = read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    to_write = keep.join(
        docs, join_type="inner", num_partitions=nparts, on=("doc_id",)
    )

    def write_source(g) -> "pd.DataFrame":
        src = str(g["source"].iloc[0])
        n_tokens = int(
            sum(len([x for x in t.split(" ") if x]) for t in g["text"])
        )
        success = os.path.join(_partition_dir(out_dir, src), "_SUCCESS")
        if os.path.exists(success):
            with open(success) as f:
                rec = _json.load(f)
        else:
            g = g.sort_values("doc_id")
            rec = write_partition_atomic(
                out_dir,
                src,
                [pa.Table.from_pandas(g, preserve_index=False)],
            )
        return pd.DataFrame(
            {
                "partition": [src],
                "n_docs": np.array([len(g)], dtype=np.int64),
                "n_tokens": np.array([n_tokens], dtype=np.int64),
                "bytes": np.array([int(rec["bytes"])], dtype=np.int64),
            }
        )

    manifest = (
        to_write.groupby("source")
        .map_groups(write_source, batch_format="pandas")
        .to_pandas()  # one row per source — the documented small result
    )
    return manifest.sort_values("partition").reset_index(drop=True)


# ---------------------------------------------------------------------------
# LM-perplexity quality scoring and BM25 retrieval — the two classic
# lexical ops a curation pipeline runs after dedup (CCNet scores docs
# with an LM; BM25 selects in-domain documents for a topic mixture).
# ---------------------------------------------------------------------------


_ppl_cache: dict[tuple, object] = {}


def doc_perplexity(sf_dir: str):
    """Per-document add-one-smoothed bigram-LM perplexity — the
    LM-based quality filter of CCNet/C4-style curation (Wenzek et al.
    2020 score with KenLM; here the LM is a bigram model trained on the
    corpus itself in the same pipeline).

    ``P(b|a) = (c(ab)+1) / (c(a)+V)``; ``ppl(doc) = exp(-mean log P)``
    over the doc's bigram transitions.  Docs with <2 tokens have no
    transitions and drop out (the SQL side drops them via the bigram
    join).

    Fully distributed, nothing broadcast (a corpus-scale bigram
    vocabulary exceeds any broadcast budget), ONE wide shuffle:

    1. one scan emits per-doc-distinct ``(doc_id, tok_a, bigram, k)``
       rows bucketed by ``hash(tok_a)``, plus one ``(final_token, k)``
       row per document.  Every occurrence of a bigram lands in one
       bucket, so the corpus count ``c(ab)`` is a segment-sum WITHIN
       the bucket; and since every occurrence of token ``a`` is either
       followed by a token (a pair row) or document-final (a final
       row), ``c(a)`` is a segment-sum over BOTH row kinds in the same
       bucket — no unigram-table join or ``Dataset.union`` at all
       (a union feeding an all-to-all re-executes both branches in
       Ray's sort-sample phase; measured 3× slower at sf0.1);
    2. the smoothed log-prob terms are computed vectorized per bucket
       and pre-aggregated per doc, so the final ``doc_id`` groupby
       carries ≤ one row per (bucket, doc), not one per bigram.

    Skew note: a stopword-grade ``tok_a`` concentrates its bigrams in
    one bucket, bounded by ≤ one row per (doc, following-token) — the
    same bound as ``doc_top_tfidf``'s stopword analysis; per-bucket
    work stays a sort.

    Floats: log terms are irrational, so unlike the integer-exact
    queries both sides ``ROUND(·, 6)`` — cross-engine sum-order jitter
    is ~1e-13 against the 5e-7 rounding slack.
    """
    import pandas as pd

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        _cache_key,
        token_counts,
    )
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    # memoized materialized per (sf_dir, job): doc_perplexity and
    # curate_by_perplexity both consume the identical score table
    key = _cache_key(sf_dir)
    cached = _ppl_cache.get(key)
    if cached is not None:
        return cached

    n_buckets = num_shuffle_buckets()
    uni = token_counts(sf_dir)
    # V = distinct unigrams (the add-one smoothing denominator); the
    # memoized vocabulary table makes this a row count, not a scan
    vocab_size = float(uni.count())

    def _bucket_of(tokens: "pa.Array") -> np.ndarray:
        uniq = pc.unique(tokens)
        ub = (hash64_strings(uniq.to_pylist()) % np.uint64(n_buckets)).astype(
            np.int64
        )
        idx = pc.index_in(tokens, value_set=uniq).to_numpy(zero_copy_only=False)
        return ub[idx]

    def doc_pairs(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        off = np.asarray(lists.offsets, dtype=np.int64)
        flat = lists.flatten()
        total = len(flat)
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "bigram": pa.array([], pa.string()),
                "k": pa.array([], pa.int64()),
            }
        )
        if total < 1:
            return empty
        parts = []
        if total >= 2:
            big = pc.binary_join_element_wise(
                flat.slice(0, total - 1), flat.slice(1, total - 1), " "
            )
            # mask pairs spanning a doc boundary (same as bigram_counts)
            valid = np.ones(total - 1, dtype=bool)
            starts = off[1:-1]
            starts = starts[(starts >= 1) & (starts <= total - 1)]
            valid[starts - 1] = False
            owner = np.repeat(
                batch["doc_id"].to_numpy(zero_copy_only=False), np.diff(off)
            )[: total - 1]
            keep = pa.array(valid)
            t = pa.table(
                {
                    "doc_id": pa.array(owner[valid]),
                    "token": flat.slice(0, total - 1).filter(keep),
                    "bigram": big.filter(keep),
                    "k": pa.array(np.ones(int(valid.sum()), dtype=np.int64)),
                }
            )
            if t.num_rows:
                g = _group_sum(t, ["doc_id", "token", "bigram"])
                parts.append(("pair", g))
        # one row per document-final token: together with the pair rows
        # these account for every token occurrence, so c(a) needs no
        # separate unigram-table join
        nonempty = np.diff(off) > 0
        fin = flat.take(pa.array(off[1:][nonempty] - 1))
        if len(fin):
            ft = pa.table(
                {"token": fin, "k": pa.array(np.ones(len(fin), dtype=np.int64))}
            )
            parts.append(("final", _group_sum(ft, ["token"])))
        if not parts:
            return empty
        out = []
        for kind_name, g in parts:
            tok = g["token"]
            if isinstance(tok, pa.ChunkedArray):
                tok = tok.combine_chunks()
            n = g.num_rows
            is_pair = kind_name == "pair"
            out.append(
                pa.table(
                    {
                        "bucket": pa.array(_bucket_of(tok), pa.int64()),
                        "kind": pa.array(
                            np.full(n, 1 if is_pair else 0, dtype=np.int64)
                        ),
                        "doc_id": g["doc_id"]
                        if is_pair
                        else pa.array(np.full(n, -1, dtype=np.int64)),
                        "token": tok,
                        "bigram": g["bigram"]
                        if is_pair
                        else pa.array([""] * n, pa.string()),
                        "k": g["k"],
                    }
                )
            )
        return pa.concat_tables(out)

    def score_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "lp": pd.Series([], dtype=np.float64),
                "nb": pd.Series([], dtype=np.int64),
            }
        )
        kind = g["kind"].to_numpy()
        pairs = g[kind == 1]
        if not len(pairs):
            return empty

        def _seg_sum(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
            """Total of ``vals`` per distinct key, gathered at ``probe``."""
            order = np.argsort(keys, kind="stable")
            ks, vs = keys[order], vals[order]
            starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
            sums = np.add.reduceat(vs, starts)
            uniq = ks[starts]
            pos = np.minimum(np.searchsorted(uniq, probe), len(uniq) - 1)
            if not np.array_equal(uniq[pos], probe):
                raise ValueError("probe key missing from segment index")
            return sums[pos]

        k = pairs["k"].to_numpy()
        # corpus bigram count: every occurrence of a bigram shares its
        # first token, hence this bucket — a segment sum suffices
        c_ab = _seg_sum(pairs["bigram"].to_numpy(), k, pairs["bigram"].to_numpy())
        # corpus unigram count of the left context: every occurrence of
        # token a is either a pair row (followed by something) or a
        # doc-final row — both kinds live in this bucket
        c_a = _seg_sum(
            g["token"].to_numpy(), g["k"].to_numpy(), pairs["token"].to_numpy()
        )
        term = k * (np.log(c_ab + 1.0) - np.log(c_a + vocab_size))
        # pre-aggregate per doc before the cross-bucket shuffle
        did = pairs["doc_id"].to_numpy()
        do = np.argsort(did, kind="stable")
        did_s = did[do]
        dstarts = np.r_[0, np.flatnonzero(did_s[1:] != did_s[:-1]) + 1]
        return pd.DataFrame(
            {
                "doc_id": did_s[dstarts],
                "lp": np.add.reduceat(term[do], dstarts),
                "nb": np.add.reduceat(k[do], dstarts).astype(np.int64),
            }
        )

    def doc_bucketed(batch: pa.Table) -> pa.Table:
        b = batch["doc_id"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return batch.append_column("doc_bucket", pa.array(b, pa.int64()))

    def finalize_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        # coarse-bucket segment reduce (the doc_top_tfidf pattern; a
        # direct groupby(doc_id).aggregate() is ~10× slower because the
        # sort-based Aggregate samples boundaries over every key)
        d = g["doc_id"].to_numpy()
        o = np.argsort(d, kind="stable")
        d_s = d[o]
        starts = np.r_[0, np.flatnonzero(np.diff(d_s)) + 1]
        lp = np.add.reduceat(g["lp"].to_numpy()[o], starts)
        nb = np.add.reduceat(g["nb"].to_numpy()[o], starts)
        avg = lp / nb.astype(np.float64)
        return pd.DataFrame(
            {
                "doc_id": d_s[starts],
                "n_bigrams": nb.astype(np.int64),
                "avg_logprob": np.round(avg, 6),
                "ppl": np.round(np.exp(-avg), 6),
            }
        )

    pairs_ds = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_pairs, batch_format="pyarrow"
    )
    out = (
        pairs_ds.groupby("bucket")
        .map_groups(score_bucket, batch_format="pandas")
        .map_batches(doc_bucketed, batch_format="pyarrow")
        .groupby("doc_bucket")
        .map_groups(finalize_bucket, batch_format="pandas")
        .materialize()
    )
    _ppl_cache[key] = out
    return out


# Probe retrieval queries over the synthetic pipeline-vocab corpus
# (terms drawn from the same in-corpus vocabulary as
# sketch_queries.PROBE_WORDS; one stopword-heavy query on purpose).
BM25_QUERIES = ("data table row", "query join value", "the a data")


def bm25_topk(
    sf_dir: str,
    queries: tuple[str, ...] = BM25_QUERIES,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-``k`` retrieval (Robertson–Spärck Jones idf) for a
    fixed probe query set — the lexical-retrieval op a curation
    pipeline uses to select in-domain documents for a topic mixture.

    Two scans, zero shuffles (the inverse of the ANN brute-force shape,
    applied to lexical scoring):

    1. a stats pass emits ONE partial row per batch (per-term document
       frequencies + doc count + total length); a scalar aggregate
       reduces them — the driver receives |terms|+2 numbers;
    2. a scoring pass computes per-doc tf for the query terms
       vectorized (token-equality masks segment-summed by the list
       offsets — no per-row Python), scores docs × queries with the
       BM25 formula written in the oracle's exact operation order, and
       keeps a per-batch partial top-k per query; the driver merges
       ≤ blocks·|queries|·k candidate rows.

    Ranking is on ``(ROUND(score, 6) DESC, doc_id ASC)`` on both sides
    — equal-to-6-decimals scores tie-break deterministically, so the
    cross-engine libm/sum-order jitter (~1e-15 relative) cannot flip
    the ranking.
    """
    from ray.data.aggregate import Sum

    terms = sorted({t for q in queries for t in q.split()})
    t_index = {t: i for i, t in enumerate(terms)}

    def _tf_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, dl, tf[docs × terms]) for one batch, vectorized."""
        lists = textops.split_words(batch["text"])
        off = np.asarray(lists.offsets, dtype=np.int64)
        flat = lists.flatten()
        dl = np.diff(off)
        tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
        for j, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(m)])
            tf[:, j] = cs[off[1:]] - cs[off[:-1]]
        return batch["doc_id"].to_numpy(zero_copy_only=False), dl, tf

    def stats_partial(batch: pa.Table) -> pa.Table:
        _, dl, tf = _tf_matrix(batch)
        cols = {
            "n_docs": pa.array([np.int64(len(dl))]),
            "sum_dl": pa.array([np.int64(dl.sum())]),
        }
        for j in range(len(terms)):
            cols[f"df_{j}"] = pa.array([np.int64((tf[:, j] > 0).sum())])
        return pa.table(cols)

    docs = read(sf_dir, "documents", ["doc_id", "text"])
    aggs = [Sum("n_docs", alias_name="n_docs"), Sum("sum_dl", alias_name="sum_dl")]
    aggs += [Sum(f"df_{j}", alias_name=f"df_{j}") for j in range(len(terms))]
    st = docs.map_batches(stats_partial, batch_format="pyarrow").aggregate(*aggs)
    n_docs = int(st["n_docs"]) if st and st.get("n_docs") is not None else 0
    if n_docs == 0:
        # empty corpus: no avgdl to divide by — the typed empty result
        # (mirrors returned_item_revenue's empty-quarter guard)
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                "query": pd.Series(dtype=str),
                "doc_id": pd.Series(dtype=np.int64),
                "rnk": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
            }
        )
    avgdl = float(st["sum_dl"]) / n_docs
    df = np.array([int(st[f"df_{j}"]) for j in range(len(terms))], dtype=np.int64)
    # Robertson–Spärck Jones idf, same operation order as the SQL oracle
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    q_term_idx = [
        np.array([t_index[t] for t in q.split()], dtype=np.int64) for q in queries
    ]

    def score_partial(batch: pa.Table) -> pa.Table:
        doc_ids, dl, tf = _tf_matrix(batch)
        norm = k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
        out_q, out_d, out_s = [], [], []
        for qi, tidx in enumerate(q_term_idx):
            tfq = tf[:, tidx].astype(np.float64)
            score = (idf[tidx] * tfq * (k1 + 1.0) / (tfq + norm[:, None])).sum(
                axis=1
            )
            hit = tf[:, tidx].sum(axis=1) > 0
            s_r = np.round(score[hit], 6)
            d = doc_ids[hit]
            top = np.lexsort((d, -s_r))[:k]
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_d.append(d[top])
            out_s.append(s_r[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else []),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else []),
                "score": pa.array(np.concatenate(out_s) if out_s else []),
            }
        )

    cand = (
        docs.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    )  # ≤ blocks·|queries|·k rows — the documented small result
    cand = cand.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rnk"] = top.groupby("query_id").cumcount().to_numpy() + 1
    top["query"] = [queries[i] for i in top["query_id"]]
    return top[["query_id", "query", "doc_id", "rnk", "score"]].astype(
        {"query_id": np.int64, "doc_id": np.int64, "rnk": np.int64}
    )


def curate_by_perplexity(sf_dir: str, max_ppl: float = 30.0):
    """LM-perplexity curation — the C4/CCNet filter step composed from
    :func:`doc_perplexity`: keep documents whose bigram-LM perplexity
    is ≤ ``max_ppl``, report per-source survivors and their mean
    perplexity.  The per-doc score table joins ``documents`` for the
    source label via the native hash join (both sides narrow; the
    doc→source map is corpus-sized, so no broadcast), then reduces per
    source.

    Both sides filter on the SAME ROUND(·, 6) doc-level ppl; the mean
    then runs on exact integer micro-ppl (ppl·1e6 is integer-valued
    after the rounding) with ONE final division — bit-identical
    doubles, no second rounding.  (A ROUND(mean, 6) here actually
    mismatched in testing: means of 6-decimal values land exactly on
    half boundaries, where numpy's banker rounding and SQL's
    half-away-from-zero disagree.)
    """
    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        _join_partitions,
        read,
    )

    scored = doc_perplexity(sf_dir)
    src = read(sf_dir, "documents", ["doc_id", "source"])
    joined = scored.join(
        src,
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, ["documents"]),
        on=("doc_id",),
    )

    def surviving(batch: pa.Table) -> pa.Table:
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)
        keep = ppl <= max_ppl
        t = batch.filter(pa.array(keep))
        micro = np.rint(ppl[keep] * 1e6).astype(np.int64)
        return _group_sum(
            pa.table(
                {
                    "source": t["source"],
                    "n_docs": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "ppl_micro": pa.array(micro, pa.int64()),
                }
            ),
            ["source"],
        )

    agg = (
        joined.map_batches(surviving, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("ppl_micro", alias_name="ppl_micro"),
        )
        .to_pandas()
    )
    agg["mean_ppl"] = agg["ppl_micro"].to_numpy().astype(np.float64) / (
        agg["n_docs"].to_numpy().astype(np.float64) * 1e6
    )
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg[["source", "n_docs", "mean_ppl"]].sort_values(
        "source"
    ).reset_index(drop=True)


def chunk_documents(sf_dir: str, chunk: int = 64, overlap: int = 16):
    """Context chunking — split each document's token stream into
    fixed-size windows with overlap (stride ``chunk - overlap``), the
    one→many flat-map a training pipeline runs before packing.  Docs
    shorter than ``chunk`` emit one short chunk; a trailing window
    shorter than ``overlap``'s complement still emits (standard sliding
    semantics, identical on the SQL side via ``range(1, len+1,
    stride)`` + ``list_slice``).

    Embarrassingly parallel: one scan, no shuffle; the per-batch
    expansion is pure offset arithmetic (repeat/arange over the word
    list offsets) + two vectorized takes — no per-doc Python.  The
    output stays narrow (ids + boundary tokens), so the expansion
    factor costs bytes proportional to chunks, not re-copied text.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than chunk")
    stride = chunk - overlap

    def expand(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        off = np.asarray(lists.offsets, dtype=np.int64)
        flat = lists.flatten()
        lens = np.diff(off)
        n_chunks = np.where(lens > 0, (lens - 1) // stride + 1, 0)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rep_doc = np.repeat(doc_ids, n_chunks)
        rep_len = np.repeat(lens, n_chunks)
        rep_base = np.repeat(off[:-1], n_chunks)
        total = int(n_chunks.sum())
        # chunk_idx = 0..n_chunks-1 within each doc
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        start = chunk_idx * stride
        n_tok = np.minimum(start + chunk, rep_len) - start
        first = flat.take(pa.array(rep_base + start))
        last = flat.take(pa.array(rep_base + start + n_tok - 1))
        return pa.table(
            {
                "doc_id": pa.array(rep_doc, pa.int64()),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "first_token": first,
                "last_token": last,
            }
        )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        expand, batch_format="pyarrow"
    )


def source_fertility(sf_dir: str, pattern: str = BPE_ISH_PATTERN):
    """Per-source tokenizer fertility — BPE-ish tokens per whitespace
    word (the tokenizer-health metric a multilingual curation pipeline
    tracks per crawl source: fertility creep flags content the
    tokenizer fragments badly).  One scan, integer partials per
    (block, source), a |sources|-row shuffle, ONE final division —
    bit-exact doubles against the SQL oracle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        bpe = pc.count_substring_regex(col, pattern).cast(pa.int64())
        words = textops.word_count(batch["text"])
        return _group_sum(
            pa.table(
                {
                    "source": batch["source"],
                    "n_bpe": bpe,
                    "n_words": pa.array(words, pa.int64()),
                    "n_docs": pa.array(
                        np.ones(batch.num_rows, dtype=np.int64)
                    ),
                }
            ),
            ["source"],
        )

    agg = (
        read(sf_dir, "documents", ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_bpe", alias_name="n_bpe"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .to_pandas()
    )
    # an all-empty source gives 0/0 → NaN (n_bpe>0, n_words=0 → inf);
    # DuckDB's double division produces the identical values, so parity
    # holds — just silence numpy's RuntimeWarning
    with np.errstate(divide="ignore", invalid="ignore"):
        agg["fertility"] = agg["n_bpe"].to_numpy().astype(np.float64) / agg[
            "n_words"
        ].to_numpy().astype(np.float64)
    for c in ("n_bpe", "n_words", "n_docs"):
        agg[c] = agg[c].astype(np.int64)
    return agg[["source", "n_docs", "n_bpe", "n_words", "fertility"]].sort_values(
        "source"
    ).reset_index(drop=True)


def dedup_windows_rewrite(sf_dir: str, w: int = 8, n_buckets: int = 64,
                          num_partitions: int | None = None):
    """Exact duplicated-window REMOVAL (the Lee et al. 2022 substring-
    dedup rewrite step — the transform :func:`dup_ngram_coverage` and
    :func:`doc_dup_stats` only measure): every w-token window keeps its
    corpus-FIRST occurrence (min (doc_id, pos), intra-doc repeats
    included) and every other occurrence's w tokens are dropped;
    overlapping dropped windows merge; each doc's surviving tokens are
    re-joined in order.  Returns one row per document:
    (doc_id, text_clean, n_tok, n_tok_clean).

    Scale shape: pass 1 ships EVERY window occurrence once, routed on
    ``hash64(sh) % n_buckets`` — exchange ∝ corpus windows, which IS
    the cost of exact substring dedup (a suffix array carries
    comparable volume); exact strings decide ownership in-bucket
    (hashes route only, the repo-wide rule).  Only NON-owner
    occurrences leave pass 1 (∝ true duplication); they collapse to
    one CSV positions row per affected doc in coarse doc buckets, and
    the rebuild is a hash-partitioned ``left_outer`` join back to the
    documents table — unaffected docs pass through with a NULL mask,
    nothing materializes on the driver.
    """
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        _join_partitions,
    )

    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, ["documents"])

    def occurrences(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh: list[str] = []
        did: list[int] = []
        pos: list[int] = []
        for i, t in enumerate(texts):
            ws = t.split()
            if len(ws) < w:
                continue
            wins = textops.word_windows(ws, w)
            sh.extend(wins)
            did.extend([int(docs[i])] * len(wins))
            pos.extend(range(len(wins)))
        if not sh:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        keys = hash64_strings(sh)
        return pa.table(
            {
                "bucket": pa.array(
                    (keys % np.uint64(n_buckets)).astype(np.int64)
                ),
                "sh": pa.array(sh, pa.string()),
                "doc_id": pa.array(np.array(did, dtype=np.int64)),
                "pos": pa.array(np.array(pos, dtype=np.int64)),
            }
        )

    def non_owners(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:  # Ray may hand map_groups an empty group
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64),
                 "doc_bucket": pd.Series([], dtype=np.int64)}
            )
        sh = g["sh"].to_numpy()
        did = g["doc_id"].to_numpy(dtype=np.int64)
        pos = g["pos"].to_numpy(dtype=np.int64)
        order = np.lexsort((pos, did, sh))
        sh_s = sh[order]
        first = np.r_[True, sh_s[1:] != sh_s[:-1]]  # segment owner rows
        dup_idx = order[~first]
        return pd.DataFrame(
            {
                "doc_id": did[dup_idx],
                "pos": pos[dup_idx],
                "doc_bucket": did[dup_idx] % np.int64(n_buckets),
            }
        )

    def per_doc_mask(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "dup_pos": pd.Series([], dtype=object)}
            )
        did = g["doc_id"].to_numpy(dtype=np.int64)
        pos = g["pos"].to_numpy(dtype=np.int64)
        order = np.lexsort((pos, did))
        did, pos = did[order], pos[order]
        starts = np.r_[0, np.flatnonzero(did[1:] != did[:-1]) + 1]
        ends = np.r_[starts[1:], len(did)]
        return pd.DataFrame(
            {
                "doc_id": did[starts],
                "dup_pos": [
                    ",".join(map(str, pos[s:e]))
                    for s, e in zip(starts, ends)
                ],
            }
        )

    masks = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(occurrences, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(non_owners, batch_format="pandas")
        .groupby("doc_bucket")
        .map_groups(per_doc_mask, batch_format="pandas")
    ).materialize()  # ∝ affected docs; one execution feeds probe + join
    if masks.count() == 0:
        # fully-unique corpus (the COMMON clean case): the join kernel
        # rejects a schema-less right side — every doc passes through
        # with a null mask, so rebuild directly from the documents scan
        joined = read(sf_dir, "documents", ["doc_id", "text"])
    else:
        joined = read(sf_dir, "documents", ["doc_id", "text"]).join(
            masks,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("doc_id",),
            right_on=("doc_id",),
            right_suffix="_m",
        )

    def rebuild(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dup = (
            batch["dup_pos"].to_pylist()
            if "dup_pos" in batch.column_names
            else [None] * len(texts)  # no-duplication fast path: no join ran
        )
        clean: list[str] = []
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_clean = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = t.split()
            n_tok[i] = len(ws)
            if not dup[i]:
                clean.append(" ".join(ws))
                n_clean[i] = len(ws)
                continue
            drop = np.zeros(len(ws), dtype=bool)
            for p in dup[i].split(","):
                s = int(p)
                drop[s : s + w] = True
            kept = [x for x, d in zip(ws, drop) if not d]
            clean.append(" ".join(kept))
            n_clean[i] = len(kept)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_clean": pa.array(clean, pa.string()),
                "n_tok": pa.array(n_tok),
                "n_tok_clean": pa.array(n_clean),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
