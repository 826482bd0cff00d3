"""Text-analysis pipelines over documents: language ID, quality
scoring, regex token counting, fingerprinting — the per-document
stages a training-data pipeline runs before/alongside the sketches."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from parallel_count_min_sketch_ray.functions import textops
from parallel_count_min_sketch_ray.pipelines.analytics import read

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
