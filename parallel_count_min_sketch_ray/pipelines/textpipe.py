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
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(lang_pred, pa.string()),
                "n_words": m["n_words"],
                "n_stopwords": m["n_stopwords"],
                "stop_ratio": np.round(m["stop_ratio"], 6),
                "avg_word_len": np.round(m["avg_word_len"], 6),
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
