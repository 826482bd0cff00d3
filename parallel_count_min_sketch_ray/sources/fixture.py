"""Deterministic fixture generator: the tokenized-sequences table.

Produces the input shape mandated by BASELINE.json's ``input_hint``:

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Token values follow the reference generator's mixture
(``/root/reference/scripts/gen_datasets.py:4-19``, its seed is 12345;
ours defaults to 42): 10% token 123, 10% token 456, 10% uniform in
[100, 110], 70% uniform in [1000, 9999].  A Pareto(alpha=2) variant
mirrors ``scripts/dataset_generator.py:6-12``.

Skew knob (FIXTURES.md §1): ``source`` drawn with probabilities
{web: .85, code: .05, books: .05, wiki: .05}; "web" rows get 2x
``n_tok`` so per-block work is genuinely skewed.

Everything is vectorized: one flat token draw, split into rows via
Arrow list offsets — generation at bench scale (200k rows / ~13M
tokens) takes well under a second per million tokens.  Same seed =>
byte-identical table (the per-row invariant asserted in tests).
"""

from __future__ import annotations

import json
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "code", "books", "wiki"])
SOURCE_PROBS = np.array([0.85, 0.05, 0.05, 0.05])

TOKENS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def mixture_tokens(n: int, rng: np.random.Generator) -> np.ndarray:
    """The reference mixture, vectorized (gen_datasets.py:4-19)."""
    u = rng.random(n)
    out = np.empty(n, dtype=np.int32)
    out[u < 0.10] = 123
    out[(u >= 0.10) & (u < 0.20)] = 456
    m = (u >= 0.20) & (u < 0.30)
    out[m] = rng.integers(100, 111, size=int(m.sum()), dtype=np.int32)
    m = u >= 0.30
    out[m] = rng.integers(1000, 10000, size=int(m.sum()), dtype=np.int32)
    return out


def pareto_tokens(n: int, rng: np.random.Generator) -> np.ndarray:
    """Pareto(alpha=2.0) clipped to [0, 9999] (dataset_generator.py:6-12)."""
    vals = (rng.pareto(2.0, size=n) * 1000.0).astype(np.int64)
    return np.clip(vals, 0, 9999).astype(np.int32)


def build_tokens_table(
    num_rows: int,
    seed: int = 42,
    distribution: str = "mixture",
    min_tok: int = 1,
    max_tok: int = 256,
    doc_id_start: int = 0,
) -> pa.Table:
    """Deterministic in-memory tokens table (schema = TOKENS_SCHEMA)."""
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=num_rows, p=SOURCE_PROBS)
    n_tok = rng.integers(min_tok, max_tok // 2 + 1, size=num_rows, dtype=np.int32)
    n_tok = np.where(src_idx == 0, np.minimum(n_tok * 2, max_tok), n_tok).astype(
        np.int32
    )  # "web" rows 2x longer -> work skew
    total = int(n_tok.sum())
    draw = mixture_tokens if distribution == "mixture" else pareto_tokens
    flat = draw(total, rng)
    offsets = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, pa.int32()))
    doc_id = pa.array(
        [f"doc-{i:08d}" for i in range(doc_id_start, doc_id_start + num_rows)],
        pa.string(),
    )
    source = pa.array(SOURCES[src_idx], pa.string())
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(n_tok, pa.int32()), source], schema=TOKENS_SCHEMA
    )


def _gen_shard(args) -> tuple[str, int]:
    """Worker for parallel shard generation (top-level: picklable).

    Streams the shard in ~64k-row slices through a ParquetWriter: peak
    fresh memory per worker stays ~100 MB and the slice buffers get
    reused, which matters on hosts where concurrent first-touch page
    faults are expensive (see bench.py allocator note).
    """
    out_dir, i, start, nrows, seed, distribution = args
    p = os.path.join(out_dir, f"tokens-{i:04d}.parquet")
    if os.path.exists(p):
        t = pq.read_table(p, columns=["n_tok"])
        return p, int(pa.compute.sum(t["n_tok"]).as_py())
    total = 0
    slice_rows = 65536
    # no dictionary + zstd: ~2x faster decode of the tokens list column
    # at similar size (measured: 1.10s vs 2.26s per 60M-token shard)
    writer = pq.ParquetWriter(
        p + ".tmp", TOKENS_SCHEMA, use_dictionary=False, compression="zstd"
    )
    try:
        done = 0
        while done < nrows:
            n = min(slice_rows, nrows - done)
            part = build_tokens_table(
                n,
                seed=seed + 1000 * i + done,
                distribution=distribution,
                doc_id_start=start + done,
            )
            writer.write_table(part)
            total += int(pa.compute.sum(part["n_tok"]).as_py())
            done += n
    finally:
        writer.close()
    os.replace(p + ".tmp", p)
    return p, total


def generate_tokens_table(
    out_dir: str,
    num_rows: int = 2000,
    seed: int = 42,
    distribution: str = "mixture",
    num_files: int = 4,
    with_oracles: bool = True,
    workers: int = 1,
) -> dict:
    """Write the fixture corpus as ``num_files`` parquet shards plus exact
    oracles, returning a manifest dict.

    Oracles (FIXTURES.md §2/§4): exact token frequency parquet, distinct
    counts, n_tok quantiles — the ground truth the sketch tests compare
    against, the analogue of the reference's ``total_<dataset>`` files
    (``scripts/frequency_counter.py:3-23``).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    rows_per = (num_rows + num_files - 1) // num_files
    total_tokens = 0
    if num_rows >= 2_000_000:
        # shard-by-shard generation (seed derived per shard) bounds peak
        # memory to one shard; still fully deterministic for a given
        # (seed, num_rows, num_files)
        table = None
        with_oracles = False
        jobs = [
            (out_dir, i, i * rows_per, min(rows_per, num_rows - i * rows_per),
             seed, distribution)
            for i in range(num_files)
        ]
        if workers > 1:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=workers) as ex:
                results = list(ex.map(_gen_shard, jobs))
        else:
            results = [_gen_shard(j) for j in jobs]
        for p, ntok in results:
            paths.append(p)
            total_tokens += ntok
    else:
        table = build_tokens_table(num_rows, seed=seed, distribution=distribution)
        for i in range(num_files):
            shard = table.slice(i * rows_per, rows_per)
            p = os.path.join(out_dir, f"tokens-{i:04d}.parquet")
            pq.write_table(shard, p, use_dictionary=False, compression="zstd")
            paths.append(p)
        total_tokens = int(pa.compute.sum(table["n_tok"]).as_py())

    manifest = {
        "dir": out_dir,
        "paths": paths,
        "num_rows": num_rows,
        "seed": seed,
        "distribution": distribution,
        "total_tokens": total_tokens,
    }
    if with_oracles:
        flat = table["tokens"].combine_chunks().flatten().to_numpy()
        vals, counts = np.unique(flat, return_counts=True)
        oracle = pa.Table.from_arrays(
            [pa.array(vals.astype(np.int64)), pa.array(counts.astype(np.int64))],
            names=["token", "count"],
        )
        opath = os.path.join(out_dir, "oracle_token_counts.parquet")
        pq.write_table(oracle, opath)
        ntok = table["n_tok"].to_numpy()
        extras = {
            "distinct_tokens": int(vals.size),
            "distinct_doc_ids": num_rows,
            "total_tokens": manifest["total_tokens"],
            "ntok_quantiles": {
                q: float(np.quantile(ntok, float(q)))
                for q in ("0.5", "0.9", "0.99", "0.999")
            },
            "probe_counts": {
                "123": int(counts[vals == 123][0]) if (vals == 123).any() else 0,
                "456": int(counts[vals == 456][0]) if (vals == 456).any() else 0,
                "range_100_110": int(counts[(vals >= 100) & (vals <= 110)].sum()),
            },
        }
        with open(os.path.join(out_dir, "oracle_stats.json"), "w") as f:
            json.dump(extras, f, indent=1)
        manifest["oracle_token_counts"] = opath
        manifest["oracle_stats"] = extras
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump({k: v for k, v in manifest.items() if k != "oracle_stats"}, f)
    return manifest
