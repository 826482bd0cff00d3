"""Exact analytics pipelines over the testdata tables.

These are the SQL-checkable counterparts of the reference's exact
validation path (inline exact counters ``src/mpi/mpiV2.c:131-140``,
``frequency_counter.py``'s group-by-count oracle) widened to the full
query surface the driver verifies against DuckDB.

Scale discipline (applies to every function here):

- reads prune columns (``columns=[...]``);
- per-key aggregations pre-aggregate inside ``map_batches`` (partial
  combiner) before the ``groupby`` shuffle, so the exchange carries
  per-block partials, not rows;
- small join sides are broadcast via ``ray.put`` and looked up per
  batch, never shuffled;
- money/value sums use integer cents so the Ray result is
  bit-comparable with the DuckDB oracle (float sums are
  order-dependent; integer sums are exact and associative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from parallel_count_min_sketch_ray.functions import textops


def read(sf_dir: str, table: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: np.ndarray) -> np.ndarray:
    """double currency -> exact integer cents (matches SQL
    CAST(ROUND(x*100) AS BIGINT); ties cannot occur for 2-decimal data).

    NaN/inf/NULL inputs would silently cast to INT64_MIN garbage —
    fail fast instead (a currency column with NULLs needs an explicit
    COALESCE policy upstream, mirroring the oracle SQL)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.size and not np.isfinite(a).all():
        raise ValueError("non-finite/NULL value in currency column")
    return np.round(a * 100.0).astype(np.int64)


def _group_sum(tbl: pa.Table, keys: list[str]) -> pa.Table:
    """Arrow-native per-batch partial combine: sum every non-key column
    grouped by ``keys`` (no pandas round-trip inside map_batches)."""
    value_cols = [c for c in tbl.column_names if c not in keys]
    out = tbl.group_by(keys).aggregate([(c, "sum") for c in value_cols])
    return out.rename_columns(
        [c[: -len("_sum")] if c.endswith("_sum") else c for c in out.column_names]
    )


# ---------------------------------------------------------------------------
# token-level exact aggregation over documents (the oracle path)
# ---------------------------------------------------------------------------


_token_counts_cache: dict[tuple, "ray.data.Dataset"] = {}


def _cache_key(sf_dir: str) -> tuple:
    # a materialized Dataset's blocks die with the Ray session — key on
    # the job id so a shutdown/re-init recomputes instead of handing
    # back refs into a dead cluster
    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    return (sf_dir, job)


def token_counts(sf_dir: str):
    """Exact per-word counts over documents.text.

    Pattern: per-batch value_counts (partial combine) → groupby('token')
    sum — the shuffle moves one row per (block, distinct word), not one
    per word occurrence.

    The materialized result is memoized per sf_dir (same pattern as
    ``sketch_queries.build_all``): heavy_hitters / token_totals are
    downstream views of the same vocabulary table — recomputing the
    full scan+shuffle per view is the anti-pattern, reusing the
    materialized artifact is how a real pipeline shares it.
    """
    key = _cache_key(sf_dir)
    cached = _token_counts_cache.get(key)
    if cached is not None:
        return cached

    def partial(batch: pa.Table) -> pa.Table:
        flat = textops.flat_words(batch["text"])
        vc = flat.value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=["token", "cnt"],
        )

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text"])
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )
    _token_counts_cache[key] = out
    return out


def token_totals(sf_dir: str):
    """Single row: total token count + distinct token count (exact).

    Distributed ``Sum + Count`` over :func:`token_counts` — the driver
    receives two scalars; the vocabulary is never materialized on it.
    """
    from ray.data.aggregate import Count, Sum

    agg = token_counts(sf_dir).aggregate(
        Sum("cnt", alias_name="total_tokens"), Count(alias_name="distinct_tokens")
    )
    return pd.DataFrame(
        {
            "total_tokens": [int(agg["total_tokens"])],
            "distinct_tokens": [int(agg["distinct_tokens"])],
        }
    )


def token_f2(sf_dir: str) -> pd.DataFrame:
    """Exact second frequency moment F2 = Σ_token cnt² (one row).

    The ground truth for the Count-Sketch / AMS estimator
    (:mod:`..state.countsketch`): per-block partial Σcnt² over the
    memoized vocabulary table, then a scalar Sum — the driver receives
    one int; the vocabulary never lands on it.  F2 fits int64 far past
    this scale (F2 <= N² needs N > 3e9 *on one token* to overflow).
    """
    from ray.data.aggregate import Sum

    def sq(batch: pa.Table) -> pa.Table:
        c = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array([int(np.dot(c, c))], pa.int64())], names=["f2_partial"]
        )

    agg = (
        token_counts(sf_dir)
        .map_batches(sq, batch_format="pyarrow")
        .aggregate(Sum("f2_partial", alias_name="f2"))
    )
    return pd.DataFrame({"f2": [int(agg["f2"])]})


def top_terms_per_source(sf_dir: str, k: int = 5):
    """Exact top-k terms per source with deterministic ranking
    (cnt DESC, token ASC) — the distributed per-group top-k pattern.

    Topology (scale-shaped; no full sort, no per-group row shuffle):

    1. per-block partial counts of packed ``source\\x1ftoken`` keys
       (combiner — the shuffle moves one row per (block, source, word),
       and the single packed key avoids Ray 2.49's slow multi-key
       aggregate path);
    2. ``groupby(key).Sum`` → exact global counts, one row per
       (source, token);
    3. per-block PRUNE to each source's local top-k (valid because
       counts are final and the global top-k of a union is a subset of
       the union of local top-ks);
    4. tiny ``groupby(source).map_groups`` final ranking over
       ≤ k·num_blocks candidate rows per source.
    """

    def partial(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        n = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_rep = pa.array(
            np.repeat(src.to_numpy(zero_copy_only=False), n.astype(np.int64))
        )
        packed = pc.binary_join_element_wise(src_rep, lists.flatten(), "\x1f")
        vc = packed.value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=["key", "cnt"],
        )

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        split = batch["key"].str.split("\x1f", n=1, expand=True)
        out = pd.DataFrame(
            {"source": split[0], "token": split[1], "cnt": batch["cnt"]}
        )
        return (
            out.sort_values(["source", "cnt", "token"],
                            ascending=[True, False, True])
            .groupby("source", sort=False)
            .head(k)
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(prune, batch_format="pandas")
        .groupby("source")
        .map_groups(rank, batch_format="pandas")
    )


def heavy_hitters(sf_dir: str, threshold: int = 100):
    """Words with exact count >= threshold (the heavy-hitter set CMS
    point queries are validated against)."""
    ds = token_counts(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"], threshold)),
        batch_format="pyarrow",
    )


def bigram_counts(sf_dir: str, threshold: int = 20):
    """Exact within-document bigram (adjacent word pair) counts with
    cnt >= threshold — token co-occurrence, the input to collocation /
    PMI analysis.

    Vectorized pair construction: one Arrow join over the flat word
    stream shifted by one, with document boundaries masked out via the
    list offsets — no per-row Python.  Same combiner→groupby topology
    as ``token_counts`` (the shuffle moves per-block distinct bigrams).
    """

    def partial(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        flat = lists.flatten()
        total = len(flat)
        if total < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        big = pc.binary_join_element_wise(
            flat.slice(0, total - 1), flat.slice(1, total - 1), " "
        )
        # a pair spanning two documents is not a bigram: mask positions
        # whose successor is a document start
        valid = np.ones(total - 1, dtype=bool)
        b = np.asarray(lists.offsets, dtype=np.int64)[1:-1]
        b = b[(b >= 1) & (b <= total - 1)]
        valid[b - 1] = False
        vc = big.filter(pa.array(valid)).value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=["bigram", "cnt"],
        )

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], threshold)),
            batch_format="pyarrow",
        )
    )


def doc_token_stats(sf_dir: str):
    """Per-doc exact stats: n_tok, chars sans spaces, avg word length."""

    def stats(batch: pa.Table) -> pa.Table:
        n_words = textops.word_count(batch["text"])
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        no_space = pc.utf8_length(pc.replace_substring(col, " ", ""))
        chars = no_space.to_numpy(zero_copy_only=False).astype(np.int64)
        avg = np.where(n_words > 0, chars.astype(np.float64) / n_words, 0.0)
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(n_words),
                pa.array(chars),
                pa.array(avg),
            ],
            names=["doc_id", "n_tok", "n_word_chars", "avg_word_len"],
        )

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def lang_source_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        read(sf_dir, "documents", ["lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="cnt"))
    )


def source_token_totals(sf_dir: str):
    """Exact token count per source (pre-aggregated per batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        n = textops.word_count(batch["text"])
        t = pa.table(
            {
                "source": batch["source"],
                "n_tokens": pa.array(n),
                "n_docs": pa.array(np.ones(len(n), dtype=np.int64)),
            }
        )
        return _group_sum(t, ["source"])

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"), Sum("n_docs", alias_name="n_docs"))
    )


def per_source_cap(sf_dir: str, cap: int = 20):
    """Per-source document cap — the "at most K docs per domain"
    rebalancing rule of web-corpus curation (C4/RefinedWeb-style),
    keeping each source's ``cap`` lowest-doc_id rows with their rank.

    Same scale topology as :func:`top_terms_per_source` (the per-group
    top-k pattern): per-block PRUNE to each source's local cap (the
    global k-smallest of a union is a subset of the union of local
    k-smallests), so the shuffle moves ≤ cap rows per (block, source)
    — never the corpus — and the final ``groupby(source)`` ranks tiny
    candidate groups.
    """

    def local_cap(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        codes = pc.index_in(src, value_set=pc.unique(src)).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((doc, codes))
        codes_s = codes[order]
        starts = np.r_[0, np.flatnonzero(np.diff(codes_s)) + 1]
        seg = np.diff(np.r_[starts, len(codes_s)])
        rank = np.arange(len(codes_s)) - np.repeat(starts, seg)
        idx = order[rank < cap]
        return pa.table(
            {"doc_id": pa.array(doc[idx]), "source": pc.take(src, pa.array(idx))}
        )

    def final_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").head(cap)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        read(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(local_cap, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_rank, batch_format="pandas")
    )


def source_mixture_sample(sf_dir: str, granularity: int = 10_000):
    """Deterministic mixture re-weighting: downsample each source to a
    shared token budget — the "equalize domain mixture" step of
    training-data assembly, with no RNG state and no stored sample.

    The budget is derived from the data (total tokens // (2 * number of
    sources)), so over-represented sources are thinned toward it while
    small sources pass through whole.  A doc survives iff
    ``md5(doc_id) % granularity < floor(min(1, budget/total_src) *
    granularity)`` — the same content-independent hash-bucket rule as
    :func:`doc_split_stats`, so any node, any rerun, and the SQL oracle
    reproduce the identical sample.

    Scale shape: pass 1 is the tiny per-source totals groupby
    (|sources| rows to the driver — the legitimate small-result
    materialization); pass 2 filters inside ``map_batches`` with the
    rate table shipped in the task closure, then rolls up per source.
    Nothing corpus-sized shuffles except the final |sources|-row
    aggregate.
    """
    totals = source_token_totals(sf_dir).to_pandas()
    budget = int(totals["n_tokens"].sum()) // (2 * len(totals))
    thresholds = {
        row["source"]: int(
            np.floor(min(1.0, budget / np.float64(row["n_tokens"])) * granularity)
        )
        for _, row in totals.iterrows()
    }

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bucket = textops.split_buckets(ids, mod=granularity)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # unique-gather: O(|sources in batch|) dict lookups, not O(rows)
        uniq = pc.unique(src)
        uthr = np.fromiter(
            (thresholds.get(s, 0) for s in uniq.to_pylist()),
            dtype=np.int64,
            count=len(uniq),
        )
        thr = uthr[pc.index_in(src, value_set=uniq).to_numpy(zero_copy_only=False)]
        keep = bucket < thr
        kept = batch.filter(pa.array(keep))
        t = pa.table(
            {
                "source": kept["source"],
                "sampled_docs": pa.array(
                    np.ones(kept.num_rows, dtype=np.int64)
                ),
                "sampled_tokens": pa.array(textops.word_count(kept["text"])),
            }
        )
        return _group_sum(t, ["source"])

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["doc_id", "source", "text"])
        .map_batches(sample, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("sampled_docs", alias_name="sampled_docs"),
            Sum("sampled_tokens", alias_name="sampled_tokens"),
        )
    )


def events_cume_dist(sf_dir: str):
    """``CUME_DIST() OVER (PARTITION BY event_type ORDER BY value)``
    for every event — the distributed window-function-by-histogram
    pattern: tie-stable (fraction of the partition ≤ the row's value),
    so the result is deterministic where NTILE/ROW_NUMBER would not be.

    Scale shape: no per-type sort and no row shuffle.  Pass 1 reduces
    the corpus to its per-(type, value) histogram (per-block partial
    counts folded by ONE ``groupby(event_type).map_groups`` — the
    ``events_value_median`` topology; the value domain is quantized,
    so the histogram is bounded and N-independent); the cumulative
    table lands on the driver histogram-sized, ships ONCE via
    ``ray.put``, and pass 2 assigns each row's cume_dist with a
    vectorized ``searchsorted`` inside ``map_batches``.
    """

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "value": batch["value"],
                "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return _group_sum(t, ["event_type", "value"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["value"].to_numpy()
        c = g["cnt"].to_numpy()
        order = np.argsort(vals, kind="stable")
        vals, c = vals[order], c[order]
        starts = np.r_[0, np.flatnonzero(np.diff(vals) != 0) + 1]
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "value": vals[starts],
                "cnt": np.add.reduceat(c, starts),
            }
        )

    hist = (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    cum_tables: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for t, g in hist.groupby("event_type"):
        v_s = g["value"].to_numpy()  # fold() emits them sorted
        c_s = np.cumsum(g["cnt"].to_numpy())
        cum_tables[str(t)] = (v_s, c_s, int(c_s[-1]))
    tables_ref = ray.put(cum_tables)

    def assign(batch: pa.Table) -> pa.Table:
        tables = ray.get(tables_ref)
        vv = batch["value"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.to_numpy(zero_copy_only=False)
        out = np.empty(len(vv), dtype=np.float64)
        for t in np.unique(codes):
            m = codes == t
            v_s, c_s, n = tables[t]
            # every value is present in the histogram, so the count of
            # rows <= v is c_s at searchsorted(side="right") - 1
            le = np.searchsorted(v_s, vv[m], side="right")
            out[m] = c_s[le - 1] / np.float64(n)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "value": batch["value"],
                "cume_dist": pa.array(out),
            }
        )

    return read(sf_dir, "events", ["event_id", "event_type", "value"]).map_batches(
        assign, batch_format="pyarrow"
    )


def doc_split_stats(sf_dir: str, train_pct: int = 90):
    """Deterministic content-independent train/val split + per-split
    rollup — the reproducible-split pattern for training corpora: the
    assignment is a pure function of ``md5(doc_id)``, so any node (or
    any rerun, or the SQL oracle) derives the identical split with no
    coordination, no stored assignment table, and no RNG state.

    Returns (split, source, n_docs, n_tokens) — exact, SQL-checked.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bucket = textops.split_buckets(ids)
        split = np.where(bucket < train_pct, "train", "val")
        n = textops.word_count(batch["text"])
        t = pa.table(
            {
                "split": pa.array(split.tolist(), pa.string()),
                "source": batch["source"],
                "n_docs": pa.array(np.ones(len(n), dtype=np.int64)),
                "n_tokens": pa.array(n),
            }
        )
        return _group_sum(t, ["split", "source"])

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["doc_id", "text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


def doc_top_tfidf(sf_dir: str, k: int = 3):
    """Top-``k`` distinctive terms per document — the TF-IDF pipeline
    shape with an integer-exact ordering (tf DESC, document-frequency
    ASC, token ASC) so the ranking is bit-reproducible and
    SQL-checkable (a float ``tf*ln(N/df)`` score ranks identically for
    equal (tf, df) and is one multiply away downstream; ranking on the
    exact integers avoids cross-library libm 1-ulp ambiguity).

    Fully distributed — the vocabulary never touches the driver:

    1. one scan emits (doc_id, token, tf) pairs (per-doc value_counts
       inside the batch; a document's rows never split across blocks)
       tagged with a coarse token-hash bucket;
    2. a groupby on the token bucket co-locates each token's pair rows,
       so document frequency is counted AND attached to every pair in
       one vectorized pass per bucket — replacing the earlier
       df-groupby + tf⋈df hash join (two shuffles of the pair set) with
       a single shuffle.  The vocabulary still never touches the
       driver, and nothing is broadcast (at corpus scale distinct
       tokens exceed any broadcast budget);
    3. per-doc ranking runs vectorized over coarse doc buckets (one
       lexsort + segment ranks per bucket, no per-doc Python).

    Skew note: a ubiquitous token ("the") contributes ≤ one pair per
    document to its bucket, so the hottest bucket holds Σ_df over its
    tokens — bounded by pairs/B on average plus ~N per stopword-grade
    token; the per-bucket work stays a sort, not a pairwise blowup.
    """
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()

    def pairs(batch: pa.Table) -> pa.Table:
        words = textops.split_words(batch["text"])
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), counts
        )
        t = pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "token": flat,
                "tf": pa.array(np.ones(len(doc_ids), dtype=np.int64)),
            }
        )
        g = _group_sum(t, ["doc_id", "token"])
        # hash unique tokens once, gather (vocab << pairs per batch)
        uniq = pc.unique(g["token"])
        ubucket = (hash64_strings(uniq.to_pylist()) % np.uint64(n_buckets)).astype(
            np.int64
        )
        idx = pc.index_in(g["token"], value_set=uniq).to_numpy(
            zero_copy_only=False
        )
        return g.append_column("tok_bucket", pa.array(ubucket[idx], pa.int64()))

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        # pairs are per-doc distinct, so rows-per-token == document freq
        tok = g["token"].to_numpy()
        order = np.argsort(tok, kind="stable")
        tok_s = tok[order]
        starts = np.r_[0, np.flatnonzero(tok_s[1:] != tok_s[:-1]) + 1]
        seg = np.diff(np.r_[starts, len(tok_s)])
        dfv = np.empty(len(tok), dtype=np.int64)
        dfv[order] = np.repeat(seg, seg)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "token": g["token"],
                "tf": g["tf"],
                "df": dfv,
            }
        )

    joined = (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("tok_bucket")
        .map_groups(annotate_df, batch_format="pandas")
    )

    def bucketed(batch: pa.Table) -> pa.Table:
        bucket = batch["doc_id"].to_numpy(zero_copy_only=False) % np.int64(
            n_buckets
        )
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def rank_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        tf = g["tf"].to_numpy()
        df = g["df"].to_numpy()
        token = g["token"].to_numpy()
        order = np.lexsort((token, df, -tf, doc))
        doc_s = doc[order]
        starts = np.r_[0, np.flatnonzero(np.diff(doc_s)) + 1]
        seg_len = np.diff(np.r_[starts, len(doc_s)])
        rank = np.arange(len(doc_s)) - np.repeat(starts, seg_len) + 1
        keep = rank <= k
        idx = order[keep]
        return pd.DataFrame(
            {
                "doc_id": doc[idx],
                "rank": rank[keep],
                "token": token[idx],
                "tf": tf[idx],
                "df": df[idx],
            }
        )

    return (
        joined.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank_in_bucket, batch_format="pandas")
    )


def dedup_exact(sf_dir: str):
    """Exact dedup by content digest: one representative (min doc_id)
    per distinct text + duplicate count.

    At scale: the groupby key is the 32-hex digest, so the shuffle is
    hash-partitioned on content, and each group fits trivially.
    """

    def digests(batch: pa.Table) -> pa.Table:
        dg = textops.md5_digests_arrow(batch["text"])
        return pa.Table.from_arrays(
            [dg, batch["doc_id"]],
            names=["digest", "doc_id"],
        )

    from ray.data.aggregate import Count, Min

    return (
        read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(digests, batch_format="pyarrow")
        .groupby("digest")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="dup_cnt"))
    )


# ---------------------------------------------------------------------------
# events: windowed aggregates + sessionization
# ---------------------------------------------------------------------------


def events_value_median(sf_dir: str):
    """EXACT per-type median without a global sort: distributed
    histogram over integer cents.

    Values are dollars-and-cents, so ``round(value*100)`` discretizes
    losslessly; the pipeline counts (event_type, cents) per block
    (combiner), then ONE ``groupby(event_type).map_groups`` folds the
    per-block partial histograms and walks the cumulative counts to
    the middle — the shuffle moves one row per (block, type, distinct
    cent), never event rows.  This is the exact-quantile-at-scale
    pattern: a 100 TB value column with a bounded value domain reduces
    to a tiny histogram regardless of N.  (A single-key group over the
    partials beats ``groupby([type, cents]).Sum`` + a second group —
    Ray 2.49's multi-key aggregate path is slow and the second shuffle
    buys nothing the in-group fold doesn't do.)  Median convention
    matches SQL: mean of the two middle values when the count is even.
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "cents": pa.array(cents),
                "cnt": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        return _group_sum(t, ["event_type", "cents"])

    def median_of_partials(g: pd.DataFrame) -> pd.DataFrame:
        cents = g["cents"].to_numpy()
        c = g["cnt"].to_numpy()
        order = np.argsort(cents, kind="stable")
        cents, c = cents[order], c[order]
        starts = np.r_[0, np.flatnonzero(np.diff(cents)) + 1]
        u = cents[starts]
        sums = np.add.reduceat(c, starts)
        n = int(sums.sum())
        cum = np.cumsum(sums)
        hi = u[np.searchsorted(cum, n // 2 + 1)]
        if n % 2:
            med = float(hi)
        else:
            lo = u[np.searchsorted(cum, n // 2)]
            med = (float(lo) + float(hi)) / 2.0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "cnt": np.array([n], dtype=np.int64),
                "value_median": [med / 100.0],
            }
        )

    return (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(median_of_partials, batch_format="pandas")
    )


def events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, hour-of-day) in ONE pass / ONE
    shuffle — the grouping-sets pattern: each block derives all three
    levels' partials locally (the (type) level folds the (type, hour)
    level; the grand total folds (type) — no re-scan per level), tags
    them with sentinel keys ('ALL' / -1), packs the composite key into
    one string, and a single groupby Sum-combines everything.  The
    exchange carries ≤ (types×25 + types + 1) rows per block no matter
    how many events feed it.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts_us // 3_600_000_000) % 24
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array(hour),
                "cnt": pa.array(np.ones(len(hour), dtype=np.int64)),
                "vc": pa.array(cents),
            }
        )
        lvl2 = _group_sum(t, ["event_type", "hour"])
        lvl1 = _group_sum(lvl2.drop_columns(["hour"]), ["event_type"])
        lvl0 = pa.table(
            {
                "cnt": pa.array([pc.sum(lvl1["cnt"]).as_py() or 0], pa.int64()),
                "vc": pa.array([pc.sum(lvl1["vc"]).as_py() or 0], pa.int64()),
            }
        )

        def packed(types, hours, tbl) -> pa.Table:
            key = pc.binary_join_element_wise(
                types, pc.cast(hours, pa.string()), "|"
            )
            return pa.table({"key": key, "cnt": tbl["cnt"], "vc": tbl["vc"]})

        n1, n2 = lvl1.num_rows, lvl2.num_rows
        return pa.concat_tables(
            [
                packed(lvl2["event_type"], lvl2["hour"], lvl2),
                packed(lvl1["event_type"], pa.array([-1] * n1, pa.int64()), lvl1),
                packed(
                    pa.array(["ALL"], pa.string()),
                    pa.array([-1], pa.int64()),
                    lvl0,
                ),
            ]
        )

    def unpack(batch: pa.Table) -> pa.Table:
        col = batch["key"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = pc.split_pattern(col, pattern="|")
        flat = parts.flatten().to_numpy(zero_copy_only=False)
        n = len(col)
        mat = flat.reshape(n, 2) if n else np.zeros((0, 2), object)
        return pa.table(
            {
                "event_type": pa.array(mat[:, 0], pa.string()),
                "hour": pa.array(
                    mat[:, 1].astype(np.int64) if n else np.zeros(0, np.int64)
                ),
                "cnt": batch["cnt"],
                "value_sum": pa.array(
                    batch["vc"].to_numpy(zero_copy_only=False).astype(np.float64)
                    / 100.0
                ),
            }
        )

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("vc", alias_name="vc"))
        .map_batches(unpack, batch_format="pyarrow")
    )


def events_value_hour_corr(sf_dir: str):
    """Pearson correlation of (hour-of-day, value) per event_type via
    EXACT mergeable moments — the one-pass distributed-statistics
    pattern: each block emits integer partial moments (n, Σx, Σy, Σxy,
    Σx², Σy²) per key, a single groupby Sum-combines them (moments are
    associative), and one tiny final map computes the ratio.  No second
    pass, no mean-centering pass, no float accumulation drift: both
    sides sum exact int64s (x = hour-of-day 0–23, y = integer cents)
    and perform the identical double-precision expression at the end,
    so the result is bit-comparable with the SQL oracle.

    At extreme scale Σy² can exceed int64 (~1e12 rows at 100-cent
    values); split the accumulator into (hi, lo) int64 limbs then —
    the topology is unchanged.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (ts_us // 3_600_000_000) % 24
        y = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
            }
        )
        return _group_sum(t, ["event_type"])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].sum()
        sx, sy = g["sx"].sum(), g["sy"].sum()
        sxy, sxx, syy = g["sxy"].sum(), g["sxx"].sum(), g["syy"].sum()
        # same expression, same order as the SQL oracle -> bit-identical
        corr = float(n * sxy - sx * sy) / np.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [int(n)],
                "corr_value_hour": [corr],
            }
        )

    return (
        read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pandas")
    )


def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + exact value sum.

    Ray Data has no event-time windows (SURVEY.md §2.4); a tumbling
    window IS a group key: floor(ts/1h).  Pre-aggregated per batch
    before the shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts_us // 3_600_000_000
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "hour": pa.array(hour),
                "cnt": pa.array(np.ones(len(hour), dtype=np.int64)),
                "value_cents": pa.array(cents),
            }
        )
        return _group_sum(t, ["event_type", "hour"])

    from ray.data.aggregate import Sum

    out = (
        read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("value_cents", alias_name="vc"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        vsum = batch["vc"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        return pa.Table.from_arrays(
            [batch["event_type"], batch["hour"], batch["cnt"], pa.array(vsum)],
            names=["event_type", "hour", "cnt", "value_sum"],
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def events_sessions(sf_dir: str, gap_us: int = 1_800_000_000):
    """Sessionization: per user, sessions split at >30-minute gaps.

    Partitioning assumption (documented per SURVEY.md custom-operator
    rule): all events of one user co-locate via the coarse-bucket
    shuffle (``user_id % 64`` — few large groups, vectorized over all
    the bucket's users); integer-microsecond gap compare, so the
    result is exact.
    """

    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()

    def bucketed(batch: pa.Table) -> pa.Table:
        bucket = batch["user_id"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL the bucket's users: user-major time sort,
        # a session break is a same-user gap > gap_us; per-user rollup
        # is one pandas groupby (no per-user Python calls)
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((ts, user))
        user_s, ts_s = user[order], ts[order]
        same_user = np.zeros(user_s.size, dtype=bool)
        same_user[1:] = user_s[1:] == user_s[:-1]
        brk = np.zeros(user_s.size, dtype=np.int64)
        brk[1:] = (np.diff(ts_s) > gap_us).astype(np.int64)
        brk &= same_user  # gaps across user boundaries are not breaks
        out = (
            pd.DataFrame({"user_id": user_s, "brk": brk, "n": 1})
            .groupby("user_id", as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype(np.int64),
                "n_events": out["n"].astype(np.int64),
                "n_sessions": (out["brk"] + 1).astype(np.int64),
            }
        )

    return (
        read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def events_sliding(sf_dir: str, window_hops: int = 4, hop_us: int = 900_000_000):
    """Sliding-window aggregate: 1-hour windows hopping every 15 min
    (window = ``window_hops`` hops).  Each event explodes into the
    ``window_hops`` windows containing it (vectorized np.repeat), then a
    keyed pre-aggregated groupby — the standard batch restatement of a
    sliding window (Ray Data has no event-time windowing; SURVEY §2.4).
    """

    def explode(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hop = ts_us // hop_us
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        n = len(hop)
        k = np.arange(window_hops, dtype=np.int64)
        window_id = (hop[:, None] - k[None, :]).ravel()
        t = pa.table(
            {
                "event_type": et.take(np.repeat(np.arange(n), window_hops)),
                "window_id": pa.array(window_id),
                "cnt": pa.array(np.ones(n * window_hops, dtype=np.int64)),
                "vc": pa.array(np.repeat(cents, window_hops)),
            }
        )
        return _group_sum(t, ["event_type", "window_id"])

    from ray.data.aggregate import Sum

    out = (
        read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("vc", alias_name="vc"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        vsum = batch["vc"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        return pa.Table.from_arrays(
            [batch["event_type"], batch["window_id"], batch["cnt"], pa.array(vsum)],
            names=["event_type", "window_id", "cnt", "value_sum"],
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def distinct_users(sf_dir: str):
    """Exact distinct count via per-batch unique pre-aggregation: the
    shuffle carries per-block distinct values, not rows."""

    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"user_id": u})

    ds = read(sf_dir, "events", ["user_id"]).map_batches(uniq, batch_format="pyarrow")
    n = ds.unique("user_id")
    return pd.DataFrame({"distinct_users": [np.int64(len(n))]})


def events_lag(sf_dir: str):
    """Per-user ordered window: each event with the previous event's
    value (lag) for the same user — the sorted-partition pattern every
    as-of / window operator reduces to.  Partitioning assumption: one
    user's events co-locate via the coarse-bucket shuffle (user_id %
    64); the user-major (ts, event_id) sort inside the bucket makes
    the result exact and deterministic with no per-user Python.
    """

    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()

    def bucketed(batch: pa.Table) -> pa.Table:
        bucket = batch["user_id"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the whole bucket: user-major (ts, event_id)
        # sort; prev = shifted value masked at user boundaries
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        order = np.lexsort((eid, ts, user))
        user_s, eid_s, val_s = user[order], eid[order], val[order]
        prev = np.empty(val_s.size, dtype=np.float64)
        if prev.size:
            prev[0] = -1.0
            prev[1:] = np.where(user_s[1:] == user_s[:-1], val_s[:-1], -1.0)
        return pd.DataFrame(
            {
                "event_id": eid_s,
                "user_id": user_s,
                "value": val_s,
                "prev_value": prev,
            }
        )

    return (
        read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag, batch_format="pandas")
    )


def events_moving_avg(sf_dir: str, k: int = 3):
    """Per-user BOUNDED-frame window: moving average of ``value`` over
    ``ROWS BETWEEN k PRECEDING AND CURRENT ROW`` (ordered by ts,
    event_id) — the sliding-frame sibling of the unbounded running
    windows (``customer_running_spend``) and of ``events_lag``.

    Same partitioning as events_lag: coarse user-bucket shuffle, one
    vectorized pass per bucket (user-major lexsort, zero per-user
    Python).  The frame sums run as integer cents through a cumsum
    with a leading zero — ``sum_i = c[i+1] - c[i+1-n_i]`` where the
    frame length ``n_i = min(pos_in_user, k) + 1`` never crosses a
    user boundary — so the only float ops are the single
    ``CAST(sum AS DOUBLE) / (100.0 * n)`` the oracle also performs
    (doubles bit-match)."""
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()

    def bucketed(batch: pa.Table) -> pa.Table:
        bucket = batch["user_id"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def moving(g: pd.DataFrame) -> pd.DataFrame:
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        cents = _cents(g["value"].to_numpy())
        order = np.lexsort((eid, ts, user))
        user_s, eid_s, cents_s = user[order], eid[order], cents[order]
        n = user_s.size
        if n == 0:
            return pd.DataFrame(
                {"event_id": eid_s, "user_id": user_s,
                 "moving_avg": np.zeros(0, np.float64)}
            )
        # position within the user's run (user-major sort → runs are
        # contiguous): seq = index - start_of_run
        new_run = np.r_[True, user_s[1:] != user_s[:-1]]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        seq = np.arange(n) - run_start
        win_n = np.minimum(seq, k) + 1
        c = np.concatenate([[0], np.cumsum(cents_s)])  # exact int64
        sums = c[np.arange(1, n + 1)] - c[np.arange(1, n + 1) - win_n]
        avg = sums.astype(np.float64) / (100.0 * win_n)
        return pd.DataFrame(
            {"event_id": eid_s, "user_id": user_s, "moving_avg": avg}
        )

    return (
        read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(moving, batch_format="pandas")
    )


def _range_frame_sums(
    user_s: np.ndarray, ts_s: np.ndarray, cents_s: np.ndarray, win_us: np.int64
) -> np.ndarray:
    """Exact integer frame sums for RANGE BETWEEN win PRECEDING AND
    CURRENT ROW over a user-major, ts-sorted run layout.

    Banded offset: shift each user run into its own disjoint time band
    so ONE pair of global searchsorteds resolves every row's
    [left, right) frame — no per-user Python.  Falls back to a per-run
    loop only if run_count x band would overflow int64 (pathological
    span x cardinality)."""
    n = user_s.size
    new_run = np.r_[True, user_s[1:] != user_s[:-1]]
    c = np.concatenate([[0], np.cumsum(cents_s)])
    run_id = np.cumsum(new_run) - 1
    ts_rel = ts_s - ts_s.min()
    band = np.int64(int(ts_rel.max()) + int(win_us) + 1)
    if int(run_id[-1] + 1) * int(band) < (1 << 62):
        ts_adj = run_id * band + ts_rel  # strictly run-major sorted
        left = np.searchsorted(ts_adj, ts_adj - win_us, side="left")
        right = np.searchsorted(ts_adj, ts_adj, side="right")  # incl. peers
        return c[right] - c[left]
    sums = np.empty(n, dtype=np.int64)
    starts = np.flatnonzero(new_run).tolist() + [n]
    for i in range(len(starts) - 1):
        s, e = starts[i], starts[i + 1]
        t = ts_s[s:e]
        lo = s + np.searchsorted(t, t - win_us, side="left")
        hi = s + np.searchsorted(t, t, side="right")
        sums[s:e] = c[hi] - c[lo]
    return sums


def events_time_window_sum(sf_dir: str, window_sec: int = 3600):
    """Per-user TIME-RANGE window: sum of ``value`` over
    ``RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW``
    (ordered by ts) — the third frame type after unbounded ROWS
    (``customer_running_spend``) and bounded ROWS
    (``events_moving_avg``).  RANGE semantics: the frame holds ALL
    rows whose ts falls in ``[ts_i - window, ts_i]``, including
    same-timestamp peers sorted after the current row.

    Per bucket: user-major ts sort, then two vectorized searchsorteds
    per user run give each row's frame as a [left, right) slice of the
    run — frame sums are integer cents via leading-zero-cumsum diffs
    (exact), and the single divide-by-100 bit-matches the oracle."""
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()
    win_us = np.int64(window_sec) * 1_000_000

    def bucketed(batch: pa.Table) -> pa.Table:
        bucket = batch["user_id"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def window_sum(g: pd.DataFrame) -> pd.DataFrame:
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()  # epoch microseconds
        eid = g["event_id"].to_numpy()
        cents = _cents(g["value"].to_numpy())
        order = np.lexsort((eid, ts, user))
        user_s, ts_s, eid_s, cents_s = (
            user[order], ts[order], eid[order], cents[order]
        )
        n = user_s.size
        if n == 0:
            return pd.DataFrame(
                {"event_id": eid_s, "user_id": user_s,
                 "window_sum": np.zeros(0, np.float64)}
            )
        sums = _range_frame_sums(user_s, ts_s, cents_s, win_us)
        return pd.DataFrame(
            {
                "event_id": eid_s,
                "user_id": user_s,
                "window_sum": sums.astype(np.float64) / 100.0,
            }
        )

    return (
        read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(window_sum, batch_format="pandas")
    )


def _pick_types(left_type: str, right_type: str, num_buckets: int | None):
    """Filter to the two participating event types and add the coarse
    shuffle key ``user_id % num_buckets`` — FEW large groups instead of
    one group per user, so the in-group merge stays vectorized at any
    user cardinality (millions of per-tiny-group calls is the
    map_groups failure mode at scale).  ``num_buckets=None`` derives
    the count from the cluster's CPUs (num_shuffle_buckets)."""
    if num_buckets is None:
        from parallel_count_min_sketch_ray.stages.partitioning import (
            num_shuffle_buckets,
        )

        num_buckets = num_shuffle_buckets()

    def pick(batch: pa.Table) -> pa.Table:
        out = batch.filter(
            pc.is_in(batch["event_type"], value_set=pa.array([left_type, right_type]))
        )
        bucket = out["user_id"].to_numpy(zero_copy_only=False) % np.int64(num_buckets)
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    return pick


def events_asof_join(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    num_buckets: int | None = None,
):
    """As-of join — the canonical custom operator Ray Data lacks
    (SURVEY.md §2.4 custom-operator rule): each ``left_type`` event is
    matched to the LATEST ``right_type`` event of the same user with
    ``r.ts <= l.ts`` (DuckDB ``ASOF LEFT JOIN`` semantics; unmatched →
    -1 sentinels).

    Partitioning: ONE shuffle on ``user_id % num_buckets`` co-locates
    both (pre-filtered) sides; inside each bucket the match is the
    vectorized merge over ALL its users at once — lexsort by (user,
    ts, side) with rights ordered before lefts at equal ts, a running
    ``maximum.accumulate`` of right-row indices, and a same-user guard
    (the carried index can only cross a user boundary when the current
    user has no earlier right event).  O((L+R) log (L+R)) per bucket
    with no per-user Python — exact for ties because equal-(user, ts)
    rights sort by event_id and the accumulate keeps the last.
    """

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        is_right = (g["event_type"] == right_type).to_numpy()
        is_left = (g["event_type"] == left_type).to_numpy()
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy()
        side = np.where(is_right, 0, 1)  # right before left at equal ts
        order = np.lexsort((eid, side, ts, user))
        user_s, ts_s, val_s, eid_s = user[order], ts[order], val[order], eid[order]
        right_s, left_s = is_right[order], is_left[order]
        idx = np.arange(order.size)
        last = np.maximum.accumulate(np.where(right_s, idx, -1))
        lpos = np.nonzero(left_s)[0]
        j = last[lpos]
        jc = np.clip(j, 0, None)
        valid = (j >= 0) & (user_s[jc] == user_s[lpos])
        return pd.DataFrame(
            {
                "event_id": eid_s[lpos],
                "user_id": user_s[lpos],
                "value": val_s[lpos],
                "prev_purchase_value": np.where(valid, val_s[jc], -1.0).astype(
                    np.float64
                ),
                "us_since_purchase": np.where(
                    valid, ts_s[lpos] - ts_s[jc], -1
                ).astype(np.int64),
            }
        )

    return (
        read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(
            _pick_types(left_type, right_type, num_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
    )


def events_range_join(
    sf_dir: str,
    left_type: str = "error",
    right_type: str = "click",
    window_us: int = 600_000_000,
    num_buckets: int | None = None,
):
    """Range (interval) join — second custom operator of the SURVEY
    §2.4 family: for each ``left_type`` event, the count of
    ``right_type`` events of the same user with ``l.ts - window <=
    r.ts <= l.ts``.

    Same partitioning as :func:`events_asof_join`: one coarse-bucket
    shuffle; inside each bucket the interval count runs vectorized over
    ALL its users at once via paired window probes — each left event
    contributes a probe row at ``ts - window``, everything lexsorts by
    (user, ts, kind) with kind ordering probe < right < left (both
    window boundaries inclusive), and the count is the difference of
    the running right-event prefix count at the left row vs its probe
    row.  The probe and its left share a user, so every right between
    them in the user-major sort is in-window by construction — no
    per-user segmentation, no O(L·R) pair expansion.
    """

    def count_in_window(g: pd.DataFrame) -> pd.DataFrame:
        is_right = (g["event_type"] == right_type).to_numpy()
        is_left = (g["event_type"] == left_type).to_numpy()
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy()
        lsel = np.nonzero(is_left)[0]
        n, nl = user.size, lsel.size
        # base rows: kind right=1 / left=2; probe rows: kind 0 at ts-w
        kind = np.where(is_right, 1, 2)
        all_user = np.concatenate([user, user[lsel]])
        all_ts = np.concatenate([ts, ts[lsel] - window_us])
        all_kind = np.concatenate([kind, np.zeros(nl, dtype=np.int64)])
        order = np.lexsort((all_kind, all_ts, all_user))
        inv = np.empty(order.size, dtype=np.int64)
        inv[order] = np.arange(order.size)
        cum = np.cumsum(all_kind[order] == 1)  # rights up to & incl. position
        counts = cum[inv[lsel]] - cum[inv[n + np.arange(nl)]]
        return pd.DataFrame(
            {
                "event_id": eid[lsel],
                "user_id": user[lsel],
                "n_right_in_window": counts.astype(np.int64),
            }
        )

    return (
        read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(
            _pick_types(left_type, right_type, num_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(count_in_window, batch_format="pandas")
    )


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON-ish ``props`` column with ONE vectorized RE2 kernel
    (``pc.extract_regex``) — the scale shape of lightweight JSON
    decoding (a full parser would be an actor-pool stage) — then exact
    per-event-type stats of k via the built-in aggregate suite."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def extract(batch: pa.Table) -> pa.Table:
        col = batch["props"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": batch["event_type"], "k": k})

    out = (
        read(sf_dir, "events", ["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="cnt"),
            Sum("k", alias_name="k_sum"),
            Min("k", alias_name="k_min"),
            Max("k", alias_name="k_max"),
        )
    ).to_pandas()
    return out[["event_type", "cnt", "k_sum", "k_min", "k_max"]]


def top_users_by_value(sf_dir: str, k: int = 20):
    """Top-k users by exact total value (cents), tie-broken by user_id."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "vc": pa.array(_cents(batch["value"].to_numpy(zero_copy_only=False))),
            }
        )
        return _group_sum(t, ["user_id"])

    agg = (
        read(sf_dir, "events", ["user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cnt", alias_name="n_events"), Sum("vc", alias_name="vc"))
    )
    top = agg.sort(["vc", "user_id"], descending=[True, False]).limit(k).to_pandas()
    top["value_sum"] = top["vc"].astype(np.float64) / 100.0
    return top[["user_id", "n_events", "value_sum"]]


# ---------------------------------------------------------------------------
# TPC-H-ish relational pipelines
# ---------------------------------------------------------------------------


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape over lineitem (no date filter — full scan),
    grouped by returnflag+linestatus, exact integer-cent arithmetic."""

    def partial(batch: pa.Table) -> pa.Table:
        qty_c = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        disc_price = ext_c * (100 - disc_c)  # in 1e-4 dollars
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_c": pa.array(qty_c),
                "ext_c": pa.array(ext_c),
                "disc_price_ten_thousandths": pa.array(disc_price),
                "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return _group_sum(t, ["l_returnflag", "l_linestatus"])

    from ray.data.aggregate import Sum

    out = (
        read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("ext_c", alias_name="ext_c"),
            Sum("disc_price_ten_thousandths", alias_name="dp"),
            Sum("cnt", alias_name="count_order"),
        )
    ).to_pandas()
    out["sum_qty"] = out["qty_c"].astype(np.float64) / 100.0
    out["sum_base_price"] = out["ext_c"].astype(np.float64) / 100.0
    out["sum_disc_price"] = out["dp"].astype(np.float64) / 10000.0
    return out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
    ]


def _join_partitions(
    sf_dir: str, tables: list[str], bytes_per_partition: int = 64 << 20
) -> int:
    """Hash-join partition count derived from input size: one partition
    per ~64 MB of parquet across both sides, clamped to [2, 4×CPUs].

    A hardcoded count starves the shuffle at 1000× the key space and
    (measured) wastes it at small inputs — each hash-shuffle partition
    costs an aggregator task, so 32 partitions on a 13 MB join ran
    3-10× slower than 2-4 here."""
    import glob
    import math
    import os

    total = 0
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            total += sum(os.path.getsize(f) for f in glob.glob(os.path.join(p, "*")))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(math.ceil(total / bytes_per_partition), 4 * cpus))


def order_lineitem_join(sf_dir: str, num_partitions: int | None = None):
    """Large-side hash join: lineitem ⋈ orders on orderkey (both sides
    too big to broadcast at scale) via native ``Dataset.join`` — a
    hash-partitioned shuffle on the key — then per-orderstatus revenue.

    Revenue uses the integer-cent product (price_cents × (100 −
    discount_cents)) so the DuckDB oracle matches bit-for-bit.
    """
    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, ["lineitem", "orders"])
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "n_items": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "rev": pa.array(ext_c * (100 - disc_c)),
            }
        )
        return _group_sum(t, ["o_orderstatus"])

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("rev", alias_name="rev"))
    ).to_pandas()
    out["revenue"] = out["rev"].astype(np.float64) / 10000.0
    return out[["o_orderstatus", "n_items", "revenue"]]


def customers_without_orders(sf_dir: str, num_partitions: int | None = None):
    """Anti-join (TPC-H Q22 shape): customers with NO urgent-priority
    order, counted per market segment, plus their account-balance sum.

    Native ``Dataset.join(join_type="left_anti")`` — a hash-partitioned
    shuffle on the key; duplicate right-side keys cannot multiply an
    anti-join, so ``orders`` needs no pre-dedup pass.  Both sides are
    column-pruned to exactly the key + aggregated columns, the priority
    predicate is pushed into the parquet scan (row-group pruning; the
    filter column never leaves storage), and the partition count
    derives from input bytes (a broadcast NOT-IN set would cap at
    driver memory; the shuffle anti-join scales with the cluster).
    """
    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, ["customer", "orders"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    )
    no_orders = cust.join(
        orders,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n_customers": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "bal": pa.array(
                    _cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
                ),
            }
        )
        return _group_sum(t, ["c_mktsegment"])

    from ray.data.aggregate import Sum

    out = (
        no_orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("bal", alias_name="bal"),
        )
    ).to_pandas()
    out["acctbal_sum"] = out["bal"].astype(np.float64) / 100.0
    return out[["c_mktsegment", "n_customers", "acctbal_sum"]]


def _sorted_lookup(table: pa.Table, key_col: str, val_col) -> tuple[np.ndarray, np.ndarray]:
    """(sorted int64 keys, aligned values) for searchsorted broadcast joins."""
    keys = table[key_col].to_numpy()
    order = np.argsort(keys)
    vals = (
        val_col[order]
        if isinstance(val_col, np.ndarray)
        else table[val_col].to_numpy(zero_copy_only=False)[order]
    )
    return np.ascontiguousarray(keys[order].astype(np.int64)), vals


def _probe_sorted(keys: np.ndarray, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Membership probe against a SORTED broadcast key array: returns
    (hit mask, clamped positions).  ``pos`` is only meaningful where
    ``hit`` — the end-of-array clamp maps misses to slot 0, so a bare
    ``vals[pos]`` without the mask silently reads the first key's value
    (the subtle bug this helper exists to contain in ONE place; the
    idiom previously appeared hand-rolled at every broadcast-lookup
    site)."""
    pos = np.searchsorted(keys, queries)
    pos[pos == len(keys)] = 0
    hit = keys[pos] == queries if len(keys) else np.zeros(len(queries), dtype=bool)
    return hit, pos


def brand_nation_revenue(sf_dir: str):
    """Star-schema rollup over the two remaining dimension tables:
    lineitem ⋈ part (brand) ⋈ supplier ⋈ nation (supplier nation) →
    revenue per (p_brand, n_name).

    Both dimension sides broadcast as sorted-array lookups resolved in
    ONE map stage (supplier→nation composed driver-side first — the
    classic snowflake-collapse); the fact table streams, pre-aggregated
    per batch before the small groupby."""
    import pyarrow.parquet as pq_

    part = pq_.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    supp = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    n2name = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    supp_nation = np.array(
        [n2name[int(nk)] for nk in supp["s_nationkey"].to_numpy()]
    ).astype(str)
    pk, pbrand = _sorted_lookup(part, "p_partkey", "p_brand")
    pbrand = pbrand.astype(str)
    sk, snation = _sorted_lookup(supp, "s_suppkey", supp_nation)
    ref = ray.put((pk, pbrand, sk, snation))

    def star_join(batch: pa.Table) -> pa.Table:
        pkeys, pvals, skeys, svals = ray.get(ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        ppos = np.clip(np.searchsorted(pkeys, lpk), 0, len(pkeys) - 1)
        spos = np.clip(np.searchsorted(skeys, lsk), 0, len(skeys) - 1)
        brand = np.where(pkeys[ppos] == lpk, pvals[ppos], "UNKNOWN")
        nat = np.where(skeys[spos] == lsk, svals[spos], "UNKNOWN")
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "p_brand": pa.array(brand),
                "n_name": pa.array(nat),
                "n_items": pa.array(np.ones(len(lpk), dtype=np.int64)),
                "rev": pa.array(ext_c * (100 - disc_c)),
            }
        )
        return _group_sum(t, ["p_brand", "n_name"])

    from ray.data.aggregate import Sum

    out = (
        read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(star_join, batch_format="pyarrow", batch_size=65536)
        .groupby(["p_brand", "n_name"])
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("rev", alias_name="rev"))
    ).to_pandas()
    out["revenue"] = out["rev"].astype(np.float64) / 10000.0
    return out[["p_brand", "n_name", "n_items", "revenue"]]


def events_value_stats(sf_dir: str):
    """Per-event-type exact value stats (min/max/mean via integer cents)
    using Ray's built-in aggregate functions."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "vc": _cents(batch["value"].to_numpy(zero_copy_only=False)),
            }
        )

    out = (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="cnt"),
            Min("vc", alias_name="min_c"),
            Max("vc", alias_name="max_c"),
            Sum("vc", alias_name="sum_c"),
        )
    ).to_pandas()
    out["value_min"] = out["min_c"].astype(np.float64) / 100.0
    out["value_max"] = out["max_c"].astype(np.float64) / 100.0
    out["value_mean"] = out["sum_c"].astype(np.float64) / 100.0 / out["cnt"]
    return out[["event_type", "cnt", "value_min", "value_max", "value_mean"]]


def orders_by_region(sf_dir: str):
    """orders ⋈ customer ⋈ nation ⋈ region rollup (all dimension sides
    broadcast as one composed custkey→region_name map; no shuffle join).
    """
    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq_.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    region_names = np.array(
        [r2name[n2r[int(nk)]] for nk in cust["c_nationkey"].to_numpy()]
    ).astype(str)
    keys, vals = _sorted_lookup(cust, "c_custkey", region_names)
    ref = ray.put((keys, vals))

    # task-based stage (not an actor pool): the broadcast arrays ride
    # the object store and ray.get is plasma-cached per worker —
    # measured ~10x faster per query on this host than spinning a
    # fresh actor pool whose processes repay the page-fault warmup
    def region_join(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
        reg = np.where(k[pos] == ck, v[pos], "UNKNOWN")
        t = pa.table(
            {
                "r_name": pa.array(reg),
                "n_orders": pa.array(np.ones(len(ck), dtype=np.int64)),
                "tp_c": pa.array(
                    _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )
        return _group_sum(t, ["r_name"])

    from ray.data.aggregate import Sum

    out = (
        read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(region_join, batch_format="pyarrow", batch_size=65536)
        .groupby("r_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("tp_c", alias_name="tp_c"))
    ).to_pandas()
    out["total_price"] = out["tp_c"].astype(np.float64) / 100.0
    return out[["r_name", "n_orders", "total_price"]]


def orders_by_segment(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-segment totals.

    customer is the classic small dimension: ``ray.put`` the
    custkey→segment map once; every map task reads it from the object
    store — no shuffle join.
    """
    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys, vals = _sorted_lookup(
        cust, "c_custkey",
        cust["c_mktsegment"].to_numpy(zero_copy_only=False).astype(str),
    )
    lookup_ref = ray.put((keys, vals))

    # task-based broadcast-join stage (see orders_by_region note)
    def segment_join(batch: pa.Table) -> pa.Table:
        k, v = ray.get(lookup_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
        seg = np.where(k[pos] == ck, v[pos], "UNKNOWN")
        t = pa.table(
            {
                "c_mktsegment": pa.array(seg),
                "n_orders": pa.array(np.ones(len(ck), dtype=np.int64)),
                "tp_c": pa.array(
                    _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )
        return _group_sum(t, ["c_mktsegment"])

    from ray.data.aggregate import Sum

    out = (
        read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(segment_join, batch_format="pyarrow", batch_size=65536)
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("tp_c", alias_name="tp_c"))
    ).to_pandas()
    out["total_price"] = out["tp_c"].astype(np.float64) / 100.0
    return out[["c_mktsegment", "n_orders", "total_price"]]


def signup_conversion(sf_dir: str, window_days: int = 7):
    """Cohort conversion funnel: per signup day, how many signing-up
    users made a purchase within ``window_days`` after their FIRST
    signup — the multi-step behavioral query of product analytics,
    composed from this repo's standard parts.

    Topology (the sessionization shape): prune to the two relevant
    event types inside the scan's first map_batches, co-locate each
    user via the coarse user-hash bucket shuffle, resolve the
    first-signup timestamp and the in-window purchase EXISTS per user
    vectorized over the whole bucket (lexsort + segment reduceat — no
    per-user Python), pre-aggregate (cohort_day, n, converted) per
    bucket, and finish with a tiny per-day Sum.  Integer-microsecond
    compares; the rate is one int/int double division, so the floats
    are bit-comparable with the SQL oracle.
    """
    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()
    window_us = np.int64(window_days) * 86_400_000_000

    def prune(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch["event_type"], value_set=pa.array(["signup", "purchase"])
        )
        kept = batch.filter(keep)
        bucket = kept["user_id"].to_numpy(zero_copy_only=False) % np.int64(
            n_buckets
        )
        return pa.table(
            {
                "user_id": kept["user_id"],
                "ts": kept["ts"],
                "is_signup": pc.equal(kept["event_type"], "signup"),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        user = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        is_su = g["is_signup"].to_numpy(dtype=bool)
        order = np.lexsort((ts, user))
        user_s, ts_s, su_s = user[order], ts[order], is_su[order]
        starts = np.r_[0, np.flatnonzero(user_s[1:] != user_s[:-1]) + 1]
        seg_len = np.diff(np.r_[starts, len(user_s)])
        # first-signup ts per user: min over signup rows (int64 max as
        # the identity for non-signup rows)
        su_ts = np.where(su_s, ts_s, np.iinfo(np.int64).max)
        first_su = np.minimum.reduceat(su_ts, starts)
        has_su = first_su != np.iinfo(np.int64).max
        row_first = np.repeat(first_su, seg_len)
        hit = (~su_s) & (ts_s > row_first) & (ts_s <= row_first + window_us)
        converted = np.add.reduceat(hit.astype(np.int64), starts) > 0
        cohort = pd.to_datetime(first_su[has_su], unit="us").strftime("%Y-%m-%d")
        out = pd.DataFrame(
            {
                "cohort_day": cohort,
                "n_users": np.int64(1),
                "n_converted": converted[has_su].astype(np.int64),
            }
        )
        return out.groupby("cohort_day", as_index=False).sum()

    agg = (
        read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(prune, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
        .groupby("cohort_day")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_converted", alias_name="n_converted"),
        )
        .to_pandas()
    )
    agg["conversion_rate"] = agg["n_converted"] / agg["n_users"]
    return agg.sort_values("cohort_day").reset_index(drop=True)


def pack_contexts(sf_dir: str, budget: int = 4096):
    """Sequence packing: assign documents, in (source, doc_id) order,
    to fixed character-budget training contexts, and report per-context
    occupancy.  A doc starts in the context its running prefix falls
    into: context_id = (cum_chars_before_doc) // budget — the
    SUM() OVER (PARTITION BY source ORDER BY doc_id) window.

    The window runs through ``stages.scan.keyed_prefix_sum`` (two
    block-aligned passes, O(blocks) coordination), so a single source
    bigger than one worker's memory still streams — no map_groups.
    The reference has no windowed operators (SURVEY §2.4); this is the
    packing step every context-window training pipeline needs.
    """
    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum

    ds = read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    with_cum = keyed_prefix_sum(ds, "source", "doc_id", "n_chars", "cum")

    def assign(batch: pa.Table) -> pa.Table:
        cum = batch["cum"].to_numpy(zero_copy_only=False)
        chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ctx = (cum - chars) // budget
        t = pa.table(
            {
                "source": batch["source"],
                "context_id": pa.array(ctx, pa.int64()),
                "n_docs": pa.array(np.ones(len(ctx), np.int64)),
                "chars": pa.array(chars, pa.int64()),
            }
        )
        # per-block pre-aggregation: the shuffle moves (source, ctx)
        # partials, not documents
        return pa.TableGroupBy(t, ["source", "context_id"]).aggregate(
            [("n_docs", "sum"), ("chars", "sum")]
        ).rename_columns(["source", "context_id", "n_docs", "chars"])

    return (
        with_cum.map_batches(assign, batch_format="pyarrow")
        .groupby(["source", "context_id"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("chars", alias_name="chars"),
        )
    )


def daily_retention(sf_dir: str):
    """Consecutive-day retention: per activity day, distinct active
    users and how many of them return the next day — the DAU/retention
    curve every engagement pipeline computes.

    Topology: per-block dedup of (user_id, day) pairs (the shuffle
    carries distinct pairs, not events) → coarse user-bucket shuffle →
    one vectorized pass per bucket finds same-user day+1 adjacencies
    (lexsort + shifted compare, no per-user Python) → per-day Sum of
    the bucket partials.  Buckets partition users, so no pair is
    counted twice.
    """
    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()
    day_us = np.int64(86_400_000_000)

    def pairs(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts_us // day_us
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, user))
        u_s, d_s = user[order], day[order]
        first = np.ones(u_s.size, dtype=bool)
        first[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        return pa.table(
            {
                "user_id": pa.array(u_s[first], pa.int64()),
                "day": pa.array(d_s[first], pa.int64()),
                "bucket": pa.array(
                    u_s[first] % np.int64(n_buckets), pa.int64()
                ),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        user = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        order = np.lexsort((day, user))
        u_s, d_s = user[order], day[order]
        # cross-block duplicates of the same (user, day) pair
        first = np.ones(u_s.size, dtype=bool)
        first[1:] = (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1])
        u_s, d_s = u_s[first], d_s[first]
        retained = np.zeros(u_s.size, dtype=np.int64)
        if u_s.size > 1:
            nxt = (u_s[1:] == u_s[:-1]) & (d_s[1:] == d_s[:-1] + 1)
            retained[:-1] = nxt.astype(np.int64)
        out = (
            pd.DataFrame({"day": d_s, "n_users": 1, "n_retained": retained})
            .groupby("day", as_index=False)
            .sum()
        )
        return out.astype(
            {"day": np.int64, "n_users": np.int64, "n_retained": np.int64}
        )

    return (
        read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_retained", alias_name="n_retained"),
        )
    )


def source_distinct_exact(sf_dir: str):
    """Exact distinct tokens per source — the exact counterpart (and
    production validation) of the grouped-HLL ``source_distinct_tokens``
    sketch query.

    Per-block dedup of (source, token) pairs → one composite-key
    distinct shuffle → per-block source counts → tiny per-source Sum.
    """
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        lists = textops.split_words(batch["text"])
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src_rep = pc.list_parent_indices(lists)
        t = pa.table(
            {"source": src.take(src_rep), "token": lists.flatten()}
        )
        return pa.TableGroupBy(t, ["source", "token"]).aggregate([])

    def per_source(batch: pa.Table) -> pa.Table:
        vc = batch["source"].combine_chunks().value_counts() if isinstance(
            batch["source"], pa.ChunkedArray
        ) else batch["source"].value_counts()
        return pa.Table.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            names=["source", "distinct_tokens"],
        )

    return (
        read(sf_dir, "documents", ["source", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["source", "token"])
        .count()
        .map_batches(per_source, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("distinct_tokens", alias_name="distinct_tokens"))
    )


def events_value_histogram(sf_dir: str, width: float = 50.0):
    """Fixed-width value histogram per event type: bin = floor(value /
    width).  Per-block (type, bin) pre-aggregation; the shuffle carries
    one row per (block, type, bin)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(vals / width).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "bin": pa.array(bins, pa.int64()),
                "cnt": pa.array(np.ones(len(bins), np.int64)),
            }
        )
        return _group_sum(t, ["event_type", "bin"])

    return (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def bigram_lift(sf_dir: str, threshold: int = 20, k: int = 20):
    """Collocation mining: top-k bigrams by lift = P(ab)·N /
    (P(a)·P(b)) — cnt_ab · total_tokens / (cnt_a · cnt_b), the
    association score behind phrase extraction.

    The unigram table rides the broadcast tier (vocabulary ≪ corpus;
    for open vocabularies the token-bucket join of ``doc_top_tfidf`` is
    the scale path).  The lift is one double expression evaluated in
    the same operation order as the SQL oracle, so floats are
    bit-comparable; ties rank deterministically (lift DESC, bigram
    ASC).
    """
    from ray.data.aggregate import Sum

    uni = token_counts(sf_dir)
    n_tokens = int(uni.aggregate(Sum("cnt", alias_name="t"))["t"])
    uni_df = uni.to_pandas()  # the documented small side
    vocab = np.sort(uni_df["token"].to_numpy())
    vorder = np.argsort(uni_df["token"].to_numpy())
    vcnt = uni_df["cnt"].to_numpy()[vorder]
    side = ray.put((vocab, vcnt))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("lift", pa.array([], pa.float64()))
        voc, cnts = ray.get(side)
        big = batch["bigram"]
        if isinstance(big, pa.ChunkedArray):
            big = big.combine_chunks()
        flat = pc.split_pattern(big, " ").flatten().to_numpy(
            zero_copy_only=False
        )
        pos_a = np.minimum(np.searchsorted(voc, flat[0::2]), len(voc) - 1)
        pos_b = np.minimum(np.searchsorted(voc, flat[1::2]), len(voc) - 1)
        # fail fast if bigram tokenization ever diverges from the
        # unigram vocabulary (a silent mismatch would mis-count lift)
        if not (
            np.array_equal(voc[pos_a], flat[0::2])
            and np.array_equal(voc[pos_b], flat[1::2])
        ):
            raise ValueError("bigram component token missing from unigram vocab")
        ca, cb = cnts[pos_a], cnts[pos_b]
        cab = batch["cnt"].to_numpy(zero_copy_only=False)
        # int64 product matches the oracle's BIGINT multiply bit-for-bit;
        # above the exact-double regime fall back to float64 (DuckDB
        # would raise on BIGINT overflow there anyway)
        if ca.size and float(ca.max()) * float(cb.max()) > 2.0**62:
            denom = ca.astype(np.float64) * cb.astype(np.float64)
        else:
            denom = ca * cb
        lift = cab.astype(np.float64) * np.float64(n_tokens) / denom
        return batch.append_column("lift", pa.array(lift, pa.float64()))

    top = (
        bigram_counts(sf_dir, threshold)
        .map_batches(score, batch_format="pyarrow")
        .sort(["lift", "bigram"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def customer_running_spend(sf_dir: str):
    """Per-customer running spend after each order (ordered by order
    date, key-tiebroken) — the running-total window, partitioned by a
    high-cardinality integer key, through the same distributed scan as
    ``pack_contexts``.  Money runs as integer cents through the scan
    (exact in any association); the final divide-by-100 is the only
    float op, so the doubles match the oracle bit-for-bit.
    """
    from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    ds = read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ).map_batches(to_cents, batch_format="pyarrow")
    with_cum = keyed_prefix_sum(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"], "cents", "cum"
    )

    def finalize(batch: pa.Table) -> pa.Table:
        spend = batch["cum"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "running_spend": pa.array(spend, pa.float64()),
            }
        )

    return with_cum.map_batches(finalize, batch_format="pyarrow")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str):
    """Long→wide pivot: one row per day with a count column per event
    type.  The pivot happens inside the per-block combiner (a 5-way
    vectorized compare), so the shuffle carries one wide row per
    (block, day) — the pivot itself never reshapes post-shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts_us // 86_400_000_000
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_np = et.to_numpy(zero_copy_only=False)
        cols = {"day": pa.array(day, pa.int64())}
        for t in _PIVOT_TYPES:
            cols[f"n_{t}"] = pa.array((et_np == t).astype(np.int64))
        return _group_sum(pa.table(cols), ["day"])

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES]
    return (
        read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(*aggs)
    )


def source_token_set_ops(sf_dir: str, src_a: str = "src0", src_b: str = "src1"):
    """Exact set algebra between two sources' token vocabularies:
    |A|, |B|, |A∩B|, |A∪B| and Jaccard — the exact counterpart (and
    validation oracle) of the KMV-sketch ``source_shingle_overlap``.

    The source filter prunes at the scan; per-block distinct
    (token, in_a, in_b) flags combine through one groupby Max — the
    shuffle carries each block's distinct tokens once, never rows.
    """
    from ray.data.aggregate import Max

    def flags(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        lists = textops.split_words(batch["text"])
        rep = pc.list_parent_indices(lists)
        srcs = src.take(rep).to_numpy(zero_copy_only=False)
        toks = lists.flatten()
        t = pa.table(
            {
                "token": toks,
                "in_a": pa.array((srcs == src_a).astype(np.int64)),
                "in_b": pa.array((srcs == src_b).astype(np.int64)),
            }
        )
        return pa.TableGroupBy(t, ["token"]).aggregate(
            [("in_a", "max"), ("in_b", "max")]
        ).rename_columns(["token", "in_a", "in_b"])

    per_token = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["source", "text"],
            filter=pc.field("source").isin([src_a, src_b]),
        )
        .map_batches(flags, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Max("in_a", alias_name="in_a"), Max("in_b", alias_name="in_b"))
    )

    def counts(batch: pa.Table) -> pa.Table:
        a = batch["in_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["in_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "size_a": pa.array([int(a.sum())], pa.int64()),
                "size_b": pa.array([int(b.sum())], pa.int64()),
                "inter": pa.array([int((a & b).sum())], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        per_token.map_batches(counts, batch_format="pyarrow")
        .aggregate(
            Sum("size_a", alias_name="size_a"),
            Sum("size_b", alias_name="size_b"),
            Sum("inter", alias_name="inter"),
        )
    )
    size_a, size_b, inter = (
        int(agg["size_a"]), int(agg["size_b"]), int(agg["inter"])
    )
    union = size_a + size_b - inter
    return pd.DataFrame(
        {
            "source_a": [src_a],
            "source_b": [src_b],
            "size_a": [size_a],
            "size_b": [size_b],
            "inter": [inter],
            "union_sz": [union],
            "jaccard": [np.float64(inter) / union],
        }
    )


def source_chars_stats(sf_dir: str):
    """Per-source n/mean/std of document length via exact mergeable
    moments (n, Σx, Σx²): one groupby of integer partials, one final
    double expression identical to the SQL oracle — the distributed-
    statistics pattern of ``events_value_hour_corr`` in its simplest
    form."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "source": batch["source"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sxx": pa.array(x * x),
            }
        )
        return _group_sum(t, ["source"])

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = batch["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = batch["sxx"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean = sx.astype(np.float64) / n
        # population std; same expression order as the oracle
        std = np.sqrt((n * sxx - sx * sx).astype(np.float64)) / n
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": pa.array(n, pa.int64()),
                "mean_chars": pa.array(mean, pa.float64()),
                "std_chars": pa.array(std, pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        read(sf_dir, "documents", ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def shipping_priority(sf_dir: str, cutoff: str = "1998-01-01", k: int = 10):
    """TPC-H Q3 shape: top-k unshipped orders by revenue for one market
    segment — a three-table plan that composes the repo's join tiers:
    the segment's customer keys ride the broadcast tier (a semi-join
    filter applied inside the orders scan), then orders⋈lineitem runs
    as the native hash join with size-derived partitions.  Revenue sums
    as integer 1e-4 dollars (exact, associative); both date predicates
    are pushed into the parquet scans.
    """
    cutoff_us = np.datetime64(cutoff, "us").astype(np.int64)
    cutoff_ts = pd.Timestamp(cutoff)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    ).take_all()
    keys = np.sort(np.array([r["c_custkey"] for r in cust], dtype=np.int64))
    keys_ref = ray.put(keys)

    def orders_semi(batch: pa.Table) -> pa.Table:
        cols = ["o_orderkey", "o_orderdate", "o_orderpriority"]
        kk = ray.get(keys_ref)
        if len(kk) == 0:  # no customers in the segment → empty semi-join
            return batch.slice(0, 0).select(cols)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kk, ck)
        pos[pos == len(kk)] = 0
        return batch.filter(pa.array(kk[pos] == ck)).select(cols)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < cutoff_ts,
    ).map_batches(orders_semi, batch_format="pyarrow")

    def line_revenue(batch: pa.Table) -> pa.Table:
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )
        return _group_sum(t, ["l_orderkey"])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > cutoff_ts,
    ).map_batches(line_revenue, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    joined = (
        lineitem.groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .join(
            orders,
            join_type="inner",
            num_partitions=_join_partitions(sf_dir, ["orders", "lineitem"]),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        rev = batch["rev"].to_numpy(zero_copy_only=False).astype(np.float64)
        date_us = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "revenue": pa.array(rev / 10000.0, pa.float64()),
                "orderdate_day": pa.array(date_us // 86_400_000_000, pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    top = (
        joined.map_batches(finalize, batch_format="pyarrow")
        .sort(["revenue", "orderdate_day", "o_orderkey"],
              descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def local_supplier_volume(
    sf_dir: str, region: str = "ASIA", date_from: str = "1996-01-01"
):
    """TPC-H Q5 shape: per-nation revenue where the customer's nation
    equals the supplier's nation, customers restricted to one region,
    orders to one year — the deepest join graph in the suite
    (region⋈nation⋈customer⋈orders⋈lineitem⋈supplier).

    Plan: the three dimension maps (nation names of the region,
    custkey→nationkey, suppkey→nationkey) ride the broadcast tier as
    sorted key/value arrays (one ``ray.put`` each, searchsorted inside
    the scans; at open-vocabulary scale customer graduates to the hash
    join tier like ``order_lineitem_join``).  Both fact scans push
    their predicates into parquet and pre-aggregate to (orderkey,
    nation) rows before the single hash join on orderkey; the
    cust-nation = supp-nation filter runs inside the join's output
    batches.  Revenue sums as integer 1e-4 dollars (exact,
    associative); the only float op is the final divide.
    """
    ts_from = pd.Timestamp(date_from)
    ts_to = pd.Timestamp(date_from) + pd.DateOffset(years=1)

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = ray.data.read_parquet(
        f"{sf_dir}/region.parquet",
        columns=["r_regionkey"],
        filter=pc.field("r_name") == region,
    ).to_pandas()
    nat = nat[nat["n_regionkey"].isin(reg["r_regionkey"])]
    nat_keys = np.sort(nat["n_nationkey"].to_numpy().astype(np.int64))
    nat_names = (
        nat.set_index("n_nationkey")["n_name"].loc[nat_keys].to_numpy(dtype=object)
    )

    def _key_map(table: str, key: str, val: str) -> "ray.ObjectRef":
        """Broadcast (sorted keys, nationkey) restricted to the region."""
        df = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet",
            columns=[key, val],
            filter=pc.field(val).isin(nat_keys.tolist()),
        ).to_pandas()
        kk = df[key].to_numpy().astype(np.int64)
        vv = df[val].to_numpy().astype(np.int64)
        o = np.argsort(kk)
        return ray.put((kk[o], vv[o]))

    cust_ref = _key_map("customer", "c_custkey", "c_nationkey")
    supp_ref = _key_map("supplier", "s_suppkey", "s_nationkey")

    def _lookup(ref, probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        kk, vv = ray.get(ref)
        if len(kk) == 0:
            return np.zeros(len(probe), np.int64), np.zeros(len(probe), bool)
        pos = np.searchsorted(kk, probe)
        pos[pos == len(kk)] = 0
        hit = kk[pos] == probe
        return vv[pos], hit

    def orders_proj(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        nk, hit = _lookup(cust_ref, ck)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(hit)),
                "cust_nation": pa.array(nk[hit], pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= ts_from)
        & (pc.field("o_orderdate") < ts_to),
    ).map_batches(orders_proj, batch_format="pyarrow")

    def line_rev(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        nk, hit = _lookup(supp_ref, sk)
        keep = pa.array(hit)
        ext_c = _cents(
            batch["l_extendedprice"].filter(keep).to_numpy(zero_copy_only=False)
        )
        disc_c = _cents(
            batch["l_discount"].filter(keep).to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"].filter(keep),
                "supp_nation": pa.array(nk[hit], pa.int64()),
                "rev": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )
        return _group_sum(t, ["l_orderkey", "supp_nation"])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_rev, batch_format="pyarrow")

    # no materialize here (unlike returned_item_revenue): the follow-up
    # groupby has |nations| keys, and an A/B at sf0.1 measured no gain
    # from splitting the plan — the pin would cost without paying
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, ["orders", "lineitem"]),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def local_only(batch: pa.Table) -> pa.Table:
        cn = batch["cust_nation"].to_numpy(zero_copy_only=False)
        sn = batch["supp_nation"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(cn == sn))
        return _group_sum(
            t.select(["supp_nation", "rev"]), ["supp_nation"]
        )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("supp_nation")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    pos = np.searchsorted(nat_keys, agg["supp_nation"].to_numpy())
    agg["n_name"] = nat_names[pos]
    agg["revenue"] = agg["rev"].to_numpy().astype(np.float64) / 10000.0
    out = agg[["n_name", "revenue"]].sort_values(
        "revenue", ascending=False
    ).reset_index(drop=True)
    return out


def returned_item_revenue(
    sf_dir: str, date_from: str = "1996-01-01", k: int = 20
):
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items in one quarter — the churn-analysis join
    (customer⋈orders⋈lineitem⋈nation) with a deterministic top-k.

    Plan: both fact scans push their predicates into parquet
    (``l_returnflag = 'R'``, the quarter's date range) and pre-aggregate
    per batch; the lineitem side joins as PARTIALS (no global
    per-orderkey shuffle — the orders side is unique per orderkey, so
    partial rev rows sum to the same per-customer total after the
    join), then a coarse custkey-bucket segment reduce with per-bucket
    top-k pruning (the ``doc_top_tfidf`` pattern; a direct
    high-cardinality ``aggregate`` measured ~10× slower).  Only the k
    winners are enriched with names: the customer/nation dimension
    reads filter to exactly those k keys, so the driver never holds a
    dimension table.  Revenue sums as integer 1e-4 dollars; ties rank
    by ``c_custkey``.
    """
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    ts_from = pd.Timestamp(date_from)
    ts_to = ts_from + pd.DateOffset(months=3)
    n_buckets = num_shuffle_buckets()

    def line_rev(batch: pa.Table) -> pa.Table:
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )
        return _group_sum(t, ["l_orderkey"])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(line_rev, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= ts_from)
        & (pc.field("o_orderdate") < ts_to),
    )

    out_cols = ["rnk", "c_custkey", "c_name", "n_name", "revenue"]
    # an empty quarter yields a schema-less read that the join kernel
    # rejects ("no match for key field") — return empty instead.  The
    # count executes only the quarter-filtered orders scan (small).
    if orders.count() == 0:
        return pd.DataFrame(columns=out_cols)

    # materialize the join output before the second all-to-all: chained
    # lazy all-to-alls re-execute the upstream scans in the sample
    # phase (measured 9-13 s vs ~4 s split); the pinned intermediate is
    # bounded by the quarter's returned line items, not the corpus
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(sf_dir, ["orders", "lineitem"]),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).materialize()

    def cust_partial(batch: pa.Table) -> pa.Table:
        g = _group_sum(
            batch.select(["o_custkey", "rev"]), ["o_custkey"]
        )
        b = g["o_custkey"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return g.append_column("bucket", pa.array(b, pa.int64()))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "c_custkey": pd.Series([], dtype=np.int64),
                "rev": pd.Series([], dtype=np.int64),
            }
        )
        if not len(g):  # an empty quarter must return empty, not crash
            return empty
        ck = g["o_custkey"].to_numpy()
        o = np.argsort(ck, kind="stable")
        ck_s = ck[o]
        starts = np.r_[0, np.flatnonzero(np.diff(ck_s)) + 1]
        rev = np.add.reduceat(g["rev"].to_numpy()[o], starts)
        # per-bucket prune to the global top-k candidates (any global
        # winner is a winner of its bucket, so ≤ buckets·k rows move)
        order = np.lexsort((ck_s[starts], -rev))[:k]
        return pd.DataFrame(
            {"c_custkey": ck_s[starts][order], "rev": rev[order]}
        )

    cand = (
        joined.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame(columns=out_cols)
    cand = cand.sort_values(
        ["rev", "c_custkey"], ascending=[False, True]
    ).head(k)
    keys = cand["c_custkey"].to_numpy().astype(np.int64)

    # enrich ONLY the winners (k rows) with names
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pc.field("c_custkey").isin(keys.tolist()),
    ).to_pandas()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = cand.merge(cust, on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    out["revenue"] = out["rev"].to_numpy().astype(np.float64) / 10000.0
    out = out.sort_values(
        ["revenue", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rnk", "c_custkey", "c_name", "n_name", "revenue"]]


def large_volume_orders(sf_dir: str, qty_threshold: int = 250):
    """TPC-H Q18 shape: orders whose TOTAL lineitem quantity exceeds
    ``qty_threshold``, enriched with the ordering customer — the
    HAVING-on-an-aggregated-fact semi-join (distinct from Q1's pure
    rollup, Q3/Q5's star joins, Q10's top-k: here the join's build
    side is itself the output of a fact aggregation).

    Plan: the lineitem scan reads TWO columns and pre-aggregates
    (orderkey, qty) per batch; partials reduce in coarse orderkey
    buckets with numpy segment sums (the measured-faster alternative
    to a high-cardinality ``aggregate``), and ONLY the orders beating
    the threshold (~1% of keys) leave the bucket stage.  Those winners
    hash-join orders, then customer — both joins' left side is
    threshold-proportional, never fact-proportional, and nothing
    materializes on the driver.  Quantities sum as exact int64
    (fail-fast if a quantity is non-integral), so the DuckDB oracle
    matches bit-for-bit.
    """
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    n_buckets = num_shuffle_buckets()

    def qty_partial(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        qi = np.rint(q)
        if q.size and not np.array_equal(qi, q):
            raise ValueError("non-integral l_quantity; exact-sum contract broken")
        g = _group_sum(
            pa.table(
                {
                    "l_orderkey": batch["l_orderkey"],
                    "total_qty": pa.array(qi.astype(np.int64)),
                }
            ),
            ["l_orderkey"],
        )
        b = g["l_orderkey"].to_numpy(zero_copy_only=False) % np.int64(n_buckets)
        return g.append_column("bucket", pa.array(b, pa.int64()))

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["l_orderkey"].to_numpy(dtype=np.int64)
        qty = g["total_qty"].to_numpy(dtype=np.int64)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        starts = np.r_[0, np.flatnonzero(ok_s[1:] != ok_s[:-1]) + 1]
        tot = np.add.reduceat(qty[order], starts)
        keep = tot > qty_threshold
        return pd.DataFrame(
            {"l_orderkey": ok_s[starts][keep], "total_qty": tot[keep]}
        )

    win = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(winners, batch_format="pandas")
    )

    out_cols = [
        "o_orderkey", "o_orderdate", "o_totalprice",
        "total_qty", "c_custkey", "c_name",
    ]
    # empty winner set -> join kernels reject a schema-less side
    if win.count() == 0:
        return pd.DataFrame(columns=out_cols)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    n_parts = _join_partitions(sf_dir, ["orders", "lineitem"])
    joined = win.join(
        orders,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).join(
        cust,
        join_type="inner",
        num_partitions=max(2, _join_partitions(sf_dir, ["customer"])),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # join keeps only the LEFT key column; restore the output names
    return joined.rename_columns(
        {"l_orderkey": "o_orderkey", "o_custkey": "c_custkey"}
    ).select_columns(out_cols)


def corpus_sample(sf_dir: str, n: int = 50):
    """Deterministic uniform corpus sample: the n docs with the
    smallest md5(doc_id) — coordination-free (any rerun, any node, and
    the SQL oracle pick the identical set, no RNG state) and cheap at
    scale: each block prunes to its local bottom-n before the tiny
    final sort, so the exchange is ≤ blocks·n rows, never the corpus.
    """

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        digests = np.array(
            textops.md5_digests([str(i) for i in ids]), dtype=object
        )
        order = np.lexsort((ids, digests))[: min(n, len(ids))]
        order.sort()
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "digest": pa.array(digests[order].tolist(), pa.string()),
            }
        )

    top = (
        read(sf_dir, "documents", ["doc_id"])
        .map_batches(prune, batch_format="pyarrow")
        .sort(["digest", "doc_id"])
        .limit(n)
        .to_pandas()
    )
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def events_user_seq(sf_dir: str):
    """Per-user event sequence number (ROW_NUMBER) and running value
    total — two window functions in ONE scan pass: the multi-value
    prefix sum carries (ones, cents) through a single sort, so the
    second window is free.  Integer cents inside; doubles bit-match
    the oracle.
    """
    from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum

    def prep(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    ds = read(sf_dir, "events", ["user_id", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    with_cum = keyed_prefix_sum(
        ds, "user_id", "event_id", ["one", "cents"], ["seq", "cum_cents"]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        run = batch["cum_cents"].to_numpy(zero_copy_only=False).astype(
            np.float64
        ) / 100.0
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "seq": batch["seq"],
                "running_value": pa.array(run, pa.float64()),
            }
        )

    return with_cum.map_batches(finalize, batch_format="pyarrow")


def events_value_ntile(sf_dir: str, n: int = 4):
    """``NTILE(n) OVER (PARTITION BY event_type ORDER BY value,
    event_id)`` — quantile-bucket assignment per partition, the
    stratification primitive behind per-type difficulty/score binning.

    Unlike ``events_cume_dist`` (which avoids NTILE's tie ambiguity by
    design), the ``event_id`` tiebreak makes the total order unique, so
    NTILE is deterministic and integer-exact on both sides.

    Scale shape: ranking IS a per-partition running count, so the
    ROW_NUMBER rides the distributed scan (``keyed_prefix_sum`` —
    one sort, O(blocks) coordination); the per-type totals are a
    |types|-row aggregate broadcast into the final vectorized pass.
    DuckDB tile semantics: the first ``cnt % n`` tiles get one extra
    row.
    """
    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.stages.scan import keyed_prefix_sum

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "event_id": batch["event_id"],
                "value": batch["value"],
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    ds = read(sf_dir, "events", ["event_type", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    # per-type row counts: |types| rows on the driver
    cnt_df = (
        ds.map_batches(
            lambda t: _group_sum(
                pa.table({"event_type": t["event_type"], "n": t["one"]}),
                ["event_type"],
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    type_keys = np.sort(cnt_df["event_type"].to_numpy())
    type_cnts = cnt_df.set_index("event_type")["n"].astype(np.int64).loc[
        type_keys
    ].to_numpy()

    with_rank = keyed_prefix_sum(
        ds, "event_type", ["value", "event_id"], "one", "rnk"
    )

    def assign(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        r = batch["rnk"].to_numpy(zero_copy_only=False)
        cnt = type_cnts[np.searchsorted(type_keys, et)]
        floor = cnt // n
        rem = cnt % n
        big_span = rem * (floor + 1)  # rows covered by the larger tiles
        in_big = r <= big_span
        # guard floor==0 (cnt < n): every row is its own tile = rank
        tile = np.where(
            in_big,
            (r - 1) // np.maximum(floor + 1, 1) + 1,
            rem + (r - big_span - 1) // np.maximum(floor, 1) + 1,
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "value": batch["value"],
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return with_rank.map_batches(assign, batch_format="pyarrow")


def events_outliers(sf_dir: str, sigmas: float = 3.0):
    """Anomaly counts per event type: events beyond ``sigmas``
    population standard deviations from the type mean — the two-pass
    distributed pattern (tiny exact-moment aggregate broadcast back
    over a streaming flag scan).  Cents-integer moments; the per-type
    n·Σx² product runs in Python ints on the 5-row driver table (it
    can exceed int64 at scale), and mean/threshold become the identical
    doubles the SQL oracle computes, so the flag comparisons match
    exactly.
    """
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(len(cents), np.int64)),
                "sx": pa.array(cents),
                "sxx": pa.array(cents * cents),
            }
        )
        return _group_sum(t, ["event_type"])

    m = (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    stats = {}
    for r in m.itertuples():
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)  # exact Python ints
        mean = float(sx) / n
        thr = sigmas * np.sqrt(float(n * sxx - sx * sx)) / n
        stats[r.event_type] = (mean, thr)
    stats_ref = ray.put(stats)

    def flag(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        et_np = et.to_numpy(zero_copy_only=False)
        out = np.zeros(len(cents), np.int64)
        for t, (mean, thr) in st.items():
            sel = et_np == t
            out[sel] = (
                np.abs(cents[sel].astype(np.float64) - mean) > thr
            ).astype(np.int64)
        tt = pa.table(
            {
                "event_type": et,
                "n_events": pa.array(np.ones(len(cents), np.int64)),
                "n_outliers": pa.array(out),
            }
        )
        return _group_sum(tt, ["event_type"])

    return (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(flag, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_outliers", alias_name="n_outliers"),
        )
    )


def events_value_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.95, 0.99)):
    """EXACT per-type discrete quantiles (p25..p99) without a global
    sort — the ``events_value_median`` histogram fold generalized to a
    quantile vector, and the exact counterpart the grouped t-digest
    (``type_value_quantiles``) is validated against.  Rank convention
    matches SQL ``quantile_disc``: the value at rank ceil(q·n).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "cents": pa.array(cents),
                "cnt": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        )
        return _group_sum(t, ["event_type", "cents"])

    def quantiles_of_partials(g: pd.DataFrame) -> pd.DataFrame:
        cents = g["cents"].to_numpy()
        c = g["cnt"].to_numpy()
        order = np.argsort(cents, kind="stable")
        cents, c = cents[order], c[order]
        starts = np.r_[0, np.flatnonzero(np.diff(cents)) + 1]
        u = cents[starts]
        sums = np.add.reduceat(c, starts)
        n = int(sums.sum())
        cum = np.cumsum(sums)
        rows = []
        for q in qs:
            rank = int(np.ceil(q * n))  # SQL quantile_disc convention
            v = u[np.searchsorted(cum, max(rank, 1))]
            rows.append((g["event_type"].iloc[0], float(q), float(v) / 100.0))
        return pd.DataFrame(rows, columns=["event_type", "q", "value_exact"])

    return (
        read(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(quantiles_of_partials, batch_format="pandas")
    )


def source_oov_rate(sf_dir: str, vocab_k: int = 10):
    """Per-source out-of-vocabulary rate against the global top-k token
    vocabulary (cnt DESC, token ASC ties; k=10 here so the tiny
    synthetic vocabulary actually has an OOV tail — production uses
    32k+) — the tokenizer-health check
    a training pipeline runs per domain before mixing.

    The vocabulary comes off the memoized ``token_counts`` table
    (driver holds k words — the broadcast tier); OOV counting is one
    streaming scan with per-block (source, n_tok, n_oov) partials.
    Rates are single divisions of exact ints, bit-comparable with SQL.
    """
    from ray.data.aggregate import Sum

    uni = token_counts(sf_dir).to_pandas()
    uni = uni.sort_values(
        ["cnt", "token"], ascending=[False, True]
    ).head(vocab_k)
    vocab = np.sort(uni["token"].to_numpy())
    vocab_ref = ray.put(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        voc = ray.get(vocab_ref)
        lists = textops.split_words(batch["text"])
        rep = pc.list_parent_indices(lists)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        srcs = src.take(rep)
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(voc, flat)
        pos[pos == len(voc)] = 0
        oov = (voc[pos] != flat).astype(np.int64)
        t = pa.table(
            {
                "source": srcs,
                "n_tokens": pa.array(np.ones(len(flat), np.int64)),
                "n_oov": pa.array(oov),
            }
        )
        return _group_sum(t, ["source"])

    out = (
        read(sf_dir, "documents", ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_oov", alias_name="n_oov"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        no = batch["n_oov"].to_numpy(zero_copy_only=False).astype(np.int64)
        rate = no.astype(np.float64) / nt
        return batch.append_column("oov_rate", pa.array(rate, pa.float64()))

    return out.map_batches(finalize, batch_format="pyarrow")


def source_token_joinsize(sf_dir: str, src_a: str = "src0", src_b: str = "src1"):
    """EXACT equi-join size between two sources' token streams:
    Σ_x f_a(x)·f_b(x) — the quantity the CMS inner product
    (``cms_inner_product_sources``) estimates, closing the
    estimate↔exact pairing for the last sketch operator.

    Per-block (token, cnt_a, cnt_b) partials → one token groupby →
    per-block Σ products → scalar Sum.  The scan is pruned to the two
    sources at the parquet layer.
    """
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        lists = textops.split_words(batch["text"])
        rep = pc.list_parent_indices(lists)
        srcs = src.take(rep).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "token": lists.flatten(),
                "cnt_a": pa.array((srcs == src_a).astype(np.int64)),
                "cnt_b": pa.array((srcs == src_b).astype(np.int64)),
            }
        )
        return _group_sum(t, ["token"])

    per_token = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["source", "text"],
            filter=pc.field("source").isin([src_a, src_b]),
        )
        .map_batches(counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt_a", alias_name="cnt_a"), Sum("cnt_b", alias_name="cnt_b"))
    )

    def products(batch: pa.Table) -> pa.Table:
        a = batch["cnt_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["cnt_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"join_size": pa.array([int((a * b).sum())], pa.int64())})

    agg = per_token.map_batches(products, batch_format="pyarrow").aggregate(
        Sum("join_size", alias_name="join_size")
    )
    return pd.DataFrame(
        {
            "source_a": [src_a],
            "source_b": [src_b],
            "join_size": [np.int64(agg["join_size"])],
        }
    )


# ---------------------------------------------------------------------------
# round-5 session-2 TPC-H shapes: Q6 / Q14 / Q4 / Q19
# ---------------------------------------------------------------------------


def forecast_revenue(
    sf_dir: str,
    year: int = 1996,
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    qty_cap: int = 24,
):
    """TPC-H Q6 shape: revenue delta from a discount policy change —
    the pure filter-and-sum fact scan (no join, no groupby), the
    cheapest query in the dial and the one where read pruning IS the
    whole plan: two predicate columns are pushed into the parquet
    scan, only four columns leave storage, and each batch collapses
    to ONE partial int64 before the O(blocks) reduce.

    The discount predicate is applied on exact integer cents (not the
    stored double) so Ray and the DuckDB oracle select the identical
    row set; revenue sums as int64 1e-4 dollars (exact, associative),
    divided once at the end — bit-equal to the oracle's expression.
    """
    from ray.data.aggregate import Sum

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        m = (disc_c >= disc_lo_c) & (disc_c <= disc_hi_c)
        return pa.table(
            {"rev_i": pa.array([int((ext_c[m] * disc_c[m]).sum())], pa.int64())}
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_discount"],
            filter=(
                (pc.field("l_shipdate") >= lo)
                & (pc.field("l_shipdate") < hi)
                & (pc.field("l_quantity") < qty_cap)
            ),
        )
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("rev_i", alias_name="rev_i"))
    )
    rev = agg["rev_i"]
    return pd.DataFrame(
        {"revenue": [np.nan if rev is None else np.float64(rev) / 10000.0]}
    )


def promo_revenue(sf_dir: str, month: str = "1996-04"):
    """TPC-H Q14 shape: share of one month's discounted revenue that
    came from promotional parts — the conditional-aggregate-over-a-
    dimension-join plan.  The part table rides the broadcast tier
    (one sorted ``p_partkey`` array + a promo bitmask via ``ray.put``,
    searchsorted lookup per batch — ~9 bytes/part, fine to ~10^8
    parts; beyond that the drop-in spelling is the repo's native hash
    join as in ``large_volume_orders``), so the month's fact scan is
    the only data motion: each batch emits TWO int64 partials
    (promo revenue, total revenue) and the reduce is O(blocks).

    Revenue is exact int64 1e-4 dollars; the final percentage is the
    oracle's expression ``100.0 * promo / total`` evaluated once in
    float64, so the result is bit-equal to DuckDB.
    """
    from ray.data.aggregate import Sum

    lo = pd.Timestamp(f"{month}-01")
    hi = lo + pd.DateOffset(months=1)

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).take_all()
    pk = np.array([r["p_partkey"] for r in part], dtype=np.int64)
    promo = np.array([r["p_type"] == "PROMO" for r in part], dtype=bool)
    order = np.argsort(pk, kind="stable")
    pk, promo = pk[order], promo[order]
    pk_ref, promo_ref = ray.put(pk), ray.put(promo)

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        flags = ray.get(promo_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        rev = ext_c * (100 - disc_c)
        hit, pos = _probe_sorted(keys, lp)
        if not hit.all():
            # inner-join semantics: lines whose part is missing drop out
            rev, pos = rev[hit], pos[hit]
        is_promo = flags[pos]
        return pa.table(
            {
                "promo_i": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_i": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("promo_i", alias_name="p"), Sum("total_i", alias_name="t"))
    )
    p, t = agg["p"], agg["t"]
    if p is None or t is None or t == 0:
        return pd.DataFrame({"promo_revenue": [np.nan]})
    return pd.DataFrame(
        {"promo_revenue": [100.0 * np.float64(p) / np.float64(t)]}
    )


def order_priority_check(
    sf_dir: str, q_start: str = "1996-07-01", late_days: int = 60
):
    """TPC-H Q4 shape: per-priority count of one quarter's orders with
    at least one LATE lineitem (shipped > ``late_days`` after the
    order date) — the EXISTS-semi-join-between-two-facts plan.

    Plan: the quarter's orders (~1/28 of the orders table — the same
    broadcast budget as Q3's market segment) ship to every lineitem
    task as three sorted arrays (orderkey, orderdate, priority code)
    via ``ray.put``; each lineitem batch searchsorts its orderkeys,
    applies the lateness test against the matched order date, and
    emits only its DISTINCT late orderkeys.  Distinctness is settled
    in coarse orderkey-bucket ``map_groups`` (the EXISTS: one count
    per order no matter how many late lines), which emit per-priority
    partial counts — so the exchange is ∝ distinct late orders, never
    lineitem rows.  Above the broadcast budget the drop-in spelling is
    the Bloom-prefiltered hash semi-join of ``bloom_semijoin_count``.
    """
    from ray.data.aggregate import Sum
    from parallel_count_min_sketch_ray.stages.partitioning import (
        num_shuffle_buckets,
    )

    lo = pd.Timestamp(q_start)
    hi = lo + pd.DateOffset(months=3)
    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    n_buckets = num_shuffle_buckets()

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).take_all()
    out_cols = ["o_orderpriority", "order_count"]
    if not orders:
        return pd.DataFrame(
            {"o_orderpriority": pd.Series([], dtype=object),
             "order_count": pd.Series([], dtype=np.int64)}
        )
    ok = np.array([r["o_orderkey"] for r in orders], dtype=np.int64)
    od = np.array(
        [np.datetime64(r["o_orderdate"], "us") for r in orders]
    ).astype(np.int64)
    prio_codes, prio_cats = pd.factorize(
        np.array([r["o_orderpriority"] for r in orders], dtype=object)
    )
    order = np.argsort(ok, kind="stable")
    ok, od, prio_codes = ok[order], od[order], prio_codes[order].astype(np.int8)
    ok_ref = ray.put(ok)
    od_ref = ray.put(od)
    prio_ref = ray.put(prio_codes)

    def late_keys(batch: pa.Table) -> pa.Table:
        keys = ray.get(ok_ref)
        dates = ray.get(od_ref)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hit, pos = _probe_sorted(keys, lk)
        late = hit & (ship > dates[pos] + late_us)
        uniq = np.unique(lk[late])
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "bucket": pa.array(uniq % np.int64(n_buckets), pa.int64()),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ok_ref)
        prios = ray.get(prio_ref)
        uniq = np.unique(g["l_orderkey"].to_numpy(dtype=np.int64))
        codes = prios[np.searchsorted(keys, uniq)]
        cnt = np.bincount(codes, minlength=len(prio_cats)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"prio_code": nz.astype(np.int64), "order_count": cnt[nz]})

    per_prio = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        .map_batches(late_keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("prio_code")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .to_pandas()
    )
    per_prio["o_orderpriority"] = prio_cats[
        per_prio["prio_code"].to_numpy(dtype=np.int64)
    ]
    per_prio["order_count"] = per_prio["order_count"].astype(np.int64)
    return (
        per_prio[out_cols]
        .sort_values("o_orderpriority", kind="stable")
        .reset_index(drop=True)
    )


def discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue from three disjunctive
    (brand, size-range, quantity-range) clause combinations — the
    OR-of-conjunctions predicate that defeats naive pushdown.  The
    part side collapses to a 3-bit clause bitmask per partkey
    (broadcast, same budget note as ``promo_revenue``); each lineitem
    batch resolves the full disjunction with numpy masks (part clause
    bit AND quantity window) and emits one int64 revenue partial.
    Exchange: O(blocks) rows total.
    """
    from ray.data.aggregate import Sum

    clauses = [  # (brand, size_hi, qty_lo, qty_hi); sizes all start at 1
        ("Brand#11", 5, 1, 11),
        ("Brand#12", 10, 10, 20),
        ("Brand#13", 15, 20, 30),
    ]

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin([c[0] for c in clauses]),
    ).take_all()
    pk = np.array([r["p_partkey"] for r in part], dtype=np.int64)
    mask = np.zeros(len(part), dtype=np.uint8)
    for i, (brand, size_hi, _, _) in enumerate(clauses):
        bits = np.array(
            [r["p_brand"] == brand and 1 <= r["p_size"] <= size_hi for r in part],
            dtype=bool,
        )
        mask |= bits.astype(np.uint8) << i
    order = np.argsort(pk, kind="stable")
    pk, mask = pk[order], mask[order]
    pk_ref, mask_ref = ray.put(pk), ray.put(mask)

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        bits = ray.get(mask_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        sel = np.zeros(len(lp), dtype=bool)
        if len(keys):
            hit, pos = _probe_sorted(keys, lp)
            m = np.where(hit, bits[pos], 0).astype(np.uint8)
            for i, (_, _, qlo, qhi) in enumerate(clauses):
                sel |= ((m >> i) & 1).astype(bool) & (qty >= qlo) & (qty <= qhi)
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        rev = int((ext_c[sel] * (100 - disc_c[sel])).sum())
        return pa.table({"rev_i": pa.array([rev], pa.int64())})

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("rev_i", alias_name="rev_i"))
    )
    rev = agg["rev_i"]
    return pd.DataFrame(
        {"revenue": [np.nan if rev is None else np.float64(rev) / 10000.0]}
    )


def customer_order_distribution(
    sf_dir: str,
    exclude_priority: str = "1-URGENT",
    num_partitions: int | None = None,
):
    """TPC-H Q13 shape: distribution of per-customer order counts
    INCLUDING the zero bucket — the LEFT OUTER JOIN + two-level
    aggregation plan, and the repo's first native
    ``join_type="left_outer"`` use (the anti-join sibling is
    ``customers_without_orders``).

    Plan: the orders scan prunes to ONE column with the priority
    predicate pushed into the read, pre-aggregates to one row per
    custkey inside ``map_batches`` partials, then a keyed groupby
    finishes the per-customer counts — so the outer join's right side
    is |customers-with-orders| rows, key-unique, never raw orders.
    Customer joins it with the native hash-partitioned left-outer
    join (partition count derived from input bytes; a broadcast
    custkey→count map would cap at driver memory, the shuffle join
    scales with the cluster).  NULL counts from unmatched customers
    ARE the zero bucket (``fill_null(0)`` per batch).  The second
    aggregation exchanges at most |distinct counts| rows per block —
    the c_count key space is tiny by construction.
    """
    from ray.data.aggregate import Sum

    if num_partitions is None:
        num_partitions = _join_partitions(sf_dir, ["customer", "orders"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != exclude_priority,
    )

    def per_cust_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "c_count": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return _group_sum(t, ["o_custkey"])

    counts = (
        orders.map_batches(per_cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("c_count", alias_name="c_count"))
    ).materialize()  # one execution feeds the emptiness probe AND the join
    if counts.count() == 0:
        # every order excluded: the join kernel rejects a schema-less
        # right side (the returned_item_revenue empty-quarter class) —
        # the Q13 answer is one all-zero bucket
        n_cust = read(sf_dir, "customer", ["c_custkey"]).count()
        return pd.DataFrame(
            {"c_count": np.array([0], dtype=np.int64),
             "custdist": np.array([n_cust], dtype=np.int64)}
        )
    joined = read(sf_dir, "customer", ["c_custkey"]).join(
        counts,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def dist_partial(batch: pa.Table) -> pa.Table:
        cc = pc.fill_null(batch["c_count"], 0).cast(pa.int64())
        t = pa.table(
            {
                "c_count": cc,
                "custdist": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return _group_sum(t, ["c_count"])

    out = (
        joined.map_batches(dist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()
    )
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return (
        out[["c_count", "custdist"]]
        .sort_values(["custdist", "c_count"], ascending=False, kind="stable")
        .reset_index(drop=True)
    )


def nation_trade_volume(
    sf_dir: str,
    nation_a: str = "NATION_20",
    nation_b: str = "NATION_11",
    ship_lo: str = "1995-01-01",
    ship_hi: str = "1997-01-01",
):
    """TPC-H Q7 shape: shipped volume between two nations, per
    direction per year — the bidirectional four-table join where BOTH
    endpoints of every lineitem (supplier nation, customer nation via
    its order) must resolve before the cross-trade predicate applies.

    Plan: the two small endpoint maps ride the broadcast tier —
    (a) suppliers of the two nations as a sorted suppkey array + int8
    nation code, (b) the two nations' customers likewise; the orders
    scan prunes to TWO columns, searchsorts each batch against the
    customer set, and only matching (orderkey, cust code) pairs reach
    the driver (~|two nations' share of orders| · 9 B — the same
    broadcast budget as Q3/Q4; above it the drop-in spelling is the
    repo's hash semi-join as in ``bloom_semijoin_count``).  The
    lineitem scan — the only big data motion — pushes the shipdate
    range into the read, resolves both endpoints per batch with
    searchsorted, applies the direction predicate (codes differ), and
    collapses to (supp_code, cust_code, year) int64 partials: the
    exchange is O(blocks · 2 · years) rows.  Revenue sums as exact
    integer 1e-4 dollars, divided once at the end (bit-equal to the
    oracle).
    """
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq_

    nation = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name2key = dict(
        zip(nation["n_name"].to_pylist(), nation["n_nationkey"].to_pylist())
    )
    names2 = np.array([nation_a, nation_b], dtype=object)
    lo = pd.Timestamp(ship_lo)
    hi = pd.Timestamp(ship_hi)
    out_cols = ["supp_nation", "cust_nation", "l_year", "n_items", "revenue"]
    empty = pd.DataFrame(
        {
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "n_items": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64),
        }
    )
    if nation_a not in name2key or nation_b not in name2key:
        return empty  # unknown nation: the oracle's join yields no rows
    keys2 = {int(name2key[nation_a]): 0, int(name2key[nation_b]): 1}

    def _two_nation_lookup(table: str, key_col: str, nk_col: str):
        t = pq_.read_table(f"{sf_dir}/{table}.parquet", columns=[key_col, nk_col])
        nk = t[nk_col].to_numpy()
        sel = np.isin(nk, np.fromiter(keys2, dtype=nk.dtype))
        keys = t[key_col].to_numpy()[sel].astype(np.int64)
        codes = np.array([keys2[int(k)] for k in nk[sel]], dtype=np.int8)
        order = np.argsort(keys, kind="stable")
        return keys[order], codes[order]

    sk, s_code = _two_nation_lookup("supplier", "s_suppkey", "s_nationkey")
    ck, c_code = _two_nation_lookup("customer", "c_custkey", "c_nationkey")
    if sk.size == 0 or ck.size == 0:
        return empty
    ck_ref = ray.put(ck)
    cc_ref = ray.put(c_code)

    def order_endpoints(batch: pa.Table) -> pa.Table:
        ckeys = ray.get(ck_ref)
        ccodes = ray.get(cc_ref)
        okeys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ocust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        hit, pos = _probe_sorted(ckeys, ocust)
        return pa.table(
            {
                "o_orderkey": pa.array(okeys[hit].astype(np.int64), pa.int64()),
                "cust_code": pa.array(ccodes[pos[hit]], pa.int8()),
            }
        )

    matched = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        .map_batches(order_endpoints, batch_format="pyarrow")
        .take_all()
    )
    if not matched:
        return empty
    ok = np.array([r["o_orderkey"] for r in matched], dtype=np.int64)
    oc = np.array([r["cust_code"] for r in matched], dtype=np.int8)
    order = np.argsort(ok, kind="stable")
    ok, oc = ok[order], oc[order]
    ok_ref = ray.put(ok)
    oc_ref = ray.put(oc)
    sk_ref = ray.put(sk)
    sc_ref = ray.put(s_code)

    def trade_partial(batch: pa.Table) -> pa.Table:
        okeys = ray.get(ok_ref)
        ocodes = ray.get(oc_ref)
        skeys = ray.get(sk_ref)
        scodes = ray.get(sc_ref)
        lo_k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls_k = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        hit_o, po = _probe_sorted(okeys, lo_k)
        hit_s, ps = _probe_sorted(skeys, ls_k)
        # both endpoints must resolve AND the trade must cross nations
        sel = hit_o & hit_s & (ocodes[po] != scodes[ps])
        # 0-row batches flow through the same _group_sum so every
        # block carries the identical (aggregated-cols, keys) schema
        sub = batch.filter(pa.array(sel))
        year = pc.year(sub["l_shipdate"]).to_numpy(zero_copy_only=False)
        ext_c = _cents(sub["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(sub["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "supp_code": pa.array(
                    scodes[ps[sel]].astype(np.int64), pa.int64()
                ),
                "cust_code": pa.array(
                    ocodes[po[sel]].astype(np.int64), pa.int64()
                ),
                "l_year": pa.array(year.astype(np.int64), pa.int64()),
                "n_items": pa.array(np.ones(int(sel.sum()), dtype=np.int64)),
                "rev_i": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )
        return _group_sum(t, ["supp_code", "cust_code", "l_year"])

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_suppkey",
                "l_shipdate",
                "l_extendedprice",
                "l_discount",
            ],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
        .map_batches(trade_partial, batch_format="pyarrow")
        .groupby(["supp_code", "cust_code", "l_year"])
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("rev_i", alias_name="rev_i"),
        )
        .to_pandas()
    )
    if out.empty:
        return empty
    out["supp_nation"] = names2[out["supp_code"].to_numpy(dtype=np.int64)]
    out["cust_nation"] = names2[out["cust_code"].to_numpy(dtype=np.int64)]
    out["l_year"] = out["l_year"].astype(np.int64)
    out["n_items"] = out["n_items"].astype(np.int64)
    out["revenue"] = out["rev_i"].astype(np.float64) / 10000.0
    return (
        out[out_cols]
        .sort_values(["supp_nation", "cust_nation", "l_year"], kind="stable")
        .reset_index(drop=True)
    )


def small_quantity_revenue(sf_dir: str, brand: str = "Brand#19"):
    """TPC-H Q17 shape: yearly-averaged revenue that would vanish if
    small-quantity orders (below 20% of their part's average order
    quantity) stopped — the aggregate-then-rejoin-the-same-fact plan
    (a correlated scalar subquery in SQL).

    Plan: two PRUNED fact scans instead of an all-to-all self-join.
    Scan 1 computes per-part (qty sum, count) partials for the one
    brand's parts (brand partkeys ride the broadcast tier, ~1/|brands|
    of the part table) and the per-part thresholds come back to the
    driver — bounded by |brand's parts|, the same broadcast budget as
    the part side itself.  Scan 2 re-reads lineitem, searchsorts each
    batch against (partkey, threshold) and emits ONE revenue partial.
    Exchange: O(|brand parts|) + O(blocks) rows; lineitem rows never
    shuffle.  Quantities are integral-valued doubles ≤ 50, so the
    int64 quantity sums (and the float64 sum/count division) are
    exact — the 0.2·avg threshold is bit-equal to the oracle's.
    """
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq_

    part = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_brand", "=", brand)],
    )
    empty = pd.DataFrame({"avg_yearly": pd.Series([0.0], dtype=np.float64)})
    if part.num_rows == 0:
        return empty
    bk = np.sort(part["p_partkey"].to_numpy().astype(np.int64))
    bk_ref = ray.put(bk)

    def qty_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(bk_ref)
        lk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        sel, _ = _probe_sorted(keys, lk)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[sel]
        t = pa.table(
            {
                "l_partkey": pa.array(lk[sel].astype(np.int64), pa.int64()),
                "qty_i": pa.array(np.round(qty).astype(np.int64), pa.int64()),
                "n_lines": pa.array(np.ones(int(sel.sum()), dtype=np.int64)),
            }
        )
        return _group_sum(t, ["l_partkey"])

    per_part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(
            Sum("qty_i", alias_name="qty_i"),
            Sum("n_lines", alias_name="n_lines"),
        )
        .to_pandas()
    )
    if per_part.empty:
        return empty
    tk = per_part["l_partkey"].to_numpy(dtype=np.int64)
    thr = 0.2 * (
        per_part["qty_i"].to_numpy(dtype=np.float64)
        / per_part["n_lines"].to_numpy(dtype=np.float64)
    )
    order = np.argsort(tk, kind="stable")
    tk, thr = tk[order], thr[order]
    tk_ref = ray.put(tk)
    thr_ref = ray.put(thr)

    def rev_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(tk_ref)
        cuts = ray.get(thr_ref)
        lk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        hit, pos = _probe_sorted(keys, lk)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        sel = hit & (qty < cuts[pos])
        ext_c = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[sel]
        )
        return pa.table({"rev_c": pa.array([int(ext_c.sum())], pa.int64())})

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(rev_partial, batch_format="pyarrow")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )
    rev = agg["rev_c"]
    return pd.DataFrame(
        {
            "avg_yearly": [
                0.0 if rev is None else np.float64(rev) / 700.0
            ]
        }
    )


def top_supplier_revenue(sf_dir: str, q_start: str = "1996-01-01"):
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue in
    one quarter — the argmax-over-an-aggregate plan (the SQL view +
    MAX subquery).

    Plan: the quarter's lineitem scan (shipdate range pushed into the
    read) collapses to per-supplier revenue partials before ONE keyed
    groupby; the global max is a scalar reduce over that small
    aggregate (never a driver materialization of it); only the
    tie-set of winners — almost always one row — leaves the
    aggregate, and the supplier dimension is read back winner-only
    with an ``isin`` pushdown (the k-winner-only enrichment pattern
    of ``returned_item_revenue``).
    """
    from ray.data.aggregate import Sum

    lo = pd.Timestamp(q_start)
    hi = lo + pd.DateOffset(months=3)
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series([], dtype=np.int64),
            "s_name": pd.Series([], dtype=object),
            "total_revenue": pd.Series([], dtype=np.float64),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        ext_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_c = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
                "rev_i": pa.array(ext_c * (100 - disc_c), pa.int64()),
            }
        )
        return _group_sum(t, ["l_suppkey"])

    per_supp = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev_i", alias_name="rev_i"))
    ).materialize()  # one execution feeds max() AND the winner filter
    best = per_supp.max("rev_i")
    if best is None:
        return empty
    winners = per_supp.filter(
        expr=f"rev_i == {int(best)}"
    ).to_pandas()  # tie-set only: ≥1 row, almost always exactly 1
    import pyarrow.parquet as pq_

    supp = pq_.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", winners["l_suppkey"].tolist())],
    ).to_pandas()
    out = winners.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = out["rev_i"].astype(np.float64) / 10000.0
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey", kind="stable")
        .reset_index(drop=True)
    )


def market_share(
    sf_dir: str,
    target_nation: str = "NATION_20",
    region: str = "EUROPE",
    part_type: str = "ECONOMY",
    o_lo: str = "1995-01-01",
    o_hi: str = "1997-01-01",
):
    """TPC-H Q8 shape: one nation's share of a region's market for a
    product type, per order year — the share-of-group conditional
    aggregate over the full snowflake (both nation roles resolved:
    supplier nation drives the numerator, customer nation→region
    scopes the market).

    Plan: three broadcast maps (type-filtered partkeys; all suppliers
    as sorted suppkey + is-target bit — the ``brand_nation_revenue``
    dimension budget; region customers via an ``isin``-pushed read)
    plus ONE orders scan emitting only the region's (orderkey, year)
    pairs to the broadcast tier (Q7's budget note applies: above it,
    the drop-in spelling is the repo's hash semi-join).  The lineitem
    scan then collapses to TWO int64 partials per (batch, year) —
    target revenue and total revenue — so the exchange is
    O(blocks · years) and the share division happens once per year at
    the end, bit-equal to the oracle's CASE-WHEN ratio.
    """
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq_

    lo, hi = pd.Timestamp(o_lo), pd.Timestamp(o_hi)
    empty = pd.DataFrame(
        {
            "o_year": pd.Series([], dtype=np.int64),
            "mkt_share": pd.Series([], dtype=np.float64),
        }
    )

    part = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_type", "=", part_type)],
    )
    if part.num_rows == 0:
        return empty
    pk = np.sort(part["p_partkey"].to_numpy().astype(np.int64))

    nation = pq_.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region_t = pq_.read_table(
        f"{sf_dir}/region.parquet",
        columns=["r_regionkey"],
        filters=[("r_name", "=", region)],
    )
    if region_t.num_rows == 0:
        return empty
    rk = set(region_t["r_regionkey"].to_pylist())
    region_nations = [
        int(k)
        for k, g in zip(
            nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
        )
        if int(g) in rk
    ]
    target_keys = {
        int(k)
        for k, n in zip(
            nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()
        )
        if n == target_nation
    }

    supp = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    s_target = np.isin(
        supp["s_nationkey"].to_numpy(),
        np.fromiter(target_keys, dtype=np.int64) if target_keys else np.array([], dtype=np.int64),
    ).astype(np.int8)
    order = np.argsort(sk, kind="stable")
    sk, s_target = sk[order], s_target[order]

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filters=[("c_nationkey", "in", region_nations)],
    )
    if cust.num_rows == 0:
        return empty
    ck = np.sort(cust["c_custkey"].to_numpy().astype(np.int64))
    ck_ref = ray.put(ck)

    def region_orders(batch: pa.Table) -> pa.Table:
        ckeys = ray.get(ck_ref)
        okeys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ocust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        hit, pos = _probe_sorted(ckeys, ocust)
        year = pc.year(batch["o_orderdate"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": pa.array(okeys[hit].astype(np.int64), pa.int64()),
                "o_year": pa.array(year[hit].astype(np.int16), pa.int16()),
            }
        )

    matched = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
        )
        .map_batches(region_orders, batch_format="pyarrow")
        .take_all()
    )
    if not matched:
        return empty
    ok = np.array([r["o_orderkey"] for r in matched], dtype=np.int64)
    oy = np.array([r["o_year"] for r in matched], dtype=np.int16)
    order = np.argsort(ok, kind="stable")
    ok, oy = ok[order], oy[order]
    ok_ref, oy_ref = ray.put(ok), ray.put(oy)
    pk_ref = ray.put(pk)
    sk_ref, st_ref = ray.put(sk), ray.put(s_target)

    def share_partial(batch: pa.Table) -> pa.Table:
        pkeys = ray.get(pk_ref)
        okeys, oyears = ray.get(ok_ref), ray.get(oy_ref)
        skeys, stgt = ray.get(sk_ref), ray.get(st_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False)
        lo_k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ls_k = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        hit_p, _ = _probe_sorted(pkeys, lp)
        hit_o, po = _probe_sorted(okeys, lo_k)
        hit_s, ps = _probe_sorted(skeys, ls_k)
        sel = hit_p & hit_o & hit_s
        sub_rev = _cents(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[sel]
        ) * (
            100
            - _cents(batch["l_discount"].to_numpy(zero_copy_only=False)[sel])
        )
        years = oyears[po[sel]].astype(np.int64)
        target = stgt[ps[sel]].astype(np.int64)
        t = pa.table(
            {
                "o_year": pa.array(years, pa.int64()),
                "rev_target_i": pa.array(sub_rev * target, pa.int64()),
                "rev_total_i": pa.array(sub_rev, pa.int64()),
            }
        )
        return _group_sum(t, ["o_year"])

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey",
                "l_orderkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .map_batches(share_partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("rev_target_i", alias_name="rev_target_i"),
            Sum("rev_total_i", alias_name="rev_total_i"),
        )
        .to_pandas()
    )
    if out.empty:
        return empty
    out["o_year"] = out["o_year"].astype(np.int64)
    out["mkt_share"] = out["rev_target_i"].astype(np.float64) / out[
        "rev_total_i"
    ].astype(np.float64)
    return (
        out[["o_year", "mkt_share"]]
        .sort_values("o_year", kind="stable")
        .reset_index(drop=True)
    )
