"""Sketch-estimate queries over the documents-derived token stream.

The testdata has no pre-tokenized table, so the documents table is
tokenized on the fly (djb2 word→int32, the reference's string adapter
path ``src/core/count_min_sketch.c:14-27``) into the reference's item
stream, and the sketch estimates are computed on it.  These results
are deterministic (fixed seeds) but not SQL-expressible — the driver
records rows-only checks; the ε·N / error-bound contracts are asserted
in pytest instead (tests/test_queries.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from parallel_count_min_sketch_ray.functions import textops
from parallel_count_min_sketch_ray.functions.hashing import djb2
from parallel_count_min_sketch_ray.pipelines.analytics import read
from parallel_count_min_sketch_ray.pipelines.sketch_build import (
    SketchSpec,
    build_sketches,
)
from parallel_count_min_sketch_ray.state.bloom import BloomFilter
from parallel_count_min_sketch_ray.state.cms import CountMinSketch
from parallel_count_min_sketch_ray.state.hll import HyperLogLog
from parallel_count_min_sketch_ray.state.kll import KLLSketch

SEED = 42


_tokenized_cache: dict[tuple, object] = {}


def tokenized_documents(sf_dir: str):
    """documents → (doc_id, tokens:list<int32>, n_tok, source): the
    input_hint shape, derived deterministically from text.

    Memoized materialized per (sf_dir, Ray job) — five sketch queries
    start from this table; re-tokenizing the corpus per query is the
    anti-pattern (same policy as ``analytics.token_counts``)."""
    import ray as _ray

    job = _ray.get_runtime_context().get_job_id() if _ray.is_initialized() else None
    key = (sf_dir, job)
    cached = _tokenized_cache.get(key)
    if cached is not None:
        return cached

    def tokenize(batch: pa.Table) -> pa.Table:
        toks, flat = textops.tokens_int32_from_text(batch["text"])
        n_tok = pa.compute.list_value_length(toks).cast(pa.int32())
        return pa.Table.from_arrays(
            [batch["doc_id"], toks, n_tok, batch["source"]],
            names=["doc_id", "tokens", "n_tok", "source"],
        )

    out = (
        read(sf_dir, "documents", ["doc_id", "text", "source"])
        .map_batches(tokenize, batch_format="pyarrow")
        .materialize()
    )
    _tokenized_cache[key] = out
    return out


def _num_docs(sf_dir: str) -> int:
    """Document count from parquet metadata (free — no scan)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _default_specs(num_docs_hint: int = 1 << 16) -> list[SketchSpec]:
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    return [
        SketchSpec("cms", CountMinSketch(eps=0.001, delta=0.1, seed=SEED), "tokens"),
        SketchSpec("hll", HyperLogLog(p=14, seed=SEED), "tokens"),
        SketchSpec("kll", KLLSketch(k=200, seed=SEED), "n_tok"),
        SketchSpec(
            "bloom",
            BloomFilter(capacity=max(num_docs_hint, 1024), fp_rate=0.01, seed=SEED),
            "doc_id",
            kind="numeric",  # doc_id is int64 in the testdata tables
        ),
        # Count-Sketch rides the same single scan (VERDICT r3 next #3:
        # it was the only query re-reading + re-tokenizing the corpus
        # for one artifact); merge is exact addition, so folding here
        # leaves its estimates bit-identical
        SketchSpec("csk", CountSketch(width=8192, depth=7, seed=SEED), "tokens"),
    ]


_BUILD_CACHE: dict[str, object] = {}


def build_all(sf_dir: str, **kwargs):
    """One streaming pass building CMS+HLL+KLL+Bloom over the tokenized
    documents (the flagship pipeline, SURVEY.md §3.1 restated).

    Bloom capacity is sized from the actual document count (parquet
    metadata) so the configured fp bound holds at any sf.  Results are
    memoized per sf_dir within a process — the driver calls several
    estimate queries that each need the same build; callers must treat
    the returned sketches as read-only.
    """
    if not kwargs and sf_dir in _BUILD_CACHE:
        return _BUILD_CACHE[sf_dir]
    ds = tokenized_documents(sf_dir)
    report = build_sketches(ds, _default_specs(_num_docs(sf_dir)), **kwargs)
    if not kwargs:
        _BUILD_CACHE[sf_dir] = report
    return report


# Probe words: frequent pipeline-vocab words present in the synthetic
# corpus + guaranteed-absent probes (the reference's 123/456/999
# pattern, src/mpi/mpiV2.c:131-140).
PROBE_WORDS = [
    "the", "a", "data", "table", "row", "value", "query", "join",
    "absent-token-xyzzy", "absent-token-plugh",
]


def cms_word_estimates(sf_dir: str) -> pd.DataFrame:
    rep = build_all(sf_dir)
    cms = rep["cms"]
    ids = np.array([djb2(w) & 0x7FFFFFFF for w in PROBE_WORDS], dtype=np.int64)
    ests = cms.query(ids)
    return pd.DataFrame(
        {
            "word": PROBE_WORDS,
            "estimate": ests.astype(np.int64),
            "error_bound": np.int64(cms.error_bound()),
            "total_tokens": np.int64(cms.total),
        }
    )


def hll_distinct_words(sf_dir: str) -> pd.DataFrame:
    rep = build_all(sf_dir)
    hll = rep["hll"]
    return pd.DataFrame(
        {
            "distinct_estimate": [float(hll.estimate())],
            "relative_error": [hll.relative_error()],
        }
    )


def kll_ntok_quantiles(sf_dir: str) -> pd.DataFrame:
    rep = build_all(sf_dir)
    kll = rep["kll"]
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return pd.DataFrame(
        {"q": qs, "n_tok_quantile": kll.quantiles(qs), "n": np.int64(kll.n)}
    )


def tdigest_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Tail quantiles of the continuous events.value column via a
    distributed t-digest build (one streaming pass, value column only).

    The KLL sibling covers integer n_tok with uniform rank error; the
    t-digest's k1 scale function concentrates centroids at the tails,
    so p99/p999 of the heavy-tailed value distribution stay tight at
    the same state size.  Deterministic but not SQL-expressible to
    bit-equality (interpolated estimates) — the rank-error envelope is
    asserted in pytest against the exact distribution instead."""
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    ds = read(sf_dir, "events", ["value"])
    rep = build_sketches(ds, [SketchSpec("td", TDigest(delta=200), "value")])
    td = rep["td"]
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]
    return pd.DataFrame(
        {
            "q": qs,
            "value_quantile": td.quantiles(qs),
            "n": np.int64(td.n),
            "num_centroids": np.int64(td.num_centroids()),
        }
    )


def type_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-event_type tail quantiles of ``value`` via GROUPED t-digests
    — the new sketch riding the keyed no-shuffle merge tree
    (:func:`..pipelines.sketch_build.build_sketches_by_key`), the same
    path as ``source_distinct_tokens``/``source_ntok_quantiles``."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    ds = read(sf_dir, "events", ["event_type", "value"])
    grouped = build_sketches_by_key(
        ds, "event_type", [SketchSpec("td", TDigest(delta=200), "value")]
    )
    rows = []
    for etype in sorted(grouped):
        td = grouped[etype]["td"]
        qs = td.quantiles([0.5, 0.9, 0.99])
        rows.append((etype, int(td.n), qs[0], qs[1], qs[2]))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "p50", "p90", "p99"]
    )


def ddsketch_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Quantiles of events.value via a distributed DDSketch build
    (:mod:`..state.ddsketch`, Masson et al. VLDB 2019) — the
    RELATIVE-error sibling: every returned quantile is within
    ``alpha=0.01`` of an actual element's value at that rank.

    Unlike the KLL/t-digest paths, the state is a pure integer
    log-bucket histogram, so while no collapse triggers the
    distributed build is **bit-identical to a serial pass in any
    merge order** — asserted in pytest alongside the relative-error
    envelope vs the exact distribution (rows-only driver check)."""
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    ds = read(sf_dir, "events", ["value"])
    rep = build_sketches(ds, [SketchSpec("dd", DDSketch(alpha=0.01), "value")])
    dd = rep["dd"]
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]
    return pd.DataFrame(
        {
            "q": qs,
            "value_quantile": dd.quantiles(qs),
            "n": np.int64(dd.n),
            "num_buckets": np.int64(dd.num_buckets()),
            "collapsed": bool(dd.collapsed()),
        }
    )


def ddsketch_type_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-event_type quantiles of ``value`` via GROUPED DDSketches —
    the relative-error kernel riding the keyed no-shuffle merge tree
    (:func:`..pipelines.sketch_build.build_sketches_by_key`), closing
    the grouped-tier symmetry with the HLL/KLL/t-digest/MG/KMV/CSK
    by-key spellings.  Each group's integer log-bucket state merges
    bit-exactly in any order while uncollapsed (the DDSketch merge
    contract), so the per-type quantiles are deterministic; the
    per-group alpha relative-error envelope is asserted in pytest
    (rows-only driver check)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    ds = read(sf_dir, "events", ["event_type", "value"])
    grouped = build_sketches_by_key(
        ds, "event_type", [SketchSpec("dd", DDSketch(alpha=0.01), "value")]
    )
    rows = []
    for etype in sorted(grouped):
        dd = grouped[etype]["dd"]
        qs = dd.quantiles([0.5, 0.9, 0.99, 0.999])
        rows.append(
            (etype, int(dd.n), qs[0], qs[1], qs[2], qs[3], bool(dd.collapsed()))
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n", "p50", "p90", "p99", "p999", "collapsed"],
    )


def label_principal_directions(
    sf_dir: str, ell: int = 32, k: int = 4
) -> pd.DataFrame:
    """Per-label principal directions of the embedding corpus via
    GROUPED Frequent Directions sketches — the matrix kernel through
    the keyed merge tree (``kind="matrix"`` extractor per key group),
    the by-key sibling of
    :func:`..pipelines.ann.embedding_principal_directions`.

    Per label: top-``k`` singular values, exact-denominator energy
    fractions (``fro2`` rides the sketch), row count and the
    ``||A||_F²/ell`` spectral bound.  Exchange volume is
    ``num_labels × ell × d`` floats per block — N-independent.  The
    per-group spectral-error envelope vs the exact group Gram matrix
    is asserted in pytest (rows-only driver check)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.fd import FrequentDirections

    ds = read(sf_dir, "embeddings", ["label", "embedding"])
    grouped = build_sketches_by_key(
        ds,
        "label",
        [SketchSpec("fd", FrequentDirections(ell=ell), "embedding", kind="matrix")],
    )
    rows = []
    for label in sorted(grouped):
        fd = grouped[label]["fd"]
        s, _ = fd.top_directions(k)
        energy = s**2 / fd.fro2 if fd.fro2 > 0 else np.zeros_like(s)
        for r in range(s.size):
            rows.append(
                (
                    int(label),
                    r + 1,
                    round(float(s[r]), 6),
                    round(float(energy[r]), 8),
                    int(fd.n),
                    round(fd.error_bound(), 6),
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "label", "rank", "singular_value", "energy_fraction",
            "n_rows", "spectral_error_bound",
        ],
    )


def ntok_range_mass(sf_dir: str) -> pd.DataFrame:
    """Range-mass estimates over the ``n_tok`` stream via the
    dyadic-range CMS — the O(log U) upgrade of the reference's naive
    per-value range sum (``cms_range_query_int``,
    src/core/count_min_sketch.c:47-53; SURVEY.md §2.1 #8/#13), with the
    naive level-0 answer alongside for parity.

    Dyadic error is ≤ 2·bits·eps·N regardless of range width; the
    naive bound degrades as |R|·eps·N, which is why the reference's
    own wide-range probes are the weak spot this sketch fixes."""
    from parallel_count_min_sketch_ray.state.dyadic import DyadicCMS

    ds = tokenized_documents(sf_dir)
    rep = build_sketches(
        ds,
        [SketchSpec(
            "dy", DyadicCMS(eps=0.001, delta=0.1, seed=SEED, bits=16),
            "n_tok", kind="numeric",
        )],
    )
    dy = rep["dy"]
    ranges = [(0, 50), (51, 100), (101, 200), (0, (1 << 16) - 1)]
    rows = [
        (
            lo,
            hi,
            np.int64(dy.range_query(lo, hi)),
            np.int64(dy.levels[0].range_query(lo, hi)),
            np.int64(dy.range_error_bound()),
            np.int64(dy.total),
        )
        for lo, hi in ranges
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "range_lo", "range_hi", "dyadic_estimate", "naive_estimate",
            "dyadic_error_bound", "total_docs",
        ],
    )


def daily_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Windowed sketch aggregate: per-DAY HyperLogLog distinct users —
    the event-time window × mergeable-sketch composition (approximate
    COUNT(DISTINCT user_id) GROUP BY day without shuffling user rows).

    The window key is derived in ``map_batches`` (timestamp → day
    string, one Arrow ``strftime``), then the grouped build folds one
    HLL blob per (block, day) through the keyed no-shuffle merge tree.
    Day granularity keeps key-cardinality × sketch-size per block small
    (HLL p=12 ≈ 4 KB × ~hundreds of days); an hour-grained variant at
    scale would drop to p=10 or the ``via="shuffle"`` spelling.
    """
    grouped = _daily_user_hlls(sf_dir)
    rows = sorted(
        (day, float(d["hll"].estimate())) for day, d in grouped.items()
    )
    return pd.DataFrame(
        {
            "day": [r[0] for r in rows],
            "distinct_users_estimate": [r[1] for r in rows],
        }
    )


_daily_hll_cache: dict[tuple, dict] = {}


def _daily_user_sketches(
    sf_dir: str,
    name: str,
    proto,
    cache: dict,
    extra_key: tuple = (),
    value_col: str = "user_id",
) -> dict:
    """Per-day per-event-column sketches through the keyed merge tree —
    the shared builder of the daily/sliding window queries (memoized
    per (sf_dir, job) — the point of the composition is ONE build,
    many window queries)."""
    import ray as _ray

    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )

    job = _ray.get_runtime_context().get_job_id() if _ray.is_initialized() else None
    key = (sf_dir, job, value_col) + extra_key
    cached = cache.get(key)
    if cached is not None:
        return cached

    def with_day(batch: pa.Table) -> pa.Table:
        day = pa.compute.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table({"day": day, value_col: batch[value_col]})

    ds = read(sf_dir, "events", ["ts", value_col]).map_batches(
        with_day, batch_format="pyarrow"
    )
    grouped = build_sketches_by_key(
        ds, "day", [SketchSpec(name, proto, value_col, kind="numeric")]
    )
    cache[key] = grouped
    return grouped


def _calendar_window_merges(grouped: dict, name: str, window_days: int):
    """Slide over CALENDAR days (a gap day — no events — must not widen
    the window beyond ``window_days`` calendar days), merging only the
    days that have state; yields (start_str, end_str, merged_sketch)."""
    proto = next(iter(grouped.values()))[name]
    first = np.datetime64(min(grouped), "D")
    last = np.datetime64(max(grouped), "D")
    one = np.timedelta64(1, "D")
    end = first + (window_days - 1) * one
    while end <= last:
        start = end - (window_days - 1) * one
        acc = proto.empty_like()
        d = start
        while d <= end:
            g = grouped.get(str(d))
            if g is not None:
                acc.merge(g[name])
            d = d + one
        yield str(start), str(end), acc
        end = end + one


def _daily_user_hlls(sf_dir: str) -> dict:
    from parallel_count_min_sketch_ray.state.hll import HyperLogLog

    return _daily_user_sketches(
        sf_dir, "hll", HyperLogLog(p=12, seed=SEED), _daily_hll_cache
    )


def weekly_distinct_users(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """SLIDING-window distinct users from the same per-day HLL state —
    sketch algebra instead of a second scan: a 7-day window's distinct
    count is the MERGE of its seven daily sketches (HLL union is
    lossless), so any window size replays off one build.  This is the
    composability argument for mergeable sketches at 100 TB: O(days)
    tiny states answer O(days × window-sizes) window queries with zero
    extra passes over the events."""
    grouped = _daily_user_hlls(sf_dir)
    if not grouped:
        return pd.DataFrame(
            columns=["window_start", "window_end", "distinct_users_estimate"]
        )
    rows = [
        (start, end, float(acc.estimate()))
        for start, end, acc in _calendar_window_merges(
            grouped, "hll", window_days
        )
    ]
    return pd.DataFrame(
        rows, columns=["window_start", "window_end", "distinct_users_estimate"]
    )


_daily_topk_cache: dict[tuple, dict] = {}


def _daily_user_topks(sf_dir: str, k: int = 256) -> dict:
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    return _daily_user_sketches(
        sf_dir, "topk", TopKSketch(k=k), _daily_topk_cache, extra_key=(k,)
    )


_daily_td_cache: dict[tuple, dict] = {}


def weekly_value_quantiles(
    sf_dir: str, window_days: int = 7, delta: int = 200
) -> pd.DataFrame:
    """SLIDING-window value quantiles from per-day t-digest state — the
    third window-merge composition (HLL → distincts, MG → heavy
    hitters, t-digest → quantiles): a window's p50/p90/p99 come from
    merging its daily digests, so every window size replays off ONE
    per-day build with zero extra passes over the events.  Calendar-day
    sliding per the ``weekly_distinct_users`` contract.

    Deterministic but interpolated (not SQL-expressible to
    bit-equality); the per-window rank-error envelope vs the exact
    window distribution is asserted in pytest."""
    from parallel_count_min_sketch_ray.state.tdigest import TDigest

    grouped = _daily_user_sketches(
        sf_dir, "td", TDigest(delta=delta), _daily_td_cache,
        extra_key=(delta,), value_col="value",
    )
    cols = ["window_start", "window_end", "n", "p50", "p90", "p99"]
    if not grouped:
        return pd.DataFrame(columns=cols)
    rows = []
    for start, end, acc in _calendar_window_merges(grouped, "td", window_days):
        rows.append(
            (start, end, np.int64(acc.n),
             float(acc.quantile(0.5)), float(acc.quantile(0.9)),
             float(acc.quantile(0.99)))
        )
    return pd.DataFrame(rows, columns=cols)


def weekly_top_users(
    sf_dir: str, window_days: int = 7, m: int = 5
) -> pd.DataFrame:
    """SLIDING-window heavy hitters (trending users) from per-day
    Misra–Gries state — the windowed-top-k composition: a window's
    heavy hitters come from MERGING its daily sketches (MG merge keeps
    the deficit bounds valid), so every window size replays off the
    ONE per-day build with zero extra passes over the events.  Windows
    slide over CALENDAR days (a gap day must not widen the window —
    the ``weekly_distinct_users`` contract).

    True count within [lower, upper] per (window, user) is asserted
    against exact per-window SQL counts in pytest; rows-only driver
    check (deficit bounds are not SQL-expressible).
    """
    grouped = _daily_user_topks(sf_dir)
    cols = ["window_start", "window_end", "rnk", "user_id",
            "count_lower", "count_upper"]
    if not grouped:
        return pd.DataFrame(columns=cols)
    rows = []
    for start, end, acc in _calendar_window_merges(grouped, "topk", window_days):
        for rank, (uid, lo, hi) in enumerate(acc.topk(m), 1):
            rows.append(
                (start, end, np.int64(rank), np.int64(uid),
                 np.int64(lo), np.int64(hi))
            )
    return pd.DataFrame(rows, columns=cols)


def bloom_doc_membership(sf_dir: str) -> pd.DataFrame:
    rep = build_all(sf_dir)
    bloom = rep["bloom"]
    present_probes = np.arange(0, 50, dtype=np.int64)  # doc_ids 0..49 exist
    absent_probes = np.arange(10_000_000, 10_000_050, dtype=np.int64)
    probes = np.concatenate([present_probes, absent_probes])
    return pd.DataFrame(
        {
            "probe_id": probes,
            "member": bloom.contains(probes),
            "expected_present": probes < 10_000_000,
        }
    )


def cms_inner_product_sources(sf_dir: str) -> pd.DataFrame:
    """Join-size estimate between two source-partitions' token streams
    (the reference's only join-like operator, cms_inner_product,
    src/core/count_min_sketch.c:65-83)."""
    ds = tokenized_documents(sf_dir)
    proto = CountMinSketch(eps=0.001, delta=0.1, seed=SEED)
    import pyarrow.compute as pc

    def part_of(src: str):
        # exact source match ("src1" must NOT also sweep in src10-19);
        # the exact Σ f_a·f_b this estimates is source_token_joinsize
        sub = ds.map_batches(
            lambda t, p=src: t.filter(pc.equal(t["source"], p)),
            batch_format="pyarrow",
        )
        from parallel_count_min_sketch_ray.pipelines.sketch_build import build_sketch

        sk, _ = build_sketch(sub, proto, "tokens")
        return sk

    a = part_of("src0")
    b = part_of("src1")
    return pd.DataFrame(
        {
            "inner_product_estimate": [np.int64(a.inner_product(b))],
            "self_product_a": [np.int64(a.inner_product(a))],
            "total_a": [np.int64(a.total)],
            "total_b": [np.int64(b.total)],
        }
    )


def source_distinct_tokens(sf_dir: str) -> pd.DataFrame:
    """Per-source HLL distinct-token estimates via grouped sketch
    aggregation (ds.groupby('source').aggregate(sketch UDAF))."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )

    ds = tokenized_documents(sf_dir)
    grouped = build_sketches_by_key(
        ds, "source", [SketchSpec("hll", HyperLogLog(p=12, seed=SEED), "tokens")]
    )
    rows = sorted(
        (src, float(d["hll"].estimate())) for src, d in grouped.items()
    )
    return pd.DataFrame(
        {
            "source": [r[0] for r in rows],
            "distinct_estimate": [r[1] for r in rows],
        }
    )


def cms_accuracy_report(sf_dir: str) -> pd.DataFrame:
    """Full accuracy sweep vs the exact token-count oracle — the
    ``test_cms_accuracy`` report (count_min_sketch.c:205-242) run
    distributed END-TO-END: Ray builds the sketch AND the exact oracle
    (token_counts), then validates every unique token in a distributed
    partial-stats pass (:func:`..state.validate.validate_cms_distributed`)
    — the vocabulary never lands on the driver; only seven scalars do."""
    from parallel_count_min_sketch_ray.pipelines.analytics import token_counts
    from parallel_count_min_sketch_ray.state.validate import validate_cms_distributed

    rep = build_all(sf_dir)
    report = validate_cms_distributed(rep["cms"], token_counts(sf_dir), strict=True)
    d = report.as_dict()
    return pd.DataFrame({"metric": list(d.keys()), "value": [float(v) for v in d.values()]})


def topk_words(sf_dir: str, m: int = 10) -> pd.DataFrame:
    """Misra–Gries heavy hitters over the tokenized documents: the
    top-m words with [lower, upper] count bounds (true count always
    inside; lower one-sided-low — the mirror of CMS's one-sided-high)."""
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    ds = tokenized_documents(sf_dir)
    rep = build_sketches(
        ds, [SketchSpec("topk", TopKSketch(k=512), "tokens")]
    )
    sk = rep["topk"]
    rows = sk.topk(m)
    return pd.DataFrame(
        {
            "token": np.array([r[0] for r in rows], dtype=np.int64),
            "count_lower": np.array([r[1] for r in rows], dtype=np.int64),
            "count_upper": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


def source_topk_words(sf_dir: str, m: int = 5) -> pd.DataFrame:
    """Per-source Misra–Gries heavy hitters — grouped top-k, the
    per-domain vocabulary profile a curation pipeline keeps per crawl
    source.  One keyed merge-tree pass builds every source's sketch
    (``build_sketches_by_key`` — the shuffle carries fixed-size MG
    partials, not rows); the exact counterpart is
    ``top_terms_per_source``.  Bounds semantics as ``topk_words``:
    the true count is always inside [lower, upper].  Deterministic but
    not SQL-expressible (hashed token ids, deficit bounds) →
    rows-only check; the containment contract is asserted in pytest.
    """
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.topk import TopKSketch

    ds = tokenized_documents(sf_dir)
    grouped = build_sketches_by_key(
        ds, "source", [SketchSpec("topk", TopKSketch(k=512), "tokens")]
    )
    rows = []
    for src in sorted(grouped):
        for rank, (tok, lo, hi) in enumerate(grouped[src]["topk"].topk(m), 1):
            rows.append((src, np.int64(rank), np.int64(tok),
                         np.int64(lo), np.int64(hi)))
    return pd.DataFrame(
        rows,
        columns=["source", "rnk", "token", "count_lower", "count_upper"],
    )


def source_shingle_overlap(
    sf_dir: str, k: int = 1024, shingle_k: int = 3
) -> pd.DataFrame:
    """Pairwise corpus overlap between sources: per-source KMV sketches
    over 3-gram shingle hashes, then KMV set operations (union /
    intersection / Jaccard, Beyer et al. 2007) for every source pair —
    the contamination / provenance-overlap check a training-data
    pipeline runs across its crawl sources.

    One streaming pass + one keyed blob merge builds all P sketches;
    the driver then does P(P-1)/2 pairwise estimates over fixed k-word
    samples (P = #sources is small here; at thousands of sources the
    pairwise step itself would move into a map over source pairs).
    Deterministic but not SQL-expressible → rows-only check; the
    estimate-vs-exact tolerance is asserted in pytest.
    """
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        _shingle_list_array,
        shingle_hashes,
    )
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.kmv import BottomKSketch

    def to_shingles(batch: pa.Table) -> pa.Table:
        sh = shingle_hashes(batch["text"].to_pylist(), shingle_k)
        return pa.Table.from_arrays(
            [batch["source"], _shingle_list_array(sh)],
            names=["source", "shingles"],
        )

    ds = read(sf_dir, "documents", ["text", "source"]).map_batches(
        to_shingles, batch_format="pyarrow"
    )
    grouped = build_sketches_by_key(
        ds,
        "source",
        [SketchSpec("kmv", BottomKSketch(k=k, seed=SEED), "shingles", kind="list")],
    )
    srcs = sorted(grouped)
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            est = grouped[sa]["kmv"].set_estimates(grouped[sb]["kmv"])
            rows.append(
                (sa, sb, round(est["jaccard"], 6),
                 round(est["union"], 1), round(est["intersection"], 1))
            )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "jaccard_est", "union_est",
                 "intersection_est"],
    )


def source_token_divergence(
    sf_dir: str, src_a: str = "src0", src_b: str = "src1"
) -> pd.DataFrame:
    """Token-frequency DIVERGENCE between two sources via Count-Sketch
    linearity (:meth:`..state.countsketch.CountSketch.subtract`): the
    per-source sketches come out of ONE keyed merge-tree pass, then
    ``csk_a - csk_b`` sketches the difference vector ``f_A - f_B``
    directly — per-word signed count differences (unbiased) and the
    AMS estimate of ``||f_A - f_B||^2``, the squared L2 distance
    between the sources' token distributions.

    This is the sketch the CMS family cannot express (min-of-rows has
    no subtraction); the exact counterparts (per-word diffs, Σ(ca-cb)²)
    are SQL-expressible and pytest-asserts the estimates' envelopes
    (rows-only driver check: the output IS the estimate)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )
    from parallel_count_min_sketch_ray.state.countsketch import CountSketch

    # only the two compared sources matter: filter BEFORE the keyed
    # build — the per-(block, key) CSK partials are 448 KB each, so an
    # unfiltered 20-source build shuffles ~10× the partial volume it
    # uses (measured 31 s late-suite vs ~1.5 s filtered).  Vectorized
    # Arrow is_in, not an interpolated expr string (a source name with
    # a quote must not change the predicate).
    import pyarrow.compute as pc

    wanted = pa.array([src_a, src_b], pa.string())

    def _two_sources(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["source"], value_set=wanted))

    ds = tokenized_documents(sf_dir).map_batches(
        _two_sources, batch_format="pyarrow"
    )
    grouped = build_sketches_by_key(
        ds,
        "source",
        [SketchSpec("csk", CountSketch(width=8192, depth=7, seed=SEED), "tokens",
                    kind="list")],
    )
    if src_a not in grouped or src_b not in grouped:
        raise ValueError(f"sources {src_a!r}/{src_b!r} not present in corpus")
    diff = grouped[src_a]["csk"]
    n_a, n_b = diff.total, grouped[src_b]["csk"].total
    diff.subtract(grouped[src_b]["csk"])
    ids = np.array([djb2(w) & 0x7FFFFFFF for w in PROBE_WORDS], dtype=np.int64)
    # one AMS pass: error_bound() would recompute the (object-int)
    # per-row F2 dots — derive the radius from the same estimate
    f2 = int(diff.estimate_f2())
    return pd.DataFrame(
        {
            "word": PROBE_WORDS,
            "count_diff_estimate": diff.query(ids),
            "l2_distance_sq": np.int64(f2),
            "error_bound": np.float64(round(np.sqrt(3.0 * max(f2, 0) / diff.width), 2)),
            "n_tokens_a": np.int64(n_a),
            "n_tokens_b": np.int64(n_b),
        }
    )


def countsketch_word_estimates(sf_dir: str) -> pd.DataFrame:
    """Unbiased signed point estimates + AMS F2 over the token stream
    (:mod:`..state.countsketch` — the Count-Sketch sibling the
    reference lacks).  Estimates may be negative (unbiasedness);
    `error_bound` is the sketch's own sqrt(3·F2/w) radius.  The
    F2-vs-exact and per-word-bound contracts are asserted in pytest
    (deterministic but not SQL-expressible → rows-only check).

    The sketch comes out of the shared multi-sketch pass
    (:func:`build_all` — one corpus scan for CMS+HLL+KLL+Bloom+CSK),
    not its own scan."""
    sk = build_all(sf_dir)["csk"]
    ids = np.array([djb2(w) & 0x7FFFFFFF for w in PROBE_WORDS], dtype=np.int64)
    f2 = int(sk.estimate_f2())  # one AMS pass (error_bound would redo it)
    return pd.DataFrame(
        {
            "word": PROBE_WORDS,
            "estimate": sk.query(ids),
            "f2_estimate": np.int64(f2),
            "error_bound": np.float64(round(np.sqrt(3.0 * max(f2, 0) / sk.width), 2)),
            "total_tokens": np.int64(sk.total),
        }
    )


def checkpointed_lineage(sf_dir: str, ckpt_dir: str | None = None) -> pd.DataFrame:
    """Flagship resumable build over documents; returns per-partition
    lineage (partition_id, rows, items, resumed)."""
    import tempfile

    from parallel_count_min_sketch_ray.state.checkpoint import (
        build_sketches_checkpointed,
    )

    if ckpt_dir is None:
        ckpt_dir = tempfile.mkdtemp(prefix="pcmr-ckpt-")
    # checkpointed build reads raw parquet; documents tokens derive in
    # the extractor, so sketch the text-hash stream instead
    specs = [
        SketchSpec("cms_words", CountMinSketch(seed=SEED), "text", kind="string_hash"),
        SketchSpec("hll_docs", HyperLogLog(p=12, seed=SEED), "doc_id", kind="numeric"),
    ]
    rep = build_sketches_checkpointed(
        [f"{sf_dir}/documents.parquet"], specs, ckpt_dir, rows_per_partition=200
    )
    lin = pd.DataFrame(rep.lineage)
    lin["items_cms"] = [it["cms_words"] for it in lin["items"]]
    return lin[["partition_id", "rows", "items_cms", "resumed"]].sort_values(
        "partition_id"
    ).reset_index(drop=True)


def incremental_append_build(sf_dir: str) -> pd.DataFrame:
    """Incremental append / delta recompute at the driver surface —
    the 100-TB operational story the checkpoint manifests are shaped
    for: when new parquet fragments are APPENDED to a corpus, a re-run
    of the checkpointed build recomputes ONLY the new fragments'
    partitions (partition ids embed the fragment path, so existing
    ones resume from their checkpoints) and the merged sketch is
    bit-identical to a from-scratch build over the full corpus (sketch
    merge is exact and order-free).

    The append is SIMULATED here by splitting ``documents.parquet``
    into two fragment files once (cached per input fingerprint; at
    real scale fragments arrive pre-split, no driver read): phase 1
    builds over fragment 0, phase 2 "appends" fragment 1 and re-runs
    over both against the SAME checkpoint dir.  Returns one summary
    row asserting the delta shape and the bit-identity vs a fresh
    full build.  Deterministic → rows-only driver check; the
    file-level append contract is also asserted in pytest
    (``tests/test_checkpoint.py``)."""
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.state.checkpoint import (
        build_sketches_checkpointed,
    )

    doc = f"{sf_dir}/documents.parquet"
    st = os.stat(doc)
    tag = hashlib.sha1(
        f"{os.path.abspath(doc)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    frag_dir = f"/tmp/pcmr-incr-{tag}"
    f0 = os.path.join(frag_dir, "frag-000.parquet")
    f1 = os.path.join(frag_dir, "frag-001.parquet")
    if not (os.path.exists(f0) and os.path.exists(f1)):
        os.makedirs(frag_dir, exist_ok=True)
        t = pq_.read_table(doc, columns=["doc_id", "text"])
        cut = t.num_rows * 3 // 4
        for path, tbl in ((f0, t.slice(0, cut)), (f1, t.slice(cut))):
            tmp = path + ".tmp"
            pq_.write_table(tbl, tmp, row_group_size=2048)
            os.replace(tmp, path)

    specs = [
        SketchSpec(
            "cms_words",
            CountMinSketch(eps=0.01, delta=0.1, seed=SEED),
            "text",
            kind="string_hash",
        ),
        SketchSpec("hll_docs", HyperLogLog(p=12, seed=SEED), "doc_id",
                   kind="numeric"),
    ]
    ckpt = tempfile.mkdtemp(prefix="pcmr-incr-ckpt-")
    rep1 = build_sketches_checkpointed([f0], specs, ckpt,
                                       rows_per_partition=2048)
    rep2 = build_sketches_checkpointed([f0, f1], specs, ckpt,
                                       rows_per_partition=2048)
    fresh = build_sketches_checkpointed(
        [f0, f1], specs, tempfile.mkdtemp(prefix="pcmr-incr-fresh-"),
        rows_per_partition=2048,
    )
    return pd.DataFrame(
        {
            "initial_partitions": [np.int64(rep1.partitions_total)],
            "append_partitions_total": [np.int64(rep2.partitions_total)],
            "append_resumed": [np.int64(rep2.partitions_resumed)],
            "append_built": [np.int64(rep2.partitions_built)],
            "rows": [np.int64(rep2.rows)],
            "delta_only": [
                bool(
                    rep2.partitions_resumed == rep1.partitions_total
                    and rep2.partitions_built
                    == rep2.partitions_total - rep1.partitions_total
                )
            ],
            "cms_bit_identical_to_fresh": [
                bool(rep2["cms_words"] == fresh["cms_words"])
            ],
            "hll_bit_identical_to_fresh": [
                bool(
                    np.array_equal(
                        rep2["hll_docs"].registers, fresh["hll_docs"].registers
                    )
                )
            ],
        }
    )


def source_ntok_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-source n_tok quantile estimates via grouped KLL aggregation
    (``ds.groupby('source').aggregate(sketch UDAF)`` — the shuffle
    carries per-block KLL partials, not rows)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_build import (
        build_sketches_by_key,
    )

    ds = tokenized_documents(sf_dir)
    grouped = build_sketches_by_key(
        ds, "source", [SketchSpec("kll", KLLSketch(k=200, seed=SEED), "n_tok")]
    )
    rows = []
    for src in sorted(grouped):
        kll = grouped[src]["kll"]
        qs = kll.quantiles([0.5, 0.9, 0.99])
        rows.append((src, int(kll.n), float(qs[0]), float(qs[1]), float(qs[2])))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "p50", "p90", "p99"]
    )


def doc_sample_kmv(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Deterministic uniform sample of document ids via the mergeable
    bottom-k (KMV) sketch — ONE streaming pass, order- and
    partitioning-independent (bit-exact across merges), plus the KMV
    distinct-count estimate the same state yields for free.

    At 100 TB this is "sample k docs uniformly from the corpus" with
    a fixed 2k-word exchange per block — no shuffle, no count pass.
    """
    from parallel_count_min_sketch_ray.state.kmv import BottomKSketch

    ds = tokenized_documents(sf_dir)
    rep = build_sketches(
        ds, [SketchSpec("kmv", BottomKSketch(k=k, seed=SEED), "doc_id", kind="numeric")]
    )
    sk = rep["kmv"]
    sample = np.sort(sk.sample())
    return pd.DataFrame(
        {
            "doc_id": sample.astype(np.int64),
            "distinct_estimate": np.float64(sk.estimate_distinct()),
            "rel_error_bound": np.float64(sk.relative_error()),
        }
    )


def doc_weighted_sample(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """Deterministic WEIGHTED sample of documents ∝ n_tok via the
    mergeable A-ES reservoir (`state/ares.py`) — one streaming pass,
    bit-exact across any partitioning (scores are pure functions of
    (doc_id, weight)), a fixed ≤3k-word exchange per block, no shuffle.

    The weighted complement of ``doc_sample_kmv``: token-budget
    mixture construction samples documents by length/quality weight,
    not uniformly.
    """
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    proto = WeightedReservoir(k=k, seed=SEED)

    def partial(batch: pa.Table) -> pa.Table:
        sk = WeightedReservoir(k=k, seed=SEED)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = w > 0  # zero-token docs carry no sampling mass
        sk.update(ids[keep], w[keep])
        return pa.table({"blob": pa.array([sk.to_bytes()], pa.binary())})

    blobs = (
        tokenized_documents(sf_dir)
        .select_columns(["doc_id", "n_tok"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    merged = proto.empty_like()
    for row in blobs:
        merged.merge(WeightedReservoir.from_bytes(row["blob"]))
    keys, weights = merged.sample_table()
    return pd.DataFrame(
        {
            "doc_id": keys.astype(np.int64),
            "weight_n_tok": weights.astype(np.float64),
            "rank": np.arange(1, keys.size + 1, dtype=np.int64),
        }
    )


def source_weighted_sample(sf_dir: str, k: int = 16) -> pd.DataFrame:
    """Stratified weighted sampling: per-source A-ES reservoirs (k docs
    each, P ∝ n_tok) built as per-(block, source) partial blobs and
    folded per source — the keyed variant of ``doc_weighted_sample``,
    the "pick representative docs per domain" curation step.

    Exchange: ≤ one ~3k-word blob per (block, source); the driver folds
    sources × blocks blobs (sources are low-cardinality by contract —
    the high-cardinality path is ``build_sketches_by_key(via=
    'shuffle')``'s topology).  Bit-exact across any partitioning.
    """
    import ray as _ray  # noqa: F401  (parity with module conventions)

    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.sort_by("source")
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        sn = src.to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.float64)
        change = np.flatnonzero(sn[1:] != sn[:-1]) + 1
        starts = np.concatenate([[0], change]).astype(np.int64)
        ends = np.concatenate([change, [len(sn)]]).astype(np.int64)
        out_src, out_blob = [], []
        for s0, e0 in zip(starts, ends):
            sk = WeightedReservoir(k=k, seed=SEED)
            seg_w = w[s0:e0]
            keep = seg_w > 0
            if keep.any():
                sk.update(ids[s0:e0][keep], seg_w[keep])
            out_src.append(sn[s0])
            out_blob.append(sk.to_bytes())
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "blob": pa.array(out_blob, pa.binary()),
            }
        )

    rows = (
        tokenized_documents(sf_dir)
        .select_columns(["doc_id", "n_tok", "source"])
        .map_batches(partials, batch_format="pyarrow")
        .take_all()
    )
    folded: dict[str, WeightedReservoir] = {}
    for r in rows:
        sk = WeightedReservoir.from_bytes(r["blob"])
        if r["source"] in folded:
            folded[r["source"]].merge(sk)
        else:
            folded[r["source"]] = sk
    out = []
    for source in sorted(folded):
        keys, weights = folded[source].sample_table()
        for rank, (d, wt) in enumerate(zip(keys.tolist(), weights.tolist()), 1):
            out.append((source, int(d), float(wt), rank))
    return pd.DataFrame(
        out, columns=["source", "doc_id", "weight_n_tok", "rank"]
    ).astype({"doc_id": np.int64, "rank": np.int64})


def bloom_semijoin_count(
    sf_dir: str, fp_rate: float = 0.01, broadcast_threshold: int = 1_000_000
) -> pd.DataFrame:
    """Bloom-pushdown semi-join: count lineitems whose order is
    URGENT-priority, filtering the big side with a Bloom filter of the
    urgent order keys instead of shuffling it — the classic sketch
    application (runtime filters / sideways information passing).

    The Bloom builds distributed over the (scan-pruned) urgent orders
    through the standard merge tree, broadcasts once (~KBs), and the
    fact-side scan counts probe hits per block (the broadcast filter
    is deserialized ONCE per worker, :mod:`..state.broadcast`).  No
    false negatives: bloom_count ≥ exact; overshoot ≤ fp_rate of the
    non-matching rows (asserted in pytest against the exact semi-join
    count).

    The EXACT side is tiered like the repo's joins: at or below
    ``broadcast_threshold`` build-side keys, a sorted key array
    broadcasts and every probe batch counts its exact hits in the same
    pass; above it, nothing materializes on the driver — the Bloom
    pre-filters the probe side (that IS the runtime-filter payoff:
    only ~exact + fp_rate·N rows enter the exchange) and a distributed
    hash semi-join computes the exact count.
    """
    import pyarrow.compute as _pc
    import ray as _ray
    import ray.data as _rd

    from ray.data.aggregate import Sum

    from parallel_count_min_sketch_ray.pipelines.analytics import _join_partitions
    from parallel_count_min_sketch_ray.pipelines.sketch_build import build_sketch
    from parallel_count_min_sketch_ray.state.bloom import BloomFilter
    from parallel_count_min_sketch_ray.state.broadcast import sketch_from_ref

    urgent = _rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=_pc.field("o_orderpriority") == "1-URGENT",
    ).materialize()  # ONE execution of the filtered scan feeds count +
    # Bloom build + (small-side) exact key broadcast; the build side is
    # a single pruned key column, so the pin is key-table-sized
    n_urgent = urgent.count()
    use_broadcast = n_urgent <= broadcast_threshold
    proto = BloomFilter(capacity=max(n_urgent, 1024), fp_rate=fp_rate, seed=SEED)
    bloom, _ = build_sketch(urgent, proto, "o_orderkey", kind="numeric")
    bloom_ref = _ray.put(bloom.to_bytes())
    lineitem = read(sf_dir, "lineitem", ["l_orderkey"])

    if use_broadcast:
        keys = np.sort(
            np.array([r["o_orderkey"] for r in urgent.take_all()], dtype=np.int64)
        )
        keys_ref = _ray.put(keys)

        def probe(batch: pa.Table) -> pa.Table:
            bf = sketch_from_ref(bloom_ref)
            kk = _ray.get(keys_ref)
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            hits = bf.contains(ok)
            if len(kk) == 0:  # no urgent orders → zero exact matches
                n_exact = 0
            else:
                pos = np.searchsorted(kk, ok)
                pos[pos == len(kk)] = 0
                n_exact = int((kk[pos] == ok).sum())
            return pa.table(
                {
                    "n_rows": pa.array([batch.num_rows], pa.int64()),
                    "bloom_hits": pa.array([int(hits.sum())], pa.int64()),
                    "exact_hits": pa.array([n_exact], pa.int64()),
                }
            )

        agg = lineitem.map_batches(probe, batch_format="pyarrow").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("bloom_hits", alias_name="bloom_hits"),
            Sum("exact_hits", alias_name="exact_hits"),
        )
        n_rows, bloom_hits = int(agg["n_rows"]), int(agg["bloom_hits"])
        exact_hits = int(agg["exact_hits"])
    else:

        def probe_counts(batch: pa.Table) -> pa.Table:
            bf = sketch_from_ref(bloom_ref)
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_rows": pa.array([batch.num_rows], pa.int64()),
                    "bloom_hits": pa.array([int(bf.contains(ok).sum())], pa.int64()),
                }
            )

        agg = lineitem.map_batches(probe_counts, batch_format="pyarrow").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("bloom_hits", alias_name="bloom_hits"),
        )
        n_rows, bloom_hits = int(agg["n_rows"]), int(agg["bloom_hits"])

        def bloom_prefilter(batch: pa.Table) -> pa.Table:
            bf = sketch_from_ref(bloom_ref)
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(bf.contains(ok)))

        # no false negatives → filtering first preserves the exact
        # count; o_orderkey is unique so inner join == semi-join
        exact_hits = (
            lineitem.map_batches(bloom_prefilter, batch_format="pyarrow")
            .join(
                urgent,
                join_type="inner",
                num_partitions=_join_partitions(sf_dir, ["lineitem", "orders"]),
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
            .count()
        )

    return pd.DataFrame(
        {
            "n_lineitems": [np.int64(n_rows)],
            "bloom_semijoin_count": [np.int64(bloom_hits)],
            "exact_semijoin_count": [np.int64(exact_hits)],
            "configured_fp_rate": [np.float64(fp_rate)],
        }
    )
