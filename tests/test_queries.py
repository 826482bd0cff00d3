"""Driver-contract query tests: Ray results vs DuckDB-exact oracles at
sf0.001, sketch estimates vs their published bounds, near-dup recall on
planted duplicates."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_UNIT

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_UNIT}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = np.round(df[c].astype(np.float64), 9)
        else:
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize(
    "name",
    [
        "token_counts",
        "token_totals",
        "token_f2",
        "top_terms_per_source",
        "doc_split_stats",
        "decontaminate_ngram",
        "curate_corpus",
        "events_value_median",
        "events_value_quantiles",
        "events_value_hour_corr",
        "pack_contexts",
        "customer_running_spend",
        "events_moving_avg",
        "events_time_window_sum",
        "events_user_seq",
        "daily_retention",
        "source_distinct_exact",
        "events_value_histogram",
        "events_outliers",
        "bigram_lift",
        "events_type_pivot",
        "source_token_set_ops",
        "source_chars_stats",
        "source_oov_rate",
        "source_token_joinsize",
        "corpus_sample",
        "bigram_counts",
        "doc_token_stats",
        "doc_top_tfidf",
        "per_source_cap",
        "source_mixture_sample",
        "repetition_stats",
        "events_cume_dist",
        "signup_conversion",
        "events_hourly",
        "events_rollup",
        "pricing_summary",
        "customers_without_orders",
        "shipping_priority",
        "orders_by_segment",
        "brand_nation_revenue",
        "clean_corpus",
        "dedup_exact",
        "distinct_users",
        "embedding_near_dup",
        "events_asof_join",
        "events_lag",
        "events_props_stats",
        "events_range_join",
        "events_sessions",
        "events_sliding",
        "events_value_stats",
        "heavy_hitters",
        "lang_quality",
        "lang_source_counts",
        "neardup_components",
        "ngram_jaccard_pairs",
        "order_lineitem_join",
        "orders_by_region",
        "source_token_totals",
        "token_count_regex",
        "top_users_by_value",
        "embedding_norms",
        "ann_topk",
        "doc_perplexity",
        "bm25_topk",
        "events_value_ntile",
        "local_supplier_volume",
        "curate_by_perplexity",
        "chunk_documents",
        "source_fertility",
        "returned_item_revenue",
        "pii_scrub",
        "dup_ngram_coverage",
        "large_volume_orders",
        "doc_dup_stats",
        "forecast_revenue",
        "promo_revenue",
        "order_priority_check",
        "discounted_revenue",
        "customer_order_distribution",
        "nation_trade_volume",
        "small_quantity_revenue",
        "top_supplier_revenue",
        "market_share",
        "dedup_windows_rewrite",
    ],
)
def test_query_matches_oracle(ray_session, con, name):
    from parallel_count_min_sketch_ray import entry as em

    res = _canon(_to_pandas(em.queries()[name](SF_UNIT)))
    ora = _canon(con.sql(em.oracle_sql()[name]).df())
    pd.testing.assert_frame_equal(res, ora, check_dtype=True)


def test_cms_word_estimates_bounds(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        cms_word_estimates,
    )

    est = cms_word_estimates(SF_UNIT).set_index("word")
    exact = dict(
        con.sql(
            "SELECT token, COUNT(*) FROM (SELECT unnest(string_split(text,' ')) AS token "
            "FROM documents) t GROUP BY token"
        ).fetchall()
    )
    for word, row in est.iterrows():
        true = exact.get(word, 0)
        assert row["estimate"] >= true, word
        assert row["estimate"] <= true + row["error_bound"], word


def test_countsketch_word_estimates_bounds(ray_session, con):
    """Signed estimates land within the sketch's own sqrt(3*F2/w)
    radius of the exact counts, and the AMS F2 estimate tracks the
    exact F2 of the token stream."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        countsketch_word_estimates,
    )

    est = countsketch_word_estimates(SF_UNIT).set_index("word")
    exact = dict(
        con.sql(
            "SELECT token, COUNT(*) FROM (SELECT unnest(string_split(text,' ')) AS token "
            "FROM documents) t WHERE token <> '' GROUP BY token"
        ).fetchall()
    )
    f2_exact = con.sql(
        "SELECT SUM(cnt * cnt) FROM (SELECT COUNT(*) AS cnt FROM "
        "(SELECT unnest(string_split(text,' ')) AS token FROM documents) t "
        "WHERE token <> '' GROUP BY token) s"
    ).fetchone()[0]
    f2_est = int(est["f2_estimate"].iloc[0])
    # AMS concentration (stream is djb2-hashed: collisions only raise F2)
    assert abs(f2_est - f2_exact) / f2_exact <= 0.10
    for word, row in est.iterrows():
        true = exact.get(word, 0)
        assert abs(row["estimate"] - true) <= row["error_bound"], word


def test_hll_and_kll_queries_vs_exact(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        hll_distinct_words,
        kll_ntok_quantiles,
    )

    hll = hll_distinct_words(SF_UNIT).iloc[0]
    true_distinct = con.sql(
        "SELECT COUNT(DISTINCT token) FROM (SELECT unnest(string_split(text,' ')) "
        "AS token FROM documents) t"
    ).fetchone()[0]
    assert abs(hll["distinct_estimate"] - true_distinct) <= max(
        4 * hll["relative_error"] * true_distinct, 2
    )

    kll = kll_ntok_quantiles(SF_UNIT)
    ntoks = np.sort(
        con.sql(
            "SELECT len(string_split(text,' ')) FROM documents"
        ).df().iloc[:, 0].to_numpy()
    )
    for _, row in kll.iterrows():
        rank = np.searchsorted(ntoks, row["n_tok_quantile"], side="right") / len(ntoks)
        assert abs(rank - row["q"]) <= 0.03 + 1.0 / len(ntoks)


def test_tdigest_value_quantiles_vs_exact(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        tdigest_value_quantiles,
    )

    df = tdigest_value_quantiles(SF_UNIT)
    vals = np.sort(
        con.sql("SELECT value FROM events").df()["value"].to_numpy()
    )
    assert int(df["n"].iloc[0]) == vals.size
    assert int(df["num_centroids"].iloc[0]) <= 200
    for _, row in df.iterrows():
        rank = np.searchsorted(vals, row["value_quantile"], side="right") / vals.size
        assert abs(rank - row["q"]) <= 0.005 + 1.0 / vals.size, row["q"]


def test_ddsketch_value_quantiles_vs_exact(ray_session, con):
    """Relative-error envelope (|est - exact| <= alpha*exact) AND the
    hard-determinism contract: the distributed build's state is
    bit-identical to a serial single-process pass (integer log-bucket
    histogram, no collapse at this scale)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        ddsketch_value_quantiles,
    )
    from parallel_count_min_sketch_ray.state.ddsketch import DDSketch

    df = ddsketch_value_quantiles(SF_UNIT)
    vals = con.sql("SELECT value FROM events").df()["value"].to_numpy()
    assert int(df["n"].iloc[0]) == vals.size
    assert not bool(df["collapsed"].iloc[0])
    exact = np.quantile(vals, df["q"].to_numpy(), method="lower")
    rel = np.abs(df["value_quantile"].to_numpy() - exact) / np.maximum(
        np.abs(exact), 1e-12
    )
    assert (rel <= 0.01 + 1e-9).all(), rel
    serial = DDSketch(alpha=0.01)
    serial.update(vals)
    got = ddsketch_value_quantiles(SF_UNIT)  # same build, memo or not
    assert np.array_equal(
        got["value_quantile"].to_numpy(), serial.quantiles(df["q"].to_numpy())
    )


def test_embedding_principal_directions_vs_exact_svd(ray_session, con):
    """Distributed Frequent Directions vs a full in-memory SVD: the
    covariance spectral bound holds and the top singular values are
    tight (the corpus is tiny relative to ell here, so near-exact)."""
    from parallel_count_min_sketch_ray.pipelines.ann import (
        embedding_principal_directions,
    )

    df = embedding_principal_directions(SF_UNIT, ell=64, k=4)
    emb = con.sql("SELECT embedding FROM embeddings").df()["embedding"]
    A = np.stack(emb.to_numpy()).astype(np.float64)
    assert int(df["n_rows"].iloc[0]) == A.shape[0]
    s_exact = np.linalg.svd(A, compute_uv=False)
    est = df["singular_value"].to_numpy()
    # FD shrink only ever LOWERS energy; bound per direction:
    # s_exact^2 - est^2 <= ||A||_F^2 / ell
    fro2 = float((A * A).sum())
    assert ((s_exact[:4] ** 2 - est**2) <= fro2 / 64 + 1e-6).all()
    assert (est <= s_exact[:4] + 1e-6).all()
    assert float(df["spectral_error_bound"].iloc[0]) == round(fro2 / 64, 6)


def test_source_token_divergence_vs_exact(ray_session, con):
    """The Count-Sketch difference's per-word estimates and AMS L2
    distance track the exact SQL counterparts within the published
    envelopes (sqrt(3*F2/w) additive for points; generous relative for
    the distance)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        PROBE_WORDS,
        source_token_divergence,
    )

    df = source_token_divergence(SF_UNIT)
    ex = con.sql(
        """
        WITH toks AS (
          SELECT source,
                 unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
          FROM documents WHERE source IN ('src0', 'src1')
        ),
        cnts AS (
          SELECT token,
                 count(*) FILTER (WHERE source = 'src0') AS ca,
                 count(*) FILTER (WHERE source = 'src1') AS cb
          FROM toks GROUP BY token
        )
        SELECT token, ca - cb AS diff FROM cnts
        """
    ).df()
    true_diff = dict(zip(ex["token"], ex["diff"]))
    f2_true = int((ex["diff"].to_numpy(dtype=np.int64) ** 2).sum())
    bound = np.sqrt(3.0 * f2_true / 8192)
    for _, row in df.iterrows():
        truth = int(true_diff.get(row["word"], 0))
        assert abs(int(row["count_diff_estimate"]) - truth) <= bound + 1, row["word"]
    assert abs(int(df["l2_distance_sq"].iloc[0]) - f2_true) <= max(
        0.25 * f2_true, 3.0 * f2_true / np.sqrt(8192) + 1
    )


def test_type_value_quantiles_grouped_tdigest(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        type_value_quantiles,
    )

    df = type_value_quantiles(SF_UNIT)
    ex = con.sql("SELECT event_type, value FROM events").df()
    assert set(df["event_type"]) == set(ex["event_type"])
    for _, row in df.iterrows():
        vals = np.sort(ex[ex.event_type == row.event_type]["value"].to_numpy())
        assert row["n"] == vals.size
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = np.searchsorted(vals, row[col], side="right") / vals.size
            assert abs(rank - q) <= 0.01 + 1.0 / vals.size, (row.event_type, col)


def test_daily_distinct_users_windowed_hll(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        daily_distinct_users,
    )

    df = daily_distinct_users(SF_UNIT)
    ex = (
        con.sql(
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "COUNT(DISTINCT user_id) AS d FROM events GROUP BY 1"
        )
        .df()
        .set_index("day")["d"]
    )
    assert set(df["day"]) == set(ex.index)
    for row in df.itertuples():
        true = ex[row.day]
        # HLL p=12 stderr ~1.6%; allow 4 sigma + small-count floor
        assert abs(row.distinct_users_estimate - true) <= max(0.07 * true, 3), row.day


def test_ntok_range_mass_bounds(ray_session, con):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        ntok_range_mass,
    )

    df = ntok_range_mass(SF_UNIT)
    for _, r in df.iterrows():
        true = con.sql(
            "SELECT COUNT(*) FROM (SELECT len(list_filter(string_split(text, ' '), "
            f"x -> x <> '')) AS n FROM documents) t "
            f"WHERE n BETWEEN {int(r.range_lo)} AND {int(r.range_hi)}"
        ).fetchone()[0]
        # one-sided CMS bound, range-width-independent for the dyadic path
        assert true <= r.dyadic_estimate <= true + r.dyadic_error_bound
        assert r.naive_estimate >= true


def test_bloom_membership_query(ray_session):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        bloom_doc_membership,
    )

    df = bloom_doc_membership(SF_UNIT)
    present = df[df["expected_present"]]
    assert present["member"].all()  # zero false negatives
    absent = df[~df["expected_present"]]
    assert absent["member"].mean() <= 0.05


@pytest.fixture(scope="module")
def planted_corpus(tmp_path_factory):
    """documents-schema corpus with planted near-duplicates."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(40):
        words = list(rng.choice(vocab, size=60))
        texts.append(" ".join(words))
        ids.append(2 * i)
        if i < 10:  # plant a near-dup: change 3 of 60 words (~88% jaccard-ish)
            mutated = words.copy()
            for j in rng.choice(60, size=3, replace=False):
                mutated[j] = str(rng.choice(vocab))
            texts.append(" ".join(mutated))
            ids.append(2 * i + 1)
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["src0"] * len(ids)),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d), t


def test_minhash_lsh_finds_planted_dups(ray_session, planted_corpus):
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs_exact,
    )

    d, t = planted_corpus
    found = minhash_lsh_pairs(d, threshold=0.5)
    exact = ngram_jaccard_pairs_exact(
        t["text"].to_pylist(), t["doc_id"].to_numpy(), threshold=0.5
    )
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    found_pairs = set(zip(found["doc_a"].astype(int), found["doc_b"].astype(int)))
    assert exact_pairs, "oracle should find the planted dups"
    recall = len(found_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9
    # verification step guarantees precision 1.0 vs the same oracle
    assert found_pairs <= exact_pairs


def test_simhash_finds_planted_dups(ray_session, planted_corpus):
    from parallel_count_min_sketch_ray.pipelines.dedup import simhash_pairs

    d, t = planted_corpus
    out = simhash_pairs(d, max_hamming=12)
    pairs = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    planted = {(2 * i, 2 * i + 1) for i in range(10)}
    assert len(pairs & planted) >= 8  # high recall on 3/60-word mutations


def test_ann_lsh_recall(ray_session):
    from parallel_count_min_sketch_ray.pipelines.ann import ann_lsh_topk, ann_topk

    exact = ann_topk(SF_UNIT, k=10, num_queries=5)
    approx = ann_lsh_topk(SF_UNIT, k=10, num_queries=5, num_planes=4)
    # LSH returns a subset of the corpus; every returned row must be a
    # true neighbor ordering (sims match exact computation)
    ex = {(r.query_id, r.vec_id): r.sim for r in exact.itertuples()}
    hits = sum((r.query_id, r.vec_id) in ex for r in approx.itertuples())
    assert hits >= 1  # buckets keep the query itself (sim=1) at minimum
    # self-neighbour sanity: each query's rank-1 neighbour is itself
    r1 = exact[exact["rank"] == 1]
    assert (r1["query_id"].to_numpy() == r1["vec_id"].to_numpy()).all()


def test_ann_ivf_recall(ray_session):
    from parallel_count_min_sketch_ray.pipelines.ann import ann_ivf_topk, ann_topk

    exact = ann_topk(SF_UNIT, k=10, num_queries=5)
    ivf = ann_ivf_topk(SF_UNIT, k=10, num_queries=5, num_centroids=8, nprobe=4)
    ex = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    hits = sum((r.query_id, r.vec_id) in ex for r in ivf.itertuples())
    # nprobe=4 of 8 centroids should recover most true neighbors
    assert hits >= len(ex) * 0.5
    # each query's own vector (sim 1.0) must always be found
    r1 = ivf[ivf["rank"] == 1]
    assert (r1["query_id"].to_numpy() == r1["vec_id"].to_numpy()).all()


def test_ann_ivf_derived_geometry(ray_session):
    """num_centroids=None derives ≈√n lists from parquet metadata (and
    nprobe=None probes ~1/4 of them); recall must hold at the derived
    geometry too."""
    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.ann import ann_ivf_topk, ann_topk

    n = pq_.ParquetFile(f"{SF_UNIT}/embeddings.parquet").metadata.num_rows
    expect_lists = int(min(max(16, round(n ** 0.5)), 4096))
    ivf = ann_ivf_topk(SF_UNIT, k=10, num_queries=5, num_centroids=None, nprobe=None)
    exact = ann_topk(SF_UNIT, k=10, num_queries=5)
    ex = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    hits = sum((r.query_id, r.vec_id) in ex for r in ivf.itertuples())
    assert hits >= len(ex) * 0.5, (hits, len(ex), expect_lists)
    r1 = ivf[ivf["rank"] == 1]
    assert (r1["query_id"].to_numpy() == r1["vec_id"].to_numpy()).all()


def test_ngram_jaccard_distributed_matches_bruteforce(ray_session, planted_corpus):
    """The inverted-index distributed Jaccard is exact: identical pair
    set and values to the all-pairs brute force."""
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_exact,
    )

    d, t = planted_corpus
    dist = ngram_jaccard_pairs(d, threshold=0.3)
    exact = (
        ngram_jaccard_pairs_exact(
            t["text"].to_pylist(), t["doc_id"].to_numpy(), threshold=0.3
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(dist) == len(exact) and len(exact) > 0
    assert (dist["doc_a"].to_numpy() == exact["doc_a"].to_numpy()).all()
    assert (dist["doc_b"].to_numpy() == exact["doc_b"].to_numpy()).all()
    assert np.allclose(dist["jaccard"], exact["jaccard"])


def test_ngram_jaccard_handles_empty_docs(ray_session, tmp_path):
    """Zero-shingle (empty-text) docs pair at jaccard 1.0 (the
    both-empty convention), via the sentinel bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.dedup import ngram_jaccard_pairs

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "", "alpha beta gamma delta"], pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([0, 0, 22], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = ngram_jaccard_pairs(str(tmp_path), threshold=0.5)
    assert list(zip(out["doc_a"], out["doc_b"])) == [(1, 2)]
    assert out["jaccard"].iloc[0] == 1.0


def test_clean_corpus_filters_and_dedups(ray_session, tmp_path):
    """Quality gate drops short/degenerate docs; exact dedup keeps the
    min-doc_id representative WITH its own metadata (argmin via packed
    key), rolled up per (lang, source)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.textpipe import clean_corpus

    good = " ".join(f"tok{i}" for i in range(20))      # passes the gate
    short = "too short"                                 # n_words < 10
    degenerate = " ".join("x" * 40 for _ in range(12))  # avg word len 40
    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([good, good, short, degenerate, good + " extra"]),
            "lang": pa.array(["en", "de", "en", "en", "en"]),
            "source": pa.array(["s1", "s2", "s1", "s1", "s1"]),
            "n_chars": pa.array([0] * 5, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = clean_corpus(str(tmp_path)).to_pandas().sort_values(
        ["lang", "source"]
    ).reset_index(drop=True)
    # doc 1 (de/s2) is the min-id representative of the duplicated good
    # text — doc 5's (en/s1) copy must NOT be counted; doc 4 is distinct
    assert out[["lang", "source"]].values.tolist() == [["de", "s2"], ["en", "s1"]]
    assert out["n_docs"].tolist() == [1, 1]
    assert out["n_tokens"].tolist() == [20, 21]


def test_decontaminate_ngram_planted(ray_session, tmp_path):
    """A train doc that quotes a full 8-gram from a val doc is flagged
    (per source); clean train docs are not — the Bloom prefilter's
    false positives must be removed by the exact verify join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.functions.textops import split_buckets
    from parallel_count_min_sketch_ray.pipelines.textpipe import decontaminate_ngram

    ids = np.arange(400, dtype=np.int64)
    buckets = split_buckets(ids)
    train_ids = ids[buckets < 90]
    val_ids = ids[buckets >= 90]
    assert len(val_ids) >= 2 and len(train_ids) >= 10

    rng = np.random.default_rng(3)
    texts = {
        int(i): " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, 30))
        for i in ids
    }
    # plant: train doc quotes words 5..12 (a full 8-gram) of a val doc
    leak_src, leak_dst = int(val_ids[0]), int(train_ids[0])
    quoted = " ".join(texts[leak_src].split()[5:13])
    texts[leak_dst] = texts[leak_dst] + " " + quoted
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array([texts[int(i)] for i in ids]),
            "source": pa.array(
                ["sA" if i % 2 == 0 else "sB" for i in ids], pa.string()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = decontaminate_ngram(str(tmp_path)).to_pandas()
    expect_source = "sA" if leak_dst % 2 == 0 else "sB"
    assert out["source"].tolist() == [expect_source]
    assert out["contaminated_docs"].tolist() == [1]
    # sharded-Bloom extreme-scale path: one filter per key % shards,
    # built through the keyed merge tree — output must be identical
    sharded = decontaminate_ngram(str(tmp_path), shards=4).to_pandas()
    assert sharded.equals(out)


def test_curate_corpus_antijoin_tier(ray_session, tmp_path):
    """Planted HIGH-contamination corpus: half the train docs quote a
    val doc's full 8-gram, so the candidate set is corpus-scale.  The
    anti-join tier (``mask_broadcast_limit=0`` forces it) must produce
    exactly the broadcast tier's rollup, and both must match a pure-
    Python recompute of the expected survivors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.functions.textops import split_buckets
    from parallel_count_min_sketch_ray.pipelines.textpipe import curate_corpus

    ids = np.arange(300, dtype=np.int64)
    buckets = split_buckets(ids)
    shared = " ".join(f"qq{i}" for i in range(8))  # the leaked 8-gram
    rng = np.random.default_rng(7)
    texts = []
    for i in ids:
        base = " ".join(f"w{int(x)}" for x in rng.integers(0, 100_000, 15))
        if buckets[i] >= 90 or i % 2 == 0:
            base = base + " " + shared
        texts.append(base)
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(
                ["sA" if i % 3 == 0 else "sB" for i in ids], pa.string()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    broad = (
        curate_corpus(str(tmp_path))
        .to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)
    )
    anti = (
        curate_corpus(str(tmp_path), mask_broadcast_limit=0)
        .to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)
    )
    assert anti.equals(broad)

    # expected: train-split docs (bucket < 90) not quoting the gram
    # (every text is distinct and passes the quality/repetition gates)
    exp: dict[tuple, list[int]] = {}
    for i in ids:
        if buckets[i] < 90 and i % 2 != 0:
            src = "sA" if i % 3 == 0 else "sB"
            exp.setdefault(("en", src), []).append(len(texts[i].split()))
    assert len(exp) > 0 and any(buckets[i] < 90 and i % 2 == 0 for i in ids)
    got = {
        (r.lang, r.source): (r.n_docs, r.n_tokens)
        for r in broad.itertuples()
    }
    assert got == {k: (len(v), sum(v)) for k, v in exp.items()}


def test_curate_and_write_flagship(ray_session, tmp_path):
    """End-to-end curate-and-write: the written corpus is exactly the
    curation survivors reduced to one representative per near-dup
    component (min doc_id), the manifest totals agree, and a rerun is
    idempotent — identical manifest, no partition rewritten."""
    import glob
    import os

    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.dedup import neardup_components
    from parallel_count_min_sketch_ray.pipelines.textpipe import (
        curate_and_write,
        curated_survivor_rows,
    )

    m1 = curate_and_write(SF_UNIT, out_root=str(tmp_path))
    assert (m1["n_docs"] > 0).any()
    files = sorted(glob.glob(str(tmp_path) + "/*/part=*/data-*.parquet"))
    assert files
    mtimes = {f: os.path.getmtime(f) for f in files}

    surv = curated_survivor_rows(SF_UNIT).to_pandas()
    comp = neardup_components(SF_UNIT)
    exp = set(surv.merge(comp, on="doc_id").groupby("rep_id")["doc_id"].min())
    written = set()
    for f in files:
        written |= set(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    assert written == exp
    assert int(m1["n_docs"].sum()) == len(exp)

    m2 = curate_and_write(SF_UNIT, out_root=str(tmp_path))
    assert m2.equals(m1)
    assert all(os.path.getmtime(f) == mtimes[f] for f in files)


def test_decontaminate_sharded_equals_single(ray_session):
    """The sharded-Bloom path is bit-identical to the single-filter
    path on the real corpus (the exact verify join strips each
    shard's false positives the same way)."""
    from parallel_count_min_sketch_ray.pipelines import textpipe

    single = textpipe.decontaminate_ngram(SF_UNIT).to_pandas()
    sharded = textpipe.decontaminate_ngram(SF_UNIT, shards=8).to_pandas()
    assert sharded.equals(single)


def test_simhash_signatures_vectorized_equals_loop():
    """The batch-vectorized SimHash kernel is bit-identical to the
    per-doc reference loop (unique-word term-frequency votes)."""
    from parallel_count_min_sketch_ray.functions.hashing import hash64_strings
    from parallel_count_min_sketch_ray.pipelines.dedup import simhash_signatures

    def per_doc(texts):
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            ws = t.split()
            if not ws:
                out[i] = 0
                continue
            uniq, counts = np.unique(np.array(ws, dtype=object), return_counts=True)
            h = hash64_strings(list(uniq))
            bits = (
                (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
            ).astype(np.int64)
            votes = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8)[::-1], bitorder="little"
            ).view(np.uint64)[0]
        return out

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(80)]
    texts = [
        " ".join(rng.choice(vocab, size=int(m)))
        for m in rng.integers(0, 90, size=300)
    ]
    texts += ["", "solo", "rep rep rep rep other"]
    assert np.array_equal(simhash_signatures(texts), per_doc(texts))


def test_events_asof_join_semantics(ray_session, tmp_path):
    """As-of semantics: latest right event with r.ts <= l.ts per user;
    exact tie matches; no prior right event -> -1 sentinels."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.analytics import events_asof_join

    us = lambda n: np.datetime64(n, "us")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array([us(100), us(50), us(150), us(150), us(10), us(5)],
                           pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "event_type": pa.array(
                ["click", "purchase", "click", "purchase", "click", "view"]
            ),
            "value": pa.array([1.0, 20.0, 3.0, 40.0, 5.0, 6.0], pa.float64()),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        events_asof_join(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1 (ts=100): purchase at 50 -> 20.0, gap 50us
    # event 3 (ts=150): purchase at 150 ties -> 40.0, gap 0
    # event 5 (user 8): no purchase -> sentinels
    assert out["event_id"].tolist() == [1, 3, 5]
    assert out["prev_purchase_value"].tolist() == [20.0, 40.0, -1.0]
    assert out["us_since_purchase"].tolist() == [50, 0, -1]


def test_events_range_join_semantics(ray_session, tmp_path):
    """Interval semantics: count right events with l.ts - 10min <=
    r.ts <= l.ts per user; window boundaries inclusive both ends."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.analytics import events_range_join

    m = 60_000_000  # one minute in us
    us = lambda n: np.datetime64(n, "us")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(
                [us(20 * m), us(20 * m - 10 * m), us(20 * m - 10 * m - 1),
                 us(20 * m), us(5), us(4)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([3, 3, 3, 3, 9, 9], pa.int64()),
            "event_type": pa.array(
                ["error", "click", "click", "click", "error", "view"]
            ),
            "value": pa.array([0.0] * 6, pa.float64()),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        events_range_join(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1: clicks at exactly -10min (in, inclusive), -10min-1us
    # (out), and 0 (in) -> 2; event 5 (user 9): no clicks -> 0
    assert out["event_id"].tolist() == [1, 5]
    assert out["n_right_in_window"].tolist() == [2, 0]


def test_embedding_near_dup_lsh_recall(ray_session):
    """LSH-bucketed near-dup (the scale path) finds most exact pairs
    and only true pairs (exact scoring within buckets)."""
    from parallel_count_min_sketch_ray.pipelines.ann import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    exact = embedding_near_dup(SF_UNIT, threshold=0.4)
    lsh = embedding_near_dup_lsh(SF_UNIT, threshold=0.4)
    ep = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    lp = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    assert ep, "exact oracle should find near-dup pairs"
    assert lp <= ep  # precision 1.0: in-bucket scoring is exact
    assert len(lp & ep) / len(ep) >= 0.5


def test_driver_contract_consistency():
    """Every oracle_sql key has a queries() entry; callables are
    importable; no duplicate names."""
    from parallel_count_min_sketch_ray import entry as em

    q = em.queries()
    o = em.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    assert all(callable(fn) for fn in q.values())
    # oracle coverage should not silently shrink
    assert len(o) >= 29
    assert len(q) >= 45


def test_source_ntok_quantiles(ray_session):
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        source_ntok_quantiles,
    )

    out = source_ntok_quantiles(SF_UNIT)
    assert len(out) > 0
    assert (out["p50"] <= out["p90"]).all() and (out["p90"] <= out["p99"]).all()
    assert (out["n_docs"] > 0).all()


def test_ngram_jaccard_max_df_drops_hot_shingles(ray_session, tmp_path):
    """The documented approximation knob: shingles whose document
    frequency exceeds max_df are dropped from the inverted index, so
    pairs supported ONLY by hot shingles disappear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.dedup import ngram_jaccard_pairs

    hot = "common shared phrase"  # one 3-shingle present in every doc
    texts = [f"{hot} unique{i} filler{i} tail{i}" for i in range(6)]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 6),
            "source": pa.array(["s"] * 6),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    full = ngram_jaccard_pairs(str(tmp_path), threshold=0.05)
    capped = ngram_jaccard_pairs(str(tmp_path), threshold=0.05, max_df=3)
    assert len(full) == 15  # all pairs share the hot shingle
    assert len(capped) == 0  # hot shingle dropped -> no support left


def test_join_partitions_derivation(ray_session):
    from parallel_count_min_sketch_ray.pipelines.analytics import _join_partitions

    small = _join_partitions("/root/testdata/sf0.01", ["lineitem", "orders"])
    assert small == 2  # ~1.4 MB -> floor of 2
    tiny_bpp = _join_partitions(
        "/root/testdata/sf0.01", ["lineitem", "orders"], bytes_per_partition=64 << 10
    )
    assert tiny_bpp > small  # scales with bytes/partition target


def test_distributed_accuracy_report_matches_driver_side(ray_session):
    """validate_cms_distributed returns the same seven scalars as the
    in-memory validate_cms over the same vocabulary."""
    from parallel_count_min_sketch_ray.functions.hashing import djb2
    from parallel_count_min_sketch_ray.pipelines.analytics import token_counts
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import build_all
    from parallel_count_min_sketch_ray.state.validate import (
        validate_cms,
        validate_cms_distributed,
    )

    cms = build_all(SF_UNIT)["cms"]
    dist = validate_cms_distributed(cms, token_counts(SF_UNIT), strict=True)
    oracle = token_counts(SF_UNIT).to_pandas()
    ids = np.array([djb2(w) & 0x7FFFFFFF for w in oracle["token"]], dtype=np.int64)
    mem = validate_cms(cms, ids, oracle["cnt"].to_numpy(), strict=True)
    assert dist.as_dict() == mem.as_dict()


def test_asof_range_vectorized_match_per_user_reference(ray_session, tmp_path):
    """The bucket-vectorized as-of / interval merges must agree with
    straightforward per-user searchsorted references on a randomized
    corpus (many users per bucket, duplicate timestamps, empty sides)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        events_asof_join,
        events_range_join,
    )

    rng = np.random.default_rng(17)
    n = 4000
    ts = rng.integers(0, 5_000_000, size=n) * 1000  # deliberate ts ties
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 200, size=n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["click", "purchase", "error", "view"], size=n)
            ),
            "value": pa.array(np.round(rng.random(n) * 99, 2), pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = t.to_pandas()
    df["tsi"] = df["ts"].astype("int64")

    # reference: per-user sorted searchsorted
    want_asof = {}
    want_range = {}
    for uid, g in df.groupby("user_id"):
        right = g[g["event_type"] == "purchase"].sort_values(["tsi", "event_id"])
        rts = right["tsi"].to_numpy()
        for _, l in g[g["event_type"] == "click"].iterrows():
            i = np.searchsorted(rts, l["tsi"], side="right") - 1
            want_asof[int(l["event_id"])] = (
                (float(right["value"].to_numpy()[i]), int(l["tsi"] - rts[i]))
                if i >= 0
                else (-1.0, -1)
            )
        crts = np.sort(g.loc[g["event_type"] == "click", "tsi"].to_numpy())
        for _, l in g[g["event_type"] == "error"].iterrows():
            hi = np.searchsorted(crts, l["tsi"], side="right")
            lo = np.searchsorted(crts, l["tsi"] - 600_000_000, side="left")
            want_range[int(l["event_id"])] = int(hi - lo)

    got_a = events_asof_join(str(tmp_path)).to_pandas()
    assert len(got_a) == len(want_asof)
    for r in got_a.itertuples():
        assert (r.prev_purchase_value, r.us_since_purchase) == want_asof[r.event_id]
    got_r = events_range_join(str(tmp_path)).to_pandas()
    assert len(got_r) == len(want_range)
    for r in got_r.itertuples():
        assert r.n_right_in_window == want_range[r.event_id]


def test_union_find_components_basic():
    import pandas as pd

    from parallel_count_min_sketch_ray.pipelines.dedup import (
        union_find_components,
    )

    # chain 1-2-3, pair 10-11 (via 12 bridging order), singleton 99 absent
    pairs = pd.DataFrame(
        {"doc_a": [2, 1, 10, 12], "doc_b": [3, 2, 12, 11]}
    )
    rep = union_find_components(pairs)
    assert rep[1] == rep[2] == rep[3] == 1
    assert rep[10] == rep[11] == rep[12] == 10
    assert 99 not in rep
    assert union_find_components(pairs.iloc[:0]) == {}


def test_neardup_components_planted(ray_session, planted_corpus):
    """Planted near-dup pairs collapse to one representative each;
    every other doc represents itself; rep is the component min."""
    from parallel_count_min_sketch_ray.pipelines.dedup import (
        neardup_components,
        ngram_jaccard_pairs_exact,
    )

    d, t = planted_corpus
    out = neardup_components(d, threshold=0.5)
    assert len(out) == t.num_rows
    exact = ngram_jaccard_pairs_exact(
        t["text"].to_pylist(), t["doc_id"].to_numpy(), threshold=0.5
    )
    paired = set(exact["doc_a"]) | set(exact["doc_b"])
    by_id = dict(zip(out["doc_id"], out["rep_id"]))
    for a, b in zip(exact["doc_a"], exact["doc_b"]):
        assert by_id[a] == by_id[b]  # same component
        assert by_id[a] <= min(a, b)  # rep is a min
    for doc in by_id:
        if doc not in paired:
            assert by_id[doc] == doc  # untouched docs keep themselves


def test_label_propagation_matches_union_find(ray_session):
    """The distributed hash-min label propagation (the documented scale
    path) computes the same components as driver-side union-find,
    including a long chain (propagation needs multiple rounds)."""
    import pandas as pd

    from parallel_count_min_sketch_ray.pipelines.dedup import (
        label_propagation_components,
        union_find_components,
    )

    rng = np.random.default_rng(11)
    # a 30-node chain + random clusters
    chain = [(i, i + 1) for i in range(100, 130)]
    clusters = [(int(a), int(b)) for a, b in rng.integers(0, 60, size=(40, 2)) if a != b]
    pairs = pd.DataFrame(chain + clusters, columns=["doc_a", "doc_b"])
    uf = union_find_components(pairs)
    lp = label_propagation_components(pairs)
    assert lp == uf
    assert label_propagation_components(pairs.iloc[:0]) == {}


def test_source_shingle_overlap_vs_exact(ray_session, con):
    """KMV pairwise source-overlap estimates track the exact shingle-set
    relations within the sampling tolerance, for every source pair."""
    from parallel_count_min_sketch_ray.pipelines.dedup import shingle_hashes
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        source_shingle_overlap,
    )

    est = source_shingle_overlap(SF_UNIT, k=1024)
    docs = con.sql("SELECT source, text FROM documents").fetchall()
    per_source: dict[str, set] = {}
    for src, text in docs:
        hs = shingle_hashes([text], 3)[0]
        per_source.setdefault(src, set()).update(int(h) for h in hs)
    k = 1024
    for _, row in est.iterrows():
        a, b = per_source[row["source_a"]], per_source[row["source_b"]]
        union, inter = len(a | b), len(a & b)
        true_j = inter / union if union else 0.0
        sigma = np.sqrt(max(true_j * (1 - true_j), 0.25 / k) / k)
        assert abs(row["jaccard_est"] - true_j) <= 5 * sigma + 1e-6, (
            row["source_a"], row["source_b"])
        if union:
            assert abs(row["union_est"] - union) / union <= 5 / np.sqrt(k - 2)
    assert len(est) == len(per_source) * (len(per_source) - 1) // 2


def test_doc_weighted_sample_distributed_equals_local(ray_session, con):
    """A-ES weighted sample: the distributed build (per-block partials,
    arbitrary merge order) is bit-identical to a local single pass over
    the same (doc_id, n_tok) pairs."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        SEED,
        doc_weighted_sample,
    )
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    got = doc_weighted_sample(SF_UNIT)
    local_rows = con.sql(
        "SELECT doc_id, len(list_filter(string_split(text, ' '), "
        "x -> x <> '')) AS n_tok FROM documents"
    ).df()
    sk = WeightedReservoir(k=64, seed=SEED)
    w = local_rows["n_tok"].to_numpy().astype(np.float64)
    ids = local_rows["doc_id"].to_numpy().astype(np.int64)
    sk.update(ids[w > 0], w[w > 0])
    keys, weights = sk.sample_table()
    assert np.array_equal(got["doc_id"].to_numpy(), keys)
    assert np.array_equal(got["weight_n_tok"].to_numpy(), weights)


def test_source_weighted_sample_distributed_equals_local(ray_session, con):
    """Stratified A-ES: each source's distributed sample is bit-equal
    to a local single pass over that source's (doc_id, n_tok) pairs."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        SEED,
        source_weighted_sample,
    )
    from parallel_count_min_sketch_ray.state.ares import WeightedReservoir

    got = source_weighted_sample(SF_UNIT, k=8)
    local = con.sql(
        "SELECT source, doc_id, len(list_filter(string_split(text, ' '), "
        "x -> x <> '')) AS n_tok FROM documents"
    ).df()
    for source, g in local.groupby("source"):
        sk = WeightedReservoir(k=8, seed=SEED)
        w = g["n_tok"].to_numpy().astype(np.float64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        sk.update(ids[w > 0], w[w > 0])
        keys, weights = sk.sample_table()
        sub = got[got["source"] == source]
        assert np.array_equal(sub["doc_id"].to_numpy(), keys), source
        assert np.array_equal(sub["weight_n_tok"].to_numpy(), weights), source


def test_train_event_model_deterministic_and_converges(ray_session):
    """Distributed GD loop: loss strictly decreases from ln(2), and
    rerunning the whole pipeline reproduces the weights bit-for-bit
    (the sorted-partial summation fixes float association even though
    Ray returns blocks in nondeterministic order)."""
    from parallel_count_min_sketch_ray.pipelines.ml import train_event_model

    t1 = train_event_model(SF_UNIT, iters=8)
    assert t1["mean_loss"].iloc[0] == pytest.approx(np.log(2.0), abs=1e-12)
    assert (np.diff(t1["mean_loss"].to_numpy()) < 0).all()
    t2 = train_event_model(SF_UNIT, iters=8)
    pd.testing.assert_frame_equal(t1, t2, check_exact=True)


def test_weekly_distinct_users_window_merge(ray_session, con):
    """Sliding-window sketch algebra: merged 7-day HLLs track the exact
    7-day distinct counts within the HLL error envelope, and reuse the
    same per-day state as the daily query (one build, many windows)."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        weekly_distinct_users,
    )

    df = weekly_distinct_users(SF_UNIT)
    assert len(df) >= 1
    ex = con.sql(
        "SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events"
    ).df()
    for row in df.itertuples():
        mask = (ex["day"] >= row.window_start) & (ex["day"] <= row.window_end)
        true = ex.loc[mask, "user_id"].nunique()
        assert abs(row.distinct_users_estimate - true) <= max(0.07 * true, 3), (
            row.window_start,
            row.distinct_users_estimate,
            true,
        )


def test_cms_inner_product_vs_exact_joinsize(ray_session, con):
    """The CMS inner-product estimate brackets the exact Σ f_a·f_b:
    one-sided (estimate ≥ exact) and within the published
    ε·N_a·N_b bound — the estimate↔exact pairing for the reference's
    join-size operator (src/core/count_min_sketch.c:65-83)."""
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        source_token_joinsize,
    )
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        cms_inner_product_sources,
    )

    exact = int(source_token_joinsize(SF_UNIT)["join_size"].iloc[0])
    est_row = cms_inner_product_sources(SF_UNIT).iloc[0]
    est = float(est_row["inner_product_estimate"])
    assert est >= exact
    eps = 0.001  # the build's configured epsilon
    assert est <= exact + eps * float(est_row["total_a"]) * float(
        est_row["total_b"]
    )


def test_bloom_semijoin_bounds(ray_session, con):
    """Bloom pushdown never loses a match (no false negatives) and
    overshoots by at most ~fp_rate of the non-matching rows; the exact
    count matches the SQL semi-join."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        bloom_semijoin_count,
    )

    row = bloom_semijoin_count(SF_UNIT).iloc[0]
    exact_sql = con.sql(
        "SELECT COUNT(*) FROM lineitem l WHERE EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT')"
    ).fetchone()[0]
    assert int(row["exact_semijoin_count"]) == exact_sql
    assert int(row["bloom_semijoin_count"]) >= exact_sql
    non_matching = int(row["n_lineitems"]) - exact_sql
    # 5x headroom on the configured rate absorbs small-sample variance
    assert int(row["bloom_semijoin_count"]) - exact_sql <= max(
        5 * row["configured_fp_rate"] * non_matching, 5
    )


def test_bloom_semijoin_large_side_branch(ray_session):
    """The scale path (build side above the broadcast threshold): no
    driver key-set materialization — the Bloom pre-filters the probe
    side and a distributed hash semi-join supplies the exact count.
    Both tiers must return identical numbers on the same input."""
    from parallel_count_min_sketch_ray.pipelines.sketch_queries import (
        bloom_semijoin_count,
    )

    small = bloom_semijoin_count(SF_UNIT).iloc[0]
    large = bloom_semijoin_count(SF_UNIT, broadcast_threshold=0).iloc[0]
    assert int(large["exact_semijoin_count"]) == int(small["exact_semijoin_count"])
    assert int(large["bloom_semijoin_count"]) == int(small["bloom_semijoin_count"])
    assert int(large["n_lineitems"]) == int(small["n_lineitems"])


def test_pii_scrub_planted_fixture(ray_session, tmp_path):
    """The sf tables contain no PII-shaped strings, so the driver row
    only exercises the zero-match path; this fixture plants emails,
    IPv4s and phone numbers (including the adversarial email-wrapping-
    an-IP case and non-ASCII text, which checks character-vs-byte
    length semantics) and requires the Ray pipeline to match the SAME
    oracle SQL the driver runs."""
    from parallel_count_min_sketch_ray import entry as em
    from parallel_count_min_sketch_ray.pipelines import textpipe

    texts = [
        "contact a.b+c@ex-ample.org or admin@x.io now",
        "server at 10.0.0.1 and 192.168.255.254, call +1 555 123 4567",
        "overlap user@1.2.3.4.com then bare 1.2.3.4",
        "phones +44-207-946-0958 and +1 555 000 1234",
        "café über no pii here",
        "",
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    res = _canon(_to_pandas(textpipe.pii_scrub(str(tmp_path))))
    # planted counts actually fired (guards against a pattern typo
    # making the oracle comparison vacuously all-zero)
    assert res["n_emails"].sum() == 3
    # doc 1's two servers + doc 2's "1.2.3.4" BOTH inside the email
    # domain and bare (counts run on the original text)
    assert res["n_ips"].sum() == 4
    assert res["n_phones"].sum() == 3

    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = _canon(c.sql(em.oracle_sql()["pii_scrub"]).df())
    pd.testing.assert_frame_equal(res, ora, check_dtype=True)

    # the write-path variant keeps the redacted text; replacement order
    # (email -> ip -> phone) means the IP inside the email is gone
    red = (
        textpipe.pii_scrub_text(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    assert red[2] == "overlap <EMAIL> then bare <IP>"
    assert red[1] == "server at <IP> and <IP>, call <PHONE>"
    assert red[4] == texts[4]


def test_dup_ngram_coverage_planted_multiblock(ray_session, tmp_path):
    """Semantics the sf tables can't isolate: a window repeated twice
    WITHIN one doc is not corpus-duplicated (distinct-doc count = 1),
    while the same window appearing in two docs — here in two separate
    parquet FILES, so the partials cross batch boundaries — is.  Short
    docs (< 8 words) contribute nothing."""
    import pyarrow.parquet as pq2
    from parallel_count_min_sketch_ray import entry as em
    from parallel_count_min_sketch_ray.pipelines.textpipe import (
        dup_ngram_coverage,
    )

    x = "a b c d e f g h"  # the shared 8-gram
    d = tmp_path / "documents.parquet"
    d.mkdir()
    parts = [
        # doc 0: x appears twice within ONE doc (plus bridging windows)
        [(0, "s1", f"{x} {x}")],
        # doc 1 (other file/batch): x once -> now duplicated corpus-wide
        [(1, "s2", f"{x} tail9 tail10")],
        # doc 2: all-unique windows; doc 3: too short to shingle;
        # doc 4: exactly x -> dup_fraction 1.0, the flagged case
        [
            (2, "s1", "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (3, "s2", "tiny doc"),
            (4, "s3", x),
        ],
    ]
    for i, rows in enumerate(parts):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        pq2.write_table(tbl, str(d / f"part{i}.parquet"))

    res = _canon(_to_pandas(dup_ngram_coverage(str(tmp_path))))
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    ora = _canon(c.sql(em.oracle_sql()["dup_ngram_coverage"]).df())
    pd.testing.assert_frame_equal(res, ora, check_dtype=True)

    r = res.set_index("source")
    # s1: doc0 has 9 windows (len 16), doc2 has 2 -> 11 total; only the
    # two in-doc copies of x are corpus-duplicated (docs 1 and 4 too)
    assert int(r.loc["s1", "n_shingles"]) == 11
    assert int(r.loc["s1", "dup_shingles"]) == 2
    # s2: doc1 has 3 windows, exactly one of which is x; doc3 none
    assert int(r.loc["s2", "n_shingles"]) == 3
    assert int(r.loc["s2", "dup_shingles"]) == 1
    # s3: doc4 IS x — its single window is duplicated
    assert int(r.loc["s3", "dup_shingles"]) == 1

    # doc-level view over the same fixture, same oracle discipline
    from parallel_count_min_sketch_ray.pipelines.textpipe import doc_dup_stats

    dd = _to_pandas(doc_dup_stats(str(tmp_path)))
    ddo = c.sql(em.oracle_sql()["doc_dup_stats"]).df()
    pd.testing.assert_frame_equal(_canon(dd), _canon(ddo), check_dtype=True)
    by_doc = dd.set_index("doc_id")
    assert int(by_doc.loc[0, "n_windows"]) == 9
    assert int(by_doc.loc[0, "dup_windows"]) == 2  # both in-doc copies of x
    assert not bool(by_doc.loc[0, "flagged"])  # 2/9 < 0.5
    assert int(by_doc.loc[1, "dup_windows"]) == 1
    assert bool(by_doc.loc[4, "flagged"])  # 1/1 > 0.5
    assert 3 not in by_doc.index  # short docs emit nothing


def test_large_volume_orders_empty_threshold(ray_session):
    """A threshold above every order's total quantity exercises the
    empty-winners guard (the join kernels reject a schema-less side)."""
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        large_volume_orders,
    )

    out = _to_pandas(large_volume_orders(SF_UNIT, qty_threshold=10**9))
    assert len(out) == 0
    assert list(out.columns) == [
        "o_orderkey", "o_orderdate", "o_totalprice",
        "total_qty", "c_custkey", "c_name",
    ]


def test_nation_trade_volume_empty_window(ray_session):
    """A ship window before the data exercises the no-matching-trade
    guard: empty frame, stable schema and dtypes."""
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        nation_trade_volume,
    )

    out = _to_pandas(
        nation_trade_volume(SF_UNIT, ship_lo="1990-01-01", ship_hi="1990-02-01")
    )
    assert len(out) == 0
    # unknown nation name: empty frame (the oracle's join yields no
    # rows), never a KeyError before the guard
    unk = _to_pandas(nation_trade_volume(SF_UNIT, nation_a="NATION_99"))
    assert len(unk) == 0
    assert list(out.columns) == [
        "supp_nation", "cust_nation", "l_year", "n_items", "revenue",
    ]
    assert str(out["l_year"].dtype) == "int64"
    assert str(out["revenue"].dtype) == "float64"


def test_customer_order_distribution_zero_bucket(ray_session, con):
    """The LEFT OUTER JOIN's defining output: every customer lands in
    exactly one bucket (custdist sums to |customer|), and with no
    order excluded the zero bucket is exactly the customers that have
    NO orders at all."""
    import pyarrow.parquet as pq_

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        customer_order_distribution,
    )

    n_cust = pq_.read_metadata(f"{SF_UNIT}/customer.parquet").num_rows
    # an exclude value no order carries keeps EVERY order in the count
    out = _to_pandas(
        customer_order_distribution(SF_UNIT, exclude_priority="NO-SUCH")
    ).set_index("c_count")
    assert int(out["custdist"].sum()) == n_cust
    no_orders = con.sql(
        "SELECT COUNT(*) FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ).fetchone()[0]
    got_zero = int(out.loc[0, "custdist"]) if 0 in out.index else 0
    assert got_zero == no_orders


def test_small_quantity_revenue_unknown_brand(ray_session):
    """A brand with no parts exercises the empty-broadcast guard:
    one row, 0.0 (the oracle's COALESCE does the same)."""
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        small_quantity_revenue,
    )

    out = _to_pandas(small_quantity_revenue(SF_UNIT, brand="Brand#NO"))
    assert len(out) == 1
    assert float(out["avg_yearly"].iloc[0]) == 0.0


def test_top_supplier_revenue_empty_quarter(ray_session):
    """A quarter before the data exercises the no-winners guard:
    empty frame, stable schema."""
    from parallel_count_min_sketch_ray.pipelines.analytics import (
        top_supplier_revenue,
    )

    out = _to_pandas(top_supplier_revenue(SF_UNIT, q_start="1990-01-01"))
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue"]


def test_market_share_guards(ray_session):
    """Unknown region and unknown part type both exercise the
    empty-broadcast early returns with a stable schema; a target
    nation outside the data yields share 0.0 for every year (the
    denominator — the region's whole market — is unchanged)."""
    from parallel_count_min_sketch_ray.pipelines.analytics import market_share

    for kw in ({"region": "NOWHERE"}, {"part_type": "NO-TYPE"}):
        out = _to_pandas(market_share(SF_UNIT, **kw))
        assert len(out) == 0
        assert list(out.columns) == ["o_year", "mkt_share"]
    zero = _to_pandas(market_share(SF_UNIT, target_nation="NATION_NONE"))
    assert len(zero) > 0
    assert (zero["mkt_share"] == 0.0).all()


def test_dedup_windows_rewrite_planted(ray_session, tmp_path):
    """Exact substring-dedup rewrite semantics on a planted corpus:
    corpus-first occurrence survives, later cross-doc AND intra-doc
    occurrences drop their 8 tokens, overlapping drops merge, short
    docs pass through — asserted explicitly AND against the DuckDB
    oracle on the same fixture."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from parallel_count_min_sketch_ray import entry as em
    from parallel_count_min_sketch_ray.pipelines.textpipe import (
        dedup_windows_rewrite,
    )

    X = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = [
        (0, "p1 p2 " + X),       # owner of X (first occurrence corpus-wide)
        (1, X + " q1 q2"),       # cross-doc dup: loses X's 8 tokens
        (2, "short doc here"),   # < 8 words: untouched
        (3, X + " " + X),        # both occurrences are dups: empties out
    ]
    d = tmp_path / "documents.parquet"
    pq2.write_table(
        pa2.table(
            {
                "doc_id": pa2.array([r[0] for r in docs], pa2.int64()),
                "text": pa2.array([r[1] for r in docs], pa2.string()),
            }
        ),
        str(d),
    )
    res = _to_pandas(dedup_windows_rewrite(str(tmp_path))).set_index("doc_id")
    assert res.loc[0, "text_clean"] == "p1 p2 " + X
    assert res.loc[1, "text_clean"] == "q1 q2"
    assert res.loc[2, "text_clean"] == "short doc here"
    assert res.loc[3, "text_clean"] == ""
    assert int(res.loc[3, "n_tok"]) == 16 and int(res.loc[3, "n_tok_clean"]) == 0

    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}')")
    ora = _canon(c.sql(em.oracle_sql()["dedup_windows_rewrite"]).df())
    pd.testing.assert_frame_equal(
        _canon(res.reset_index()), ora, check_dtype=True
    )


def test_dedup_windows_rewrite_clean_corpus(ray_session, tmp_path):
    """The COMMON clean-corpus cases must pass through, not crash: a
    fully-unique corpus (no duplicated window anywhere) and an
    all-short-docs corpus both produce an empty mask side, which the
    join kernel would reject schema-less."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from parallel_count_min_sketch_ray.pipelines.textpipe import (
        dedup_windows_rewrite,
    )

    uniq = [
        (0, " ".join(f"u{i}" for i in range(12))),
        (1, " ".join(f"v{i}" for i in range(12))),
        (2, "too short"),
    ]
    d = tmp_path / "documents.parquet"
    pq2.write_table(
        pa2.table(
            {
                "doc_id": pa2.array([r[0] for r in uniq], pa2.int64()),
                "text": pa2.array([r[1] for r in uniq], pa2.string()),
            }
        ),
        str(d),
    )
    res = _to_pandas(dedup_windows_rewrite(str(tmp_path))).set_index("doc_id")
    assert len(res) == 3
    for i, t in uniq:
        assert res.loc[i, "text_clean"] == t
        assert int(res.loc[i, "n_tok"]) == int(res.loc[i, "n_tok_clean"])


def test_customer_order_distribution_all_excluded(ray_session, tmp_path):
    """Excluding EVERY order (all rows carry the excluded priority)
    empties the join's right side; the answer is the single all-zero
    bucket, not an ArrowInvalid from a schema-less join input."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from parallel_count_min_sketch_ray.pipelines.analytics import (
        customer_order_distribution,
    )

    pq2.write_table(
        pa2.table({"c_custkey": pa2.array([1, 2, 3], pa2.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq2.write_table(
        pa2.table(
            {
                "o_custkey": pa2.array([1, 1, 2], pa2.int64()),
                "o_orderpriority": pa2.array(["1-URGENT"] * 3, pa2.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = _to_pandas(customer_order_distribution(str(tmp_path)))
    assert len(out) == 1
    assert int(out["c_count"].iloc[0]) == 0
    assert int(out["custdist"].iloc[0]) == 3
