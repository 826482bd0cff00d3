"""Driver contract implementation: entry(), queries(), oracle_sql().

Each SQL-expressible query pairs a Ray Data pipeline with an
equivalent DuckDB statement over the same parquet views; column names
and dtypes match exactly (integer-cents arithmetic keeps float sums
bit-comparable).  Sketch-estimate queries are deterministic but not
SQL-expressible → no oracle entry (driver records rows-only; bounds
are asserted in pytest).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from parallel_count_min_sketch_ray.pipelines import (
    analytics,
    ann,
    dedup,
    ml,
    sketch_queries,
    textpipe,
)


def _corpus_write_lineage(sf_dir: str):
    from parallel_count_min_sketch_ray.pipelines.io import corpus_write_lineage

    return corpus_write_lineage(sf_dir)


def _range_partitioned_write(sf_dir: str):
    from parallel_count_min_sketch_ray.pipelines.io import range_partitioned_write

    return range_partitioned_write(sf_dir)


def _media_decode_stats(sf_dir: str):
    from parallel_count_min_sketch_ray.pipelines.multimodal import media_decode_stats

    return media_decode_stats(sf_dir)


def _media_near_dup(sf_dir: str):
    from parallel_count_min_sketch_ray.pipelines.multimodal import media_near_dup

    return media_near_dup(sf_dir)


def entry() -> Any:
    """Flagship: single-pass CMS+HLL+KLL+Bloom over tokenized documents
    at sf0.001; returns a summary DataFrame (stable schema)."""
    import numpy as np
    import pandas as pd

    rep = sketch_queries.build_all("/root/testdata/sf0.001")
    cms, hll, kll, bloom = rep["cms"], rep["hll"], rep["kll"], rep["bloom"]
    rows = [
        ("rows", float(rep.rows)),
        ("tokens", float(rep.items["cms"])),
        ("cms_total", float(cms.total)),
        ("cms_error_bound", float(cms.error_bound())),
        ("hll_distinct_tokens", float(hll.estimate())),
        ("kll_ntok_p50", float(kll.quantile(0.5))),
        ("kll_ntok_p99", float(kll.quantile(0.99))),
        ("bloom_fill_ratio", float(bloom.fill_ratio())),
        ("wall_time_sec", float(rep.wall_time)),
    ]
    return pd.DataFrame(rows, columns=["metric", "value"]).astype(
        {"metric": str, "value": np.float64}
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """Driver-checked queries.

    ORDER MATTERS: the driver's correctness harness checks the FIRST
    ~50 entries per round, so entries are ordered by DRIVER-ROW AGE
    (VERDICT r4 "Next round" #2): the 22 oracle queries whose latest
    green rows are r03-era come first, then the round-5 additions,
    then the 19 queries last driver-checked in r02, then a few r04
    oracle rows to fill the window; everything below the ~50 cap was
    driver-checked green in r04.
    """
    return {
        # --- oracle-checked, stalest driver rows (r03-era code) ---
        "token_counts": analytics.token_counts,
        "token_totals": analytics.token_totals,
        "heavy_hitters": analytics.heavy_hitters,
        "events_hourly": analytics.events_hourly,
        "events_lag": analytics.events_lag,
        "events_sessions": analytics.events_sessions,
        "events_sliding": analytics.events_sliding,
        "events_asof_join": analytics.events_asof_join,
        "events_range_join": analytics.events_range_join,
        "events_props_stats": analytics.events_props_stats,
        "events_value_stats": analytics.events_value_stats,
        "top_users_by_value": analytics.top_users_by_value,
        "orders_by_segment": analytics.orders_by_segment,
        "orders_by_region": analytics.orders_by_region,
        "order_lineitem_join": analytics.order_lineitem_join,
        "brand_nation_revenue": analytics.brand_nation_revenue,
        "pricing_summary": analytics.pricing_summary,
        "distinct_users": analytics.distinct_users,
        "dedup_exact": analytics.dedup_exact,
        "clean_corpus": textpipe.clean_corpus,
        "token_count_regex": textpipe.token_count_regex,
        "source_token_totals": analytics.source_token_totals,
        # --- NEW in round 5 (rows-only; contracts asserted in pytest) ---
        "curate_and_write": textpipe.curate_and_write,
        "semantic_dedup": ann.semantic_dedup,
        "incremental_append_build": sketch_queries.incremental_append_build,
        "ddsketch_type_value_quantiles": (
            sketch_queries.ddsketch_type_value_quantiles
        ),
        "label_principal_directions": sketch_queries.label_principal_directions,
        # NEW in round 5, oracle-checked: PII redaction audit +
        # substring-dup coverage (Lee et al. 2022 measurement)
        "pii_scrub": textpipe.pii_scrub,
        "dup_ngram_coverage": textpipe.dup_ngram_coverage,
        "large_volume_orders": analytics.large_volume_orders,
        "doc_dup_stats": textpipe.doc_dup_stats,
        # NEW in round-5 session 2, oracle-checked: TPC-H Q6/Q14/Q4/Q19
        "forecast_revenue": analytics.forecast_revenue,
        "promo_revenue": analytics.promo_revenue,
        "order_priority_check": analytics.order_priority_check,
        "discounted_revenue": analytics.discounted_revenue,
        # NEW in round-5 session 3, oracle-checked: TPC-H Q13/Q7/Q17/Q15/Q8
        "customer_order_distribution": analytics.customer_order_distribution,
        "nation_trade_volume": analytics.nation_trade_volume,
        "small_quantity_revenue": analytics.small_quantity_revenue,
        "top_supplier_revenue": analytics.top_supplier_revenue,
        "market_share": analytics.market_share,
        # NEW in round-5 session 3: the substring-dedup REWRITE step
        # (dup_ngram_coverage / doc_dup_stats measure; this removes)
        "dedup_windows_rewrite": textpipe.dedup_windows_rewrite,
        # --- rows-only queries last driver-checked in r02 ---
        "cms_word_estimates": sketch_queries.cms_word_estimates,
        "hll_distinct_words": sketch_queries.hll_distinct_words,
        "kll_ntok_quantiles": sketch_queries.kll_ntok_quantiles,
        "topk_words": sketch_queries.topk_words,
        "cms_accuracy_report": sketch_queries.cms_accuracy_report,
        "cms_inner_product_sources": sketch_queries.cms_inner_product_sources,
        "bloom_doc_membership": sketch_queries.bloom_doc_membership,
        "source_distinct_tokens": sketch_queries.source_distinct_tokens,
        "source_ntok_quantiles": sketch_queries.source_ntok_quantiles,
        "doc_sample_kmv": sketch_queries.doc_sample_kmv,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,  # LSH recall in pytest
        "simhash_pairs": dedup.simhash_pairs,
        "ann_lsh_topk": ann.ann_lsh_topk,
        "ann_ivf_topk": ann.ann_ivf_topk,
        "embedding_near_dup_lsh": ann.embedding_near_dup_lsh,
        "media_decode_stats": _media_decode_stats,
        "sketch_checkpoint_lineage": sketch_queries.checkpointed_lineage,
        "corpus_write_lineage": _corpus_write_lineage,
        "doc_fingerprints": textpipe.doc_fingerprints,
        # --- r04-checked oracle queries filling the ~50 window ---
        "doc_token_stats": analytics.doc_token_stats,
        "lang_source_counts": analytics.lang_source_counts,
        "token_f2": analytics.token_f2,
        "top_terms_per_source": analytics.top_terms_per_source,
        # ^ cap boundary (~54 entries above — the session-3
        # Q13/Q7/Q17/Q15/Q8 + dedup_windows_rewrite additions push the
        # tail slightly past ~50; everything at or below this line had
        # a green driver row from r04 code, so nothing unverified can
        # fall outside the window)
        "bigram_counts": analytics.bigram_counts,
        "doc_top_tfidf": analytics.doc_top_tfidf,
        "doc_split_stats": analytics.doc_split_stats,
        "per_source_cap": analytics.per_source_cap,
        "source_mixture_sample": analytics.source_mixture_sample,
        "repetition_stats": textpipe.repetition_stats,
        "decontaminate_ngram": textpipe.decontaminate_ngram,
        "curate_corpus": textpipe.curate_corpus,
        "events_value_hour_corr": analytics.events_value_hour_corr,
        "events_rollup": analytics.events_rollup,
        "events_cume_dist": analytics.events_cume_dist,
        "signup_conversion": analytics.signup_conversion,
        "customers_without_orders": analytics.customers_without_orders,
        "shipping_priority": analytics.shipping_priority,
        "events_value_median": analytics.events_value_median,
        "pack_contexts": analytics.pack_contexts,
        "daily_retention": analytics.daily_retention,
        "customer_running_spend": analytics.customer_running_spend,
        "source_distinct_exact": analytics.source_distinct_exact,
        "events_value_histogram": analytics.events_value_histogram,
        "bigram_lift": analytics.bigram_lift,
        "events_type_pivot": analytics.events_type_pivot,
        "source_token_set_ops": analytics.source_token_set_ops,
        "source_chars_stats": analytics.source_chars_stats,
        "events_moving_avg": analytics.events_moving_avg,
        "events_time_window_sum": analytics.events_time_window_sum,
        "doc_perplexity": textpipe.doc_perplexity,
        "bm25_topk": textpipe.bm25_topk,
        "events_value_ntile": analytics.events_value_ntile,
        "local_supplier_volume": analytics.local_supplier_volume,
        "curate_by_perplexity": textpipe.curate_by_perplexity,
        "chunk_documents": textpipe.chunk_documents,
        "source_fertility": textpipe.source_fertility,
        "returned_item_revenue": analytics.returned_item_revenue,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "neardup_components": dedup.neardup_components,
        "lang_quality": textpipe.lang_quality,
        "ann_topk": ann.ann_topk,
        "embedding_norms": ann.embedding_norms,
        "embedding_near_dup": ann.embedding_near_dup,
        "corpus_sample": analytics.corpus_sample,
        "events_outliers": analytics.events_outliers,
        "events_value_quantiles": analytics.events_value_quantiles,
        "events_user_seq": analytics.events_user_seq,
        "source_oov_rate": analytics.source_oov_rate,
        "source_token_joinsize": analytics.source_token_joinsize,
        # --- sketch estimates (deterministic, rows-only, r04-checked) ---
        "countsketch_word_estimates": sketch_queries.countsketch_word_estimates,
        "source_token_divergence": sketch_queries.source_token_divergence,
        "tdigest_value_quantiles": sketch_queries.tdigest_value_quantiles,
        "ddsketch_value_quantiles": sketch_queries.ddsketch_value_quantiles,
        "type_value_quantiles": sketch_queries.type_value_quantiles,
        "daily_distinct_users": sketch_queries.daily_distinct_users,
        "weekly_distinct_users": sketch_queries.weekly_distinct_users,
        "weekly_top_users": sketch_queries.weekly_top_users,
        "weekly_value_quantiles": sketch_queries.weekly_value_quantiles,
        "ntok_range_mass": sketch_queries.ntok_range_mass,
        "bloom_semijoin_count": sketch_queries.bloom_semijoin_count,
        "source_topk_words": sketch_queries.source_topk_words,
        "doc_weighted_sample": sketch_queries.doc_weighted_sample,
        "source_weighted_sample": sketch_queries.source_weighted_sample,
        "source_shingle_overlap": sketch_queries.source_shingle_overlap,
        "events_range_partition": _range_partitioned_write,
        "embedding_clusters": ann.embedding_clusters,
        "embedding_principal_directions": ann.embedding_principal_directions,
        "quality_model_scores": textpipe.quality_model_scores,  # actor-pool inference
        "train_event_model": ml.train_event_model,  # iterative GD loop
        "media_near_dup": _media_near_dup,
    }


# shingling + inverted self-join co-occurrence (shared by the pair
# query and the connected-components closure over those pairs)
_NGRAM_PAIRS_CTES = (
    "d AS (SELECT doc_id, "
    "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), "
    "s AS (SELECT doc_id, list_distinct("
    "CASE WHEN len(ws) = 0 THEN [] "
    "WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')] "
    "ELSE [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] "
    "FOR i IN range(1, len(ws) - 1)] END) AS sh FROM d), "
    "e AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS g FROM s), "
    "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "a.sz AS size_a, b.sz AS size_b, COUNT(*) AS inter "
    "FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id "
    "GROUP BY 1, 2, 3, 4), "
    "pr AS (SELECT doc_a, doc_b, "
    "CAST(inter AS DOUBLE) / (size_a + size_b - inter) AS jaccard "
    "FROM p WHERE CAST(inter AS DOUBLE) / (size_a + size_b - inter) >= 0.2 "
    # exact_jaccard's both-empty convention: two zero-shingle
    # (empty-text) docs pair at jaccard 1.0
    "UNION ALL SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1.0 AS jaccard "
    "FROM s a JOIN s b ON a.doc_id < b.doc_id "
    "WHERE len(a.sh) = 0 AND len(b.sh) = 0)"
)


def _bm25_oracle(k: int = 10) -> str:
    """BM25 oracle generated from the same query set / constants as
    ``textpipe.bm25_topk`` (single source of truth for parity)."""
    vals = ", ".join(
        f"({qi}, '{q}', '{t}')"
        for qi, q in enumerate(textpipe.BM25_QUERIES)
        for t in q.split()
    )
    return (
        "WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(len(ws)) AS DOUBLE) / COUNT(*) AS avgdl FROM ws), "
        f"qterms(query_id, query, term) AS (VALUES {vals}), "
        "dterm AS (SELECT DISTINCT term FROM qterms), "
        "tf AS (SELECT w.doc_id, dt.term, "
        "CAST(len(list_filter(w.ws, x -> x = dt.term)) AS BIGINT) AS tf, "
        "CAST(len(w.ws) AS BIGINT) AS dl FROM ws w CROSS JOIN dterm dt), "
        "dfs AS (SELECT term, CAST(COUNT(*) FILTER (WHERE tf > 0) AS BIGINT) "
        "AS df FROM tf GROUP BY term), "
        "scored AS (SELECT q.query_id, q.query, f.doc_id, "
        "SUM(LN(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * f.tf * 2.2 / "
        "(f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / s.avgdl))) AS score "
        "FROM tf f JOIN qterms q USING (term) JOIN dfs d USING (term) "
        "CROSS JOIN stats s WHERE f.tf > 0 "
        "GROUP BY q.query_id, q.query, f.doc_id) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, query, doc_id, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY query_id "
        "ORDER BY ROUND(score, 6) DESC, doc_id) AS BIGINT) AS rnk, "
        "ROUND(score, 6) AS score FROM scored "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY ROUND(score, 6) DESC, doc_id) <= {k}"
    )


def oracle_sql() -> dict[str, str]:
    words = (
        "SELECT unnest(string_split(text, ' ')) AS token FROM documents"
    )
    # shared bigram-LM CTE chain (doc_perplexity + curate_by_perplexity)
    ppl_cte = (
        "WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS ws FROM documents), "
        "bg AS (SELECT doc_id, "
        "unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS bigram, "
        "unnest([ws[i] FOR i IN range(1, len(ws))]) AS tok_a FROM ws), "
        "cab AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_ab "
        "FROM bg GROUP BY bigram), "
        "ucnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM (SELECT unnest(ws) AS token FROM ws) GROUP BY token), "
        "v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM ucnt), "
        "per AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
        "SUM(LN(c.c_ab + 1) - LN(u.cnt + v.v)) AS lp "
        "FROM bg b JOIN cab c USING (bigram) "
        "JOIN ucnt u ON u.token = b.tok_a CROSS JOIN v GROUP BY b.doc_id)"
    )
    return {
        "token_counts": (
            f"SELECT token, COUNT(*) AS cnt FROM ({words}) w "
            "WHERE token <> '' GROUP BY token"
        ),
        "token_totals": (
            f"SELECT COUNT(*) AS total_tokens, COUNT(DISTINCT token) AS distinct_tokens "
            f"FROM ({words}) w WHERE token <> ''"
        ),
        "token_f2": (
            f"SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2 FROM ("
            f"SELECT COUNT(*) AS cnt FROM ({words}) w "
            "WHERE token <> '' GROUP BY token) t"
        ),
        "heavy_hitters": (
            f"SELECT token, COUNT(*) AS cnt FROM ({words}) w "
            "WHERE token <> '' GROUP BY token HAVING COUNT(*) >= 100"
        ),
        "bigram_counts": (
            "SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) "
            "AS bigram FROM (SELECT list_filter(string_split(text, ' '), "
            "x -> x <> '') AS ws FROM documents) d) b "
            "GROUP BY bigram HAVING COUNT(*) >= 20"
        ),
        "top_terms_per_source": (
            "SELECT source, token, cnt, rnk FROM ("
            "SELECT source, token, cnt, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY cnt DESC, token) AS BIGINT) AS rnk FROM ("
            "SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM (SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents) w WHERE token <> '' "
            "GROUP BY source, token) g) t WHERE rnk <= 5"
        ),
        "doc_token_stats": (
            "SELECT doc_id, "
            "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok, "
            "CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_word_chars, "
            "COALESCE(CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
            "NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0), 0.0) "
            "AS avg_word_len "
            "FROM documents"
        ),
        "lang_source_counts": (
            "SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY lang, source"
        ),
        "source_token_totals": (
            "SELECT source, "
            "CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY source"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS digest, MIN(doc_id) AS keep_doc_id, "
            "COUNT(*) AS dup_cnt FROM documents GROUP BY md5(text)"
        ),
        # top-3 distinctive terms per doc, integer-exact tf-idf ordering
        # (tf DESC, df ASC, token ASC); mirrors analytics.doc_top_tfidf
        "doc_top_tfidf": (
            "WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS token FROM documents), "
            "tfx AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM w GROUP BY 1, 2), "
            "dfx AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY 1), "
            "r AS (SELECT t.doc_id, t.token, t.tf, d.df, ROW_NUMBER() OVER ("
            "PARTITION BY t.doc_id ORDER BY t.tf DESC, d.df ASC, t.token ASC) AS rk "
            "FROM tfx t JOIN dfx d USING (token)) "
            "SELECT doc_id, CAST(rk AS BIGINT) AS rank, token, tf, df "
            "FROM r WHERE rk <= 3"
        ),
        # sequence packing: running prefix SUM() OVER the (source,
        # doc_id) order assigns each doc to a fixed char-budget context
        "pack_contexts": (
            "WITH c AS (SELECT source, n_chars, "
            "SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS cum FROM documents) "
            "SELECT source, "
            "CAST(CAST(cum - n_chars AS BIGINT) // 4096 AS BIGINT) AS context_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS chars "
            "FROM c GROUP BY 1, 2"
        ),
        # TPC-H Q3 shape: segment semi-join + hash join + top-k revenue
        "shipping_priority": (
            "WITH r AS (SELECT l_orderkey, "
            "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY l_orderkey), "
            "j AS (SELECT o.o_orderkey, "
            "CAST(r.rev AS DOUBLE) / 10000.0 AS revenue, "
            "CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            "AS orderdate_day, o.o_orderpriority "
            "FROM orders o JOIN r ON r.l_orderkey = o.o_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_orderkey, revenue, orderdate_day, o_orderpriority, "
            "CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, orderdate_day, "
            "o_orderkey) AS BIGINT) AS rnk FROM j QUALIFY rnk <= 10"
        ),
        # running-total window through the distributed scan; integer
        # cents inside, one final divide — doubles match bit-for-bit
        # bounded sliding frame (ROWS BETWEEN k PRECEDING): integer-cent
        # frame sums, single double division — bit-matches the Ray side
        "events_moving_avg": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) "
            "/ (100.0 * COUNT(*) OVER w) AS moving_avg "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ),
        # time-RANGE frame: all rows with ts in [ts_i - 1h, ts_i],
        # including same-ts peers (RANGE semantics, ORDER BY ts only)
        "events_time_window_sum": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) "
            "/ 100.0 AS window_sum "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)"
        ),
        # add-one-smoothed bigram-LM perplexity; logs are irrational so
        # both sides ROUND(·,6) (sum-order jitter ~1e-13 vs 5e-7 slack)
        "doc_perplexity": (
            f"{ppl_cte} "
            "SELECT doc_id, n_bigrams, ROUND(lp / n_bigrams, 6) AS avg_logprob, "
            "ROUND(EXP(-(lp / n_bigrams)), 6) AS ppl FROM per"
        ),
        # the C4/CCNet filter step: filter + average over the SAME
        # rounded doc-level ppl on both sides
        "curate_by_perplexity": (
            f"{ppl_cte}, "
            "ppl AS (SELECT doc_id, ROUND(EXP(-(lp / n_bigrams)), 6) AS ppl "
            "FROM per) "
            "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(CAST(ROUND(p.ppl * 1000000, 0) AS BIGINT)) AS DOUBLE) "
            "/ (COUNT(*) * 1000000.0) AS mean_ppl "
            "FROM ppl p JOIN documents d USING (doc_id) "
            "WHERE p.ppl <= 30.0 GROUP BY d.source"
        ),
        # BM25 with RSJ idf; ranking on (ROUND(score,6) DESC, doc_id)
        # both sides so libm jitter cannot flip ranks
        "bm25_topk": _bm25_oracle(),
        # TPC-H Q10: integer 1e-4-dollar revenue, tie-broken top-k
        "returned_item_revenue": (
            "WITH r AS (SELECT o_custkey, "
            "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1996-04-01' GROUP BY o_custkey) "
            "SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, c_custkey) "
            "AS BIGINT) AS rnk, c_custkey, c_name, n_name, "
            "CAST(rev AS DOUBLE) / 10000.0 AS revenue "
            "FROM r JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "QUALIFY ROW_NUMBER() OVER (ORDER BY rev DESC, c_custkey) <= 20"
        ),
        # per-source tokenizer fertility: integer sums, one division
        "source_fertility": (
            "WITH w AS (SELECT source, "
            "len(regexp_extract_all(text, "
            r"'[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) "
            "AS n_words FROM documents) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_bpe) AS BIGINT) AS n_bpe, "
            "CAST(SUM(n_words) AS BIGINT) AS n_words, "
            "CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE) "
            "AS fertility FROM w GROUP BY source"
        ),
        # PII scrub audit: both engines run the same RE2 patterns
        # (pyarrow count/replace_substring_regex vs DuckDB
        # regexp_extract_all/regexp_replace 'g'); replacement order
        # email -> ip -> phone is part of the contract
        "pii_scrub": (
            "SELECT doc_id, "
            f"CAST(len(regexp_extract_all(text, '{textpipe.PII_EMAIL}')) "
            "AS BIGINT) AS n_emails, "
            f"CAST(len(regexp_extract_all(text, '{textpipe.PII_IP}')) "
            "AS BIGINT) AS n_ips, "
            f"CAST(len(regexp_extract_all(text, '{textpipe.PII_PHONE}')) "
            "AS BIGINT) AS n_phones, "
            "CAST(length(regexp_replace(regexp_replace(regexp_replace("
            f"text, '{textpipe.PII_EMAIL}', '<EMAIL>', 'g'), "
            f"'{textpipe.PII_IP}', '<IP>', 'g'), "
            f"'{textpipe.PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) "
            "AS scrubbed_len FROM documents"
        ),
        # per-doc duplicated-window stats; same double division both
        # sides, threshold compare on identical IEEE doubles
        "doc_dup_stats": (
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words "
            "FROM documents), "
            "s AS (SELECT doc_id, array_to_string(words[i:i+7], ' ') AS sh "
            "FROM w, unnest(range(1, len(words) - 6)) AS t(i) "
            "WHERE len(words) >= 8), "
            "g AS (SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY sh) "
            "SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows, "
            "CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS dup_windows, "
            "CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*) AS dup_fraction, "
            "(CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*)) > 0.5 AS flagged "
            "FROM s JOIN g USING (sh) GROUP BY s.doc_id"
        ),
        # TPC-H Q18: HAVING on the aggregated fact, integer quantities
        "large_volume_orders": (
            "WITH t AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS total_qty FROM lineitem GROUP BY l_orderkey "
            "HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 250) "
            "SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, "
            "t.total_qty, c.c_custkey, c.c_name "
            "FROM t JOIN orders o ON o.o_orderkey = t.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey"
        ),
        # TPC-H Q6: pure filter-and-sum; discount predicate on exact
        # integer cents so both sides select the identical row set
        "forecast_revenue": (
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 "
            "AS revenue FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_quantity < 24 "
            "AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7"
        ),
        # TPC-H Q14: promo share of one month's revenue; integer 1e-4
        # dollars inside, the oracle's exact 100.0*p/t expression once
        "promo_revenue": (
            "WITH j AS (SELECT "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev, "
            "p.p_type = 'PROMO' AS is_promo "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-04-01' "
            "AND l_shipdate < TIMESTAMP '1996-05-01') "
            "SELECT 100.0 * "
            "CAST(SUM(CASE WHEN is_promo THEN rev ELSE 0 END) AS DOUBLE) / "
            "CAST(SUM(rev) AS DOUBLE) AS promo_revenue FROM j"
        ),
        # TPC-H Q4 shape: EXISTS semi-join between two facts (late =
        # shipped > 60 days after the order date; schema has no
        # commit/receipt dates, so lateness anchors on o_orderdate)
        "order_priority_check": (
            "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-07-01' "
            "AND o_orderdate < TIMESTAMP '1996-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        # TPC-H Q19 shape: OR-of-conjunctions over (brand, size, qty)
        "discounted_revenue": (
            "SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "/ 10000.0 AS revenue "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30)"
        ),
        # TPC-H Q13 shape: LEFT OUTER JOIN + two-level aggregation —
        # the zero bucket comes from unmatched customers
        "customer_order_distribution": (
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
            "SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS c_count "
            "FROM customer c LEFT OUTER JOIN orders o "
            "ON c.c_custkey = o.o_custkey "
            "AND o.o_orderpriority <> '1-URGENT' "
            "GROUP BY c.c_custkey) GROUP BY c_count"
        ),
        # TPC-H Q7 shape: bidirectional two-nation volume, per
        # direction per ship year; integer 1e-4 dollars inside
        "nation_trade_volume": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "/ 10000.0 AS revenue "
            "FROM lineitem l "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n1 ON n1.n_nationkey = s.s_nationkey "
            "JOIN nation n2 ON n2.n_nationkey = c.c_nationkey "
            "WHERE l.l_shipdate >= TIMESTAMP '1995-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1997-01-01' "
            "AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11') "
            "OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) "
            "GROUP BY 1, 2, 3"
        ),
        # TPC-H Q17 shape: aggregate-then-rejoin-the-same-fact
        # (correlated scalar subquery); quantities are integral-valued
        # doubles so AVG is exact in float64
        "small_quantity_revenue": (
            "SELECT COALESCE(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) "
            "AS BIGINT)) AS DOUBLE) / 700.0, 0.0) AS avg_yearly "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE p.p_brand = 'Brand#19' "
            "AND l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) "
            "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
        ),
        # TPC-H Q15 shape: argmax over an aggregate (view + MAX), ties kept
        "top_supplier_revenue": (
            "WITH r AS (SELECT l_suppkey, "
            "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_i "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s.s_suppkey, s.s_name, "
            "CAST(r.rev_i AS DOUBLE) / 10000.0 AS total_revenue "
            "FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
            "WHERE r.rev_i = (SELECT MAX(rev_i) FROM r)"
        ),
        # TPC-H Q8 shape: share-of-group conditional aggregate over the
        # snowflake, both nation roles resolved; int64 revenue inside,
        # one CASE-WHEN ratio per year at the end
        "market_share": (
            "WITH j AS (SELECT "
            "CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS rev, "
            "n1.n_name = 'NATION_20' AS is_target "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "AND p.p_type = 'ECONOMY' "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n1 ON n1.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n2 ON n2.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = n2.n_regionkey "
            "AND r.r_name = 'EUROPE' "
            "WHERE o.o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-01-01') "
            "SELECT o_year, "
            "CAST(SUM(CASE WHEN is_target THEN rev ELSE 0 END) AS DOUBLE) / "
            "CAST(SUM(rev) AS DOUBLE) AS mkt_share "
            "FROM j GROUP BY o_year"
        ),
        # exact duplicated-window removal (Lee et al. substring-dedup
        # rewrite): every 8-token window keeps its corpus-first
        # occurrence (min (doc_id, pos), intra-doc repeats included);
        # other occurrences' tokens drop; survivors re-join with ' '
        "dedup_windows_rewrite": (
            "WITH w AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words "
            "FROM documents), "
            "tok AS (SELECT doc_id, t.i AS tokpos, words[t.i] AS tok "
            "FROM w, unnest(range(1, len(words) + 1)) AS t(i)), "
            "s AS (SELECT doc_id, t.i AS pos, "
            "array_to_string(words[t.i:t.i+7], ' ') AS sh "
            "FROM w, unnest(range(1, len(words) - 6)) AS t(i) "
            "WHERE len(words) >= 8), "
            "r AS (SELECT doc_id, pos, ROW_NUMBER() OVER "
            "(PARTITION BY sh ORDER BY doc_id, pos) AS rn FROM s), "
            "cov AS (SELECT DISTINCT r.doc_id, u.p AS tokpos "
            "FROM r, unnest(range(r.pos, r.pos + 8)) AS u(p) WHERE r.rn > 1), "
            "keep AS (SELECT tok.doc_id, tok.tokpos, tok.tok FROM tok "
            "LEFT JOIN cov ON cov.doc_id = tok.doc_id "
            "AND cov.tokpos = tok.tokpos WHERE cov.tokpos IS NULL), "
            "k AS (SELECT doc_id, "
            "string_agg(tok, ' ' ORDER BY tokpos) AS text_clean, "
            "CAST(COUNT(*) AS BIGINT) AS n_tok_clean FROM keep GROUP BY doc_id) "
            "SELECT w.doc_id, COALESCE(k.text_clean, '') AS text_clean, "
            "CAST(len(w.words) AS BIGINT) AS n_tok, "
            "COALESCE(k.n_tok_clean, 0) AS n_tok_clean "
            "FROM w LEFT JOIN k USING (doc_id)"
        ),
        # corpus-duplicated 8-gram coverage per source: exact string
        # semantics; integer counts + ONE final double division
        "dup_ngram_coverage": (
            "WITH w AS (SELECT doc_id, source, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words "
            "FROM documents), "
            "s AS (SELECT doc_id, source, "
            "array_to_string(words[i:i+7], ' ') AS sh "
            "FROM w, unnest(range(1, len(words) - 6)) AS t(i) "
            "WHERE len(words) >= 8), "
            "g AS (SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM s GROUP BY sh) "
            "SELECT s.source, CAST(COUNT(*) AS BIGINT) AS n_shingles, "
            "CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS dup_shingles, "
            "CAST(SUM(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*) AS dup_fraction "
            "FROM s JOIN g USING (sh) GROUP BY s.source"
        ),
        # context chunking: sliding token windows, stride 48 (64-16);
        # integer-exact boundary tokens both sides
        "chunk_documents": (
            "WITH ws AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS ws FROM documents), "
            "st AS (SELECT doc_id, ws, "
            "unnest(range(1, len(ws) + 1, 48)) AS start FROM ws) "
            "SELECT doc_id, CAST((start - 1) / 48 AS BIGINT) AS chunk_idx, "
            "CAST(len(list_slice(ws, start, least(start + 63, len(ws)))) "
            "AS BIGINT) AS n_tok, "
            "ws[start] AS first_token, "
            "ws[least(start + 63, len(ws))] AS last_token FROM st"
        ),
        # NTILE with a unique tiebreak — integer-exact on both sides
        "events_value_ntile": (
            "SELECT event_id, event_type, value, "
            "CAST(NTILE(4) OVER (PARTITION BY event_type "
            "ORDER BY value, event_id) AS BIGINT) AS tile FROM events"
        ),
        # TPC-H Q5: integer 1e-4-dollar revenue, one final divide
        "local_supplier_volume": (
            "WITH rn AS (SELECT n_nationkey, n_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') "
            "SELECT rn.n_name, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) "
            "/ 10000.0 AS revenue "
            "FROM customer c JOIN orders o ON c_custkey = o_custkey "
            "JOIN lineitem l ON l_orderkey = o_orderkey "
            "JOIN supplier s ON l_suppkey = s_suppkey "
            "JOIN rn ON s_nationkey = rn.n_nationkey "
            "AND c_nationkey = rn.n_nationkey "
            "WHERE o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1997-01-01' "
            "GROUP BY rn.n_name"
        ),
        "customer_running_spend": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_spend "
            "FROM orders"
        ),
        # consecutive-day retention over distinct (user, day) activity
        "daily_retention": (
            "WITH du AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events) "
            "SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_users, "
            "CAST(COALESCE(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 "
            "ELSE 0 END), 0) AS BIGINT) AS n_retained "
            "FROM du a LEFT JOIN du b "
            "ON a.user_id = b.user_id AND b.day = a.day + 1 "
            "GROUP BY a.day"
        ),
        "source_distinct_exact": (
            "SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) "
            "AS distinct_tokens FROM (SELECT source, "
            "unnest(string_split(text, ' ')) AS token FROM documents) w "
            "WHERE token <> '' GROUP BY source"
        ),
        "events_value_histogram": (
            "SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM events GROUP BY event_type, bin"
        ),
        # long→wide pivot: one column per event type
        "events_type_pivot": (
            "SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            + ", ".join(
                "CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
                "AS BIGINT) AS n_{t}".format(t=t)
                for t in ("click", "error", "purchase", "signup", "view")
            )
            + " FROM events GROUP BY day"
        ),
        # exact vocabulary set algebra between two sources (the exact
        # counterpart of the KMV source_shingle_overlap estimates)
        "source_token_set_ops": (
            "WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents WHERE source IN ('src0', 'src1')), "
            "a AS (SELECT DISTINCT token FROM w WHERE source = 'src0' "
            "AND token <> ''), "
            "b AS (SELECT DISTINCT token FROM w WHERE source = 'src1' "
            "AND token <> ''), "
            "i AS (SELECT COUNT(*) AS c FROM a JOIN b USING (token)) "
            "SELECT 'src0' AS source_a, 'src1' AS source_b, "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS size_a, "
            "(SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS size_b, "
            "CAST(i.c AS BIGINT) AS inter, "
            "CAST((SELECT COUNT(*) FROM a) + (SELECT COUNT(*) FROM b) - i.c "
            "AS BIGINT) AS union_sz, "
            "CAST(i.c AS DOUBLE) / ((SELECT COUNT(*) FROM a) + "
            "(SELECT COUNT(*) FROM b) - i.c) AS jaccard FROM i"
        ),
        # two windows (ROW_NUMBER + running sum) in one scan pass
        "events_user_seq": (
            "SELECT user_id, event_id, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) "
            "/ 100.0 AS running_value FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY event_id "
            "ROWS UNBOUNDED PRECEDING)"
        ),
        # exact equi-join size between two sources' token streams —
        # the quantity the CMS inner product estimates
        "source_token_joinsize": (
            "WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents WHERE source IN ('src0', 'src1')), "
            "a AS (SELECT token, COUNT(*) AS cnt FROM w "
            "WHERE source = 'src0' AND token <> '' GROUP BY 1), "
            "b AS (SELECT token, COUNT(*) AS cnt FROM w "
            "WHERE source = 'src1' AND token <> '' GROUP BY 1) "
            "SELECT 'src0' AS source_a, 'src1' AS source_b, "
            "CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS join_size "
            "FROM a JOIN b USING (token)"
        ),
        # per-source OOV rate vs the global top-10 vocabulary
        "source_oov_rate": (
            "WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS token "
            "FROM documents), "
            "u AS (SELECT token, COUNT(*) AS cnt FROM w WHERE token <> '' "
            "GROUP BY 1), "
            "v AS (SELECT token FROM (SELECT token, ROW_NUMBER() OVER ("
            "ORDER BY cnt DESC, token) AS r FROM u) t WHERE r <= 10) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_oov, "
            "CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ COUNT(*) AS oov_rate "
            "FROM w LEFT JOIN v USING (token) WHERE w.token <> '' "
            "GROUP BY source"
        ),
        # exact discrete quantile vector via the cents-histogram fold
        "events_value_quantiles": (
            "WITH c AS (SELECT event_type, "
            "CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events), "
            "qt AS (SELECT event_type, "
            "quantile_disc(cents, [0.25, 0.5, 0.75, 0.95, 0.99]) AS vs "
            "FROM c GROUP BY 1) "
            "SELECT event_type, qs.q, "
            "CAST(vs[qs.i] AS DOUBLE) / 100.0 AS value_exact "
            "FROM qt CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95, 0.99]) "
            "AS q, unnest([1, 2, 3, 4, 5]) AS i) qs"
        ),
        # 3-sigma anomaly counts: exact integer moments, identical
        # double threshold expression on both sides
        "events_outliers": (
            "WITH c AS (SELECT event_type, "
            "CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS sx, "
            "SUM(cents * cents) AS sxx FROM c GROUP BY 1), "
            "f AS (SELECT c.event_type, CASE WHEN "
            "ABS(CAST(c.cents AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.n) > "
            "3.0 * SQRT(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) / m.n "
            "THEN 1 ELSE 0 END AS isout "
            "FROM c JOIN m USING (event_type)) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(isout) AS BIGINT) AS n_outliers FROM f GROUP BY 1"
        ),
        # deterministic hash-ordered global sample (bottom-n by md5)
        "corpus_sample": (
            "SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS digest, "
            "CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), "
            "doc_id) AS BIGINT) AS rnk FROM documents "
            "QUALIFY rnk <= 50"
        ),
        # exact mergeable moments: mean/std from (n, Σx, Σx²)
        "source_chars_stats": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars, "
            "SQRT(CAST(COUNT(*) * SUM(n_chars * n_chars) - "
            "SUM(n_chars) * SUM(n_chars) AS DOUBLE)) / COUNT(*) AS std_chars "
            "FROM documents GROUP BY source"
        ),
        # lift = cnt_ab * N / (cnt_a * cnt_b); identical operation order
        # on both sides keeps the doubles bit-comparable
        "bigram_lift": (
            "WITH w AS (SELECT unnest(string_split(text, ' ')) AS token "
            "FROM documents), "
            "u AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM w "
            "WHERE token <> '' GROUP BY token), "
            "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM w "
            "WHERE token <> ''), "
            "b AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM ("
            "SELECT unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) "
            "AS bigram FROM (SELECT list_filter(string_split(text, ' '), "
            "x -> x <> '') AS ws FROM documents) d) bb "
            "GROUP BY bigram HAVING COUNT(*) >= 20), "
            "s AS (SELECT b.bigram, b.cnt, "
            "CAST(b.cnt AS DOUBLE) * t.total / (a.cnt * c.cnt) AS lift "
            "FROM b, t, u a, u c "
            "WHERE a.token = string_split(b.bigram, ' ')[1] "
            "AND c.token = string_split(b.bigram, ' ')[2]) "
            "SELECT bigram, cnt, lift, CAST(ROW_NUMBER() OVER ("
            "ORDER BY lift DESC, bigram) AS BIGINT) AS rnk FROM s "
            "QUALIFY rnk <= 20"
        ),
        "per_source_cap": (
            "SELECT doc_id, source, rnk FROM ("
            "SELECT doc_id, source, ROW_NUMBER() OVER "
            "(PARTITION BY source ORDER BY doc_id) AS rnk FROM documents) t "
            "WHERE rnk <= 20"
        ),
        # mixture re-weighting: budget = total tokens // (2 * #sources);
        # keep iff md5(doc_id) % 10000 < floor(min(1, budget/total_src)*10000)
        "source_mixture_sample": (
            "WITH tot AS (SELECT source, CAST(SUM(len(list_filter("
            "string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY source), "
            "b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // (2 * COUNT(*)) "
            "AS budget FROM tot), "
            "thr AS (SELECT source, CAST(floor(least(1.0, "
            "CAST((SELECT budget FROM b) AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
            ") * 10000) AS BIGINT) AS t FROM tot), "
            "kept AS (SELECT d.source, len(list_filter(string_split(d.text, ' '), "
            "x -> x <> '')) AS ntok FROM documents d JOIN thr ON d.source = thr.source "
            "WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) "
            "AS BIGINT) % 10000 < thr.t) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS sampled_docs, "
            "CAST(SUM(ntok) AS BIGINT) AS sampled_tokens FROM kept GROUP BY source"
        ),
        "repetition_stats": (
            "SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, "
            "CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct, "
            "CASE WHEN len(ws) = 0 THEN 0.0 ELSE 1.0 - "
            "CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE) "
            "END AS dup_frac, "
            "CASE WHEN len(ws) = 0 THEN FALSE ELSE (1.0 - "
            "CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)) "
            "> 0.75 END AS flagged "
            "FROM (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS ws FROM documents) t"
        ),
        "events_cume_dist": (
            "SELECT event_id, event_type, value, CUME_DIST() OVER "
            "(PARTITION BY event_type ORDER BY value) AS cume_dist FROM events"
        ),
        # cohort funnel: first signup per user; converted iff any
        # purchase lands in (first_signup, first_signup + 7 days]
        "signup_conversion": (
            "WITH s AS (SELECT user_id, MIN(ts) AS su FROM events "
            "WHERE event_type = 'signup' GROUP BY user_id), "
            "conv AS (SELECT s.user_id, s.su, MAX(CASE WHEN "
            "e.event_type = 'purchase' AND e.ts > s.su AND "
            "e.ts <= s.su + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS c "
            "FROM s LEFT JOIN events e ON e.user_id = s.user_id "
            "GROUP BY s.user_id, s.su) "
            "SELECT strftime(su, '%Y-%m-%d') AS cohort_day, "
            "CAST(COUNT(*) AS BIGINT) AS n_users, "
            "CAST(SUM(c) AS BIGINT) AS n_converted, "
            "CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) "
            "AS conversion_rate FROM conv GROUP BY 1"
        ),
        # flagship curation chain: split -> quality -> repetition ->
        # dedup -> decontamination mask -> rollup (mirrors
        # textpipe.curate_corpus stage for stage)
        "curate_corpus": (
            "WITH f AS (SELECT doc_id, lang, source, text, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words, "
            "COALESCE(CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
            "NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0), 0.0) AS awl, "
            "len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS nd, "
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 "
            "AS bkt FROM documents), "
            "q AS (SELECT * FROM f WHERE bkt < 90 AND n_words >= 10 "
            "AND awl >= 2.0 AND awl <= 12.0 "
            "AND (CASE WHEN n_words = 0 THEN 0.0 ELSE 1.0 - "
            "CAST(nd AS DOUBLE) / CAST(n_words AS DOUBLE) END) <= 0.75), "
            "d AS (SELECT md5(text) AS dg, MIN(doc_id) AS keep_id FROM q GROUP BY 1), "
            "k AS (SELECT q.* FROM q JOIN d ON q.doc_id = d.keep_id), "
            "w_ AS (SELECT doc_id, CASE WHEN CAST(('0x' || "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 "
            "THEN 'train' ELSE 'val' END AS split, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words FROM documents), "
            "s AS (SELECT doc_id, split, array_to_string(words[i:i+7], ' ') AS sh "
            "FROM w_, unnest(range(1, len(words) - 6)) AS t(i) WHERE len(words) >= 8), "
            "cont AS (SELECT DISTINCT t.doc_id FROM s t WHERE t.split = 'train' "
            "AND t.sh IN (SELECT sh FROM s WHERE split = 'val')) "
            "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_words) AS BIGINT) AS n_tokens FROM k "
            "WHERE doc_id NOT IN (SELECT doc_id FROM cont) GROUP BY lang, source"
        ),
        "doc_split_stats": (
            "SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS BIGINT) % 100 < 90 THEN 'train' ELSE 'val' END AS split, "
            "source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) "
            "AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY 1, 2"
        ),
        "token_count_regex": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            r"'[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        # cross-split 8-gram decontamination: train docs sharing any
        # full 8-gram with a val doc (split = md5(doc_id) bucket);
        # mirrors pipelines/textpipe.py::decontaminate_ngram
        "decontaminate_ngram": (
            "WITH d AS (SELECT doc_id, source, text, "
            "CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS BIGINT) % 100 < 90 THEN 'train' ELSE 'val' END AS split "
            "FROM documents), "
            "w AS (SELECT doc_id, source, split, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS words FROM d), "
            "s AS (SELECT doc_id, source, split, "
            "array_to_string(words[i:i+7], ' ') AS sh "
            "FROM w, unnest(range(1, len(words) - 6)) AS t(i) "
            "WHERE len(words) >= 8) "
            "SELECT t.source, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) "
            "AS contaminated_docs "
            "FROM s t WHERE t.split = 'train' "
            "AND t.sh IN (SELECT sh FROM s WHERE split = 'val') "
            "GROUP BY t.source"
        ),
        # quality filter -> exact dedup (min doc_id representative) ->
        # per-(lang, source) rollup; mirrors pipelines/textpipe.py::clean_corpus
        "clean_corpus": (
            "WITH f AS (SELECT doc_id, lang, source, text, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words, "
            "COALESCE(CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
            "NULLIF(len(list_filter(string_split(text, ' '), x -> x <> '')), 0), 0.0) "
            "AS awl FROM documents), "
            "q AS (SELECT * FROM f WHERE n_words >= 10 AND awl >= 2.0 AND awl <= 12.0), "
            "d AS (SELECT md5(text) AS dg, MIN(doc_id) AS keep_id FROM q GROUP BY 1), "
            "k AS (SELECT q.* FROM q JOIN d ON q.doc_id = d.keep_id) "
            "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_words) AS BIGINT) AS n_tokens FROM k GROUP BY lang, source"
        ),
        # one-pass GROUP BY ROLLUP(event_type, hour-of-day); sentinels
        # 'ALL'/-1 stand in for the rollup NULLs
        "events_rollup": (
            "SELECT COALESCE(event_type, 'ALL') AS event_type, "
            "COALESCE(hour, -1) AS hour, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
            "AS value_sum FROM (SELECT event_type, "
            "CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS hour, value "
            "FROM events) GROUP BY ROLLUP(event_type, hour)"
        ),
        # exact mergeable moments -> Pearson corr(hour-of-day, cents);
        # the double-precision expression mirrors analytics.py::finish
        # term for term so the float result is bit-identical
        "events_value_hour_corr": (
            "WITH b AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS x, "
            "CAST(ROUND(value * 100) AS BIGINT) AS y FROM events), "
            "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx, "
            "CAST(SUM(y*y) AS BIGINT) AS syy FROM b GROUP BY event_type) "
            "SELECT event_type, n, CAST(n*sxy - sx*sy AS DOUBLE) / "
            "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) "
            "AS corr_value_hour FROM m"
        ),
        "events_hourly": (
            "SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum "
            "FROM events GROUP BY event_type, hour"
        ),
        "events_sessions": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(1 + COALESCE(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sessions "
            "FROM (SELECT user_id, date_diff('microsecond', "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us "
            "FROM events) t GROUP BY user_id"
        ),
        "events_sliding": (
            "SELECT event_type, w AS window_id, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum "
            "FROM (SELECT event_type, value, "
            "unnest(generate_series(CAST(epoch_us(ts) // 900000000 AS BIGINT) - 3, "
            "CAST(epoch_us(ts) // 900000000 AS BIGINT))) AS w FROM events) t "
            "GROUP BY event_type, w"
        ),
        "distinct_users": (
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users FROM events"
        ),
        # native ASOF LEFT JOIN mirrors analytics.events_asof_join
        "events_asof_join": (
            "SELECT l.event_id, l.user_id, l.value, "
            "COALESCE(r.value, -1.0) AS prev_purchase_value, "
            "COALESCE(date_diff('microsecond', r.ts, l.ts), -1) AS us_since_purchase "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        # regex field extraction mirrors analytics.events_props_stats
        "events_props_stats": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(k) AS BIGINT) AS k_sum, "
            "CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max "
            "FROM (SELECT event_type, "
            "CAST(regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1) AS BIGINT) AS k "
            "FROM events) t GROUP BY event_type"
        ),
        # interval join mirrors analytics.events_range_join
        "events_range_join": (
            "SELECT l.event_id, l.user_id, "
            "CAST(COUNT(r.event_id) AS BIGINT) AS n_right_in_window "
            "FROM (SELECT * FROM events WHERE event_type = 'error') l "
            "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r "
            "ON l.user_id = r.user_id "
            "AND r.ts >= l.ts - INTERVAL 10 MINUTE AND r.ts <= l.ts "
            "GROUP BY l.event_id, l.user_id"
        ),
        "events_lag": (
            "SELECT event_id, user_id, value, "
            "COALESCE(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), -1.0) AS prev_value "
            "FROM events"
        ),
        "top_users_by_value": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_sum "
            "FROM events GROUP BY user_id "
            "ORDER BY SUM(CAST(ROUND(value * 100) AS BIGINT)) DESC, user_id LIMIT 20"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price, "
            "CAST(COUNT(*) AS BIGINT) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_region": (
            "SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name"
        ),
        "orders_by_segment": (
            "SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment"
        ),
        "order_lineitem_join": (
            "SELECT o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderstatus"
        ),
        # anti-join (TPC-H Q22 shape) mirrors analytics.customers_without_orders
        "customers_without_orders": (
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers, "
            "CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 "
            "AS acctbal_sum FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND o.o_orderpriority = '1-URGENT') GROUP BY c_mktsegment"
        ),
        # snowflake-collapse star join mirrors analytics.brand_nation_revenue
        "brand_nation_revenue": (
            "SELECT p.p_brand, n.n_name, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 "
            "AS revenue "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY p.p_brand, n.n_name"
        ),
        "events_value_median": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "median(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS value_median "
            "FROM events GROUP BY event_type"
        ),
        "events_value_stats": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_min, "
            "CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS value_max, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS value_mean "
            "FROM events GROUP BY event_type"
        ),
        # heuristic language-ID + quality metrics (textpipe.lang_quality);
        # the stopword list mirrors functions/textops.py::EN_STOP_SET
        "lang_quality": (
            "WITH w AS (SELECT doc_id, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), "
            "m AS (SELECT doc_id, text, CAST(len(ws) AS BIGINT) AS n_words, "
            "CAST(len(list_filter(ws, x -> x IN ('the','a','an','and','or','of','to',"
            "'in','is','are','was','be','on','at','for','with','that','this','it',"
            "'as','by'))) AS BIGINT) AS n_stopwords FROM w) "
            "SELECT doc_id, "
            "CASE WHEN n_words > 0 AND CAST(n_stopwords AS DOUBLE) / n_words > 0.08 "
            "THEN 'en' ELSE 'other' END AS lang_pred, "
            "n_words, n_stopwords, "
            "COALESCE(CAST(n_stopwords AS DOUBLE) / NULLIF(n_words, 0), 0.0) "
            "AS stop_ratio, "
            "COALESCE(CAST(length(replace(text, ' ', '')) AS DOUBLE) / "
            "NULLIF(n_words, 0), 0.0) AS avg_word_len "
            "FROM m"
        ),
        "embedding_norms": (
            "SELECT vec_id, ROUND(sqrt(list_sum(list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm FROM embeddings"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe FROM embeddings WHERE vec_id < 5), "
            "c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce FROM embeddings), "
            "s AS (SELECT q.query_id, c.vec_id, "
            "list_dot_product(q.qe, c.ce) / (sqrt(list_dot_product(q.qe, q.qe)) * "
            "sqrt(list_dot_product(c.ce, c.ce))) AS sim FROM q CROSS JOIN c), "
            "r AS (SELECT query_id, vec_id, sim, "
            "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk FROM s) "
            "SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank, ROUND(sim, 4) AS sim "
            "FROM r WHERE rnk <= 10"
        ),
        # exact distributed inverted-index Jaccard (pipelines/dedup.py);
        # the SQL restates shingling + the self-join co-occurrence count
        "ngram_jaccard_pairs": (
            f"WITH {_NGRAM_PAIRS_CTES} SELECT doc_a, doc_b, jaccard FROM pr"
        ),
        # connected components over the same pair set: recursive
        # min-label reachability closure (every label reaches every node
        # of its component; MIN per node = the component representative)
        "neardup_components": (
            f"WITH RECURSIVE {_NGRAM_PAIRS_CTES}, "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM pr "
            "UNION ALL SELECT doc_b, doc_a FROM pr), "
            "reach(node, label) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT eg.b, r.label FROM reach r JOIN edges eg ON eg.a = r.node) "
            "SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS rep_id "
            "FROM reach GROUP BY node"
        ),
        "embedding_near_dup": (
            "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
            "FROM embeddings) "
            "SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, "
            "ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
            "sqrt(list_dot_product(b.v, b.v))), 4) AS sim "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id "
            "WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
            "sqrt(list_dot_product(b.v, b.v))) >= 0.4"
        ),
    }
