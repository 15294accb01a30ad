"""Driver-contract gate, run locally: every queries() entry vs its
DuckDB oracle at sf0.001 (the driver repeats this at sf0.01)."""

import pytest

from . import parity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results():
    return parity.run(SF_DIR)


def test_all_queries_present(results):
    import __ray_entry__ as e

    assert set(results) == set(e.queries())
    # every oracle key must have a query
    assert set(e.oracle_sql()) <= set(e.queries())


def test_entry_smoke():
    import __ray_entry__ as e

    out = e.entry()
    import pyarrow as pa

    assert isinstance(out, pa.Table) and out.num_rows > 0
    assert "content_sha256" in out.column_names


@pytest.mark.parametrize(
    "name",
    [
        "cdc_replay_lake", "scd2_history", "cdc_scan_recent",
        "lww_upsert_events", "watermark_events",
        "per_type_counts", "orphan_filter_events", "json_extract_events",
        "explode_embeddings", "spread_embeddings", "demux_events",
        "hourly_user_activity", "systematic_sample_events",
        "stratified_sample_events", "priority_sample_events",
        "distinct_langs",
        "distinct_users_per_type", "hourly_distinct_users",
        "hourly_retention",
        "normalized_text_sha", "top2_per_user",
        "top_events", "sha256_documents",
        "exact_dedup_documents", "token_stats_documents",
        "pii_scan_documents", "top_tokens_documents", "doc_quality",
        "ngram_jaccard_pairs", "knn_cosine", "embedding_neardup",
        "broadcast_join_segment", "hash_join_orders_customer",
        "left_join_customer_orders", "semi_join_customers",
        "anti_join_customers",
        "asof_join_clicks_views", "range_join_value_bins",
        "sliding_window_activity", "repo_stats_lake",
        "tpch_q1", "tpch_q3", "tpch_q6", "lang_id_documents",
        "curate_documents", "incremental_curate", "split_documents",
        "seq_pack_documents",
        "embed_documents", "semantic_neardup_docs", "pagerank_parts",
        "epoch_shuffle_documents", "prepare_training_set",
        "simhash_documents", "fingerprint_documents", "minhash_lsh_pairs",
        "knn_lsh", "knn_pq", "multimodal_features",
        "window_lag_value", "window_running_totals", "window_dense_rank",
        "window_lead_moving", "window_rank_tiles", "median_value_per_user",
        "quantiles_value_per_user", "string_agg_per_user",
        "moments_value_per_user", "mode_type_per_user",
        "topk_types_per_user", "outlier_events_per_user",
        "funnel_click_purchase", "profile_events",
        "pivot_event_counts", "unpivot_event_counts", "rollup_event_counts",
        "cube_event_counts",
        "heavy_hitter_users", "fanout_repo_activity",
        "intersect_click_purchase", "except_click_no_purchase",
        "bm25_search", "boilerplate_prefixes", "chunk_documents",
        "mix_char_budget", "contamination_documents",
        "redact_pii_documents", "token_rarity_documents",
        "repetition_stats_documents",
        "dup_ngrams_documents", "remove_dup_spans_documents",
        "changelog_export", "dedup_keep_best_documents",
        "tfidf_top_terms", "lm_bigram_documents", "bpe_encode_documents",
        "ngram_containment_pairs", "pack_bpe_documents",
        "token_diversity_documents", "event_transitions",
        "jaccard_clusters", "triangle_count", "gopher_quality_documents",
        "winsorize_value_events", "pareto_events",
        "full_outer_join_customer_orders", "mad_value_per_user",
        "degree_histogram", "trimmed_sum_per_user",
        "throttle_dedup_events", "knn_ivf_incremental",
        "funnel3_click_view_purchase", "cohort_retention_matrix",
        "regr_value_on_ts_per_user", "entropy_types_per_user",
        "cumulative_distinct_users", "type_cooccurrence",
        "activity_gaps_per_user", "khop2_reachability",
        "twap_value_per_user", "interarrival_quantiles_per_type",
        "cluster_size_histogram", "kl_unigram_documents",
        "benford_value_digits", "weekday_hour_heatmap",
        "autocorr_lag1_value_per_user", "type_streaks_per_user",
        "late_orders_by_priority", "promo_revenue_share",
        "big_orders_topk",
        "tpch_q5", "tpch_q8", "tpch_q10", "tpch_q13", "tpch_q15",
        "tpch_q22",
        "rolling_wau", "centroid_per_label", "user_activity_gini",
        "user_value_percent_rank",
        "fertility_per_lang", "top_journeys",
        "hard_negatives_embeddings",
        "temperature_mix_documents", "phash_media_dupes",
        "repeat_purchase_rate",
        "tpch_q7", "tpch_q17", "tpch_q19",
        "shingle_novelty_documents", "dup_rate_per_source",
        "cross_source_overlap", "session_length_histogram",
        "daily_streaks_per_user", "first_touch_attribution",
        "fim_split_documents", "vocab_richness_per_source",
        "pmi_collocations", "langid_confusion",
    ],
)
def test_query(results, name):
    passed, msg = results[name]
    assert passed, f"{name}: {msg}"


def test_exact_dedup_keep_drops_planted_duplicates(tmp_path):
    """The keep-list must actually DROP non-representative exact
    duplicates (the sf fixtures contain none, so plant some)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import q_exact_dedup_keep

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(["same text", "same text", "unique a",
                                  "same text", "unique b"]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_exact_dedup_keep(str(tmp_path))
    assert out["doc_id"].to_pylist() == [1, 3, 5]


def test_lm_bigram_scores_fluent_above_gibberish(tmp_path):
    """The corpus bigram LM must rank text made of corpus-frequent
    bigrams above a doc of bigrams seen nowhere else (the CCNet
    filtering direction), and count bigrams exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import q_lm_bigram_documents

    common = "the model trains the model on the data"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [common, common, "the model trains well",
                     "zq xv qj kk pp zz"]
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_lm_bigram_documents(str(tmp_path))
    import pandas as pd

    df = pa.Table.from_pylist(out.take_all()).to_pandas().set_index("doc_id")
    assert df.loc[1, "n_bigrams"] == 7  # 8 tokens -> 7 bigrams
    assert df.loc[4, "n_bigrams"] == 5
    # fluent (corpus-repeated) docs beat the gibberish doc on both stats
    assert df.loc[1, "p50_lp"] > df.loc[4, "p50_lp"]
    assert df.loc[1, "min_lp"] > df.loc[4, "min_lp"]
    assert df.loc[3, "p50_lp"] > df.loc[4, "p50_lp"]


def test_lm_bigram_adversarial_vs_duckdb(tmp_path):
    """lm_bigram edge fuzz: empty / punctuation-only / 1-token docs
    (no bigrams -> no row), heavy repetition (tied lps exercise the
    quantile_disc pick), unicode tokens, plus a randomized tail —
    engine vs the registered oracle, dtype-strict."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import (
        ORACLE_LM_BIGRAM,
        q_lm_bigram_documents,
    )
    from . import parity

    rng = np.random.default_rng(23)
    vocab = ["a", "b", "να", "δ3", "the", "of", "x9"]
    texts = [
        "", "...!!!", "one", "a a a a a a a a", "a b a b a b",
        "να δ3 να δ3 να", "  spaced   out\ttabs\nnewlines  ",
    ] + [
        " ".join(rng.choice(vocab, rng.integers(0, 12)))
        for _ in range(200)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    out = q_lm_bigram_documents(str(tmp_path))
    ok, msg = parity.compare("lm_bigram", out, ORACLE_LM_BIGRAM, con)
    assert ok, msg


def test_containment_catches_short_in_long_jaccard_misses(tmp_path):
    """The asymmetric-criterion differentiator: a short doc whose
    shingles are fully embedded in a much longer doc has containment
    1.0 but Jaccard << 0.5, so only `ngram_containment_pairs` reports
    the pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import (
        q_ngram_containment_pairs,
        q_ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i} mid{i} end{i}" for i in range(40))
    long_doc = short + " " + filler
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([short, long_doc, "unrelated words only here"]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    cont = q_ngram_containment_pairs(str(tmp_path))
    jac = q_ngram_jaccard_pairs(str(tmp_path))
    assert (cont.column("id_a").to_pylist(),
            cont.column("id_b").to_pylist()) == ([1], [2])
    # all 4 of the short doc's shingles are inside the long doc
    assert cont.column("n_inter").to_pylist() == [4]
    assert cont.column("n_small").to_pylist() == [4]
    assert jac.num_rows == 0  # Jaccard ~ 4/124 — far below 0.5


def test_grouped_order_stats_fuzz_vs_duckdb(tmp_path):
    """Randomized exactness fuzz for the keyed-exchange order
    statistics (quantiles / median / mode / topk): heavy ties, single-
    element keys, one hot key — engine vs DuckDB on the same parquet."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    rng = np.random.default_rng(17)
    n = 20_000
    # adversarial: few users (forced multi-batch segments), heavily
    # tied values, one hot user with 50% of rows, a singleton user
    users = np.where(rng.random(n) < 0.5, 3,
                     rng.integers(0, 12, n)).astype(np.int64)
    users[0] = 99  # singleton key
    values = (rng.integers(0, 7, n) * 0.25).astype(np.float64)  # ties
    types = rng.choice(["a", "b", "c"], n)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(users),
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "event_type": pa.array(types),
                "value": pa.array(values),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS FROM read_parquet('{tmp_path}/events.parquet')"
    )
    qs, oracles = e.queries(), e.oracle_sql()
    for name in ("quantiles_value_per_user", "median_value_per_user",
                 "mode_type_per_user", "topk_types_per_user",
                 "moments_value_per_user"):
        out = qs[name](str(tmp_path))
        if hasattr(out, "take_all"):
            out = pa.Table.from_pylist(out.take_all())
        cols = sorted(out.column_names)
        got = sorted(
            tuple(r[c] for c in cols) for r in out.to_pylist()
        )
        ddb = con.sql(oracles[name]).arrow()
        want = sorted(
            tuple(r[c] for c in sorted(out.column_names))
            for r in ddb.to_pylist()
        )
        assert got == want, name


def test_filter_to_reps_semi_join_path_matches_broadcast(tmp_path):
    """The distributed semi-join keep-filter (large-rep-set path) must
    equal the broadcast membership path exactly."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from web3research_etl_ray.functions.dedup import exact_dedup_groups
    from web3research_etl_ray.pipelines.queries import _filter_to_reps

    rng = np.random.default_rng(5)
    texts = [f"doc body {i % 70}" for i in range(400)]  # heavy dup
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(400, dtype=np.int64)),
         "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(tbl)
    reps = exact_dedup_groups(ds)
    bc = sorted(r["doc_id"] for r in
                _filter_to_reps(ds, reps, broadcast_max=10**9).take_all())
    sj = sorted(r["doc_id"] for r in
                _filter_to_reps(ds, reps, broadcast_max=0).take_all())
    assert bc == sj == sorted(range(70))


@pytest.mark.parametrize("n_rows", [0, 1])
def test_new_operators_on_degenerate_tables(tmp_path, n_rows):
    """0-row and 1-row inputs must not crash any of the r02 grouped /
    scan / sampling operators (empty partitions are routine at scale).
    Output must also be consistent: 0 rows in -> 0 rows out; 1 row in
    -> the operator's documented shape."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines import queries as Q

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([5][:n_rows], pa.int64()),
                "event_id": pa.array([1][:n_rows], pa.int64()),
                "event_type": pa.array(["click"][:n_rows], pa.string()),
                "value": pa.array([12.5][:n_rows], pa.float64()),
                "ts": pa.array([ts0][:n_rows], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7][:n_rows], pa.int64()),
                "text": pa.array(
                    ["the quick brown fox jumps over the lazy dog " * 6
                     ][:n_rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    names = [
        "quantiles_value_per_user", "median_value_per_user",
        "mode_type_per_user", "topk_types_per_user",
        "moments_value_per_user", "string_agg_per_user",
        "outlier_events_per_user", "funnel_click_purchase",
        "stratified_sample_events", "priority_sample_events",
        "hourly_distinct_users", "profile_events",
        "split_documents", "seq_pack_documents",
        "epoch_shuffle_documents", "pii_scan_documents",
        "top_tokens_documents", "curate_documents",
        "prepare_training_set",
        "shingle_novelty_documents", "session_length_histogram",
        "daily_streaks_per_user", "first_touch_attribution",
        "fim_split_documents",
    ]
    for name in names:
        out = Q.QUERIES[name](str(tmp_path))
        n = out.count() if hasattr(out, "count") else out.num_rows
        if n_rows == 0:
            assert n == 0, name
        else:
            # single-row sanity for a few shape-known operators
            if name in ("quantiles_value_per_user", "median_value_per_user",
                        "mode_type_per_user", "moments_value_per_user",
                        "split_documents", "seq_pack_documents",
                        "epoch_shuffle_documents"):
                assert n == 1, name
            if name == "outlier_events_per_user":
                assert n == 0, name  # n<2 excluded
            if name in ("session_length_histogram",
                        "daily_streaks_per_user",
                        "first_touch_attribution"):
                assert n == 1, name
            if name == "shingle_novelty_documents":
                assert n == 1, name  # one doc, all shingles novel
            if name == "fim_split_documents":
                assert n == 1, name


def test_token_diversity_flags_degenerate_repetition(tmp_path):
    """Repeat-rate must separate a degenerate looping doc from a
    diverse one, with exact integer counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.queries import (
        q_token_diversity_documents,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["spam spam spam spam", "one two three four", ""]
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r["doc_id"]: r
        for r in q_token_diversity_documents(str(tmp_path)).take_all()
    }
    assert set(rows) == {1, 2}  # the empty doc emits no row (SQL twin)
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct"] == 1
    assert rows[1]["sum_c2"] == 16  # 4^2 — repeat rate 1.0
    assert rows[2]["n_tokens"] == 4 and rows[2]["n_distinct"] == 4
    assert rows[2]["sum_c2"] == 4   # 4×1^2 — repeat rate 0.25


def test_cross_source_overlap_counts_planted_shared_shas(tmp_path):
    """The sf0.001/0.01 fixtures have NO cross-source duplicates (the
    driver parity there is 0-row), so plant some: the operator must
    count each shared sha once per source pair, regardless of how many
    copies each source holds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines import queries as Q

    texts = ["alpha beta gamma", "delta epsilon zeta", "unique one",
             "unique two"]
    rows = {
        "doc_id": pa.array(
            [1, 2, 3, 4, 5, 6, 7], pa.int64()
        ),
        # t0 in A (twice) and B; t1 in B and C; uniques fill in
        "text": pa.array(
            [texts[0], texts[0], texts[0], texts[1], texts[1],
             texts[2], texts[3]],
            pa.string(),
        ),
        "source": pa.array(
            ["A", "A", "B", "B", "C", "A", "C"], pa.string()
        ),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = Q.QUERIES["cross_source_overlap"](str(tmp_path))
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in out.to_pylist()
    }
    assert got == {("A", "B"): 1, ("B", "C"): 1}


def test_dup_rate_attributes_copies_not_canonicals(tmp_path):
    """Per-source dup counts: only NON-canonical copies (doc_id above
    the corpus-wide min for the sha) count as dups, attributed to the
    source that holds the copy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines import queries as Q

    rows = {
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # sha X: canonical doc 1 in A, copies 2 (A) and 3 (B);
        # sha Y: canonical doc 4 in B; unique doc 5 in B
        "text": pa.array(["x", "x", "x", "y", "z"], pa.string()),
        "source": pa.array(["A", "A", "B", "B", "B"], pa.string()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = Q.QUERIES["dup_rate_per_source"](str(tmp_path))
    rows_out = (
        out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    )
    got = {r["source"]: (r["n_docs"], r["n_dups"]) for r in rows_out}
    assert got == {"A": (2, 1), "B": (3, 1)}


def test_fim_split_reconstructs_exact_lengths(tmp_path):
    """FIM split lengths must partition the doc exactly and the PSM
    sha must match a direct reference reconstruction."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines import queries as Q

    texts = ["abcdefghij", "x", "", "hello world hello"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3, 11, 12, 40], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = Q.QUERIES["fim_split_documents"](str(tmp_path))
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    by_id = {r["doc_id"]: r for r in rows}
    for did, s in zip([3, 11, 12, 40], texts):
        r = by_id[did]
        n = len(s)
        assert r["p_len"] + r["m_len"] + r["s_len"] == n
        a = (did * 48271 + 11) % (n + 1)
        b = a + (did * 16807 + 7) % (n - a + 1)
        want = hashlib.sha256(
            b"<PRE>" + s[:a].encode() + b"<SUF>" + s[b:].encode()
            + b"<MID>" + s[a:b].encode()
        ).hexdigest()
        assert r["fim_sha256"] == want, did
