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
        "cdc_replay_lake", "lww_upsert_events", "watermark_events",
        "per_type_counts", "orphan_filter_events", "json_extract_events",
        "explode_embeddings", "spread_embeddings", "demux_events",
        "hourly_user_activity", "systematic_sample_events", "distinct_langs",
        "distinct_users_per_type", "normalized_text_sha", "top2_per_user",
        "top_events", "sha256_documents",
        "exact_dedup_documents", "token_stats_documents",
        "pii_scan_documents", "doc_quality",
        "ngram_jaccard_pairs", "knn_cosine", "embedding_neardup",
        "broadcast_join_segment", "hash_join_orders_customer",
        "left_join_customer_orders", "semi_join_customers",
        "anti_join_customers",
        "asof_join_clicks_views", "range_join_value_bins",
        "sliding_window_activity", "repo_stats_lake",
        "tpch_q1", "tpch_q3", "tpch_q6", "lang_id_documents",
        "curate_documents",
        "simhash_documents", "fingerprint_documents", "minhash_lsh_pairs",
        "knn_lsh", "knn_pq", "multimodal_features",
        "window_lag_value", "window_running_totals", "window_dense_rank",
        "window_lead_moving", "window_rank_tiles", "median_value_per_user",
        "quantiles_value_per_user", "string_agg_per_user",
        "moments_value_per_user", "mode_type_per_user",
        "topk_types_per_user",
        "pivot_event_counts", "unpivot_event_counts", "rollup_event_counts",
        "cube_event_counts",
        "heavy_hitter_users", "fanout_repo_activity",
        "intersect_click_purchase", "except_click_no_purchase",
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
