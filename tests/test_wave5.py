"""Adversarial unit tests for the wave-5 operators: planted fixtures
that exercise the kernel edge cases the sf corpora don't reach
(ts ties in the skyline, a known-K4 triangle graph, quantile indices
at small n, zero-word documents)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2026, 1, 1) + dt.timedelta(seconds=r[2])
                     for r in rows],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array([r[4] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_pareto_strict_dominance_with_ts_ties(tmp_path):
    """Two events at the SAME ts never dominate each other (dominance
    needs strictly later ts), and a later-but-equal-value event does
    not dominate either."""
    from web3research_etl_ray.pipelines.queries import q_pareto_events

    rows = [
        # (event_id, user_id, seconds, value, type)
        (1, 7, 10, 5.00, "click"),   # dominated by id 3 (later, greater)
        (2, 7, 20, 5.00, "click"),   # equal value to 3 -> NOT dominated
        (3, 7, 20, 9.00, "click"),   # frontier
        (4, 7, 30, 5.00, "click"),   # later but equal value to 2 -> no
                                     # domination either way; frontier
        (5, 8, 10, 1.00, "view"),    # other user: frontier trivially
        (6, 8, 10, 2.00, "view"),    # same ts as 5 -> both kept
    ]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_pareto_events(str(tmp_path)).take_all()
    ).sort_by("event_id")
    assert out["event_id"].to_pylist() == [2, 3, 4, 5, 6]

    # brute-force oracle on a random instance, including duplicate ts
    rng = np.random.default_rng(5)
    rows = [
        (i, int(rng.integers(0, 5)), int(rng.integers(0, 8)),
         float(rng.integers(0, 6)), "click")
        for i in range(200)
    ]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_pareto_events(str(tmp_path)).take_all()
    )
    got = sorted(out["event_id"].to_pylist())
    want = sorted(
        a[0] for a in rows
        if not any(
            b[1] == a[1] and b[2] > a[2] and b[3] > a[3] for b in rows
        )
    )
    assert got == want


def test_triangle_count_k4_plus_isolated_edge(tmp_path):
    """Four identical docs form K4 (C(4,3)=4 triangles); a disjoint
    near-dup pair adds an edge but no triangle."""
    from web3research_etl_ray.pipelines.queries import q_triangle_count

    clique = "alpha beta gamma delta epsilon zeta eta theta"
    pair = "one two three four five six seven eight nine ten"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(6)), pa.int64()),
                "text": pa.array([clique] * 4 + [pair] * 2),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_triangle_count(str(tmp_path))
    assert out["n_triangles"].to_pylist() == [4]


def test_jaccard_clusters_component_min(tmp_path):
    """A 3-doc chain and a 2-doc pair: cluster ids are the component
    minima, docs outside any pair are absent."""
    from web3research_etl_ray.pipelines.queries import q_jaccard_clusters

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight nine ten"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
                "text": pa.array([a, a, a, b, b, "lone doc words here"]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_jaccard_clusters(str(tmp_path))
    assert out["doc_id"].to_pylist() == [10, 11, 12, 20, 21]
    assert out["cluster_id"].to_pylist() == [10, 10, 10, 20, 20]


def test_winsorize_small_group_indices(tmp_path):
    """n=9 per type: quantile_disc(0.125/0.875) = sorted[1]/sorted[7]
    (ceil(q*n)-1), so exactly the min and max get clipped."""
    from web3research_etl_ray.pipelines.queries import q_winsorize_value_events

    vals = [0.50, 1.00, 2.00, 3.00, 4.00, 5.00, 6.00, 7.00, 99.00]
    rows = [(i, 1, i, vals[i], "click") for i in range(9)]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_winsorize_value_events(str(tmp_path)).take_all()
    ).sort_by("event_id")
    cents_w = out["cents_w"].to_pylist()
    # lo = 100 (sorted[1]), hi = 700 (sorted[7])
    assert cents_w == [100, 100, 200, 300, 400, 500, 600, 700, 700]


def test_trimmed_sum_drops_exactly_the_tail_ranks(tmp_path):
    """n=9 -> k=1: exactly the min and max rank drop; duplicates of
    the min value keep all-but-one copy (rank-trimming, not
    value-trimming)."""
    from web3research_etl_ray.pipelines.queries import q_trimmed_sum_per_user

    vals = [1.00, 1.00, 2.00, 3.00, 4.00, 5.00, 6.00, 7.00, 99.00]
    rows = [(i, 1, i, vals[i], "click") for i in range(9)]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_trimmed_sum_per_user(str(tmp_path)).take_all()
    )
    assert out["n_mid"].to_pylist() == [7]
    # drops one 1.00 (rank 1) and the 99.00 (rank 9)
    assert out["sum_mid_cents"].to_pylist() == [
        100 + 200 + 300 + 400 + 500 + 600 + 700
    ]


def test_throttle_dedup_window_semantics(tmp_path):
    """Same (user, type, cents) tuple: kept when the PREVIOUS firing
    is >1h earlier, dropped otherwise; different cents never throttle
    each other."""
    from web3research_etl_ray.pipelines.queries import q_throttle_dedup_events

    rows = [
        (1, 1, 0, 5.00, "click"),      # kept (first)
        (2, 1, 1800, 5.00, "click"),   # +30min -> dropped
        (3, 1, 3600, 5.00, "click"),   # 30min after #2 (lag compare
                                       # is vs previous EVENT) -> dropped
        (4, 1, 7300, 5.00, "click"),   # >1h after #3 -> kept
        (5, 1, 1800, 6.00, "click"),   # different cents -> kept
        (6, 2, 1800, 5.00, "click"),   # different user -> kept
        (7, 1, 1900, 5.00, "view"),    # different type -> kept
    ]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_throttle_dedup_events(str(tmp_path)).take_all()
    ).sort_by("event_id")
    assert out["event_id"].to_pylist() == [1, 4, 5, 6, 7]


def test_funnel3_exists_not_greedy(tmp_path):
    """The chain click -> view -> purchase must use EXISTS semantics:
    the FIRST view after a click has no purchase, a LATER view (still
    inside the click's window) does — greedy first-match would miss
    the funnel."""
    from web3research_etl_ray.pipelines.queries import (
        q_funnel3_click_view_purchase,
    )

    rows = [
        (1, 1, 0, 1.0, "click"),
        (2, 1, 60, 1.0, "view"),       # no purchase within 1h of this
        (3, 1, 1800, 1.0, "view"),     # qualifying view
        (4, 1, 3000, 1.0, "purchase"), # within 1h of view #3
        # user 2: purchase BEFORE the view -> no funnel
        (5, 2, 0, 1.0, "click"),
        (6, 2, 100, 1.0, "purchase"),
        (7, 2, 200, 1.0, "view"),
        # user 3: view outside the click's 1h window -> no funnel
        (8, 3, 0, 1.0, "click"),
        (9, 3, 4000, 1.0, "view"),
        (10, 3, 4100, 1.0, "purchase"),
    ]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_funnel3_click_view_purchase(str(tmp_path)).take_all()
    )
    assert out["user_id"].to_pylist() == [1]
    assert out["n_funnels"].to_pylist() == [1]


def test_funnel3_fallback_equals_lifted(tmp_path):
    """The per-user overflow fallback and the lifted vectorized path
    must agree on a random instance."""
    from web3research_etl_ray.pipelines.queries import (
        _funnel3_per_user,
        q_funnel3_click_view_purchase,
    )

    rng = np.random.default_rng(9)
    types = ["click", "view", "purchase"]
    rows = [
        (i, int(rng.integers(0, 6)), int(rng.integers(0, 10_000)),
         1.0, types[int(rng.integers(0, 3))])
        for i in range(400)
    ]
    _write_events(tmp_path, rows)
    out = pa.Table.from_pylist(
        q_funnel3_click_view_purchase(str(tmp_path)).take_all()
    ).sort_by("user_id")

    arr = {t: ([], []) for t in types}
    for _eid, u, sec, _v, t in rows:
        arr[t][0].append(u)
        arr[t][1].append(sec * 1_000_000 + 1_767_225_600_000_000)

    def sorted_uv(t):
        u = np.array(arr[t][0], np.int64)
        s = np.array(arr[t][1], np.int64)
        o = np.lexsort((s, u))
        return u[o], s[o]

    cu, ct = sorted_uv("click")
    vu, vt = sorted_uv("view")
    pu, pt = sorted_uv("purchase")
    want = _funnel3_per_user(cu, ct, vu, vt, pu, pt)
    assert out["user_id"].to_pylist() == want["user_id"].to_pylist()
    assert out["n_funnels"].to_pylist() == want["n_funnels"].to_pylist()


def test_gopher_zero_word_and_digit_docs(tmp_path):
    """Empty / punctuation-only / digit-only docs: integer counters
    stay well-defined and the verdict is reject."""
    from web3research_etl_ray.pipelines.queries import (
        q_gopher_quality_documents,
    )

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs off to the forest with a bone that it have found "
            * 3)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["", "!!! ... ???", "123 456 789", good]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = pa.Table.from_pylist(
        q_gopher_quality_documents(str(tmp_path)).take_all()
    ).sort_by("doc_id")
    assert out["n_words"].to_pylist()[:3] == [0, 0, 3]
    assert out["n_alpha_words"].to_pylist() == [0, 0, 0,
                                                out["n_words"].to_pylist()[3]]
    assert out["keep"].to_pylist()[:3] == [False, False, False]
    assert out["keep"].to_pylist()[3]
