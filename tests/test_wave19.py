"""Adversarial unit tests for the wave-19 operators: the kernel edge
cases the sf corpora don't reach — RANGE-frame peer groups and exact
1-hour boundaries, quantile_cont at tiny n, the audience bitmask fold
when a type is entirely absent from a user, BFS over chain / star /
two-component graphs, and the overflow-chunked offset lift in
``range_frame_bounds``."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


# ---------------------------------------------------------------- range frame

def _bounds_brute(ts, keys, window):
    lo, hi = [], []
    for i in range(len(ts)):
        in_w = [
            j for j in range(len(ts))
            if keys[j] == keys[i] and ts[i] - window <= ts[j] <= ts[i]
        ]
        lo.append(min(in_w))
        hi.append(max(in_w) + 1)
    return np.array(lo), np.array(hi)


def test_range_frame_bounds_peers_and_boundary():
    from web3research_etl_ray.functions.window import (
        range_frame_bounds, segment_starts)

    # user 1: peer group at t=100 (3 rows), a row EXACTLY window back,
    # and one just outside; user 2: single row
    keys = np.array([1, 1, 1, 1, 1, 1, 2])
    ts = np.array([0, 39, 100, 100, 100, 200, 50], dtype=np.int64)
    window = np.int64(60)
    lo, hi = range_frame_bounds(ts, segment_starts(keys), window)
    blo, bhi = _bounds_brute(ts, keys, window)
    np.testing.assert_array_equal(lo, blo)
    np.testing.assert_array_equal(hi, bhi)
    # the peer group shares one frame [2, 5) — equal-ts rows see each
    # other; t=100 sees t=40..100, so t=39 is out but t=100-60=40 edge:
    assert list(lo[2:5]) == [2, 2, 2] and list(hi[2:5]) == [5, 5, 5]


def test_range_frame_bounds_overflow_chunks():
    from web3research_etl_ray.functions.window import (
        range_frame_bounds, segment_starts)

    # spans so large the lifted axis cannot hold two segments without
    # restarting: forces the chunked path, results must be identical
    rng = np.random.default_rng(7)
    keys = np.repeat(np.arange(6), 4)
    base = np.int64(1) << np.int64(61)
    ts = np.concatenate(
        [np.sort(rng.integers(0, base, 4)) for _ in range(6)]
    ).astype(np.int64)
    window = np.int64(1) << np.int64(59)
    lo, hi = range_frame_bounds(ts, segment_starts(keys), window)
    blo, bhi = _bounds_brute(ts, keys, window)
    np.testing.assert_array_equal(lo, blo)
    np.testing.assert_array_equal(hi, bhi)


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_window_range_trailing_planted(ray_session, tmp_path):
    from web3research_etl_ray.pipelines.queries import (
        q_window_range_trailing)

    H = 3_600_000_000  # 1h in us
    t0 = 1_700_000_000_000_000
    rows = [
        # user 1: equal-ts peers at t0+H must BOTH count each other,
        # and both include the row exactly 1h earlier (closed bound)
        (1, t0, 1, "click", 1.00),
        (2, t0 + H, 1, "click", 2.00),
        (3, t0 + H, 1, "view", 4.00),
        (4, t0 + 2 * H + 1, 1, "click", 8.00),  # 1us past: alone
        # user 2: single event
        (5, t0, 2, "click", 16.00),
    ]
    _write_events(tmp_path, rows)
    out = {
        r["event_id"]: (r["w1h_n"], r["w1h_sum_cents"])
        for r in q_window_range_trailing(str(tmp_path)).take_all()
    }
    assert out[1] == (1, 100)
    assert out[2] == (3, 700) and out[3] == (3, 700)
    assert out[4] == (1, 800)
    assert out[5] == (1, 1600)


# ------------------------------------------------------------- quantile_cont

def test_quantiles_cont_matches_duckdb_small_n(ray_session, tmp_path):
    import duckdb

    from web3research_etl_ray.pipelines.queries import (
        ORACLE_QUANTILES_CONT, q_quantiles_cont_per_user)

    # users with n = 1..6 rows — every interpolation fraction
    rows, eid = [], 0
    t0 = 1_700_000_000_000_000
    vals = [3.17, 0.02, 99.99, 10.50, 7.33, 42.00]
    for u in range(1, 7):
        for i in range(u):
            rows.append((eid, t0 + eid, u, "click", vals[(u + i) % 6]))
            eid += 1
    _write_events(tmp_path, rows)
    got = {
        r["user_id"]: (r["p25_qc"], r["p50_qc"], r["p75_qc"])
        for r in q_quantiles_cont_per_user(str(tmp_path)).take_all()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS FROM '{tmp_path}/events.parquet'"
    )
    for u, p25, p50, p75 in con.sql(ORACLE_QUANTILES_CONT).fetchall():
        assert got[u] == (p25, p50, p75), u


# ------------------------------------------------------------ audience matrix

def test_audience_matrix_planted(ray_session, tmp_path):
    from web3research_etl_ray.pipelines.queries import q_audience_matrix

    t0 = 1_700_000_000_000_000
    # high-value events only (>200); user 1 did A+B, user 2 did A only,
    # user 3 did nothing high-value (must not appear anywhere)
    rows = [
        (1, t0, 1, "A", 300.0),
        (2, t0, 1, "B", 300.0),
        (3, t0, 2, "A", 300.0),
        (4, t0, 2, "B", 100.0),   # below threshold: doesn't count
        (5, t0, 3, "A", 50.0),
        (6, t0, 3, "C", 201.0),   # only high-value C in the corpus
    ]
    _write_events(tmp_path, rows)
    got = {
        (r["done_type"], r["missing_type"]): r["n_users"]
        for r in q_audience_matrix(str(tmp_path)).to_pylist()
    }
    assert got == {
        ("A", "B"): 1,          # user 2
        ("A", "C"): 2,          # users 1 and 2
        ("B", "C"): 1,          # user 1
        ("C", "A"): 1,          # user 3
        ("C", "B"): 1,          # user 3
    }


# ----------------------------------------------------------------------- bfs

def _edges_ds(pairs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(
                    [p[0] for p in pairs] + [p[1] for p in pairs],
                    pa.int64(),
                ),
                "dst": pa.array(
                    [p[1] for p in pairs] + [p[0] for p in pairs],
                    pa.int64(),
                ),
            }
        )
    )


def _seeds_ds(nodes):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "hops": pa.array([0] * len(nodes), pa.int64()),
            }
        )
    )


def test_bfs_hops_chain_star_two_components(ray_session):
    from web3research_etl_ray.functions.graph import bfs_hops

    # component A: chain 1-2-3-4 (seed 1); component B: star 10 with
    # leaves 11,12,13 (seed 10)
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)]
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(_edges_ds(pairs), _seeds_ds([1, 10])).take_all()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 10: 0, 11: 1, 12: 1, 13: 1}


def test_bfs_hops_shortcut_takes_min(ray_session):
    from web3research_etl_ray.functions.graph import bfs_hops

    # cycle with a chord: 1-2-3-4-5-1 plus 1-4; dist(4) = 1 not 3
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 4)]
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(_edges_ds(pairs), _seeds_ds([1])).take_all()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 1}


# ------------------------------------------------------- wave 20: churn etc.

def test_version_churn_kernel_planted(ray_session, tmp_path, monkeypatch):
    """Plant a tiny CDC stream via the derivation cache dir: two paths,
    one with a full rewrite (zero overlap), one with repeated tokens
    (within-version dedup) and an empty middle version."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines import queries as Q

    stream = tmp_path / "stream"
    stream.mkdir()
    rows = [
        # path A: 'a b b' -> 'a b c' (inter {a,b}=2, union {a,b,c}=3)
        ("r1", "A", 0, "a b b", "upsert"),
        ("r1", "A", 1, "a b c", "upsert"),
        # path B: 'x y' -> '' -> 'x y' (pairs: inter 0/0, union 2/2)
        ("r1", "B", 0, "x y", "upsert"),
        ("r1", "B", 1, "", "upsert"),
        ("r1", "B", 2, "x y", "upsert"),
        # path C: deleted mid-stream: delete rows are EXCLUDED, so the
        # surviving pair is v0 -> v2 (rewrite, inter 0)
        ("r1", "C", 0, "p q", "upsert"),
        ("r1", "C", 1, "p q", "delete"),
        ("r1", "C", 2, "z w", "upsert"),
        # path D: single version -> not in output
        ("r1", "D", 0, "solo", "upsert"),
    ]
    pq.write_table(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array([f"c{i}" for i in range(len(rows))]),
                "lang": pa.array(["en"] * len(rows)),
                "content": pa.array([r[3] for r in rows]),
                "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
                "op": pa.array([r[4] for r in rows]),
            }
        ),
        str(stream / "events-00000.parquet"),
    )
    # patch the DEFINING module (queries.code) — the registry package
    # re-exports the name, but the kernel resolves it in its own module
    from web3research_etl_ray.pipelines.queries import code as Qcode

    monkeypatch.setattr(
        Qcode, "_derive_cdc_stream", lambda sf: str(stream)
    )
    got = {
        (r["repo"], r["path"]): (
            r["n_versions"], r["sum_inter"], r["sum_union"])
        for r in Q.q_version_churn_per_path("ignored").take_all()
    }
    assert got == {
        ("r1", "A"): (2, 2, 3),
        ("r1", "B"): (3, 0, 4),
        ("r1", "C"): (2, 0, 4),
    }


def test_lang_source_chi2_zero_cell(ray_session, tmp_path):
    """A (source, lang) combination with zero observed docs must still
    appear with its expected count (the margin product)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["a", "b", "c"]),
                "lang": pa.array(["en", "en", "fr"]),
                "source": pa.array(["s1", "s2", "s2"]),
                "n_chars": pa.array([1, 1, 1], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from web3research_etl_ray.pipelines.queries import q_lang_source_chi2

    t = q_lang_source_chi2(str(tmp_path))
    got = {
        (r["source"], r["lang"]): (r["observed"], r["expected"])
        for r in t.to_pylist()
    }
    assert len(got) == 4  # full 2x2 product
    assert got[("s1", "fr")] == (0, 1.0 * 1.0 / 3.0)
    assert got[("s1", "en")][0] == 1 and got[("s2", "en")][0] == 1


def test_readability_edge_docs(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["", "One two. Three!", "no punctuation here"]
                ),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([0, 15, 19], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from web3research_etl_ray.pipelines.queries import (
        q_readability_documents)

    got = {
        r["doc_id"]: r
        for r in q_readability_documents(str(tmp_path)).take_all()
    }
    assert got[0]["n_words"] == 0 and got[0]["flesch"] is None
    assert got[1]["n_sentences"] == 2
    assert got[2]["n_sentences"] == 1  # floored at 1
    assert got[2]["flesch"] is not None
