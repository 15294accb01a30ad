"""Adversarial unit tests for the wave-21 operators — planted cases
the sf corpora don't necessarily reach: drawdown peak resets and
(ts, event_id) tie ordering, LAG over observed weeks with a calendar
gap, and the int8 quantizer's zero-vector / extreme / round-half-up
cells — each checked against a hand computation AND the registered
DuckDB oracle on the same planted parquet."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web3research_etl_ray.pipelines.queries import (
    ORACLE_MAX_DRAWDOWN,
    ORACLE_QUANTIZE,
    ORACLE_WOW_CHANGE,
    q_max_drawdown_per_user,
    q_quantize_embeddings,
    q_wow_change_per_type,
)


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), pa.timestamp("us"))


def _events(tmp_path, eid, uid, ts_us, value, etype=None):
    cols = {
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": _ts(ts_us),
        "value": pa.array(value, pa.float64()),
    }
    if etype is not None:
        cols["event_type"] = pa.array(etype, pa.string())
    pq.write_table(pa.table(cols), str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(tmp_path, table, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{tmp_path}/{table}.parquet')"
    )
    return con.execute(sql).fetch_arrow_table()


def test_max_drawdown_peak_resets_and_tie_order(tmp_path):
    # user 1: peak 10 -> trough 5, NEW peak 12 -> trough 3 (dd 900c);
    # user 2: monotone rise (dd 0); user 3: equal ts, event_id breaks
    # the tie — 10 lands BEFORE 1, so dd = 900c (reversed order: 0)
    sf = _events(
        tmp_path,
        eid=[1, 2, 3, 4, 5, 10, 11, 21, 22],
        uid=[1, 1, 1, 1, 1, 2, 2, 3, 3],
        ts_us=[100, 200, 300, 400, 500, 100, 200, 500, 500],
        value=[10.0, 5.0, 7.0, 12.0, 3.0, 1.0, 2.0, 10.0, 1.0],
    )
    # user 3: eid 21 carries 10.0, eid 22 carries 1.0 at the SAME ts
    out = (
        q_max_drawdown_per_user(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["max_drawdown"].tolist() == [900, 0, 900]
    ora = (
        _oracle(tmp_path, "events", ORACLE_MAX_DRAWDOWN)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert ora["max_drawdown"].tolist() == out["max_drawdown"].tolist()


def test_wow_change_lag_skips_gap_weeks(tmp_path):
    WEEK = 604_800_000_000
    # type 'a': weeks 0 (2 events), 1 (5), 3 (1) — week 2 missing, so
    # the delta at week 3 is vs week 1 (observed-week LAG semantics);
    # type 'b': single week -> null delta
    ts = (
        [10, 20]
        + [WEEK + 1] * 5
        + [3 * WEEK + 7]
        + [2 * WEEK + 5]
    )
    et = ["a"] * 8 + ["b"]
    n = len(ts)
    sf = _events(
        tmp_path,
        eid=list(range(n)),
        uid=[1] * n,
        ts_us=ts,
        value=[1.0] * n,
        etype=et,
    )
    out = q_wow_change_per_type(sf).to_pandas()
    a = out[out.event_type == "a"].sort_values("wk")
    assert a["wk"].tolist() == [0, 1, 3]
    assert a["n_events"].tolist() == [2, 5, 1]
    d = a["wow_delta"].tolist()
    assert np.isnan(d[0]) or d[0] is None
    assert d[1] == 3 and d[2] == -4
    b = out[out.event_type == "b"]
    assert len(b) == 1 and (
        b["wow_delta"].isna().all()
    )
    ora = _oracle(tmp_path, "events", ORACLE_WOW_CHANGE).to_pandas()
    oa = ora[ora.event_type == "a"].sort_values("wk")
    assert oa["n_events"].tolist() == [2, 5, 1]
    assert oa["wow_delta"].tolist()[1:] == [3, -4]


def test_quantize_zero_vector_extremes_and_half_up(tmp_path):
    # vec 0: all zeros -> s=0 guard, every stat 0
    # vec 1: [1.0, -1.0, 0.5] -> s=1e6, q=[127, -127, 64] (the 0.5
    #        element hits the EXACT +0.5 boundary: floor(63.5+0.5)=64)
    # vec 2: [-0.25, 1.0] -> s=1e6, q = [floor(-31.75+0.5), 127] =
    #        [-32, 127] (floor on the negative, NOT trunc)
    emb = pa.array(
        [[0.0, 0.0], [1.0, -1.0, 0.5], [-0.25, 1.0]],
        pa.list_(pa.float32()),
    )
    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": emb}),
        str(tmp_path / "embeddings.parquet"),
    )
    out = (
        q_quantize_embeddings(str(tmp_path))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.loc[0].tolist() == [0, 0, 0, 0, 0, 0]
    assert out.loc[1].tolist() == [1, 1_000_000, 64, 127**2 * 2 + 64**2,
                                   -127, 127]
    assert out.loc[2].tolist() == [2, 1_000_000, 95, 1024 + 127**2,
                                   -32, 127]
    ora = (
        _oracle(tmp_path, "embeddings", ORACLE_QUANTIZE)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in ("s_micro", "q_sum", "q_sumsq", "q_min", "q_max"):
        assert ora[c].tolist() == out[c].tolist(), c
