"""Arrow-native bucketed joins: correctness, salting under skew, and
the deterministic as-of tie-break (ADVICE r01)."""

import numpy as np
import pyarrow as pa

import ray.data

from web3research_etl_ray.functions.joins import asof_join, hash_join


def _sorted_rows(ds, cols):
    t = pa.Table.from_pylist(ds.take_all())
    return sorted(tuple(r[c] for c in cols) for r in t.select(cols).to_pylist())


def test_hash_join_matches_reference_small():
    left = pa.table({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
    right = pa.table({"k": [2, 2, 3, 4], "rv": ["a", "b", "c", "d"]})
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        left_cols=["lv"], right_cols=["rv"], num_buckets=4,
    )
    got = _sorted_rows(out, ["k", "lv", "rv"])
    want = sorted(
        (lk, lv, rv)
        for lk, lv in zip(left["k"].to_pylist(), left["lv"].to_pylist())
        for rk, rv in zip(right["k"].to_pylist(), right["rv"].to_pylist())
        if lk == rk
    )
    assert got == want


def test_hash_join_salted_matches_unsalted_under_hot_key():
    """One key holds 50% of probe rows; salt=8 must spread it over
    sub-buckets and produce the identical join result."""
    rng = np.random.default_rng(11)
    n = 20_000
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n)).astype(np.int64)
    left = pa.table({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table({"k": np.arange(0, 500, dtype=np.int64),
                      "rv": np.arange(0, 500, dtype=np.int64) * 2})
    a = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
                  left_cols=["lv"], right_cols=["rv"], num_buckets=8, salt=1)
    b = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
                  left_cols=["lv"], right_cols=["rv"], num_buckets=8, salt=8)
    ra = _sorted_rows(a, ["k", "lv", "rv"])
    rb = _sorted_rows(b, ["k", "lv", "rv"])
    assert ra == rb and len(ra) == n  # every probe row matches exactly once


def test_hash_join_salt_bounds_max_group_size():
    """The salted exchange caps the largest per-group probe share."""
    from web3research_etl_ray.functions.joins import _bucketed_union

    n = 8_000
    left = pa.table({"k": np.full(n, 7, dtype=np.int64),
                     "lv": np.arange(n, dtype=np.int64)})
    right = pa.table({"k": [7], "rv": [1]})
    salt = 8
    ds, _ = _bucketed_union(
        ray.data.from_arrow(left), ray.data.from_arrow(right), ["k"], 8, salt
    )
    t = pa.Table.from_pylist(ds.take_all())
    probe = t.filter(pa.compute.equal(t["__side"], "l"))
    counts = {}
    for b in probe["__bucket"].to_pylist():
        counts[b] = counts.get(b, 0) + 1
    assert len(counts) == salt
    assert max(counts.values()) <= (n // salt) + n // (salt * 4)


def test_asof_join_backward_and_tie_break():
    # right has duplicate (by, on) rows: (u, 10) appears with view ids
    # 3 and 9 — the engine must deterministically pick max (9)
    left = pa.table({
        "u": ["a", "a", "b", "c"],
        "ts": [10, 15, 5, 99],
        "click": [1, 2, 3, 4],
    })
    right = pa.table({
        "u": ["a", "a", "a", "b"],
        "ts": [10, 10, 12, 7],
        "view": [3, 9, 11, 30],
    })
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="u", on="ts", left_cols=["click"], right_cols=["view"],
        num_buckets=2,
    )
    got = {r["click"]: r["view"] for r in pa.Table.from_pylist(out.take_all()).to_pylist()}
    # click1 (a,10): ties at ts=10 -> max view 9; click2 (a,15): view 11
    # click3 (b,5): no view at/before 5 -> null; click4 (c,99): key absent -> null
    assert got == {1: 9, 2: 11, 3: None, 4: None}


def test_asof_join_salted_matches_unsalted():
    rng = np.random.default_rng(3)
    n = 5_000
    users = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 50, n)).astype(np.int64)
    lts = rng.integers(0, 10_000, n).astype(np.int64)
    left = pa.table({"u": users, "ts": lts, "click": np.arange(n, dtype=np.int64)})
    m = 2_000
    rus = rng.integers(0, 50, m).astype(np.int64)
    rts = rng.integers(0, 10_000, m).astype(np.int64)
    right = pa.table({"u": rus, "ts": rts, "view": np.arange(m, dtype=np.int64)})
    kw = dict(by="u", on="ts", left_cols=["click"], right_cols=["view"],
              num_buckets=4)
    a = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), **kw)
    b = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  salt=4, **kw)
    ga = _sorted_rows(a, ["click", "view"])
    gb = _sorted_rows(b, ["click", "view"])
    assert ga == gb and len(ga) == n


def test_range_join_matches_duckdb_random():
    """Randomized interval join (overlapping, boundary-crossing, and
    empty intervals) must equal DuckDB's inequality join exactly."""
    import duckdb

    from web3research_etl_ray.functions.joins import range_join

    rng = np.random.default_rng(7)
    n_pts, n_iv = 5_000, 300
    pts = pa.table({
        "pid": np.arange(n_pts, dtype=np.int64),
        "v": np.round(rng.uniform(0, 100, n_pts), 3),
    })
    lo = np.round(rng.uniform(-5, 100, n_iv), 3)
    width = np.round(rng.uniform(0, 12, n_iv), 3)
    width[::50] = 0.0  # empty intervals: must match nothing
    iv = pa.table({
        "iid": np.arange(n_iv, dtype=np.int64),
        "lo": lo,
        "hi": lo + width,
    })
    out = range_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(iv),
        on="v", lo="lo", hi="hi",
        point_cols=["pid"], interval_cols=["iid"],
        num_chunks=16,
    )
    got = _sorted_rows(out, ["pid", "iid"])
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("iv", iv)
    want = sorted(
        map(tuple, con.sql(
            "SELECT pid, iid FROM pts JOIN iv ON v >= lo AND v < hi"
        ).fetchall())
    )
    assert got == want and len(want) > 0


def test_range_join_explicit_boundaries_and_wide_interval():
    """A full-domain interval replicates to every chunk but each pair
    is still emitted exactly once (points live in one chunk each)."""
    from web3research_etl_ray.functions.joins import range_join

    pts = pa.table({"pid": [0, 1, 2, 3], "v": [0.5, 10.5, 20.5, 30.5]})
    iv = pa.table({"iid": [0, 1], "lo": [0.0, 10.0], "hi": [100.0, 11.0]})
    out = range_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(iv),
        on="v", lo="lo", hi="hi",
        point_cols=["pid"], interval_cols=["iid"],
        boundaries=[10.0, 20.0, 30.0],
    )
    got = _sorted_rows(out, ["pid", "iid"])
    assert got == [(0, 0), (1, 0), (1, 1), (2, 0), (3, 0)]


# ---------------------------------------------------------------------------
# outer / semi / anti variants
# ---------------------------------------------------------------------------

_L = pa.table({"k": [1, 2, 2, 3, 5], "lv": [10, 20, 21, 30, 50]})
_R = pa.table({"k": [2, 2, 3, 4], "rv": ["a", "b", "c", "d"]})


def _run_how(how, **kw):
    return hash_join(
        ray.data.from_arrow(_L), ray.data.from_arrow(_R), "k",
        left_cols=["lv"], right_cols=["rv"], num_buckets=4, how=how, **kw,
    )


def test_hash_join_left_outer_null_extends():
    got = _sorted_rows(_run_how("left"), ["k", "lv", "rv"])
    want = sorted(
        [(2, 20, "a"), (2, 20, "b"), (2, 21, "a"), (2, 21, "b"),
         (3, 30, "c"), (1, 10, None), (5, 50, None)],
        key=lambda r: tuple((v is None, v) for v in r),
    )
    assert sorted(got, key=lambda r: tuple((v is None, v) for v in r)) == want


def test_hash_join_full_outer_keeps_both_unmatched():
    got = _sorted_rows(_run_how("full"), ["k", "lv", "rv"])
    assert (4, None, "d") in got  # right-unmatched kept once
    assert (1, 10, None) in got and (5, 50, None) in got
    assert len(got) == 5 + 2 + 1  # 5 inner pairs + l-unmatched 1,5 + r-unmatched 4


def test_hash_join_semi_anti():
    semi = _sorted_rows(_run_how("semi"), ["k", "lv"])
    assert semi == [(2, 20), (2, 21), (3, 30)]
    anti = _sorted_rows(_run_how("anti"), ["k", "lv"])
    assert anti == [(1, 10), (5, 50)]


def test_hash_join_semi_salted_matches_unsalted():
    a = _sorted_rows(_run_how("semi"), ["k", "lv"])
    b = _sorted_rows(_run_how("semi", salt=4), ["k", "lv"])
    assert a == b


def test_hash_join_outer_rejects_salt():
    import pytest

    for how in ("right", "full"):
        with pytest.raises(ValueError):
            _run_how(how, salt=2)
    with pytest.raises(ValueError):
        _run_how("cross")


def test_hash_join_bloom_prune_identical_and_prunes():
    """Bloom pruning must (a) leave the join result bit-identical (no
    false negatives) and (b) actually drop non-matching probe rows
    before the exchange on a selective join."""
    import pytest

    from web3research_etl_ray.functions.joins import (
        _bloom_test, build_bloom, key_hash64,
    )

    rng = np.random.default_rng(3)
    n = 30_000
    # probe keys span 0..9999; build side holds only 0..99 -> ~1% match
    keys = rng.integers(0, 10_000, n).astype(np.int64)
    left = pa.table({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pa.table({"k": np.arange(0, 100, dtype=np.int64),
                      "rv": np.arange(0, 100, dtype=np.int64) * 3})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    plain = hash_join(lds, rds, "k", left_cols=["lv"], right_cols=["rv"],
                      num_buckets=8)
    pruned = hash_join(lds, rds, "k", left_cols=["lv"], right_cols=["rv"],
                       num_buckets=8, bloom_prune=True)
    assert _sorted_rows(plain, ["k", "lv", "rv"]) == \
        _sorted_rows(pruned, ["k", "lv", "rv"])

    # the filter itself: all build keys pass, ~99% of non-keys drop
    bloom = build_bloom(rds, ["k"], n_bits=1 << 16)
    h_build = key_hash64(right.column("k"))
    assert _bloom_test(bloom, h_build, 4).all()  # no false negatives
    h_probe = key_hash64(left.column("k"))
    survive = _bloom_test(bloom, h_probe, 4).mean()
    assert survive < 0.05  # ~1% true matches + small fp rate

    # semantics guard: pruning under left/anti/full would drop rows
    # that belong in the output
    for how in ("left", "anti", "full"):
        with pytest.raises(ValueError):
            hash_join(lds, rds, "k", how=how, bloom_prune=True)


# ---------------------------------------------------------------------------
# auto_join planner (broadcast vs bucketed by build-side size)
# ---------------------------------------------------------------------------


def _aj_fixture():
    import numpy as np

    rng = np.random.default_rng(21)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, 3000), pa.int64()),
            "lv": pa.array(np.arange(3000, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(0, 40, dtype=np.int64)),
            "rv": pa.array(np.arange(100, 140, dtype=np.int64)),
        }
    )
    return left, right


def test_auto_join_picks_broadcast_for_small_build_side():
    from web3research_etl_ray.functions.joins import auto_join, hash_join

    left_t, right_t = _aj_fixture()
    left = ray.data.from_arrow(left_t).repartition(4)
    right = ray.data.from_arrow(right_t)
    out, plan = auto_join(left, right, "k", explain=True)
    assert plan["strategy"] == "broadcast" and plan["right_rows"] == 40
    got = sorted(
        (r["k"], r["lv"], r["rv"]) for r in out.take_all()
    )
    ref = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in hash_join(
            ray.data.from_arrow(left_t), ray.data.from_arrow(right_t), "k"
        ).take_all()
    )
    assert got == ref


def test_auto_join_switches_to_bucketed_past_threshold():
    from web3research_etl_ray.functions.joins import auto_join

    left_t, right_t = _aj_fixture()
    left = ray.data.from_arrow(left_t).repartition(4)
    right = ray.data.from_arrow(right_t)
    out, plan = auto_join(
        left, right, "k", broadcast_max_rows=10, explain=True
    )
    assert plan["strategy"] == "bucketed"
    b_out = auto_join(left, right, "k")  # default: broadcast
    assert sorted(
        (r["k"], r["lv"], r["rv"]) for r in out.take_all()
    ) == sorted((r["k"], r["lv"], r["rv"]) for r in b_out.take_all())


def test_auto_join_left_keeps_unmatched_probe_rows():
    from web3research_etl_ray.functions.joins import auto_join

    left_t, right_t = _aj_fixture()  # keys 40..49 unmatched
    out = auto_join(
        ray.data.from_arrow(left_t), ray.data.from_arrow(right_t),
        "k", how="left",
    )
    rows = out.take_all()
    assert len(rows) == 3000
    assert any(r["rv"] is None for r in rows)
