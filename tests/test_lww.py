"""Unit tests for the LWW fold kernels (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from web3research_etl_ray.schema import UNIFIED_EVENT_SCHEMA
from web3research_etl_ray.stages.lww import ORPHAN_OP, fold_lww, partial_lww
from web3research_etl_ray.stages.normalize import Normalize, orphan_mask


def _events(rows):
    """rows: list of (repo, path, seq, op)"""
    return pa.table(
        {
            "repo": [r[0] for r in rows],
            "path": [r[1] for r in rows],
            "commit": [f"c{r[2]}" for r in rows],
            "lang": ["py"] * len(rows),
            "content": [f"body-{r[0]}-{r[1]}-{r[2]}" for r in rows],
            "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
            "op": [r[3] for r in rows],
        }
    )


def _normalized(rows, parts=4, ranges=()):
    return Normalize(parts, list(ranges))(_events(rows))


def test_fold_keeps_max_seq_out_of_order():
    t = _normalized(
        [("r", "a", 5, "upsert"), ("r", "a", 9, "upsert"), ("r", "a", 7, "upsert"),
         ("r", "b", 1, "upsert")]
    )
    t = t.append_column("n_events", pa.array([1] * 4, pa.int64()))
    out = fold_lww(t)
    got = {(r["repo"], r["path"]): (r["commit_seq"], r["n_events"]) for r in out.to_pylist()}
    assert got == {("r", "a"): (9, 3), ("r", "b"): (1, 1)}


def test_fold_duplicate_delivery_single_copy():
    t = _normalized([("r", "a", 5, "upsert"), ("r", "a", 5, "upsert")])
    t = t.append_column("n_events", pa.array([1, 1], pa.int64()))
    out = fold_lww(t)
    assert out.num_rows == 1 and out.column("n_events")[0].as_py() == 2


def test_partial_emits_orphan_counters():
    t = _normalized(
        [("r", "a", 5, "upsert"), ("r", "a", 8, "upsert"), ("r", "b", 7, "upsert")],
        ranges=[(6, 9)],
    )
    out = partial_lww(t)
    counters = out.filter(pc.equal(out["op"], ORPHAN_OP))
    real = out.filter(pc.not_equal(out["op"], ORPHAN_OP))
    assert {r["commit_seq"] for r in real.to_pylist()} == {5}
    assert int(pc.sum(counters["n_events"]).as_py()) == 2
    # watermark must advance past orphaned seqs
    assert int(pc.max(out["commit_seq"]).as_py()) == 8


def test_orphan_mask_vectorized():
    seqs = np.array([1, 5, 6, 9, 10, 100])
    m = orphan_mask(seqs, [(5, 6), (90, 110)])
    assert m.tolist() == [False, True, True, False, False, True]
    assert orphan_mask(seqs, []).sum() == 0


def test_orphan_mask_nested_and_overlapping_ranges():
    """ADVICE r01 (high): with nested/overlapping ranges the nearest
    start's end is not enough — seqs 105/115 inside (80,120) but past
    the nested (90,100) must still be flagged.  Engine vs oracle."""
    from web3research_etl_ray.oracle import in_orphan_range

    cases = [
        [(80, 120), (90, 100)],            # nested
        [(80, 110), (100, 130)],           # overlapping
        [(10, 20), (15, 16), (18, 40), (100, 100)],  # chain + point
    ]
    seqs = np.arange(0, 150, dtype=np.int64)
    for ranges in cases:
        got = orphan_mask(seqs, ranges)
        want = np.array([in_orphan_range(int(s), ranges) for s in seqs])
        assert got.tolist() == want.tolist(), ranges


def test_delete_wins_then_dropped_at_merge():
    t = _normalized([("r", "a", 5, "upsert"), ("r", "a", 6, "delete")])
    t = t.append_column("n_events", pa.array([1, 1], pa.int64()))
    out = fold_lww(t)
    assert out.num_rows == 1 and out.column("op")[0].as_py() == "delete"


def test_normalize_unifies_v1_batch():
    t = _events([("r", "a", 1, "upsert")])
    out = Normalize(4, [])(t)
    for name in UNIFIED_EVENT_SCHEMA.names:
        assert name in out.column_names
    assert out.column("metadata")[0].as_py() is None
    assert out.column("size_bytes")[0].as_py() is None
    # content_sha256 is computed at merge time (winners only), not here
    assert "content_sha256" not in out.column_names
    import hashlib

    from web3research_etl_ray.functions.hashing import sha256_binary

    assert (
        sha256_binary(out.column("content"))[0].as_py()
        == hashlib.sha256(b"body-r-a-1").digest()
    )


def test_fold_lww_sum_cols_accumulate_and_associate():
    """sum_cols generalize the fold to SummingMergeTree semantics:
    per-key sums (null = 0), other payload from the max-order row, and
    the fold is associative over any split of the rows."""
    import pyarrow as pa

    from web3research_etl_ray.stages.lww import fold_lww

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "a", "b"]),
            "seq": pa.array([1, 3, 2, 2, 9], pa.int64()),
            "n_events": pa.array([1, 1, 1, 1, 1], pa.int64()),
            "add": pa.array([10, None, 5, 7, 1], pa.int64()),
            "payload": pa.array(["p1", "p3", "q2", "p2", "q9"]),
        }
    )
    out = fold_lww(t, "n_events", ("k",), "seq", sum_cols=("add",))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows["a"]["add"] == 17 and rows["b"]["add"] == 6  # null = 0
    assert rows["a"]["payload"] == "p3" and rows["b"]["payload"] == "q9"
    assert rows["a"]["n_events"] == 3 and rows["b"]["n_events"] == 2

    # associativity: fold halves, then fold the folded halves
    h1 = fold_lww(t.slice(0, 2), "n_events", ("k",), "seq", sum_cols=("add",))
    h2 = fold_lww(t.slice(2), "n_events", ("k",), "seq", sum_cols=("add",))
    refold = fold_lww(
        pa.concat_tables([h1, h2]), "n_events", ("k",), "seq",
        sum_cols=("add",),
    )
    assert sorted(refold.to_pylist(), key=lambda r: r["k"]) == sorted(
        out.to_pylist(), key=lambda r: r["k"]
    )


def test_fold_lww_min_max_cols():
    """AggregatingMergeTree family: running min/max per key, nulls
    ignored, all-null key → null, associative over splits."""
    import pyarrow as pa

    from web3research_etl_ray.stages.lww import fold_lww

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "a", "b", "c"]),
            "seq": pa.array([1, 3, 2, 2, 9, 4], pa.int64()),
            "n_events": pa.array([1] * 6, pa.int64()),
            "lo": pa.array([5, None, 7, 2, 3, None], pa.int64()),
            "hi": pa.array([5.0, 9.5, 7.0, None, 3.0, None], pa.float64()),
        }
    )
    out = fold_lww(t, "n_events", ("k",), "seq",
                   min_cols=("lo",), max_cols=("hi",))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows["a"]["lo"] == 2 and rows["b"]["lo"] == 3
    assert rows["a"]["hi"] == 9.5 and rows["b"]["hi"] == 7.0
    assert rows["c"]["lo"] is None and rows["c"]["hi"] is None

    h1 = fold_lww(t.slice(0, 3), "n_events", ("k",), "seq",
                  min_cols=("lo",), max_cols=("hi",))
    h2 = fold_lww(t.slice(3), "n_events", ("k",), "seq",
                  min_cols=("lo",), max_cols=("hi",))
    refold = fold_lww(pa.concat_tables([h1, h2]), "n_events", ("k",), "seq",
                      min_cols=("lo",), max_cols=("hi",))
    assert sorted(refold.to_pylist(), key=lambda r: r["k"]) == sorted(
        out.to_pylist(), key=lambda r: r["k"]
    )


def test_fold_lww_int_min_max_exact_above_2_53():
    """Integer min/max columns with nulls must stay integer-exact:
    the old ±inf-via-float64 sentinel rounded values above 2^53
    (ADVICE r02).  Hash-like ids differing only in the low bits must
    reduce exactly; all-null groups still null."""
    import pyarrow as pa

    from web3research_etl_ray.stages.lww import fold_lww

    big = 2**60 + 1  # not representable in float64 (rounds to 2^60)
    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b", "c"]),
            "seq": pa.array([1, 2, 1, 2, 1], pa.int64()),
            "n_events": pa.array([1] * 5, pa.int64()),
            "lo": pa.array([big, None, big + 2, big + 4, None], pa.int64()),
            "hi": pa.array([None, big, big + 2, big + 4, None], pa.int64()),
        }
    )
    out = fold_lww(t, "n_events", ("k",), "seq",
                   min_cols=("lo",), max_cols=("hi",))
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows["a"]["lo"] == big and rows["a"]["hi"] == big  # exact, odd
    assert rows["b"]["lo"] == big + 2 and rows["b"]["hi"] == big + 4
    assert rows["c"]["lo"] is None and rows["c"]["hi"] is None


def test_prior_cache_staleness_guard(tmp_path):
    """The fused-merge prior cache must serve a hit only while the
    on-disk bytes are the cached bytes: a rewrite of the same path
    (the crashed-then-rerun window) invalidates via (mtime_ns, size)."""
    import os
    import time

    import pyarrow.parquet as pq

    from web3research_etl_ray.stages.merge import (
        _PRIOR_CACHE,
        _read_prior_cached,
    )

    p = str(tmp_path / "part.parquet")
    t1 = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(t1, p)
    got1 = _read_prior_cached(p)
    assert got1.equals(t1) and p in _PRIOR_CACHE
    # hit: same object served
    assert _read_prior_cached(p) is got1
    # rewrite the path with different content (ensure mtime moves)
    time.sleep(0.02)
    t2 = pa.table({"a": pa.array([9, 9], pa.int64())})
    pq.write_table(t2, p)
    os.utime(p)
    got2 = _read_prior_cached(p)
    assert got2.equals(t2)
    _PRIOR_CACHE.pop(p, None)
