"""GDPR purge: watermarked tombstones must hold across every rebuild
path — live reads, point lookups, future ticks, forced full rebuilds,
conformance checks — while post-purge upserts of the same key still
apply.  Physical history erasure composes with gc_generations."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from web3research_etl_ray.oracle import diff_tables, oracle_fold, tables_equal
from web3research_etl_ray.pipelines.purge import load_purge_list, purge
from web3research_etl_ray.pipelines.replay import lake_table, lookup_key, replay
from web3research_etl_ray.state.manifest import gc_generations, load_latest


def _pick_keys(lake: pa.Table, n: int = 3) -> pa.Table:
    t = lake.sort_by([("repo", "ascending"), ("path", "ascending")])
    return t.select(["repo", "path"]).slice(5, n)


def _minus_keys(t: pa.Table, keys: pa.Table) -> pa.Table:
    from web3research_etl_ray.pipelines.purge import composite_key

    comp = composite_key(t, ["repo", "path"])
    kc = composite_key(keys, ["repo", "path"])
    return t.filter(pc.invert(pc.is_in(comp, value_set=kc)))


def test_purge_removes_live_rows_and_lookup(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    before = lake_table(lake_dir)
    keys = _pick_keys(before)
    rep = purge(lake_dir, keys)
    assert rep["rows_purged"] == keys.num_rows
    assert rep["keys"] == keys.num_rows
    after = lake_table(lake_dir)
    exp = _minus_keys(before, keys)
    assert tables_equal(after, exp), diff_tables(after, exp)
    k0 = keys.to_pylist()[0]
    assert lookup_key(lake_dir, k0["repo"], k0["path"]) is None
    # untouched partitions carry their files forward byte-identically
    m_before = load_latest(lake_dir)
    assert m_before.generation == rep["generation"]


def test_purge_survives_tick_and_full_rebuild(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    keys = _pick_keys(lake_table(lake_dir))
    purge(lake_dir, keys)
    exp = _minus_keys(oracle_fold(tiny_stream), keys)

    # a no-new-data tick must not resurrect
    replay(tiny_stream, lake_dir, num_partitions=8)
    got = lake_table(lake_dir)
    assert tables_equal(got, exp), diff_tables(got, exp)

    # a forced FULL rebuild replays all history through normalize —
    # the tombstones must hold there too
    m = load_latest(lake_dir)
    replay(
        tiny_stream,
        lake_dir,
        num_partitions=8,
        force_repair_pids=frozenset(range(m.num_partitions)),
    )
    got = lake_table(lake_dir)
    assert tables_equal(got, exp), diff_tables(got, exp)


def test_post_purge_upsert_reapplies(tiny_stream, tmp_path):
    """An upsert PAST purge_seq is new data, not erased history."""
    import shutil

    stream = str(tmp_path / "stream")
    shutil.copytree(tiny_stream, stream)
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8)
    keys = _pick_keys(lake_table(lake), n=1)
    purge(lake, keys)
    k = keys.to_pylist()[0]

    seg = sorted(glob.glob(f"{stream}/events-*.parquet"))[-1]
    base = pq.read_table(seg)
    max_seq = int(pc.max(base.column("commit_seq")).as_py())
    template = base.slice(0, 1).to_pylist()[0]
    template.update(
        repo=k["repo"], path=k["path"], commit_seq=max_seq + 1,
        op="upsert", content="back by consent",
    )
    add = pa.table(
        {name: [template.get(name)] for name in base.column_names}
    ).cast(base.schema)
    pq.write_table(add, f"{stream}/events-99999.parquet")

    replay(stream, lake, num_partitions=8)
    got = lookup_key(lake, k["repo"], k["path"])
    assert got is not None and got["commit_seq"] == max_seq + 1
    # and the pre-purge winner for that key is still NOT part of state:
    # nothing else changed vs oracle-minus-purged + the new row
    exp = _minus_keys(oracle_fold(stream), keys)
    lk = lake_table(lake)
    assert lk.num_rows == exp.num_rows + 1


def test_purge_is_idempotent_and_monotone(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    keys = _pick_keys(lake_table(lake_dir))
    r1 = purge(lake_dir, keys)
    after1 = lake_table(lake_dir)
    r2 = purge(lake_dir, keys)  # same keys again: no-op on rows
    after2 = lake_table(lake_dir)
    assert tables_equal(after1, after2)
    assert r2["rows_purged"] == 0
    assert r2["tombstones_total"] == r1["tombstones_total"]
    pl = load_purge_list(lake_dir)
    assert pl.num_rows == keys.num_rows
    # purge of a key that never existed records a tombstone, purges 0
    ghost = pa.table({"repo": ["no/such"], "path": ["nope.py"]})
    r3 = purge(lake_dir, ghost)
    assert r3["rows_purged"] == 0 and r3["tombstones_total"] == keys.num_rows + 1


def test_purge_then_check_is_clean(tiny_stream, lake_dir):
    from web3research_etl_ray.pipelines.check import check

    replay(tiny_stream, lake_dir, num_partitions=8)
    keys = _pick_keys(lake_table(lake_dir))
    purge(lake_dir, keys)
    report = check(tiny_stream, lake_dir)
    assert report.missing == 0 and report.mismatched == 0
    assert report.extra == 0 and report.corrupt == 0


def test_gc_erases_pre_purge_history_bytes(tiny_stream, lake_dir):
    """Time travel keeps purged bytes until gc; gc removes them."""
    replay(tiny_stream, lake_dir, num_partitions=8)
    keys = _pick_keys(lake_table(lake_dir), n=1)
    purge(lake_dir, keys)
    # generation 0 files still physically hold the purged row
    g0 = lake_table(lake_dir, generation=0)
    assert _minus_keys(g0, keys).num_rows == g0.num_rows - 1
    gc_generations(lake_dir, keep=1)
    with pytest.raises((FileNotFoundError, ValueError)):
        lake_table(lake_dir, generation=0)
    # no remaining partition file under the lake holds the key
    from web3research_etl_ray.pipelines.purge import composite_key

    kc = composite_key(keys, ["repo", "path"])
    for f in glob.glob(os.path.join(lake_dir, "**", "part-*.parquet"),
                       recursive=True):
        t = pq.read_table(f, columns=["repo", "path"])
        assert not pc.any(
            pc.is_in(composite_key(t, ["repo", "path"]), value_set=kc)
        ).as_py()


def test_purge_on_split_layout_routes_extended_pids(tiny_stream, lake_dir):
    """Purge must route keys through the SAME split-aware router as
    ingest — erasing from a depth-1/2 layout rewrites only the
    extended partitions that actually hold the keys."""
    from web3research_etl_ray.pipelines.replay import split_partitions

    replay(tiny_stream, lake_dir, num_partitions=8)
    split_partitions(lake_dir, [0])
    split_partitions(lake_dir, [0, 5])  # depth 2 + depth 1
    before = lake_table(lake_dir)
    keys = _pick_keys(before, n=5)
    rep = purge(lake_dir, keys)
    assert rep["rows_purged"] == keys.num_rows
    after = lake_table(lake_dir)
    exp = _minus_keys(before, keys)
    assert tables_equal(after, exp), diff_tables(after, exp)
    # rebuild through the split layout must not resurrect
    m = load_latest(lake_dir)
    replay(
        tiny_stream, lake_dir, num_partitions=8,
        force_repair_pids=frozenset(m.extended_pids()),
    )
    got = lake_table(lake_dir)
    exp2 = _minus_keys(oracle_fold(tiny_stream), keys)
    assert tables_equal(got, exp2), diff_tables(got, exp2)
