"""Tron-width 44-table fan-out registry (VERDICT r03 Next #3/#4/#5):

* all 44 tables land in ONE MultiManifest generation, re-tick is
  idempotent, partial+resume equals one-shot;
* the decimal256(76,0) payload (UInt256 analogue), the binary(20) KEY
  (FixedString analogue) and the list<struct<..., map_>> payload
  (Map-inside-Nested, reference src/ch_tron/schema.rs:1976-1984)
  survive the full spool → merge → commit path bit-exact;
* additive / min-max tables fold correctly at this width;
* check_fanout conformance passes over the wide lake.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from web3research_etl_ray.oracle import (
    in_orphan_range,
    load_rollback_ranges,
    oracle_fold,
    tables_equal,
)
from web3research_etl_ray.pipelines.fanout import fanout_table, replay_fanout
from web3research_etl_ray.pipelines.replay import event_files
from web3research_etl_ray.pipelines.wide import (
    _addr20,
    tron_width_tables,
)
from web3research_etl_ray.schema import unify_to
from web3research_etl_ray.state.manifest import load_latest_multi


def _stream_rows(stream_dir):
    """Non-orphaned unified events, one dict per row."""
    import pyarrow.dataset as pads

    ranges = load_rollback_ranges(stream_dir)
    rows = []
    for f in event_files(stream_dir):
        t = unify_to(pads.dataset(f).to_table())
        for r in t.to_pylist():
            if not in_orphan_range(r["commit_seq"], ranges):
                rows.append(r)
    return rows


def _lww_winners(rows, keyfn):
    best = {}
    for r in rows:
        k = keyfn(r)
        if k not in best or r["commit_seq"] > best[k]["commit_seq"]:
            best[k] = r
    return {k: r for k, r in best.items() if r["op"] != "delete"}


@pytest.fixture(scope="module")
def wide_lake(tiny_stream, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wide") / "mlake")
    m = replay_fanout(tiny_stream, d, tron_width_tables(), num_partitions=8)
    return d, m


def test_44_tables_one_generation(wide_lake, tiny_stream):
    d, m = wide_lake
    assert len(m.tables) == 44
    assert m.generation == 0
    assert load_latest_multi(d).generation == 0
    # base table still oracle-exact at full width
    assert tables_equal(fanout_table(d, "repo_files"), oracle_fold(tiny_stream))


def test_decimal256_valuations_exact(wide_lake, tiny_stream):
    d, _ = wide_lake
    t = fanout_table(d, "w_valuations")
    assert t.schema.field("value_wei").type == pa.decimal256(76, 0)
    winners = _lww_winners(
        _stream_rows(tiny_stream), lambda r: (r["repo"], r["path"])
    )
    got = {
        (r["repo"], r["path"]): int(r["value_wei"])
        for r in t.to_pylist()
    }
    want = {
        k: len(r["content"]) * 1_000_000_000 + r["commit_seq"]
        for k, r in winners.items()
    }
    assert got == want


def test_binary20_key_addresses(wide_lake, tiny_stream):
    d, _ = wide_lake
    t = fanout_table(d, "w_addresses")
    assert t.schema.field("addr").type == pa.binary(20)
    winners = _lww_winners(
        _stream_rows(tiny_stream), lambda r: (r["repo"], r["path"])
    )
    # addr is a pure function of (repo, path): same winner set
    assert t.num_rows == len(winners)
    # spot-check the derivation end-to-end for a handful of rows
    sample = t.slice(0, 10).to_pylist()
    for r in sample:
        a = _addr20(
            pa.chunked_array([pa.array([r["repo"]])]),
            pa.chunked_array([pa.array([r["path"]])]),
        )[0].as_py()
        assert a == r["addr"]


def test_map_inside_nested_roundtrip(wide_lake, tiny_stream):
    d, _ = wide_lake
    t = fanout_table(d, "w_refs")
    f = t.schema.field("refs")
    assert pa.types.is_list(f.type)
    assert pa.types.is_struct(f.type.value_type)
    assert pa.types.is_map(f.type.value_type.field("counts").type)
    winners = _lww_winners(
        _stream_rows(tiny_stream), lambda r: (r["repo"], r["path"])
    )
    got = {}
    for r in t.to_pylist():
        (ref,) = r["refs"]  # exactly one element per row
        got[(r["repo"], r["path"])] = (ref["name"], dict(ref["counts"]))
    want = {
        k: (r["lang"], {"len": len(r["content"]), "seq": r["commit_seq"]})
        for k, r in winners.items()
    }
    assert got == want


def test_additive_and_minmax_at_width(wide_lake, tiny_stream):
    d, _ = wide_lake
    rows = _stream_rows(tiny_stream)
    # additive: per-repo change counts across ALL events (incl deletes)
    want_n = {}
    for r in rows:
        want_n[r["repo"]] = want_n.get(r["repo"], 0) + 1
    act = fanout_table(d, "w_repo_activity")
    got_n = dict(
        zip(act["repo"].to_pylist(), act["n_changes"].to_pylist())
    )
    assert got_n == want_n
    # min/max: global first/last seq per repo
    fl = fanout_table(d, "w_repo_firstlast")
    want_first, want_last = {}, {}
    for r in rows:
        repo, s = r["repo"], r["commit_seq"]
        want_first[repo] = min(want_first.get(repo, s), s)
        want_last[repo] = max(want_last.get(repo, s), s)
    assert dict(zip(fl["repo"].to_pylist(), fl["first_seq"].to_pylist())) == want_first
    assert dict(zip(fl["repo"].to_pylist(), fl["last_seq"].to_pylist())) == want_last
    # sharded min/max union == global table
    shard_rows = {}
    for s in range(10):
        st = fanout_table(d, f"w_shard_{s}")
        for r in st.to_pylist():
            assert r["repo"] not in shard_rows  # shards are disjoint
            shard_rows[r["repo"]] = (r["first_seq"], r["last_seq"])
    assert shard_rows == {
        repo: (want_first[repo], want_last[repo]) for repo in want_first
    }


def test_per_lang_file_tables_partition_base(wide_lake, tiny_stream):
    d, _ = wide_lake
    winners = _lww_winners(
        _stream_rows(tiny_stream), lambda r: (r["repo"], r["path"])
    )
    # the 7 per-lang LWW tables partition the base winner set by the
    # WINNER's lang (tombstones pass through per table)
    from web3research_etl_ray.schema import LANGS

    per_lang_keys = set()
    for lang in LANGS:
        t = fanout_table(d, f"w_files_{lang}")
        keys = set(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
        per_lang_keys |= keys
        # every key's winner in THIS table has that lang in the stream
        lang_rows = [
            r for r in _stream_rows(tiny_stream) if r["lang"] == lang
        ]
        want = _lww_winners(lang_rows, lambda r: (r["repo"], r["path"]))
        assert keys == set(want)
    assert per_lang_keys >= set(winners)


def test_partial_then_resume_equals_oneshot(tiny_stream, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    tables = tron_width_tables()
    replay_fanout(tiny_stream, a, tables, num_partitions=8)
    replay_fanout(tiny_stream, b, tables, num_partitions=8, upto_seq=900)
    replay_fanout(tiny_stream, b, tables, num_partitions=8)
    for name in load_latest_multi(a).tables:
        ta = fanout_table(a, name)
        tb = fanout_table(b, name)
        cols = sorted(ta.column_names)
        ra = sorted(
            tuple(str(r[c]) for c in cols) for r in ta.to_pylist()
        )
        rb = sorted(
            tuple(str(r[c]) for c in cols) for r in tb.to_pylist()
        )
        assert ra == rb, name


def test_check_fanout_conformance(wide_lake, tiny_stream):
    from web3research_etl_ray.pipelines.check import check_fanout

    d, _ = wide_lake
    report = check_fanout(tiny_stream, d, tron_width_tables())
    bad = {name: r for name, r in report.items() if not r.ok}
    assert not bad, bad


def test_sync_fanout_at_width(tiny_stream, tmp_path):
    """Multi-tick incremental sync over the full 44-table registry: a
    growing landing zone absorbed tick by tick, every tick one
    cross-table-atomic generation, final state == one-shot."""
    from web3research_etl_ray.pipelines.tail import sync_fanout

    live = str(tmp_path / "live")
    os.makedirs(live)
    for f in os.listdir(tiny_stream):
        if not f.startswith("events-"):
            shutil.copy(os.path.join(tiny_stream, f), os.path.join(live, f))
    segs = event_files(tiny_stream)
    tables = tron_width_tables()
    lake = str(tmp_path / "mlake")

    def land(tick, manifest):
        if tick < len(segs) - 1:
            nxt = segs[tick + 1]
            shutil.copy(nxt, os.path.join(live, os.path.basename(nxt)))

    shutil.copy(segs[0], os.path.join(live, os.path.basename(segs[0])))
    m = sync_fanout(live, lake, tables, max_ticks=len(segs),
                    num_partitions=8, on_tick=land)
    assert m.generation == len(segs) - 1
    one_shot = str(tmp_path / "oneshot")
    replay_fanout(tiny_stream, one_shot, tables, num_partitions=8)
    for name in ("repo_files", "w_valuations", "w_addresses", "w_refs",
                 "w_repo_activity", "w_shard_3", "w_repo_firstlast"):
        ta = fanout_table(one_shot, name)
        tb = fanout_table(lake, name)
        cols = sorted(ta.column_names)
        ra = sorted(tuple(str(r[c]) for c in cols) for r in ta.to_pylist())
        rb = sorted(tuple(str(r[c]) for c in cols) for r in tb.to_pylist())
        assert ra == rb, name


def test_crash_before_commit_at_width(tiny_stream, tmp_path):
    """A crash after the merge work but BEFORE the multi-manifest
    pointer swap leaves NO table advanced (44-way lockstep), and the
    rerun converges to the one-shot state."""
    lake = str(tmp_path / "mlake")
    tables = tron_width_tables()
    with pytest.raises(RuntimeError, match="injected crash"):
        replay_fanout(tiny_stream, lake, tables, num_partitions=8,
                      _crash_before_commit=True)
    assert load_latest_multi(lake) is None  # nothing committed
    m = replay_fanout(tiny_stream, lake, tables, num_partitions=8)
    assert len(m.tables) == 44 and m.generation == 0
    ref = str(tmp_path / "ref")
    replay_fanout(tiny_stream, ref, tables, num_partitions=8)
    for name in ("repo_files", "w_valuations", "w_refs", "w_repo_activity"):
        ta = fanout_table(ref, name)
        tb = fanout_table(lake, name)
        cols = sorted(ta.column_names)
        ra = sorted(tuple(str(r[c]) for c in cols) for r in ta.to_pylist())
        rb = sorted(tuple(str(r[c]) for c in cols) for r in tb.to_pylist())
        assert ra == rb, name


def test_check_fanout_detects_nested_mismatch(tiny_stream, tmp_path):
    """The vectorized nested compare (check.nested_equal) must still
    DETECT a corrupted map-inside-nested payload: flip one map value in
    one w_refs data file and the conformance check flags exactly that
    partition as mismatched."""
    from web3research_etl_ray.pipelines.check import check_fanout
    from web3research_etl_ray.state.manifest import load_latest_multi

    refs_only = [t for t in tron_width_tables() if t.spec.name == "w_refs"]
    assert len(refs_only) == 1
    lake = str(tmp_path / "mlake")
    replay_fanout(tiny_stream, lake, refs_only, num_partitions=8)
    clean = check_fanout(tiny_stream, lake, refs_only)["w_refs"]
    assert clean.ok, clean

    # corrupt one row's counts["seq"] inside one parquet file
    import pyarrow.parquet as pq

    ts = load_latest_multi(lake).tables["w_refs"]
    victim = next(f for f in ts.data_files(lake) if pq.read_table(f).num_rows)
    t = pq.read_table(victim)
    rows = t.column("refs").to_pylist()
    ref0 = dict(rows[0][0])
    ref0["counts"] = [(k, v + 1 if k == "seq" else v)
                     for k, v in ref0["counts"]]
    rows[0] = [ref0] + list(rows[0][1:])
    t = t.set_column(
        t.schema.get_field_index("refs"),
        t.schema.field("refs"),
        pa.array(rows, t.schema.field("refs").type),
    )
    pq.write_table(t, victim)

    report = check_fanout(tiny_stream, lake, refs_only)["w_refs"]
    assert not report.ok
    assert report.mismatched >= 1
    assert report.missing == 0 and report.extra == 0
    assert report.bad_partitions
