"""check / repair / tail pipeline tests (reference check.rs + sync.rs)."""

import glob
import os

import pyarrow.parquet as pq

from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.check import check, check_and_repair, verify_integrity
from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.pipelines.tail import sync
from web3research_etl_ray.state.manifest import load_latest


def test_check_clean_lake(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    report = check(tiny_stream, lake_dir)
    assert report.ok, report
    assert report.rows_expected == report.rows_in_lake > 0


def test_check_detects_and_repairs_corruption(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    # corrupt one partition file: drop half its rows (simulated data loss)
    m = load_latest(lake_dir)
    victim = next(e for e in m.partitions.values() if e.file and e.num_rows > 2)
    path = os.path.join(lake_dir, victim.file)
    t = pq.read_table(path)
    pq.write_table(t.slice(0, t.num_rows // 2), path)

    report = check(tiny_stream, lake_dir)
    assert not report.ok and report.missing > 0
    assert victim.part_id in report.bad_partitions

    report2 = check_and_repair(tiny_stream, lake_dir)
    final = check(tiny_stream, lake_dir)
    assert final.ok, final
    assert tables_equal(lake_table(lake_dir), oracle_fold(tiny_stream))


def test_integrity_detects_bitrot(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    assert sum(verify_integrity(lake_dir).values()) == 0
    # flip content of one row, keeping the stored (now stale) sha256
    m = load_latest(lake_dir)
    victim = next(e for e in m.partitions.values() if e.file and e.num_rows > 0)
    path = os.path.join(lake_dir, victim.file)
    t = pq.read_table(path)
    import pyarrow as pa

    contents = t.column("content").to_pylist()
    contents[0] = contents[0] + "_BITROT"
    t = t.set_column(
        t.schema.get_field_index("content"), "content", pa.array(contents)
    )
    pq.write_table(t, path)
    bad = verify_integrity(lake_dir)
    assert bad.get(victim.part_id, 0) == 1
    report = check(tiny_stream, lake_dir)
    assert report.corrupt == 1 and victim.part_id in report.bad_partitions


def test_sync_ticks_with_growing_stream(tmp_path, tiny_stream):
    """Simulate tailing: start with a prefix of segments, add the rest,
    tick again — converges to full-replay state."""
    import shutil

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    segs = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))
    shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)
    for s in segs[:2]:
        shutil.copy(s, stream)
    lake = str(tmp_path / "lake")
    sync(stream, lake, max_ticks=1, num_partitions=8)
    wm1 = load_latest(lake).max_watermark
    for s in segs[2:]:
        shutil.copy(s, stream)
    sync(stream, lake, max_ticks=1, check_every=1, num_partitions=8)
    assert load_latest(lake).max_watermark > wm1
    assert tables_equal(lake_table(lake), oracle_fold(tiny_stream))


def test_cli_roundtrip(tmp_path):
    """Drive the CLI surface end-to-end in-process (gen → init → check)."""
    from web3research_etl_ray.__main__ import main

    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    assert main(["gen", "--out", stream, "--n-events", "500", "--seed", "1"]) == 0
    assert (
        main(["init", "--stream", stream, "--lake", lake, "--partitions", "4"]) == 0
    )
    assert main(["check", "--stream", stream, "--lake", lake]) == 0
    assert tables_equal(lake_table(lake), oracle_fold(stream))


def test_demux_roundtrip(tmp_path):
    import ray.data

    from web3research_etl_ray.pipelines.demux import demux_to_tables, read_demuxed

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    info = demux_to_tables(ds, "event_type", str(tmp_path / "demux"))
    assert sum(v["rows"] for v in info.values()) == 1000
    one = next(iter(info))
    sub = read_demuxed(str(tmp_path / "demux"), "event_type", one)
    assert sub.count() == info[one]["rows"]


def test_stats_cli_and_exec_profile(tmp_path):
    from web3research_etl_ray.__main__ import main

    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    assert main(["gen", "--out", stream, "--n-events", "400", "--seed", "2"]) == 0
    assert main(["init", "--stream", stream, "--lake", lake, "--partitions", "4"]) == 0
    assert main(["stats", "--lake", lake, "--partitions"]) == 0
    # per-generation execution profile persisted beside the lake
    logs = os.listdir(os.path.join(lake, "logs"))
    assert any(f.startswith("gen-000000") for f in logs)


def test_check_windowed(tiny_stream, lake_dir):
    """Trailing-window re-check (the reference's 100k-block window,
    src/ch_eth/sync.rs:348): only keys whose winner falls in the window
    are compared, and a clean lake stays clean."""
    replay(tiny_stream, lake_dir, num_partitions=8)
    full = check(tiny_stream, lake_dir)
    windowed = check(tiny_stream, lake_dir, from_seq=1500)
    assert windowed.ok
    assert 0 < windowed.rows_expected < full.rows_expected


def test_cli_fanout_verbs(tmp_path):
    """init-fanout / sync-fanout / check-fanout drive the multi-table
    lake end-to-end with the table set resolved from 'module:callable'
    (the CLI analogue of the reference's per-chain registry)."""
    from web3research_etl_ray.__main__ import main

    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "mlake")
    assert main(["gen", "--out", stream, "--n-events", "600", "--seed", "3"]) == 0
    assert main([
        "init-fanout", "--stream", stream, "--lake", lake,
        "--tables", "tests.test_fanout:_tables", "--partitions", "4",
    ]) == 0
    assert main([
        "sync-fanout", "--stream", stream, "--lake", lake,
        "--tables", "tests.test_fanout:_tables", "--partitions", "4",
        "--ticks", "2", "--check-every", "2",
    ]) == 0
    assert main([
        "check-fanout", "--stream", stream, "--lake", lake,
        "--tables", "tests.test_fanout:_tables",
    ]) == 0

    from tests.test_fanout import _heads_oracle
    from web3research_etl_ray.pipelines.fanout import fanout_table

    heads = fanout_table(lake, "repo_heads")
    got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                heads["commit"].to_pylist())}
    assert got == _heads_oracle(stream)


def test_query_cli_verb(tmp_path, capsys):
    """`query` runs any registry entry from the CLI: --list enumerates
    with oracle flags, a run prints rows + total, --out writes parquet."""
    import json

    import pyarrow.parquet as pq

    from web3research_etl_ray.__main__ import main

    assert main(["query", "--list"]) == 0
    listing = json.loads(capsys.readouterr().out.strip())
    assert listing["distinct_langs"] == "o"
    assert listing["bpe_encode_documents"] == "rows-only"

    assert main(["query", "distinct_langs",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["rows_total"] == 5

    out = str(tmp_path / "wm.parquet")
    assert main(["query", "watermark_events",
                 "--sf-dir", "/root/testdata/sf0.001", "--out", out]) == 0
    assert pq.read_table(out).num_rows == 1


# --- nested_equal: vectorized structural equality (VERDICT r04) ------

def _ne(a, b):
    import pyarrow as pa

    from web3research_etl_ray.pipelines.check import nested_equal

    return nested_equal(pa.array(a[0], a[1]) if isinstance(a, tuple) else a,
                        pa.array(b[0], b[1]) if isinstance(b, tuple) else b)


def test_nested_equal_lists_structs_maps():
    import numpy as np
    import pyarrow as pa

    # plain lists: equal, value diff, length diff, null semantics
    a = pa.array([[1, 2], [3], None, [], [5, None]],
                 pa.list_(pa.int64()))
    b = pa.array([[1, 2], [3, 4], None, [], [5, 6]],
                 pa.list_(pa.int64()))
    assert _ne(a, b).tolist() == [True, False, True, True, False]
    # struct with nested list
    ty = pa.struct([("x", pa.int64()), ("ys", pa.list_(pa.string()))])
    a = pa.array([{"x": 1, "ys": ["a"]}, {"x": 2, "ys": []}, None],
                 ty)
    b = pa.array([{"x": 1, "ys": ["a"]}, {"x": 2, "ys": ["b"]}, None],
                 ty)
    assert _ne(a, b).tolist() == [True, False, True]
    # map inside list-of-struct — the w_refs shape
    mty = pa.list_(pa.struct([("tag", pa.string()),
                              ("counts", pa.map_(pa.string(), pa.int64()))]))
    a = pa.array([[{"tag": "t", "counts": [("len", 3), ("seq", 7)]}],
                  [{"tag": "u", "counts": [("len", 1), ("seq", 2)]}]], mty)
    b = pa.array([[{"tag": "t", "counts": [("len", 3), ("seq", 7)]}],
                  [{"tag": "u", "counts": [("len", 1), ("seq", 99)]}]], mty)
    got = _ne(a, b)
    assert got.tolist() == [True, False]
    assert got.dtype == np.bool_


def test_nested_equal_matches_pylist_on_slices_and_chunks():
    """Offset/chunk-layout independence: sliced and chunked inputs must
    compare by VALUE exactly like to_pylist equality did."""
    import pyarrow as pa

    ty = pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())]))
    rows = [[{"k": "a", "v": i}] if i % 3 else None for i in range(10)]
    rows2 = [([{"k": "a", "v": -i}] if i % 4 == 0 else r)
             for i, r in enumerate(rows)]
    a = pa.array(rows, ty).slice(2, 6)
    b0 = pa.array(rows2, ty)
    b = pa.chunked_array([b0.slice(2, 3), b0.slice(5, 3)])
    want = [x == y for x, y in
            zip(a.to_pylist(), b.combine_chunks().to_pylist())]
    assert _ne(a, b).tolist() == want


def test_nested_equal_binary_and_decimal_leaves():
    import pyarrow as pa

    a = pa.array([[b"\x00\x01"], [b"\xff"]], pa.list_(pa.binary()))
    b = pa.array([[b"\x00\x01"], [b"\xfe"]], pa.list_(pa.binary()))
    assert _ne(a, b).tolist() == [True, False]
    d = pa.decimal256(76, 0)
    a = pa.array([[10 ** 40], [2]], pa.list_(d))
    b = pa.array([[10 ** 40], [3]], pa.list_(d))
    assert _ne(a, b).tolist() == [True, False]


def test_length_prefixed_join_unambiguous():
    """ADVICE r04: with a \\x00 separator, ('a\\x00','b') and
    ('a','\\x00b') joined identically — framing must distinguish
    them, and equal tuples must still join equally."""
    import pyarrow as pa

    from web3research_etl_ray.functions.hashing import length_prefixed_join

    k1 = length_prefixed_join(
        [pa.array([b"a\x00", b"x"], pa.binary()),
         pa.array([b"b", b"y"], pa.binary())]
    )
    k2 = length_prefixed_join(
        [pa.array([b"a", b"x"], pa.binary()),
         pa.array([b"\x00b", b"y"], pa.binary())]
    )
    assert k1[0].as_py() != k2[0].as_py()  # distinct tuples differ
    assert k1[1].as_py() == k2[1].as_py()  # identical tuples agree


def test_sync_watch_applies_heads_as_they_land(tmp_path, tiny_stream):
    """Push-per-head mode (VERDICT r04 Next #5, reference
    src/ch_eth/sync.rs:118-145): a background producer lands one
    segment at a time; sync(watch=True) blocks on the landing zone and
    applies each head as it arrives.  Converges to the full-replay
    oracle with one generation per landed head."""
    import shutil
    import threading
    import time as _time

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    segs = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))
    shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)
    shutil.copy(segs[0], stream)

    def producer():
        for s in segs[1:]:
            _time.sleep(0.3)
            shutil.copy(s, stream + "/.tmp-" + os.path.basename(s))
            os.replace(
                stream + "/.tmp-" + os.path.basename(s),
                os.path.join(stream, os.path.basename(s)),
            )

    lake = str(tmp_path / "lake")
    t = threading.Thread(target=producer)
    t.start()
    sync(
        stream,
        lake,
        watch=True,
        max_ticks=len(segs),
        watch_timeout_s=2.0,
        num_partitions=8,
    )
    t.join()
    m = load_latest(lake)
    # every landed head applied (coalescing ticks is legal, so the
    # generation count is >= 1 and <= one per head); the loop must
    # have woken at least once on a pushed head
    assert 1 <= m.generation <= len(segs) - 1
    assert tables_equal(lake_table(lake), oracle_fold(tiny_stream))


def test_sync_watch_idle_timeout_returns(tmp_path, tiny_stream):
    """With no new heads, watch mode returns after watch_timeout_s
    instead of ticking on a timer (and instead of blocking forever)."""
    import shutil
    import time as _time

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    segs = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))
    shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)
    shutil.copy(segs[0], stream)
    lake = str(tmp_path / "lake")
    t0 = _time.monotonic()
    sync(
        stream,
        lake,
        watch=True,
        max_ticks=10,
        watch_timeout_s=0.3,
        num_partitions=8,
    )
    elapsed = _time.monotonic() - t0
    # tick 0 applied the backlog; the loop then idled out once —
    # nowhere near 10 ticks' worth of work
    assert elapsed < 10.0
    m = load_latest(lake)
    assert m is not None and m.generation == 0
