"""Wire-tail sync: the north rule's "binlog/WAL tail -> lake upsert"
as ONE loop — each tick lands newly appended wire bytes (WAL byte
offsets / Debezium file ledger) into the canonical stream, then
replays past the watermark.  Final lake must equal the oracle fold of
the full stream; re-landed frames (crash between land and state
persist, grown JSONL files) must be absorbed."""

import json
import os

import pyarrow.parquet as pq

from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table
from web3research_etl_ray.pipelines.tail import sync
from web3research_etl_ray.sources.debezium import DebeziumTail
from web3research_etl_ray.sources.wal import (
    WalTail,
    encode_record,
    encode_rollback,
    write_wal_segment,
)


def _stream_rows(stream_dir):
    import glob

    rows = []
    for f in sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet"))):
        rows.extend(pq.read_table(f).to_pylist())
    rows.sort(key=lambda r: r["commit_seq"])
    rbs = pq.read_table(os.path.join(stream_dir, "rollbacks.parquet")).to_pylist()
    return rows, rbs


def test_wal_tail_sync_converges(tmp_path):
    """Grow a WAL segment between sync ticks; wire= lands increments and
    the lake converges to the oracle of the full stream."""
    stream = ensure_stream(3_000)
    rows, rbs = _stream_rows(stream)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    seg = os.path.join(wal_dir, "wal-00000.log")
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")

    # three growth steps: frames 0..1000, ..2200 (+ rollbacks), ..end
    cuts = [1000, 2200, len(rows)]
    frames = [encode_record(r) for r in rows]
    step = {"i": 0}

    def grow(tick, manifest):
        # called AFTER each tick's replay: append the next slice so the
        # NEXT tick's land_new sees new bytes
        i = step["i"]
        if i + 1 < len(cuts):
            lo, hi = cuts[i], cuts[i + 1]
            extra = [encode_rollback(r["barrier_seq"], r["orphan_from"],
                                     r["orphan_to"]) for r in rbs] if i == 0 else []
            write_wal_segment(seg, frames[lo:hi] + extra, append=True)
            step["i"] = i + 1

    write_wal_segment(seg, frames[: cuts[0]])
    wire = WalTail(wal_dir, landing)
    sync(landing, lake, max_ticks=3, wire=wire, num_partitions=4,
         on_tick=grow)
    assert tables_equal(lake_table(lake), oracle_fold(stream))
    # offsets persisted: a fresh WalTail re-lands nothing
    wire2 = WalTail(wal_dir, landing)
    assert wire2.land_new()["events"] == 0


def test_wal_tail_crash_before_state_persist_is_benign(tmp_path):
    """Simulate a crash AFTER landing but BEFORE the offsets persist:
    the next tail derives coverage from the landing zone (landed names
    carry [start,end)) and skips the already-landed bytes entirely —
    zero duplicate frames, replay stays exact."""
    stream = ensure_stream(2_000)
    rows, rbs = _stream_rows(stream)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    seg = os.path.join(wal_dir, "wal-00000.log")
    write_wal_segment(
        seg,
        [encode_record(r) for r in rows]
        + [encode_rollback(r["barrier_seq"], r["orphan_from"], r["orphan_to"])
           for r in rbs],
    )
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")
    wire = WalTail(wal_dir, landing)
    wire.land_new()
    os.remove(wire.state_path)  # the crash: offsets lost
    wire_retry = WalTail(wal_dir, landing)
    info = wire_retry.land_new()  # coverage derived from landing zone
    assert info["events"] == 0  # nothing re-decoded, nothing duplicated
    import glob as _glob

    total = sum(
        pq.read_table(f).num_rows
        for f in _glob.glob(os.path.join(landing, "events-*.parquet"))
    )
    assert total == len(rows)
    sync(landing, lake, max_ticks=1, wire=wire_retry, num_partitions=4)
    assert tables_equal(lake_table(lake), oracle_fold(stream))


def test_debezium_tail_grown_file_and_new_file(tmp_path):
    """File-ledger tail: a grown JSONL is re-landed whole (duplicates
    absorbed), a new file lands incrementally, untouched files skip."""
    wire_dir = tmp_path / "wire"
    wire_dir.mkdir()
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")

    def env(seq, repo, path, content, op="c"):
        row = {"repo": repo, "path": path, "commit": f"c{seq}",
               "lang": "py", "content": content}
        e = {"op": op, "seq": seq,
             "before": row if op == "d" else None,
             "after": None if op == "d" else row}
        return json.dumps(e)

    f1 = wire_dir / "dump-000.jsonl"
    f1.write_text("\n".join([env(0, "r1", "a.py", "v0"),
                             env(1, "r1", "b.py", "v1")]) + "\n")
    tail = DebeziumTail(str(wire_dir), landing)
    sync(landing, lake, max_ticks=1, wire=tail, num_partitions=2)
    assert {r["path"] for r in lake_table(lake).to_pylist()} == {"a.py", "b.py"}

    # grow f1 (update a.py) + add f2 (delete b.py, add c.py)
    with open(f1, "a") as fh:
        fh.write(env(2, "r1", "a.py", "v2", "u") + "\n")
    (wire_dir / "dump-001.jsonl").write_text(
        "\n".join([env(3, "r1", "b.py", "", "d"),
                   env(4, "r1", "c.py", "v4")]) + "\n")
    sync(landing, lake, max_ticks=1, wire=tail, num_partitions=2)
    got = {r["path"]: r["content"] for r in lake_table(lake).to_pylist()}
    assert got == {"a.py": "v2", "c.py": "v4"}

    # nothing new: tick is a no-op land
    assert tail.land_new() == {"files": 0, "segments": 0, "rollbacks": 0}


def test_wal_crash_repeat_land_never_duplicates_frames(tmp_path):
    """Idempotent landing: a crash between landing and offset persist
    re-lands the same byte range — the deterministic (segment, offset)
    name OVERWRITES the earlier file, so the landing zone never holds
    two copies of a frame.  Required for additive (sum_cols) tables,
    where duplicates would permanently double-count (ADVICE r02)."""
    import glob

    from web3research_etl_ray.sources.wal import land_wal_segments

    stream = ensure_stream(2_000)
    rows, rbs = _stream_rows(stream)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    seg = os.path.join(wal_dir, "wal-00000.log")
    frames = [encode_record(r) for r in rows]
    write_wal_segment(seg, frames[:1200])
    landing = str(tmp_path / "landing")

    info1 = land_wal_segments(wal_dir, landing)
    # offsets lost (since={}): coverage is derived from the landing
    # zone, so only the newly appended bytes land
    write_wal_segment(seg, frames[1200:], append=True)
    land_wal_segments(wal_dir, landing)
    landed = sorted(glob.glob(os.path.join(landing, "events-*.parquet")))
    total = sum(pq.read_table(f).num_rows for f in landed)
    assert total == len(rows)  # every frame exactly once
    seqs = sorted(
        s for f in landed for s in pq.read_table(f)["commit_seq"].to_pylist()
    )
    assert len(set(seqs)) == len(seqs) == len(rows)
    # a land with STALE offsets (pre-growth) is a no-op, not a dup
    land_wal_segments(wal_dir, landing, since=info1["offsets"])
    landed = sorted(glob.glob(os.path.join(landing, "events-*.parquet")))
    total = sum(pq.read_table(f).num_rows for f in landed)
    assert total == len(rows)


def test_debezium_grown_file_reland_never_duplicates_frames(tmp_path):
    """A grown JSONL wire file re-lands WHOLE; the deterministic
    per-file segment name must overwrite, not append a second copy."""
    import glob
    import json as _json

    from web3research_etl_ray.sources.debezium import land_debezium_jsonl

    wire = str(tmp_path / "wire")
    os.makedirs(wire)
    f = os.path.join(wire, "dump-0.jsonl")
    envs = [
        {"op": "c", "before": None,
         "after": {"repo": "r1", "path": f"p{i}", "commit": f"c{i}",
                   "lang": "py", "content": f"x{i}"},
         "seq": i}
        for i in range(50)
    ]
    with open(f, "w") as fh:
        for e in envs[:30]:
            fh.write(_json.dumps(e) + "\n")
    landing = str(tmp_path / "landing")
    land_debezium_jsonl(wire, landing)
    with open(f, "a") as fh:
        for e in envs[30:]:
            fh.write(_json.dumps(e) + "\n")
    land_debezium_jsonl(wire, landing)  # whole-file re-land
    landed = sorted(glob.glob(os.path.join(landing, "events-*.parquet")))
    assert len(landed) == 1  # one segment per wire file, overwritten
    t = pq.read_table(landed[0])
    assert t.num_rows == 50
    assert sorted(t["commit_seq"].to_pylist()) == list(range(50))


def test_wal_tail_watch_mode_drains_wire_in_wait(tmp_path):
    """watch=True with a wire source: the WAL grows on the PRODUCER's
    clock (no on_tick callback), the watch wait itself drains the wire
    each poll, and every appended frame converges into the lake."""
    import threading
    import time as _time

    stream = ensure_stream(3_000)
    rows, rbs = _stream_rows(stream)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    seg = os.path.join(wal_dir, "wal-00000.log")
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")

    cuts = [0, 1000, 2200, len(rows)]
    frames = [encode_record(r) for r in rows]
    rb_frames = [
        encode_rollback(r["barrier_seq"], r["orphan_from"], r["orphan_to"])
        for r in rbs
    ]

    def producer():
        for i in range(len(cuts) - 1):
            lo, hi = cuts[i], cuts[i + 1]
            extra = rb_frames if i == 1 else []
            write_wal_segment(
                seg, frames[lo:hi] + extra, append=(i > 0)
            )
            _time.sleep(0.4)

    wire = WalTail(wal_dir, landing)
    t = threading.Thread(target=producer)
    t.start()
    sync(
        landing,
        lake,
        watch=True,
        max_ticks=10,
        watch_timeout_s=2.5,
        wire=wire,
        num_partitions=4,
    )
    t.join()
    assert tables_equal(lake_table(lake), oracle_fold(stream))
