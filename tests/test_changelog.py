"""Publish-side CDC: lake → changelog feed → Debezium JSONL export.

The inverse of the ingest path — a downstream consumer must be able to
(a) apply the c/u/d feed to its copy of the old snapshot and land on
the new snapshot exactly, and (b) bootstrap a REPLICA lake from the
exported snapshot+changelog JSONL through the engine's own Debezium
landing, closing the loop: this engine can feed itself."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from web3research_etl_ray.gen import ensure_stream
from web3research_etl_ray.oracle import tables_equal
from web3research_etl_ray.pipelines.replay import (
    lake_changelog,
    lake_table,
    replay,
)
from web3research_etl_ray.sources.debezium import (
    export_debezium_jsonl,
    land_debezium_jsonl,
)


def _two_tick_lake(tmp_path, n_events=2_000, split_frac=0.55):
    stream = ensure_stream(n_events)
    lake = str(tmp_path / "lake")
    seqs = []
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(os.path.join(stream, "events-*.parquet"))):
        seqs.extend(pq.read_table(f, columns=["commit_seq"]).column(0).to_pylist())
    seqs.sort()
    split = seqs[int(len(seqs) * split_frac)]
    replay(stream, lake, num_partitions=4, upto_seq=split)
    replay(stream, lake, num_partitions=4)
    return stream, lake


def _ckey(t: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        t.column("repo").cast(pa.string()), t.column("path").cast(pa.string()), "\x00"
    )


def test_changelog_applies_old_to_new(tmp_path):
    _, lake = _two_tick_lake(tmp_path)
    old = lake_table(lake, generation=0)
    new = lake_table(lake, generation=1)
    import ray

    blocks = [
        b for b in ray.get(lake_changelog(lake, 0, 1).to_arrow_refs()) if b.num_rows
    ]
    cl = pa.concat_tables(blocks)
    assert cl.num_rows > 0
    ops = set(cl.column("op").to_pylist())
    assert ops <= {"c", "u", "d"} and "u" in ops
    # after-images are present for c/u, null for d
    cu = cl.filter(pc.not_equal(cl.column("op"), "d"))
    d = cl.filter(pc.equal(cl.column("op"), "d"))
    assert cu.column("content").null_count == 0
    assert d.num_rows == 0 or d.column("content").null_count == d.num_rows
    assert d.num_rows == 0 or d.column("seq").null_count == d.num_rows

    # apply: drop changed/deleted keys from old, union the c/u after-images
    touched = _ckey(cl)
    keep = old.filter(pc.is_null(pc.index_in(_ckey(old), touched)))
    applied_cols = {}
    for name in new.column_names:
        src = cu.column(name if name != "commit_seq" else "seq")
        applied_cols[name] = pa.concat_arrays(
            [
                pa.concat_arrays([c for c in keep.column(name).cast(new.schema.field(name).type).chunks]),
                pa.concat_arrays([c for c in src.cast(new.schema.field(name).type).chunks]),
            ]
        )
    applied = pa.table(applied_cols).cast(new.schema)
    assert tables_equal(applied, new)
    # c rows' keys are absent from old; u rows' old_seq matches old state
    c = cl.filter(pc.equal(cl.column("op"), "c"))
    assert c.num_rows == 0 or pc.all(
        pc.is_null(pc.index_in(_ckey(c), _ckey(old)))
    ).as_py()
    u = cl.filter(pc.equal(cl.column("op"), "u"))
    idx = pc.index_in(_ckey(u), _ckey(old))
    assert pc.all(pc.is_valid(idx)).as_py()
    assert pc.all(
        pc.equal(pc.take(old.column("commit_seq"), idx), u.column("old_seq"))
    ).as_py()


def test_changelog_same_generation_is_empty(tmp_path):
    _, lake = _two_tick_lake(tmp_path)
    assert lake_changelog(lake, 1, 1).count() == 0


def test_export_snapshot_changelog_bootstraps_replica(tmp_path):
    """export(snapshot@gen0 + changelog 0→1) → land → replay must
    reproduce the source lake's latest state exactly — the engine
    feeding a second copy of itself over its own wire format."""
    _, lake = _two_tick_lake(tmp_path)
    wire = str(tmp_path / "wire")
    stats = export_debezium_jsonl(
        lake, wire, gen_old=0, gen_new=1, snapshot=True
    )
    assert stats["snapshot_rows"] > 0 and stats["changelog_rows"] > 0
    landed = str(tmp_path / "landed")
    land_debezium_jsonl(wire, landed)
    replica = str(tmp_path / "replica")
    replay(landed, replica, num_partitions=4)
    assert tables_equal(lake_table(replica), lake_table(lake))


def test_export_is_idempotent(tmp_path):
    """Re-exporting into the same wire dir overwrites (content-derived
    names) — the landing side then sees each frame once."""
    _, lake = _two_tick_lake(tmp_path)
    wire = str(tmp_path / "wire")
    export_debezium_jsonl(lake, wire, gen_old=0, gen_new=1, snapshot=True)
    first = sorted(os.listdir(wire))
    export_debezium_jsonl(lake, wire, gen_old=0, gen_new=1, snapshot=True)
    assert sorted(os.listdir(wire)) == first


def test_export_tick_relay_chain(tmp_path):
    """Continuous outbox: tick the source lake three times, export
    after each tick (snapshot, then incremental changelogs), land the
    accumulated wire dir — the replica must equal the source after
    every tick, and a no-change tick must export nothing."""
    import json

    import pyarrow.parquet as pq

    from web3research_etl_ray.sources.debezium import export_tick

    stream = ensure_stream(2_000)
    seqs = []
    for f in sorted(glob.glob(os.path.join(stream, "events-*.parquet"))):
        seqs.extend(pq.read_table(f, columns=["commit_seq"]).column(0).to_pylist())
    seqs.sort()
    cuts = [seqs[len(seqs) // 3], seqs[2 * len(seqs) // 3], None]

    lake = str(tmp_path / "lake")
    wire = str(tmp_path / "wire")
    modes = []
    for i, cut in enumerate(cuts):
        replay(stream, lake, num_partitions=4, upto_seq=cut)
        stats = export_tick(lake, wire)
        modes.append(stats["mode"])
        landed = str(tmp_path / f"landed{i}")
        land_debezium_jsonl(wire, landed)
        replica = str(tmp_path / f"replica{i}")
        replay(landed, replica, num_partitions=4)
        assert tables_equal(lake_table(replica), lake_table(lake)), f"tick {i}"
    assert modes == ["snapshot", "changelog", "changelog"]
    # cursor caught up: a tick with no new generation exports nothing
    assert export_tick(lake, wire)["mode"] == "noop"
    with open(os.path.join(wire, "export-cursor.json")) as fh:
        assert json.load(fh)["generation"] == 2


def test_sync_loop_publishes_outbox(tmp_path):
    """sync(export_out=...) is the full relay: segments arrive between
    ticks, each tick commits AND publishes — landing the wire dir at
    the end rebuilds the source lake exactly."""
    import shutil

    from web3research_etl_ray.pipelines.tail import sync

    stream = ensure_stream(3_000)
    segs = sorted(glob.glob(os.path.join(stream, "events-*.parquet")))
    growing = str(tmp_path / "growing")
    os.makedirs(growing)
    rb = os.path.join(stream, "rollbacks.parquet")
    if os.path.exists(rb):
        shutil.copy(rb, os.path.join(growing, "rollbacks.parquet"))
    # ~3 growth steps
    cuts = [max(1, len(segs) // 3), max(2, 2 * len(segs) // 3), len(segs)]
    for f in segs[: cuts[0]]:
        shutil.copy(f, growing)
    step = {"i": 0}

    def grow(tick, manifest):
        i = step["i"]
        if i + 1 < len(cuts):
            for f in segs[cuts[i]: cuts[i + 1]]:
                shutil.copy(f, growing)
            step["i"] = i + 1

    lake = str(tmp_path / "lake")
    wire = str(tmp_path / "wire")
    sync(growing, lake, max_ticks=3, num_partitions=4, on_tick=grow,
         export_out=wire)
    landed = str(tmp_path / "landed")
    land_debezium_jsonl(wire, landed)
    replica = str(tmp_path / "replica")
    replay(landed, replica, num_partitions=4)
    assert tables_equal(lake_table(replica), lake_table(lake))


def test_export_tick_refuses_gcd_cursor(tmp_path):
    """If the cursor generation fell out of the GC window the changelog
    base is gone; export_tick must fail loudly (a silent re-snapshot
    would strand deletes on the replica) and tell the operator to
    re-bootstrap into a fresh wire dir."""
    import pytest

    from web3research_etl_ray.sources.debezium import export_tick
    from web3research_etl_ray.state.manifest import gc_generations

    stream = ensure_stream(2_000)
    seqs = []
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(os.path.join(stream, "events-*.parquet"))):
        seqs.extend(pq.read_table(f, columns=["commit_seq"]).column(0).to_pylist())
    seqs.sort()
    lake = str(tmp_path / "lake")
    wire = str(tmp_path / "wire")
    replay(stream, lake, num_partitions=4, upto_seq=seqs[len(seqs) // 4])
    export_tick(lake, wire)  # cursor -> gen 0
    replay(stream, lake, num_partitions=4, upto_seq=seqs[len(seqs) // 2])
    replay(stream, lake, num_partitions=4, upto_seq=seqs[3 * len(seqs) // 4])
    replay(stream, lake, num_partitions=4)
    gc_generations(lake, keep=1)
    with pytest.raises(RuntimeError, match="Re-bootstrap"):
        export_tick(lake, wire)


def test_lakes_diff_source_vs_replica(tmp_path):
    """Cross-lake consistency check: a freshly relayed replica diffs
    empty against the source; after the source advances a generation
    the diff reports exactly the changed keys (b relative to a)."""
    from web3research_etl_ray.pipelines.replay import lakes_diff

    stream = ensure_stream(2_000)
    seqs = []
    import pyarrow.parquet as pq

    for f in sorted(glob.glob(os.path.join(stream, "events-*.parquet"))):
        seqs.extend(pq.read_table(f, columns=["commit_seq"]).column(0).to_pylist())
    seqs.sort()
    split = seqs[int(len(seqs) * 0.6)]

    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=4, upto_seq=split)
    wire = str(tmp_path / "wire")
    export_debezium_jsonl(lake, wire, gen_old=0, snapshot=True)
    landed = str(tmp_path / "landed")
    land_debezium_jsonl(wire, landed)
    replica = str(tmp_path / "replica")
    replay(landed, replica, num_partitions=4)
    assert lakes_diff(lake, replica).count() == 0

    # source advances; replica is now behind — diff must be exactly
    # the lake's own generation diff
    replay(stream, lake, num_partitions=4)
    from web3research_etl_ray.pipelines.replay import lake_diff

    cross = pa.Table.from_pylist(
        lakes_diff(replica, lake).take_all()
    ).sort_by([("repo", "ascending"), ("path", "ascending")])
    own = pa.Table.from_pylist(
        lake_diff(lake, 0, 1).take_all()
    ).sort_by([("repo", "ascending"), ("path", "ascending")])
    assert cross.num_rows > 0
    assert cross.select(own.column_names).equals(own)


def test_export_fanout_tick_cross_table_consistent(tmp_path):
    """Fan-out outbox: one cursor covers every table; folding each
    table's exported envelopes (snapshot tick + changelog tick) by LWW
    must reproduce that table's committed state exactly."""
    import json

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.fanout import (
        FanoutTable,
        fanout_table,
        replay_fanout,
    )
    from web3research_etl_ray.schema import REPO_FILES, TableSpec
    from web3research_etl_ray.sources.debezium import export_fanout_tick

    heads_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("commit", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    heads = TableSpec(
        name="repo_heads",
        schema=heads_schema,
        key=("repo",),
        event_schema=heads_schema.append(pa.field("op", pa.string())),
    )

    def derive_heads(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "commit": t.column("commit"),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    tables = [FanoutTable(REPO_FILES, None), FanoutTable(heads, derive_heads)]
    stream = ensure_stream(2_000)
    seqs = []
    for f in sorted(glob.glob(os.path.join(stream, "events-*.parquet"))):
        seqs.extend(pq.read_table(f, columns=["commit_seq"]).column(0).to_pylist())
    seqs.sort()

    lake = str(tmp_path / "mlake")
    wire = str(tmp_path / "wire")
    replay_fanout(stream, lake, tables, num_partitions=4,
                  upto_seq=seqs[len(seqs) // 2])
    s1 = export_fanout_tick(lake, wire, tables)
    assert s1["mode"] == "snapshot"
    replay_fanout(stream, lake, tables, num_partitions=4)
    s2 = export_fanout_tick(lake, wire, tables)
    assert s2["mode"] == "changelog"
    assert s2["tables"]["repo_files"]["changelog_rows"] > 0

    for ft in tables:
        name = ft.spec.name
        latest = {}
        for f in sorted(glob.glob(os.path.join(wire, name, "*.jsonl"))):
            with open(f) as fh:
                for line in fh:
                    env = json.loads(line)
                    payload = env["after"] if env["op"] != "d" else env["before"]
                    key = tuple(payload[k] for k in ft.spec.key)
                    prev = latest.get(key)
                    if prev is None or env["seq"] > prev[0]:
                        latest[key] = (env["seq"], env["op"], payload)
        want = {
            k: (seq, payload)
            for k, (seq, op, payload) in latest.items()
            if op != "d"
        }
        got = fanout_table(lake, name)
        assert got.num_rows == len(want), name
        rows = got.to_pylist()
        for r in rows:
            k = tuple(r[c] for c in ft.spec.key)
            seq, payload = want[k]
            assert r["commit_seq"] == seq, (name, k)
            assert r["commit"] == payload["commit"], (name, k)
