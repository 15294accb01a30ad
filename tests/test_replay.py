"""Golden replay + metamorphic/property tests (SURVEY.md §5).

The reference has no tests; its correctness is operational (check/
health_check self-conformance, src/ch_eth/sync.rs:157-327).  These
tests are the from-scratch suite BASELINE.json requires: golden replay
vs oracle, at-least-once tolerance, kill+resume exactly-once, late
rollback repair.
"""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from web3research_etl_ray.gen import generate_events
from web3research_etl_ray.oracle import diff_tables, oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, read_lake, replay
from web3research_etl_ray.state.manifest import load_latest


def assert_lake_equals_oracle(lake_dir, stream_dir, **fold_kw):
    lake = lake_table(lake_dir)
    exp = oracle_fold(stream_dir, **fold_kw)
    assert tables_equal(lake, exp), diff_tables(lake, exp)


def test_golden_replay(tiny_stream, lake_dir):
    m = replay(tiny_stream, lake_dir, num_partitions=8)
    assert m.generation == 0
    assert_lake_equals_oracle(lake_dir, tiny_stream)
    totals = m.totals()
    n_events = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{tiny_stream}/events-*.parquet")
    )
    assert (
        totals["events_applied"]
        + totals["events_superseded"]
        + totals["events_rolled_back"]
        == n_events
    )


def test_retick_idempotent(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    m2 = replay(tiny_stream, lake_dir, num_partitions=8)
    assert m2.generation == 1
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_partial_then_resume(tiny_stream, lake_dir):
    """Kill-at-barrier analogue: bounded replay then resume must equal
    the uninterrupted replay (0 duplicate / 0 lost applies)."""
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=999)
    assert_lake_equals_oracle(lake_dir, tiny_stream, upto_seq=999)
    replay(tiny_stream, lake_dir, num_partitions=8)
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_staged_without_commit_invisible(tiny_stream, lake_dir):
    """Exactly-once: files staged by a crashed generation are invisible
    until a manifest commit publishes them."""
    m = replay(tiny_stream, lake_dir, num_partitions=8)
    # simulate a crashed next generation: stage files, never commit
    staged = os.path.join(lake_dir, "data", "gen=000001")
    os.makedirs(staged, exist_ok=True)
    with open(os.path.join(staged, "part-00000.parquet"), "w") as fh:
        fh.write("garbage")
    assert load_latest(lake_dir).generation == 0
    assert_lake_equals_oracle(lake_dir, tiny_stream)
    # rerun overwrites the staged garbage and commits cleanly
    m2 = replay(tiny_stream, lake_dir, num_partitions=8)
    assert m2.generation == 1
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_late_rollback_triggers_repair(tmp_path):
    """Reorg after apply: replay with no rollbacks known, then reveal
    the rollback table — the engine must detect affected partitions via
    footer stats and rebuild them (reference delete+reinsert,
    src/ch_eth/sync.rs:92-116)."""
    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=1500, seed=7)
    hidden = os.path.join(stream, "rollbacks.parquet.hidden")
    os.replace(os.path.join(stream, "rollbacks.parquet"), hidden)
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8)
    assert_lake_equals_oracle(lake, stream)  # no rollbacks applied yet
    os.replace(hidden, os.path.join(stream, "rollbacks.parquet"))
    m = replay(stream, lake, num_partitions=8)
    assert_lake_equals_oracle(lake, stream)
    assert m.totals()["events_rolled_back"] > 0


def test_duplicated_batch_at_least_once(tmp_path, tiny_stream):
    """Replaying a stream with ~a segment duplicated converges to the
    same state (at-least-once producer tolerance)."""
    dup = str(tmp_path / "dup_stream")
    shutil.copytree(tiny_stream, dup)
    seg = sorted(glob.glob(f"{dup}/events-*.parquet"))[1]
    shutil.copy(seg, seg.replace("events-", "events-9"))
    lake = str(tmp_path / "lake")
    replay(dup, lake, num_partitions=8)
    lake_t = lake_table(lake)
    exp = oracle_fold(tiny_stream)
    assert tables_equal(lake_t, exp), diff_tables(lake_t, exp)


def test_read_lake_dataset(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    ds = read_lake(lake_dir, columns=["repo", "path", "commit_seq"])
    assert ds.count() == oracle_fold(tiny_stream).num_rows
    assert set(ds.schema().names) == {"repo", "path", "commit_seq"}


def test_schema_evolution_visible_in_lake(tiny_stream, lake_dir):
    m = replay(tiny_stream, lake_dir, num_partitions=8)
    assert m.schema_version == 3
    lake = lake_table(lake_dir)
    by_seq = sorted(lake.to_pylist(), key=lambda r: r["commit_seq"])
    assert by_seq[0]["metadata"] is None and by_seq[0]["size_bytes"] is None
    last = by_seq[-1]
    assert last["size_bytes"] == len(last["content"])


def test_lookup_key_point_read(tiny_stream, lake_dir):
    from web3research_etl_ray.pipelines.replay import lookup_key

    replay(tiny_stream, lake_dir, num_partitions=8)
    exp = oracle_fold(tiny_stream).to_pylist()
    row = exp[len(exp) // 2]
    got = lookup_key(lake_dir, row["repo"], row["path"])
    assert got is not None
    assert got["commit_seq"] == row["commit_seq"]
    assert got["content_sha256"] == row["content_sha256"]
    assert lookup_key(lake_dir, "no-such-org/repo", "nope.py") is None


def test_groupby_exchange_path_matches_spool(tiny_stream, tmp_path):
    """exchange="groupby" (single streaming execution, for small ticks)
    must produce the identical lake as the default spool exchange."""
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.replay import lake_table, replay

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    replay(tiny_stream, a, num_partitions=8)
    replay(tiny_stream, b, num_partitions=8, exchange="groupby")
    assert tables_equal(lake_table(a), lake_table(b))
    assert tables_equal(lake_table(b), oracle_fold(tiny_stream))
    # incremental groupby tick on top of a spool-built lake
    m = replay(tiny_stream, a, num_partitions=8, exchange="groupby")
    assert m.generation == 1
    assert tables_equal(lake_table(a), oracle_fold(tiny_stream))


def test_randomized_streams_replay_equals_oracle(tmp_path):
    """Randomized end-to-end equivalence sweep: several generated
    streams (different seeds → different rollback placement, key
    skew, schema-evolution boundaries, op mixes) must replay to the
    oracle fold row-for-row, across partition counts and interrupted
    resumes."""
    import numpy as np

    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.oracle import (
        load_rollback_ranges,
        oracle_fold,
        tables_equal,
    )
    from web3research_etl_ray.pipelines.replay import lake_table, replay

    rng = np.random.default_rng(123)
    for trial, seed in enumerate((7, 101, 999)):
        stream = str(tmp_path / f"s{seed}")
        n = int(rng.integers(1_500, 4_000))
        generate_events(stream, n_events=n, seed=seed)
        lake = str(tmp_path / f"l{seed}")
        P = int(rng.choice([3, 8, 17]))
        if trial % 2:
            # interrupted: partial replay to a random mid-seq, resume
            mid = int(rng.integers(n // 4, 3 * n // 4))
            replay(stream, lake, num_partitions=P, upto_seq=mid)
        replay(stream, lake, num_partitions=P)
        assert tables_equal(lake_table(lake), oracle_fold(stream)), (
            seed, P, load_rollback_ranges(stream)
        )


def test_auto_partitions_matches_explicit(tmp_path, tiny_stream):
    """num_partitions="auto" sizes P from input bytes on the first
    generation, pins to the committed P on later ticks, and converges
    to the oracle state."""
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.replay import (
        auto_partitions,
        event_files,
        lake_table,
        replay,
    )

    files = event_files(tiny_stream)
    assert auto_partitions(files) == 32  # tiny input → default
    assert auto_partitions(files, target_bytes=1) == 1024  # clamp hi

    lake = str(tmp_path / "lake_auto")
    m = replay(tiny_stream, lake, num_partitions="auto")
    assert m.num_partitions == 32
    assert tables_equal(lake_table(lake), oracle_fold(tiny_stream))
    # second tick with auto must keep the committed layout
    m2 = replay(tiny_stream, lake, num_partitions="auto")
    assert m2.num_partitions == m.num_partitions


def test_lake_scan_prunes_files_by_footer_stats(tmp_path):
    """Zone-map scan: a selective commit_seq predicate must read a
    strict subset of lake files (footer min/max pruning) and return
    exactly the rows a full-scan filter returns."""
    import pyarrow as pa

    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.pipelines.replay import (
        lake_scan, lake_table, replay,
    )

    stream = ensure_stream(20_000)
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=16)

    full = lake_table(lake)
    hi = max(full.column("commit_seq").to_pylist())
    ds, read, total = lake_scan(
        lake, predicate=("commit_seq", "==", hi),
        columns=["repo", "path", "commit_seq"],
    )
    got = pa.Table.from_pylist(ds.take_all()).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    import pyarrow.compute as pc

    want = full.filter(
        pc.equal(full.column("commit_seq"), pa.scalar(hi))
    ).select(["repo", "path", "commit_seq"]).sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    )
    assert got.to_pylist() == want.to_pylist()
    assert 0 < read < total  # the point: strictly fewer files touched

    # no-match predicate: zero files read, typed empty result
    ds0, read0, _ = lake_scan(lake, predicate=("commit_seq", ">", hi + 1))
    assert read0 == 0 and ds0.count() == 0


def test_retyped_column_mid_stream_unifies(tiny_stream, tmp_path):
    """RETYPED columns (north-star: 'added/retyped columns ... handled
    via Arrow schema unification'): a segment arriving with a narrower
    int type (size_bytes int32, commit_seq int32) must unify to the
    lake's declared widths, values intact — no rebuild, no error."""
    import glob as _glob
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    stream = str(tmp_path / "stream")
    shutil.copytree(tiny_stream, stream)
    last = sorted(_glob.glob(f"{stream}/events-*.parquet"))[-1]
    t = pq.read_table(last)
    max_seq = int(pc.max(t.column("commit_seq")).as_py())
    row = t.slice(0, 1).to_pylist()[0]
    row.update(commit_seq=max_seq + 1, op="upsert",
               content="retyped segment", size_bytes=15)
    narrow = pa.table(
        {name: [row.get(name)] for name in t.column_names}
    ).cast(t.schema)
    # retype: int64 -> int32 on both the order col and the v3 extra
    narrow = narrow.set_column(
        narrow.schema.get_field_index("commit_seq"), "commit_seq",
        narrow.column("commit_seq").cast(pa.int32()),
    ).set_column(
        narrow.schema.get_field_index("size_bytes"), "size_bytes",
        narrow.column("size_bytes").cast(pa.int32()),
    )
    pq.write_table(narrow, f"{stream}/events-00009.parquet")

    from web3research_etl_ray.pipelines.replay import lookup_key

    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8)
    got = lookup_key(lake, row["repo"], row["path"])
    assert got is not None
    assert got["commit_seq"] == max_seq + 1
    assert got["size_bytes"] == 15
    lt = lake_table(lake)
    assert lt.schema.field("commit_seq").type == pa.int64()
    assert lt.schema.field("size_bytes").type == pa.int64()


def test_driver_tick_paths_equivalent(tiny_stream, tmp_path, monkeypatch):
    """The driver-local tick's three merge legs (fused single-pass,
    serial per-partition, distributed groupby) must produce identical
    lakes AND identical lineage counters per partition.  Replays the
    same growing stream tick-by-tick under each forced leg and
    compares manifests row-for-row."""
    segs = sorted(glob.glob(f"{tiny_stream}/events-*.parquet"))

    def run(env: dict[str, str], sub: str):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        stream = str(tmp_path / f"s-{sub}")
        os.makedirs(stream)
        shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)
        lake = str(tmp_path / f"l-{sub}")
        for s in segs:
            shutil.copy(s, stream)
            replay(stream, lake, num_partitions=8)
        for k in env:
            monkeypatch.delenv(k)
        return lake

    fused = run({"W3R_FUSED_MERGE_BYTES": str(1 << 30)}, "fused")
    serial = run(
        {"W3R_FUSED_MERGE_BYTES": "0", "W3R_DRIVER_REMOTE_ROWS": str(1 << 40)},
        "serial",
    )
    remote = run(  # batched raw-Ray-task leg
        {"W3R_FUSED_MERGE_BYTES": "0", "W3R_DRIVER_REMOTE_ROWS": "0"},
        "remote",
    )
    dist = run({"W3R_DRIVER_TICK_BYTES": "0"}, "dist")  # Ray groupby path

    lakes = (fused, serial, remote, dist)
    t_f, t_s, t_r, t_d = (lake_table(x) for x in lakes)
    assert tables_equal(t_f, t_s)
    assert tables_equal(t_f, t_r)
    assert tables_equal(t_f, t_d)
    assert tables_equal(t_f, oracle_fold(tiny_stream))
    m_f, m_s, m_r, m_d = (load_latest(x) for x in lakes)
    for pid in m_f.partitions:
        ef, es, er, ed = (
            m.partitions[pid] for m in (m_f, m_s, m_r, m_d)
        )
        for attr in (
            "num_rows",
            "watermark_seq",
            "events_applied",
            "events_superseded",
            "events_rolled_back",
            "schema_version",
        ):
            vals = {getattr(e, attr) for e in (ef, es, er, ed)}
            assert len(vals) == 1, (pid, attr, vals)


@pytest.mark.parametrize("seed", [7, 11, 23])
def test_driver_tick_paths_equivalent_randomized(tmp_path, monkeypatch, seed):
    """Randomized twin of test_driver_tick_paths_equivalent: fresh
    streams (different seeds → different rollback placement, schema
    version boundaries, key skew) replayed tick-by-tick under the
    fused leg vs the distributed groupby leg must converge to
    identical lakes and identical counters."""
    src = str(tmp_path / "src")
    generate_events(src, n_events=3_000, seed=seed, n_segments=3)
    segs = sorted(glob.glob(f"{src}/events-*.parquet"))

    def run(env, sub):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        stream = str(tmp_path / f"s-{sub}")
        os.makedirs(stream)
        for f in os.listdir(src):
            if not f.startswith("events-"):
                shutil.copy(os.path.join(src, f), stream)
        lake = str(tmp_path / f"l-{sub}")
        for s in segs:
            shutil.copy(s, stream)
            replay(stream, lake, num_partitions=8)
        for k in env:
            monkeypatch.delenv(k)
        return lake

    fused = run({"W3R_FUSED_MERGE_BYTES": str(1 << 30)}, "fused")
    dist = run({"W3R_DRIVER_TICK_BYTES": "0"}, "dist")
    t_f, t_d = lake_table(fused), lake_table(dist)
    assert tables_equal(t_f, t_d)
    assert tables_equal(t_f, oracle_fold(src))
    m_f, m_d = load_latest(fused), load_latest(dist)
    for pid in m_f.partitions:
        ef, ed = m_f.partitions[pid], m_d.partitions[pid]
        for attr in ("num_rows", "watermark_seq", "events_applied",
                     "events_superseded", "events_rolled_back",
                     "schema_version"):
            assert getattr(ef, attr) == getattr(ed, attr), (pid, attr)


def test_driver_tick_crash_before_commit_is_invisible(
    tiny_stream, tmp_path, monkeypatch
):
    """Two-phase publish holds on the driver-local tick leg: a tick
    that dies after writing its partition files but BEFORE the LATEST
    swap leaves the lake readable at the prior generation, and the
    rerun converges with no double-counted lineage."""
    import web3research_etl_ray.pipelines.replay as R

    lake = str(tmp_path / "lake")
    replay(tiny_stream, lake, num_partitions=8, upto_seq=800)  # gen 0
    m0 = load_latest(lake)
    before = lake_table(lake)

    real_commit = R.commit_manifest

    def boom(lake_dir, manifest):
        raise RuntimeError("injected crash before LATEST swap")

    monkeypatch.setattr(R, "commit_manifest", boom)
    try:
        replay(tiny_stream, lake, num_partitions=8)
        raise AssertionError("tick should have crashed")
    except RuntimeError:
        pass
    monkeypatch.setattr(R, "commit_manifest", real_commit)

    # crash invisible: same generation, same readable state
    m1 = load_latest(lake)
    assert m1.generation == m0.generation
    assert tables_equal(lake_table(lake), before)

    # rerun converges exactly; counters equal a clean two-tick run
    replay(tiny_stream, lake, num_partitions=8)
    assert tables_equal(lake_table(lake), oracle_fold(tiny_stream))
    clean = str(tmp_path / "clean")
    replay(tiny_stream, clean, num_partitions=8, upto_seq=800)
    replay(tiny_stream, clean, num_partitions=8)
    assert load_latest(lake).totals() == load_latest(clean).totals()
