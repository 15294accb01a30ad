"""Multi-table fan-out replay: one stream → N tables, ONE atomic
commit (reference src/ch_eth/init.rs:146-341,403-424 — the block→
5-tables insert loop, here with cross-table atomicity the reference
lacks)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from web3research_etl_ray.pipelines.fanout import (
    FanoutTable,
    fanout_table,
    read_fanout_table,
    replay_fanout,
)
from web3research_etl_ray.schema import REPO_FILES, TableSpec
from web3research_etl_ray.state.manifest import load_latest_multi


def _eq(a: pa.Table, b: pa.Table) -> bool:
    """Order/column-order-insensitive table equality (generic over any
    spec — tables_equal is repo_files-specific)."""
    cols = sorted(a.column_names)
    if cols != sorted(b.column_names) or a.num_rows != b.num_rows:
        return False
    ra = sorted(tuple(r[c] for c in cols) for r in a.to_pylist())
    rb = sorted(tuple(r[c] for c in cols) for r in b.to_pylist())
    return ra == rb


def _tables():
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

    return [FanoutTable(REPO_FILES, None), FanoutTable(heads, derive_heads)]


def _heads_oracle(stream_dir):
    """Single-process reference: per-repo max non-orphaned commit_seq."""
    import pyarrow.dataset as pads

    from web3research_etl_ray.oracle import in_orphan_range, load_rollback_ranges
    from web3research_etl_ray.pipelines.replay import event_files
    from web3research_etl_ray.schema import unify_to

    ranges = load_rollback_ranges(stream_dir)
    best: dict[str, tuple[int, str]] = {}
    for f in event_files(stream_dir):
        t = unify_to(pads.dataset(f).to_table())
        for repo, commit, seq in zip(
            t["repo"].to_pylist(), t["commit"].to_pylist(),
            t["commit_seq"].to_pylist(),
        ):
            if in_orphan_range(seq, ranges):
                continue
            if repo not in best or seq > best[repo][0]:
                best[repo] = (seq, commit)
    return {r: c for r, (s, c) in best.items()}


def test_fanout_two_tables_one_commit(tiny_stream, lake_dir):
    m = replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8)
    assert set(m.tables) == {"repo_files", "repo_heads"}
    files = fanout_table(lake_dir, "repo_files")
    heads = fanout_table(lake_dir, "repo_heads")
    assert files.num_rows > 0 and heads.num_rows > 0
    # repo_files table matches the single-table engine's oracle
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    assert tables_equal(files, oracle_fold(tiny_stream))
    # repo_heads matches the per-repo reference fold
    want = _heads_oracle(tiny_stream)
    got = {
        r: c for r, c in zip(heads["repo"].to_pylist(), heads["commit"].to_pylist())
    }
    assert got == want
    # exactly one generation, shared by both tables
    assert load_latest_multi(lake_dir).generation == 0


def test_fanout_retick_idempotent(tiny_stream, lake_dir):
    replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8)
    a_files = fanout_table(lake_dir, "repo_files")
    a_heads = fanout_table(lake_dir, "repo_heads")
    m2 = replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8)
    assert m2.generation == 1
    assert _eq(fanout_table(lake_dir, "repo_files"), a_files)
    assert _eq(fanout_table(lake_dir, "repo_heads"), a_heads)


def test_fanout_partial_then_resume_equals_uninterrupted(tiny_stream, tmp_path):
    lake_a = str(tmp_path / "a")
    lake_b = str(tmp_path / "b")
    replay_fanout(tiny_stream, lake_a, _tables(), num_partitions=8)
    replay_fanout(tiny_stream, lake_b, _tables(), num_partitions=8, upto_seq=900)
    replay_fanout(tiny_stream, lake_b, _tables(), num_partitions=8)
    for name in ("repo_files", "repo_heads"):
        assert _eq(fanout_table(lake_a, name), fanout_table(lake_b, name))


def test_fanout_crash_before_commit_keeps_tables_in_lockstep(
    tiny_stream, lake_dir
):
    """A killed job may leave staged partition files for SOME tables —
    readers must still see every table at the prior generation (no
    table a generation ahead), and the rerun must converge."""
    replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8,
                  upto_seq=900)
    gen0 = load_latest_multi(lake_dir)
    files0 = fanout_table(lake_dir, "repo_files")
    heads0 = fanout_table(lake_dir, "repo_heads")
    with pytest.raises(RuntimeError, match="injected crash"):
        replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8,
                      _crash_before_commit=True)
    # LATEST still points at gen0; BOTH tables read exactly as before,
    # even though gen1 staged files exist on disk for both tables
    m = load_latest_multi(lake_dir)
    assert m.generation == gen0.generation
    assert _eq(fanout_table(lake_dir, "repo_files"), files0)
    assert _eq(fanout_table(lake_dir, "repo_heads"), heads0)
    staged = os.path.join(lake_dir, "tables", "repo_files", "data", "gen=000001")
    assert os.path.isdir(staged)  # orphaned staged files are invisible
    # rerun picks up from the COMMITTED watermark and converges
    replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8)
    want = _heads_oracle(tiny_stream)
    heads = fanout_table(lake_dir, "repo_heads")
    got = {
        r: c for r, c in zip(heads["repo"].to_pylist(), heads["commit"].to_pylist())
    }
    assert got == want


def test_fanout_rollback_repairs_every_table(tmp_path):
    """A rollback range that orphans already-applied events must repair
    ALL derived tables, not just the base one."""
    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.oracle import load_rollback_ranges

    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=2_000, seed=9)
    (lo, _hi) = load_rollback_ranges(stream)[0]
    lake = str(tmp_path / "lake")
    # replay to just before the orphan range: rollback not yet visible,
    # so the soon-to-be-orphaned events' predecessors are applied state
    replay_fanout(stream, lake, _tables(), num_partitions=8, upto_seq=lo - 1)
    # now the full stream (rollback range crosses in) — repair kicks in
    replay_fanout(stream, lake, _tables(), num_partitions=8)
    want = _heads_oracle(stream)
    heads = fanout_table(lake, "repo_heads")
    got = {
        r: c for r, c in zip(heads["repo"].to_pylist(), heads["commit"].to_pylist())
    }
    assert got == want
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    assert tables_equal(fanout_table(lake, "repo_files"), oracle_fold(stream))


def test_fanout_dataset_reader(tiny_stream, lake_dir):
    replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=8)
    ds = read_fanout_table(lake_dir, "repo_heads", columns=["repo", "commit_seq"])
    t = pa.Table.from_pylist(ds.take_all())
    assert set(t.column_names) == {"repo", "commit_seq"}
    assert t.num_rows == fanout_table(lake_dir, "repo_heads").num_rows


def test_fanout_sync_ticks_and_gc(tiny_stream, lake_dir):
    from web3research_etl_ray.pipelines.tail import sync_fanout
    from web3research_etl_ray.state.manifest import (
        gc_multi_generations,
        load_latest_multi,
    )

    m = sync_fanout(tiny_stream, lake_dir, _tables(), max_ticks=3,
                    num_partitions=8)
    assert m.generation == 2
    removed = gc_multi_generations(lake_dir, keep=1)
    assert removed and load_latest_multi(lake_dir).generation == 2
    # lake still reads correctly after GC
    want = _heads_oracle(tiny_stream)
    heads = fanout_table(lake_dir, "repo_heads")
    got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                heads["commit"].to_pylist())}
    assert got == want


def test_fanout_check_localizes_corruption(tiny_stream, lake_dir):
    """check_fanout: per-table conformance over the multi-manifest —
    green after replay, localizes a corrupted derived-table partition."""
    import glob

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.check import check_fanout

    tables = _tables()
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8)
    reports = check_fanout(tiny_stream, lake_dir, tables)
    assert set(reports) == {"repo_files", "repo_heads"}
    assert all(r.ok for r in reports.values())

    # corrupt a repo_heads partition file (flip one commit_seq)
    part = sorted(glob.glob(os.path.join(
        lake_dir, "tables", "repo_heads", "data", "gen=*", "part-*.parquet")))[0]
    t = pq.read_table(part)
    seqs = t.column("commit_seq").to_pylist()
    seqs[0] = seqs[0] + 999_999
    t = t.set_column(t.schema.get_field_index("commit_seq"), "commit_seq",
                     pa.array(seqs, pa.int64()))
    pq.write_table(t, part)

    reports2 = check_fanout(tiny_stream, lake_dir, tables)
    assert reports2["repo_files"].ok  # other table untouched
    assert not reports2["repo_heads"].ok
    assert reports2["repo_heads"].mismatched >= 1


def test_fanout_check_and_repair_heals_corruption(tiny_stream, lake_dir):
    """check_and_repair_fanout: localize a corrupted derived-table
    partition, rebuild it in ONE atomic generation, re-check green —
    and the repair generation advances ALL tables together."""
    import glob

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.check import (
        check_and_repair_fanout,
        check_fanout,
    )
    from web3research_etl_ray.state.manifest import load_latest_multi

    tables = _tables()
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8)
    gen0 = load_latest_multi(lake_dir).generation

    part = sorted(glob.glob(os.path.join(
        lake_dir, "tables", "repo_heads", "data", "gen=*", "part-*.parquet")))[0]
    t = pq.read_table(part)
    seqs = t.column("commit_seq").to_pylist()
    seqs[0] = seqs[0] + 999_999
    t = t.set_column(t.schema.get_field_index("commit_seq"), "commit_seq",
                     pa.array(seqs, pa.int64()))
    pq.write_table(t, part)

    pre = check_and_repair_fanout(tiny_stream, lake_dir, tables)
    assert not pre["repo_heads"].ok  # reports show what WAS wrong
    post = check_fanout(tiny_stream, lake_dir, tables)
    assert all(r.ok for r in post.values())
    m = load_latest_multi(lake_dir)
    assert m.generation > gen0  # repair = one new atomic generation


def test_sync_fanout_periodic_check(tiny_stream, lake_dir):
    """sync_fanout(check_every=1) runs the per-table trailing-window
    check each tick and returns the reports."""
    from web3research_etl_ray.pipelines.tail import sync_fanout

    tables = _tables()
    last, reports = sync_fanout(
        tiny_stream, lake_dir, tables,
        max_ticks=2, check_every=1, num_partitions=8,
    )
    assert len(reports) == 2
    for rep in reports:
        assert all(r.ok for r in rep.values())


def test_fanout_wide_many_tables(tiny_stream, lake_dir):
    """The tron shape (44 tables per block, reference
    src/ch_tron/init.rs:76-214): a WIDE fan-out list — base table plus
    12 per-lang derived tables — through ONE spool and ONE atomic
    commit.  Width must not change semantics: each lang table holds
    the per-(repo,lang-bucket) head."""
    import numpy as np

    from web3research_etl_ray.schema import TableSpec

    def lang_table(b: int):
        schema = pa.schema(
            [
                pa.field("repo", pa.string(), nullable=False),
                pa.field("path", pa.string(), nullable=False),
                pa.field("commit_seq", pa.int64(), nullable=False),
            ]
        )
        spec = TableSpec(
            name=f"bucket_{b:02d}",
            schema=schema,
            key=("repo", "path"),
            event_schema=schema.append(pa.field("op", pa.string())),
        )

        def derive(t: pa.Table, _b=b) -> pa.Table:
            # deterministic 12-way split by path hash — each event lands
            # in exactly one derived table
            import numpy as np_

            from web3research_etl_ray.functions.hashing import key_hash64

            h = key_hash64(t.column("path")) % np_.uint64(12)
            sub = t.filter(pa.array(h == _b))
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "path": sub.column("path"),
                    "commit_seq": sub.column("commit_seq"),
                    "op": sub.column("op"),
                }
            )

        return FanoutTable(spec, derive)

    tables = [FanoutTable(REPO_FILES, None)] + [lang_table(b) for b in range(12)]
    m = replay_fanout(tiny_stream, lake_dir, tables, num_partitions=4)
    assert len(m.tables) == 13
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    lake = oracle_fold(tiny_stream)
    assert tables_equal(fanout_table(lake_dir, "repo_files"), lake)
    # union of the 12 split tables == LWW state over ALL events per key
    # (deletes carry op through derive, so tombstoned keys are absent)
    from web3research_etl_ray.functions.hashing import key_hash64
    import numpy as np_

    total = 0
    for b in range(12):
        t = fanout_table(lake_dir, f"bucket_{b:02d}")
        if t.num_rows == 0:
            continue
        h = key_hash64(t.column("path")) % np_.uint64(12)
        assert (h == b).all()  # routing respected
        total += t.num_rows
    assert total == lake.num_rows


def test_randomized_fanout_streams_match_oracles(tmp_path):
    """Randomized fan-out sweep: generated streams (different seeds →
    different rollbacks/skew/schema boundaries) through the 2-table
    fan-out must match both per-table oracles."""
    import numpy as np

    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    for seed in (13, 77):
        stream = str(tmp_path / f"s{seed}")
        generate_events(stream, n_events=2_500, seed=seed)
        lake = str(tmp_path / f"l{seed}")
        replay_fanout(stream, lake, _tables(), num_partitions=7)
        assert tables_equal(fanout_table(lake, "repo_files"), oracle_fold(stream))
        want = _heads_oracle(stream)
        heads = fanout_table(lake, "repo_heads")
        got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                    heads["commit"].to_pylist())}
        assert got == want


# ---------------------------------------------------------------------------
# additive (SummingMergeTree-mode) tables: spec.sum_cols
# ---------------------------------------------------------------------------


def _additive_tables():
    act_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    act = TableSpec(
        name="repo_activity",
        schema=act_schema,
        key=("repo",),
        event_schema=act_schema.append(pa.field("op", pa.string())),
        sum_cols=("n_changes", "content_chars"),
    )

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {
                "repo": t.column("repo"),
                "n_changes": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "content_chars": pc.utf8_length(t.column("content")).cast(
                    pa.int64()
                ),
                "commit_seq": t.column("commit_seq"),
                "op": pa.array(["upsert"] * t.num_rows, pa.string()),
            }
        )

    return [FanoutTable(REPO_FILES, None), FanoutTable(act, derive)]


def _activity_oracle(stream_dir):
    """Single-process reference: per-repo (count, char-sum, max seq)
    over non-orphaned events."""
    import pyarrow.dataset as pads

    from web3research_etl_ray.oracle import in_orphan_range, load_rollback_ranges
    from web3research_etl_ray.pipelines.replay import event_files
    from web3research_etl_ray.schema import unify_to

    ranges = load_rollback_ranges(stream_dir)
    acc: dict[str, list[int]] = {}
    for f in event_files(stream_dir):
        t = unify_to(pads.dataset(f).to_table())
        for repo, content, seq in zip(
            t["repo"].to_pylist(), t["content"].to_pylist(),
            t["commit_seq"].to_pylist(),
        ):
            if in_orphan_range(seq, ranges):
                continue
            a = acc.setdefault(repo, [0, 0, -1])
            a[0] += 1
            a[1] += len(content)
            a[2] = max(a[2], seq)
    return {r: tuple(v) for r, v in acc.items()}


def _activity_rows(lake):
    t = fanout_table(lake, "repo_activity")
    return {
        r["repo"]: (r["n_changes"], r["content_chars"], r["commit_seq"])
        for r in t.to_pylist()
    }


def test_additive_table_one_shot_matches_oracle(tiny_stream, lake_dir):
    replay_fanout(tiny_stream, lake_dir, _additive_tables(), num_partitions=8)
    assert _activity_rows(lake_dir) == _activity_oracle(tiny_stream)


def test_additive_table_accumulates_across_ticks(tiny_stream, tmp_path):
    """Sums must accumulate over merge generations: 3-tick sync equals
    the one-shot replay equals the oracle."""
    lake_a, lake_b = str(tmp_path / "a"), str(tmp_path / "b")
    replay_fanout(tiny_stream, lake_a, _additive_tables(), num_partitions=8)
    replay_fanout(tiny_stream, lake_b, _additive_tables(), num_partitions=8,
                  upto_seq=400)
    replay_fanout(tiny_stream, lake_b, _additive_tables(), num_partitions=8,
                  upto_seq=900)
    replay_fanout(tiny_stream, lake_b, _additive_tables(), num_partitions=8)
    want = _activity_oracle(tiny_stream)
    assert _activity_rows(lake_a) == want
    assert _activity_rows(lake_b) == want


def test_additive_table_retick_is_idempotent(tiny_stream, lake_dir):
    replay_fanout(tiny_stream, lake_dir, _additive_tables(), num_partitions=8)
    before = _activity_rows(lake_dir)
    replay_fanout(tiny_stream, lake_dir, _additive_tables(), num_partitions=8)
    assert _activity_rows(lake_dir) == before  # no double counting


def test_additive_table_rollback_repair_rebuilds_sums(tmp_path):
    """Events applied into the sums then orphaned by a late rollback
    must be SUBTRACTED — via the repair rebuild, since additive state
    can't retract per-row."""
    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.oracle import load_rollback_ranges

    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=2_000, seed=9)
    (lo, _hi) = load_rollback_ranges(stream)[0]
    lake = str(tmp_path / "lake")
    replay_fanout(stream, lake, _additive_tables(), num_partitions=8,
                  upto_seq=lo - 1)
    replay_fanout(stream, lake, _additive_tables(), num_partitions=8)
    assert _activity_rows(lake) == _activity_oracle(stream)


def test_additive_table_check_detects_and_repairs_corruption(
    tiny_stream, lake_dir
):
    """check_fanout must validate additive sums (full-history fold even
    when a trailing window is requested) and heal corruption through
    the shared atomic repair generation."""
    import glob

    import pyarrow.parquet as pq

    from web3research_etl_ray.pipelines.check import (
        check_and_repair_fanout,
        check_fanout,
    )

    tables = _additive_tables()
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8)
    reports = check_fanout(tiny_stream, lake_dir, tables, from_seq=500)
    assert all(r.ok for r in reports.values())

    # corrupt one activity partition file: zero out the sums
    fpat = os.path.join(lake_dir, "tables", "repo_activity", "data",
                        "gen=*", "part-*.parquet")
    victim = sorted(glob.glob(fpat))[0]
    t = pq.read_table(victim)
    idx = t.schema.get_field_index("n_changes")
    t = t.set_column(idx, "n_changes",
                     pa.array([0] * t.num_rows, pa.int64()))
    pq.write_table(t, victim)

    reports = check_fanout(tiny_stream, lake_dir, tables, from_seq=500)
    assert not reports["repo_activity"].ok
    check_and_repair_fanout(tiny_stream, lake_dir, tables)
    assert _activity_rows(lake_dir) == _activity_oracle(tiny_stream)


def test_additive_table_sync_growing_stream(tmp_path):
    """Tail loop over a GROWING stream: additive sums converge to the
    full-history oracle after each tick lands new segments, with the
    periodic check finding nothing to repair."""
    from web3research_etl_ray.gen import generate_events
    from web3research_etl_ray.pipelines.tail import sync_fanout

    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    tables = _additive_tables()
    generate_events(stream, n_events=800, seed=5)
    sync_fanout(stream, lake, tables, max_ticks=1, num_partitions=8)
    assert _activity_rows(lake) == _activity_oracle(stream)
    # stream grows (two more segments, later seqs), tick again
    generate_events(stream, n_events=1_600, seed=5)
    sync_fanout(stream, lake, tables, max_ticks=2, check_every=2,
                num_partitions=8)
    assert _activity_rows(lake) == _activity_oracle(stream)


def test_randomized_additive_tick_splits_match_oracle(tmp_path):
    """Adversarial exactly-once fuzz for sums: random streams replayed
    through RANDOM tick split points (skewed per-partition watermarks
    at every boundary) must always equal the full-history oracle."""
    import numpy as np

    from web3research_etl_ray.gen import generate_events

    rng = np.random.default_rng(99)
    for seed in (13, 77):
        stream = str(tmp_path / f"as{seed}")
        generate_events(stream, n_events=2_500, seed=seed)
        lake = str(tmp_path / f"al{seed}")
        splits = sorted(rng.integers(100, 2_400, size=3).tolist())
        tables = _additive_tables()
        for s in splits:
            replay_fanout(stream, lake, tables, num_partitions=7, upto_seq=s)
        replay_fanout(stream, lake, tables, num_partitions=7)
        assert _activity_rows(lake) == _activity_oracle(stream), (seed, splits)


def test_fanout_scan_prunes_by_footer_stats(tmp_path):
    """Zone-map scan over one fan-out table: selective predicate reads
    a strict subset of that table's files with exact rows."""
    import pyarrow.compute as pc

    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.pipelines.fanout import (
        fanout_scan, fanout_table, replay_fanout,
    )
    from web3research_etl_ray.pipelines.queries import _fanout_tables

    stream = ensure_stream(20_000)
    lake = str(tmp_path / "mlake")
    replay_fanout(stream, lake, _fanout_tables(), num_partitions=16)

    full = fanout_table(lake, "repo_heads")
    hi = max(full.column("commit_seq").to_pylist())
    ds, read, total = fanout_scan(
        lake, "repo_heads", predicate=("commit_seq", "==", hi),
        columns=["repo", "commit_seq"],
    )
    got = sorted(
        (r["repo"], r["commit_seq"]) for r in ds.take_all()
    )
    want = sorted(
        (r["repo"], r["commit_seq"])
        for r in full.filter(
            pc.equal(full.column("commit_seq"), pa.scalar(hi))
        ).select(["repo", "commit_seq"]).to_pylist()
    )
    assert got == want and got
    assert 0 < read < total


def test_fanout_time_travel_reads_consistent_generation(tmp_path):
    """Reading an older generation of a fan-out lake must return every
    table's state AS OF that generation — the cross-table consistency
    the single multi-manifest exists for."""
    import glob
    import shutil

    import pytest

    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.pipelines.fanout import (
        fanout_table, replay_fanout,
    )
    from web3research_etl_ray.pipelines.queries import _fanout_tables

    full = ensure_stream(20_000)
    files = sorted(glob.glob(f"{full}/events-*.parquet"))
    grow = str(tmp_path / "stream")
    shutil.copytree(full, grow, ignore=shutil.ignore_patterns("events-*"))
    lake = str(tmp_path / "mlake")
    # tick 1: first half of the stream -> generation 0
    for f in files[: max(1, len(files) // 2)]:
        shutil.copy(f, grow)
    replay_fanout(grow, lake, _fanout_tables(), num_partitions=8)
    heads_g0 = fanout_table(lake, "repo_heads").sort_by("repo")
    files_g0 = fanout_table(lake, "repo_files").num_rows
    # tick 2: rest of the stream -> generation 1
    for f in files:
        shutil.copy(f, grow)
    replay_fanout(grow, lake, _fanout_tables(), num_partitions=8)

    assert not fanout_table(lake, "repo_heads").sort_by("repo").equals(
        heads_g0
    )
    # generation 0 reads reproduce BOTH tables' old state together
    assert fanout_table(lake, "repo_heads", generation=0).sort_by(
        "repo"
    ).equals(heads_g0)
    assert fanout_table(lake, "repo_files", generation=0).num_rows == files_g0
    # an uncommitted generation id is invisible
    with pytest.raises(FileNotFoundError):
        fanout_table(lake, "repo_heads", generation=7)


def test_fanout_time_travel_after_gc(tiny_stream, lake_dir):
    """GC'd parent manifests must not break time travel to KEPT
    generations (ADVICE r02: committed_chain_multi crashed with
    FileNotFoundError after gc_multi_generations)."""
    import pytest

    from web3research_etl_ray.pipelines.tail import sync_fanout
    from web3research_etl_ray.state.manifest import (
        committed_chain_multi,
        gc_multi_generations,
        multi_manifest_at,
    )

    m = sync_fanout(tiny_stream, lake_dir, _tables(), max_ticks=4,
                    num_partitions=8)
    assert m.generation == 3
    removed = gc_multi_generations(lake_dir, keep=2)
    assert removed  # gens 0.. dropped
    # chain walk stops at the GC boundary instead of raising
    assert committed_chain_multi(lake_dir) == {2, 3}
    # time travel to a kept, committed, non-latest generation works
    old = multi_manifest_at(lake_dir, 2)
    assert old.generation == 2
    t = fanout_table(lake_dir, "repo_heads", generation=2)
    assert t.num_rows > 0
    # a GC'd generation is a clean FileNotFoundError, not a crash
    with pytest.raises(FileNotFoundError):
        multi_manifest_at(lake_dir, 0)


def _tables_small_heads():
    """Same two tables, but the tiny derived table uses 1/8 the base
    table's partitions (VERDICT r02 Next #9: per-table sizing — a
    20-key aggregate must not carry the base table's merge fan-out)."""
    base, heads = _tables()
    return [base, FanoutTable(heads.spec, heads.derive, num_partitions=2)]


def test_fanout_per_table_partition_counts(tiny_stream, lake_dir):
    m = replay_fanout(
        tiny_stream, lake_dir, _tables_small_heads(), num_partitions=16
    )
    assert m.tables["repo_files"].num_partitions == 16
    assert m.tables["repo_heads"].num_partitions == 2
    assert len(m.tables["repo_heads"].partitions) == 2
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    assert tables_equal(fanout_table(lake_dir, "repo_files"),
                        oracle_fold(tiny_stream))
    want = _heads_oracle(tiny_stream)
    heads = fanout_table(lake_dir, "repo_heads")
    got = {
        r: c for r, c in zip(heads["repo"].to_pylist(),
                             heads["commit"].to_pylist())
    }
    assert got == want
    # ticks + auto resume keep the per-table layout and stay exact
    m2 = replay_fanout(
        tiny_stream, lake_dir, _tables_small_heads(), num_partitions="auto"
    )
    assert m2.tables["repo_heads"].num_partitions == 2
    assert m2.tables["repo_files"].num_partitions == 16
    assert tables_equal(fanout_table(lake_dir, "repo_files"),
                        oracle_fold(tiny_stream))


def test_fanout_per_table_resize_triggers_table_repair(tiny_stream, lake_dir):
    replay_fanout(tiny_stream, lake_dir, _tables_small_heads(),
                  num_partitions=16)
    # widen ONLY the derived table: full rebuild of that table, base
    # untouched, everything still oracle-exact
    base, heads = _tables()
    resized = [base, FanoutTable(heads.spec, heads.derive, num_partitions=4)]
    m = replay_fanout(tiny_stream, lake_dir, resized, num_partitions=16)
    assert m.tables["repo_heads"].num_partitions == 4
    assert sorted(m.tables["repo_heads"].partitions) == [0, 1, 2, 3]
    want = _heads_oracle(tiny_stream)
    heads_t = fanout_table(lake_dir, "repo_heads")
    got = {
        r: c for r, c in zip(heads_t["repo"].to_pylist(),
                             heads_t["commit"].to_pylist())
    }
    assert got == want


def test_fanout_partition_split_and_resume(tiny_stream, lake_dir):
    """Per-table growth splits: split one table's bases, content
    identical, then resume ticks route through the split layout and
    stay oracle-exact; the other table's files are untouched."""
    from web3research_etl_ray.pipelines.fanout import split_fanout_partitions
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    tables = _tables()
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8,
                  upto_seq=999)
    before_files = fanout_table(lake_dir, "repo_files")
    m = split_fanout_partitions(lake_dir, tables, {"repo_files": [0, 3]})
    ts = m.tables["repo_files"]
    assert ts.split_depths == {0: 1, 3: 1}
    assert _eq(fanout_table(lake_dir, "repo_files"), before_files)
    # untouched table carried forward wholesale
    heads_files = [e.file for e in m.tables["repo_heads"].partitions.values()]
    assert all(f is None or "gen=000000" in f for f in heads_files)
    # resume the stream through the split layout
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8)
    assert tables_equal(fanout_table(lake_dir, "repo_files"),
                        oracle_fold(tiny_stream))
    want = _heads_oracle(tiny_stream)
    heads = fanout_table(lake_dir, "repo_heads")
    got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                heads["commit"].to_pylist())}
    assert got == want


def test_fanout_auto_split_bounds_partitions(tiny_stream, lake_dir):
    from web3research_etl_ray.oracle import oracle_fold, tables_equal

    m = replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=4,
                      split_threshold_rows=60)
    ts = m.tables["repo_files"]
    assert ts.split_depths, "threshold should have split the base table"
    assert all(e.num_rows <= 60 for e in ts.partitions.values())
    assert tables_equal(fanout_table(lake_dir, "repo_files"),
                        oracle_fold(tiny_stream))
    # re-tick keeps the layout
    m2 = replay_fanout(tiny_stream, lake_dir, _tables(), num_partitions=4,
                       split_threshold_rows=60)
    assert m2.tables["repo_files"].split_depths == ts.split_depths
    assert tables_equal(fanout_table(lake_dir, "repo_files"),
                        oracle_fold(tiny_stream))


def test_fanout_check_repair_across_split(tiny_stream, lake_dir):
    import os

    import pyarrow.parquet as _pq

    from web3research_etl_ray.pipelines.check import check_fanout, repair_fanout
    from web3research_etl_ray.pipelines.fanout import split_fanout_partitions
    from web3research_etl_ray.state.manifest import load_latest_multi, table_dir

    tables = _tables()
    replay_fanout(tiny_stream, lake_dir, tables, num_partitions=8)
    split_fanout_partitions(lake_dir, tables, {"repo_files": [1]})
    reports = check_fanout(tiny_stream, lake_dir, tables)
    assert all(r.ok for r in reports.values()), reports
    # corrupt the split child file; check localizes (base-level), and
    # repair expands the base to its extended ids
    m = load_latest_multi(lake_dir)
    victim = next(e for p, e in sorted(m.tables["repo_files"].partitions.items())
                  if p >= 8 and e.file)
    path = os.path.join(table_dir(lake_dir, "repo_files"), victim.file)
    t = _pq.read_table(path)
    _pq.write_table(t.slice(1), path)
    reports = check_fanout(tiny_stream, lake_dir, tables)
    assert not reports["repo_files"].ok
    repair_fanout(tiny_stream, lake_dir, tables,
                  {"repo_files": reports["repo_files"].bad_partitions})
    reports = check_fanout(tiny_stream, lake_dir, tables)
    assert all(r.ok for r in reports.values()), reports


def test_fanout_sync_watch_applies_heads(tiny_stream, tmp_path):
    """sync_fanout(watch=True): a producer lands heads on its own
    clock; every landed head is applied across all tables in lockstep
    and the loop returns on idle timeout."""
    import glob as _glob
    import shutil as _shutil
    import threading
    import time as _time

    from web3research_etl_ray.pipelines.tail import sync_fanout
    from web3research_etl_ray.state.manifest import load_latest_multi

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    segs = sorted(_glob.glob(f"{tiny_stream}/events-*.parquet"))
    _shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)

    def producer():
        for s in segs:
            _time.sleep(0.25)
            _shutil.copy(s, stream + "/.tmp")
            os.replace(
                stream + "/.tmp", os.path.join(stream, os.path.basename(s))
            )

    lake = str(tmp_path / "mlake")
    t = threading.Thread(target=producer)
    t.start()
    sync_fanout(
        stream,
        lake,
        _tables(),
        watch=True,
        max_ticks=len(segs),
        watch_timeout_s=3.0,
        num_partitions=8,
    )
    t.join()
    m = load_latest_multi(lake)
    assert m is not None and 1 <= m.generation <= len(segs) - 1
    want = _heads_oracle(tiny_stream)
    heads = fanout_table(lake, "repo_heads")
    got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                heads["commit"].to_pylist())}
    assert got == want


def test_fanout_driver_tick_equivalent_to_distributed(tiny_stream, tmp_path, monkeypatch):
    """The fanout driver-local tick leg must produce the same
    multi-lake (every table, value-level) and the same per-partition
    lineage as the distributed spool path, tick by tick."""
    import glob as _glob
    import shutil as _shutil

    from web3research_etl_ray.state.manifest import load_latest_multi

    segs = sorted(_glob.glob(f"{tiny_stream}/events-*.parquet"))
    tables = _tables()

    def run(env, sub):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        stream = str(tmp_path / f"s-{sub}")
        os.makedirs(stream)
        _shutil.copy(f"{tiny_stream}/rollbacks.parquet", stream)
        lake = str(tmp_path / f"l-{sub}")
        for s in segs:
            _shutil.copy(s, stream)
            replay_fanout(stream, lake, tables, num_partitions=8)
        for k in env:
            monkeypatch.delenv(k)
        return lake

    drv = run({"W3R_FANOUT_DRIVER_TICK_BYTES": str(1 << 30),
               "W3R_FUSED_MERGE_BYTES": str(1 << 30)}, "drv")
    dist = run({"W3R_FANOUT_DRIVER_TICK_BYTES": "0"}, "dist")
    m_v, m_d = load_latest_multi(drv), load_latest_multi(dist)
    assert set(m_v.tables) == set(m_d.tables)
    for name in m_v.tables:
        tv = fanout_table(drv, name)
        td = fanout_table(dist, name)
        key = [c for c in ("repo", "path") if c in tv.column_names] or [
            tv.column_names[0]
        ]
        assert tv.sort_by([(k, "ascending") for k in key]).equals(
            td.sort_by([(k, "ascending") for k in key])
        ), name
        pv, pd_ = m_v.tables[name].partitions, m_d.tables[name].partitions
        assert set(pv) == set(pd_), name
        for pid in pv:
            for attr in ("num_rows", "watermark_seq", "events_applied",
                         "events_superseded", "events_rolled_back"):
                assert getattr(pv[pid], attr) == getattr(pd_[pid], attr), (
                    name, pid, attr)
