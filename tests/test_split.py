"""Partition splitting — growth-adaptive lake layout (SURVEY §7.5(6)).

A base partition past the split threshold doubles its file count
(depth k → k+1) in its own committed generation, rewriting ONLY that
partition's bytes; routing, watermark resume, rollback repair, check/
repair, time travel and point lookups must all stay exact across the
layout change.  The reference has no analogue (ClickHouse parts split
implicitly); this is the engine answer to a lake growing 100× past its
generation-0 sizing without a full rebuild.
"""

import os

import pyarrow.parquet as pq

from web3research_etl_ray.oracle import diff_tables, oracle_fold, tables_equal
from web3research_etl_ray.pipelines.check import check, check_and_repair
from web3research_etl_ray.pipelines.replay import (
    lake_table,
    lookup_key,
    read_lake,
    replay,
    split_partitions,
)
from web3research_etl_ray.state.manifest import gc_generations, load_latest


def assert_lake_equals_oracle(lake_dir, stream_dir, **fold_kw):
    lake = lake_table(lake_dir)
    exp = oracle_fold(stream_dir, **fold_kw)
    assert tables_equal(lake, exp), diff_tables(lake, exp)


def test_split_preserves_content_and_time_travel(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    before = lake_table(lake_dir)
    m = split_partitions(lake_dir, [0, 3])
    assert m.split_depths == {0: 1, 3: 1}
    assert sorted(m.partitions) == [0, 1, 2, 3, 4, 5, 6, 7, 8, 11]
    # byte-identical reads: same rows before/after the layout change
    assert tables_equal(lake_table(lake_dir), before)
    # pre-split generation still readable via time travel
    assert tables_equal(lake_table(lake_dir, generation=0), before)
    assert read_lake(lake_dir, generation=0).count() == before.num_rows
    # only the split bases' files were rewritten — others carried forward
    kept = [e.file for p, e in m.partitions.items() if p in (1, 2, 4, 5, 6, 7)]
    assert all(f and "gen=000000" in f for f in kept)


def test_split_then_retick_and_lookup(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    split_partitions(lake_dir, [0])
    split_partitions(lake_dir, [0, 5])  # depth 2 + a fresh base
    m = replay(tiny_stream, lake_dir, num_partitions=8)  # idempotent re-tick
    assert m.split_depths == {0: 2, 5: 1}
    assert_lake_equals_oracle(lake_dir, tiny_stream)
    row = lake_table(lake_dir).to_pylist()[13]
    got = lookup_key(lake_dir, row["repo"], row["path"])
    assert got is not None and got["commit_seq"] == row["commit_seq"]


def test_split_mid_stream_resume(tiny_stream, lake_dir):
    """Partial replay → split → resume: the split children's watermarks
    route the remaining events exactly (no duplicate / lost applies),
    including the stream's rollback repair landing on extended pids."""
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=999)
    split_partitions(lake_dir, [1, 2, 6])
    replay(tiny_stream, lake_dir, num_partitions=8)
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_auto_split_converges_under_threshold(tiny_stream, lake_dir):
    m = replay(
        tiny_stream, lake_dir, num_partitions=4, split_threshold_rows=60
    )
    assert m.split_depths, "threshold should have triggered splits"
    assert all(e.num_rows <= 60 for e in m.partitions.values())
    assert_lake_equals_oracle(lake_dir, tiny_stream)
    # next tick keeps the layout and stays exact
    m2 = replay(
        tiny_stream, lake_dir, num_partitions=4, split_threshold_rows=60
    )
    assert m2.split_depths == m.split_depths
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_check_and_repair_across_split(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    split_partitions(lake_dir, [0, 4])
    report = check(tiny_stream, lake_dir)
    assert report.ok, vars(report)
    # corrupt one SPLIT child file, then check→repair (base-level bad
    # pids expand to every extended id of the base)
    m = load_latest(lake_dir)
    victim = next(
        e for p, e in sorted(m.partitions.items()) if p >= 8 and e.file
    )
    path = os.path.join(lake_dir, victim.file)
    t = pq.read_table(path)
    pq.write_table(t.slice(1), path)  # drop a row
    report = check_and_repair(tiny_stream, lake_dir)
    assert not report.ok
    assert check(tiny_stream, lake_dir).ok
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_gc_after_split_keeps_referenced_files(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    split_partitions(lake_dir, [2])
    replay(tiny_stream, lake_dir, num_partitions=8)
    gc_generations(lake_dir, keep=1)
    assert_lake_equals_oracle(lake_dir, tiny_stream)


def test_split_partition_files_stay_key_sorted(tiny_stream, lake_dir):
    """Merge-on-write zone-map invariant survives the split rewrite."""
    replay(tiny_stream, lake_dir, num_partitions=4)
    m = split_partitions(lake_dir, [0, 1, 2, 3])
    for e in m.partitions.values():
        if not e.file:
            continue
        t = pq.read_table(os.path.join(lake_dir, e.file), columns=["repo", "path"])
        rows = list(zip(t.column("repo").to_pylist(), t.column("path").to_pylist()))
        assert rows == sorted(rows), e.file
