"""Manifest two-phase commit + GC unit tests (no Ray needed)."""

import os

from web3research_etl_ray.state.manifest import (
    Manifest,
    PartitionEntry,
    commit_manifest,
    gc_generations,
    load_latest,
    partition_relpath,
)


def _mk(gen, parts, lake):
    m = Manifest(generation=gen, num_partitions=len(parts), partitions=parts,
                 parent_generation=None if gen == 0 else gen - 1)
    for e in parts.values():
        if e.file:
            p = os.path.join(lake, e.file)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            open(p, "w").write("x")
    commit_manifest(lake, m)
    return m


def test_commit_and_load_roundtrip(tmp_path):
    lake = str(tmp_path)
    parts = {
        0: PartitionEntry(0, partition_relpath(0, 0), 10, 99, 10, 2, 1, 3),
        1: PartitionEntry(1, None, 0, 99),
    }
    _mk(0, parts, lake)
    m = load_latest(lake)
    assert m.generation == 0
    assert m.partitions[0].events_applied == 10
    assert m.partitions[0].schema_version == 3
    assert m.partitions[1].file is None
    assert m.min_watermark == 99


def test_latest_pointer_monotonic(tmp_path):
    lake = str(tmp_path)
    _mk(0, {0: PartitionEntry(0, partition_relpath(0, 0), 1, 5)}, lake)
    _mk(1, {0: PartitionEntry(0, partition_relpath(1, 0), 1, 9)}, lake)
    assert load_latest(lake).generation == 1


def test_gc_keeps_referenced_generations(tmp_path):
    lake = str(tmp_path)
    _mk(0, {0: PartitionEntry(0, partition_relpath(0, 0), 1, 5),
            1: PartitionEntry(1, partition_relpath(0, 1), 1, 5)}, lake)
    # gen1 rewrites partition 0 only; partition 1 still references gen0
    _mk(1, {0: PartitionEntry(0, partition_relpath(1, 0), 1, 9),
            1: PartitionEntry(1, partition_relpath(0, 1), 1, 5)}, lake)
    _mk(2, {0: PartitionEntry(0, partition_relpath(2, 0), 1, 12),
            1: PartitionEntry(1, partition_relpath(0, 1), 1, 5)}, lake)
    removed = gc_generations(lake, keep=1)
    # gen0 files are still referenced by gen2's partition 1 → must survive
    assert os.path.exists(os.path.join(lake, partition_relpath(0, 1)))
    assert 1 in removed  # gen1 fully superseded → deleted
    assert load_latest(lake).generation == 2


def test_backup_and_restore_roundtrip(tiny_stream, tmp_path):
    """Backup snapshots the committed generation (scripts/backup_db.py
    analogue); restore yields a byte-identical readable lake."""
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.replay import lake_table, replay
    from web3research_etl_ray.state.manifest import backup_lake, restore_lake

    lake = str(tmp_path / "lake")
    bak = str(tmp_path / "bak")
    lake2 = str(tmp_path / "lake2")
    replay(tiny_stream, lake, num_partitions=4)
    info = backup_lake(lake, bak)
    assert info["files_copied"] > 0
    restore_lake(bak, lake2)
    assert tables_equal(lake_table(lake2), oracle_fold(tiny_stream))
    # the backup itself reads as a lake
    assert tables_equal(lake_table(bak), lake_table(lake))
