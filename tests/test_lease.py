"""Single-writer enforcement: lease + LATEST check-and-swap.

The reference is single-loop by construction (src/ch_eth/sync.rs:357-434
— one sync process per chain); at cluster scale two tail loops pointed
at one lake would last-write-win the pointer.  These tests pin the
engine's answer: a second live writer refuses cleanly, a dead writer's
lease is taken over, and a pointer that moved underneath a commit
aborts the swap — no committed generation is ever orphaned.
"""

import os


import pytest

from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.state.manifest import (
    ConcurrentWriterError,
    Manifest,
    acquire_lease,
    commit_manifest,
    load_latest,
    release_lease,
)


def test_live_foreign_writer_refused(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)
    # simulate a live writer from another process on this host: pid 1
    # is always alive (init) and never ours
    with open(os.path.join(lake_dir, "WRITER.lease"), "w") as fh:
        fh.write(f"{os.uname().nodename}:1")
    with pytest.raises(ConcurrentWriterError):
        replay(tiny_stream, lake_dir, num_partitions=8)
    # lake unchanged and still readable
    assert load_latest(lake_dir).generation == 0
    os.remove(os.path.join(lake_dir, "WRITER.lease"))


def test_dead_writer_lease_taken_over(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=999)
    # a hard-killed writer left its lease behind: pick a pid that
    # cannot be alive (kernel pid_max is < 2^22 by default)
    with open(os.path.join(lake_dir, "WRITER.lease"), "w") as fh:
        fh.write(f"{os.uname().nodename}:4194000")
    m = replay(tiny_stream, lake_dir, num_partitions=8)
    assert m.generation == 1
    assert tables_equal(lake_table(lake_dir), oracle_fold(tiny_stream))
    assert not os.path.exists(os.path.join(lake_dir, "WRITER.lease"))


def test_reentrant_hold_not_released_by_inner(tmp_path):
    lake = str(tmp_path)
    assert acquire_lease(lake) is True
    assert acquire_lease(lake) is False  # reentrant — inner must not own
    assert os.path.exists(os.path.join(lake, "WRITER.lease"))
    release_lease(lake)
    assert not os.path.exists(os.path.join(lake, "WRITER.lease"))


def test_cas_refuses_moved_pointer(tiny_stream, lake_dir):
    m0 = replay(tiny_stream, lake_dir, num_partitions=8)
    # writer A builds generation 1 on parent 0 ... meanwhile writer B
    # commits its own generation 1 first
    interloper = Manifest(
        generation=1,
        num_partitions=8,
        partitions=dict(m0.partitions),
        parent_generation=0,
    )
    commit_manifest(lake_dir, interloper)
    stale = Manifest(
        generation=2,
        num_partitions=8,
        partitions=dict(m0.partitions),
        parent_generation=0,  # built against the OLD head
    )
    with pytest.raises(ConcurrentWriterError):
        commit_manifest(lake_dir, stale)
    assert load_latest(lake_dir).generation == 1  # B's commit survives


def test_two_concurrent_sync_loops(tiny_stream, lake_dir):
    """Two real writer processes on one lake: while this process's sync
    loop holds the lease mid-tick, a second process's sync loop refuses
    cleanly (ConcurrentWriterError before it touches any state); after
    the holder finishes, the lake is exact — no generation lost."""
    import subprocess
    import sys

    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=499)
    assert acquire_lease(lake_dir) is True  # this process = live loop A
    try:
        child = subprocess.run(
            [
                sys.executable,
                "-c",
                "import sys; sys.path.insert(0, '/root/repo')\n"
                "from web3research_etl_ray.pipelines.replay import replay\n"
                "from web3research_etl_ray.state.manifest import (\n"
                "    ConcurrentWriterError)\n"
                f"try:\n"
                f"    replay({tiny_stream!r}, {lake_dir!r}, num_partitions=8)\n"
                f"    sys.exit(2)\n"
                f"except ConcurrentWriterError:\n"
                f"    sys.exit(0)\n",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert child.returncode == 0, (child.returncode, child.stderr[-500:])
        assert load_latest(lake_dir).generation == 0  # B changed nothing
    finally:
        release_lease(lake_dir)
    replay(tiny_stream, lake_dir, num_partitions=8)  # loop A continues
    assert tables_equal(lake_table(lake_dir), oracle_fold(tiny_stream))


def test_index_ticks_hold_the_lease(tmp_path):
    """The persistent index state dirs share the lake's single-writer
    contract: a live foreign writer makes a tick refuse cleanly."""
    import pyarrow as pa
    import ray

    from web3research_etl_ray.pipelines.curate import CurateIndex
    from web3research_etl_ray.pipelines.dedup_index import MinHashIndex

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(30)), pa.int64()),
            "text": pa.array(
                ["the quick brown fox jumps over the lazy dog "
                 f"document number {i} with enough distinct words to pass "
                 "every quality filter threshold easily" for i in range(30)]
            ),
        }
    )
    for idx in (
        MinHashIndex(str(tmp_path / "didx")),
        CurateIndex(str(tmp_path / "cidx"), quality_min=0.5),
    ):
        with open(os.path.join(idx.root, "WRITER.lease"), "w") as fh:
            fh.write(f"{os.uname().nodename}:1")  # live foreign writer
        with pytest.raises(ConcurrentWriterError):
            if hasattr(idx, "dedup_tick"):
                idx.dedup_tick(ray.data.from_arrow(docs))
            else:
                idx.tick(ray.data.from_arrow(docs))
        os.remove(os.path.join(idx.root, "WRITER.lease"))
        # with the stale writer gone the tick proceeds
        if hasattr(idx, "dedup_tick"):
            idx.dedup_tick(ray.data.from_arrow(docs))
        else:
            out = idx.tick(ray.data.from_arrow(docs))
            assert out.num_rows > 0
