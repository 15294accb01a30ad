"""Named generation tags (Iceberg-tag analogue): pin a committed
snapshot under a stable name.  The contracts under test:

- a tagged generation survives ``gc_generations`` — manifest AND every
  file it references — and stays byte-identical readable via
  ``lake_table(tag=...)`` / ``read_lake(tag=...)`` even after the
  parent-chain links past it are GC'd;
- deleting the tag makes the generation collectable again;
- only committed-chain generations can be tagged (a staged-only
  manifest written by a crashed writer is invisible to tagging, like
  it is to every other read path);
- duplicate tag names refuse to move silently.
"""

import json
import os

import pytest

from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, read_lake, replay
from web3research_etl_ray.state.manifest import (
    create_tag,
    delete_tag,
    gc_generations,
    list_tags,
    resolve_tag,
)

UPTO = 999


@pytest.fixture()
def three_gen_lake(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=UPTO)  # gen 0
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=1500)  # gen 1
    replay(tiny_stream, lake_dir, num_partitions=8)  # gen 2
    return lake_dir


def test_tag_pins_generation_across_gc(tiny_stream, three_gen_lake):
    lake = three_gen_lake
    assert create_tag(lake, "v0", 0) == 0
    snap = lake_table(lake, generation=0)
    assert tables_equal(snap, oracle_fold(tiny_stream, upto_seq=UPTO))

    # keep=1 would normally leave only gen 2; the tag must pin gen 0
    removed = gc_generations(lake, keep=1)
    assert 1 in removed and 0 not in removed and 2 not in removed

    assert resolve_tag(lake, "v0") == 0
    again = lake_table(lake, tag="v0")
    assert tables_equal(again, snap)
    assert read_lake(lake, tag="v0").count() == snap.num_rows
    # the untagged middle generation is really gone
    with pytest.raises(ValueError):
        lake_table(lake, generation=1)


def test_delete_tag_releases_pin(three_gen_lake):
    lake = three_gen_lake
    create_tag(lake, "v0", 0)
    gc_generations(lake, keep=1)
    assert delete_tag(lake, "v0") == 0
    assert list_tags(lake) == {}
    removed = gc_generations(lake, keep=1)
    assert 0 in removed
    with pytest.raises(ValueError):
        lake_table(lake, generation=0)
    with pytest.raises(KeyError):
        resolve_tag(lake, "v0")


def test_tag_latest_by_default_and_duplicate_refused(three_gen_lake):
    lake = three_gen_lake
    assert create_tag(lake, "release") == 2
    # same name, same generation: idempotent no-op
    assert create_tag(lake, "release") == 2
    with pytest.raises(ValueError):
        create_tag(lake, "release", 0)
    assert create_tag(lake, "release", 0, replace=True) == 0
    assert list_tags(lake) == {"release": 0}


def test_staged_only_generation_cannot_be_tagged(three_gen_lake):
    lake = three_gen_lake
    # simulate a crashed writer: manifest file exists, LATEST never
    # swapped to it — invisible to reads, must be invisible to tags
    with open(os.path.join(lake, "manifest-000002.json")) as fh:
        doc = json.load(fh)
    doc["generation"] = 99
    doc["parent_generation"] = 2
    ghost = os.path.join(lake, "manifest-000099.json")
    with open(ghost, "w") as fh:
        json.dump(doc, fh)
    with pytest.raises(ValueError):
        create_tag(lake, "ghost", 99)
    os.remove(ghost)


def test_gc_keeps_files_referenced_by_tagged_manifest(three_gen_lake):
    lake = three_gen_lake
    create_tag(lake, "v0", 0)
    gc_generations(lake, keep=1)
    # every file the tagged manifest lists must still exist on disk
    from web3research_etl_ray.state.manifest import load_manifest

    m = load_manifest(lake, 0)
    for f in m.data_files(lake):
        assert os.path.exists(f), f


def test_fanout_tag_pins_multi_generation_across_gc(tiny_stream, lake_dir):
    """Fan-out analogue: a multi-table tag pins ONE mutually
    consistent snapshot of every table past GC."""
    from tests.test_fanout import _tables
    from web3research_etl_ray.pipelines.fanout import fanout_table
    from web3research_etl_ray.pipelines.tail import sync_fanout
    from web3research_etl_ray.state.manifest import (
        create_tag_multi,
        gc_multi_generations,
    )

    sync_fanout(tiny_stream, lake_dir, _tables(), max_ticks=3,
                num_partitions=8)
    assert create_tag_multi(lake_dir, "tick0", 0) == 0
    snap = fanout_table(lake_dir, "repo_heads", generation=0)
    removed = gc_multi_generations(lake_dir, keep=1)
    assert 1 in removed and 0 not in removed
    again = fanout_table(lake_dir, "repo_heads", tag="tick0")
    assert again.sort_by("repo").equals(snap.sort_by("repo"))
    with pytest.raises(FileNotFoundError):
        fanout_table(lake_dir, "repo_heads", generation=1)
    with pytest.raises(ValueError):
        create_tag_multi(lake_dir, "ghost", 77)


def test_concurrent_taggers_drop_no_tag(three_gen_lake, tmp_path):
    """ADVICE r03 / VERDICT r04: two concurrent ``create_tag`` calls
    must not lose either tag (the unlocked read-modify-write did), and
    tag writes must serialize against ``gc_generations``.  Six
    processes tag gens {0,1,2} concurrently while one runs
    ``gc_generations(keep=1)``.  GC winning the lock FIRST is a legal
    ordering — gens 0/1 are then legitimately collected and tagging
    them correctly raises ValueError — so a gen-0/1 tagger may lose.
    The hard contracts, which no ordering may violate:

    - gen-2 taggers ALWAYS succeed (LATEST is never collectable);
    - every tag that WAS written still exists afterwards (no lost
      update) and resolves to a live, readable generation (no
      dangling pin — GC never collected a generation being tagged);
    - a tagger loses ONLY by ValueError-after-GC, never by crash or
      lock failure.
    """
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    ok_dir = str(tmp_path / "written")
    os.makedirs(ok_dir, exist_ok=True)
    procs = [
        ctx.Process(
            target=_tag_proc, args=(three_gen_lake, f"t{i}", i % 3, ok_dir)
        )
        for i in range(6)
    ] + [ctx.Process(target=_gc_proc, args=(three_gen_lake,))]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    written = {
        f.removesuffix(".ok") for f in os.listdir(ok_dir) if f.endswith(".ok")
    }
    lost = {
        f.removesuffix(".lost")
        for f in os.listdir(ok_dir)
        if f.endswith(".lost")
    }
    # every tagger reported exactly one outcome; no crashes
    assert written | lost == {f"t{i}" for i in range(6)}
    assert written & lost == set()
    # gen-2 taggers (t2, t5) can never lose: LATEST is uncollectable
    assert {"t2", "t5"} <= written
    # no written tag was dropped by a concurrent write or GC'd dangling
    tags = list_tags(three_gen_lake)
    assert set(tags) == written
    for name in written:
        assert lake_table(three_gen_lake, tag=name).num_rows > 0


def _tag_proc(lake, name, gen, ok_dir):
    from web3research_etl_ray.state.manifest import create_tag

    try:
        create_tag(lake, name, gen)
    except ValueError:
        # legal loss: GC won the TAGS.lock first and collected this
        # generation; the engine correctly refuses to pin it
        with open(os.path.join(ok_dir, f"{name}.lost"), "w"):
            pass
    else:
        with open(os.path.join(ok_dir, f"{name}.ok"), "w"):
            pass


def _gc_proc(lake):
    from web3research_etl_ray.state.manifest import gc_generations

    gc_generations(lake, keep=1)


def test_tags_lock_owner_checked_release(tmp_path):
    """ADVICE r04: a holder that lost its lock (stale takeover by a
    successor) must NOT delete the successor's lock on __exit__."""
    from web3research_etl_ray.state.manifest import _tags_lock

    lake = str(tmp_path)
    a = _tags_lock(lake)
    a.__enter__()
    # simulate a successor having taken over: overwrite with a foreign
    # token (what a takeover's os.replace does)
    with open(a._path, "w") as fh:
        fh.write("otherhost:99999:deadbeef")
    a.__exit__()
    # the foreign lock survives the loser's release
    assert os.path.exists(a._path)
    with open(a._path) as fh:
        assert fh.read().strip() == "otherhost:99999:deadbeef"
    os.remove(a._path)


def test_tags_lock_stale_takeover_verified(tmp_path):
    """A stale lock (dead same-host pid) is taken over, the takeover is
    verified by token re-read, and release removes only our own file."""
    from web3research_etl_ray.state.manifest import _tags_lock

    lake = str(tmp_path)
    lock_path = os.path.join(lake, _tags_lock._NAME)
    # a dead-pid same-host owner: pid 2 is almost never ours/live in a
    # test sandbox — pick a pid that does not exist
    dead = 2
    while True:
        try:
            os.kill(dead, 0)
            dead += 1
        except ProcessLookupError:
            break
        except PermissionError:
            dead += 1
    import socket

    with open(lock_path, "w") as fh:
        fh.write(f"{socket.gethostname()}:{dead}:cafebabe")
    b = _tags_lock(lake)
    b.__enter__()
    with open(lock_path) as fh:
        assert fh.read().strip() == b._token
    b.__exit__()
    assert not os.path.exists(lock_path)
