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


def test_concurrent_taggers_drop_no_tag(three_gen_lake):
    """ADVICE r03: two concurrent ``create_tag`` calls must not lose
    either tag (the unlocked read-modify-write did), and tag writes
    must serialize against ``gc_generations``.  N processes tag
    concurrently while one runs GC; afterwards every tag exists and
    resolves to a live, readable generation."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_tag_proc, args=(three_gen_lake, f"t{i}", i % 3))
        for i in range(6)
    ] + [ctx.Process(target=_gc_proc, args=(three_gen_lake,))]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    tags = list_tags(three_gen_lake)
    assert set(tags) == {f"t{i}" for i in range(6)}
    # every pinned generation still readable (GC never collected one
    # that a tagger was pinning)
    for name in tags:
        assert lake_table(three_gen_lake, tag=name).num_rows > 0


def _tag_proc(lake, name, gen):
    from web3research_etl_ray.state.manifest import create_tag

    create_tag(lake, name, gen)


def _gc_proc(lake):
    from web3research_etl_ray.state.manifest import gc_generations

    gc_generations(lake, keep=1)
