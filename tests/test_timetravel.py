"""Time-travel reads + snapshot diff over the committed manifest chain.

The reference keeps only the current table state (ClickHouse
ReplacingMergeTree); its backup script (scripts/backup_db.py) is the
closest thing to a snapshot.  The manifest-per-generation design gives
the lake real snapshot isolation for free — these tests pin the
visibility rules: committed chain only, staged manifests invisible,
GC bounds retention, diff matches a sequential oracle.
"""

import json
import os

import pyarrow as pa
import pytest

from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import (
    lake_diff,
    lake_table,
    lookup_key,
    read_lake,
    replay,
)
from web3research_etl_ray.state.manifest import (
    committed_chain,
    gc_generations,
    load_latest,
)

UPTO = 999


@pytest.fixture()
def two_gen_lake(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=UPTO)  # gen 0
    replay(tiny_stream, lake_dir, num_partitions=8)  # gen 1
    return lake_dir


def test_time_travel_read(tiny_stream, two_gen_lake):
    assert committed_chain(two_gen_lake) == [0, 1]
    old = lake_table(two_gen_lake, generation=0)
    assert tables_equal(old, oracle_fold(tiny_stream, upto_seq=UPTO))
    assert tables_equal(lake_table(two_gen_lake), oracle_fold(tiny_stream))
    assert read_lake(two_gen_lake, generation=0).count() == old.num_rows


def test_time_travel_point_lookup(tiny_stream, two_gen_lake):
    old = lake_table(two_gen_lake, generation=0)
    row = old.slice(0, 1).to_pylist()[0]
    got = lookup_key(two_gen_lake, row["repo"], row["path"], generation=0)
    assert got is not None and got["commit_seq"] == row["commit_seq"]


def test_snapshot_diff_matches_oracle(tiny_stream, two_gen_lake):
    diff = pa.Table.from_pylist(lake_diff(two_gen_lake, 0, 1).take_all())

    def keymap(t):
        return {
            (r, p): s
            for r, p, s in zip(
                t.column("repo").to_pylist(),
                t.column("path").to_pylist(),
                t.column("commit_seq").to_pylist(),
            )
        }

    old = keymap(oracle_fold(tiny_stream, upto_seq=UPTO))
    new = keymap(oracle_fold(tiny_stream))
    expected = {}
    for k in old.keys() - new.keys():
        expected[k] = ("deleted", old[k], None)
    for k in new.keys() - old.keys():
        expected[k] = ("added", None, new[k])
    for k in old.keys() & new.keys():
        if old[k] != new[k]:
            expected[k] = ("updated", old[k], new[k])
    got = {
        (r["repo"], r["path"]): (r["change"], r["old_seq"], r["new_seq"])
        for r in diff.to_pylist()
    }
    assert got == expected
    assert expected, "fixture must actually change state between ticks"


def test_diff_empty_between_identical_generations(tiny_stream, two_gen_lake):
    # a re-tick over a fully-applied stream commits a new generation
    # whose partitions carry forward unchanged → empty diff, and the
    # partition-alignment skip means zero files are even read
    replay(tiny_stream, two_gen_lake, num_partitions=8)  # gen 2 == gen 1
    assert lake_diff(two_gen_lake, 1, 2).count() == 0


def test_staged_manifest_invisible_to_time_travel(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8)  # gen 0
    # simulate a writer that crashed between manifest write and the
    # LATEST swap: manifest file exists, never published
    staged = {
        "generation": 7,
        "num_partitions": 8,
        "partitions": {},
        "applied_rollbacks": [],
        "schema_version": 1,
        "parent_generation": 0,
    }
    with open(os.path.join(lake_dir, "manifest-000007.json"), "w") as fh:
        json.dump(staged, fh)
    assert committed_chain(lake_dir) == [0]
    with pytest.raises(ValueError, match="not on the committed chain"):
        read_lake(lake_dir, generation=7)


def test_gc_bounds_time_travel(tiny_stream, lake_dir):
    replay(tiny_stream, lake_dir, num_partitions=8, upto_seq=UPTO)  # gen 0
    replay(tiny_stream, lake_dir, num_partitions=8)  # gen 1
    replay(tiny_stream, lake_dir, num_partitions=8)  # gen 2 (no-op tick)
    gc_generations(lake_dir, keep=1)
    chain = committed_chain(lake_dir)
    assert chain[-1] == load_latest(lake_dir).generation
    assert 0 not in chain
    with pytest.raises(ValueError, match="not on the committed chain"):
        read_lake(lake_dir, generation=0)
