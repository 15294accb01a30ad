"""Hot-key / hot-repo skew tests (BASELINE.json: explicit salt-based
skew splitting of hot repos).

Two layers of defense, both verified here:

1. ``partial_lww`` is the combiner: a hot KEY collapses to one row per
   block before the exchange, so its shuffle volume is O(blocks), not
   O(events).
2. hash partitioning over (repo, path) spreads a hot REPO's paths
   across partitions, and the salted spool (salt column in the
   partition path) splits one partition's spool across sub-dirs so no
   single reducer input file set is written by a single producer.
"""

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from web3research_etl_ray.gen import generate_events
from web3research_etl_ray.oracle import oracle_fold, tables_equal
from web3research_etl_ray.pipelines.replay import lake_table, replay
from web3research_etl_ray.stages.lww import partial_lww
from web3research_etl_ray.stages.normalize import Normalize


def _hot_key_events(n=20_000, hot_frac=0.5):
    """Synthetic stream where one key receives ``hot_frac`` of events."""
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": [],
            "commit_seq": [], "op": []}
    rng = np.random.default_rng(7)
    for seq in range(n):
        if rng.random() < hot_frac:
            repo, path = "org-hot/repo-hot", "src/hot.py"
        else:
            repo = f"org-{int(rng.integers(0, 20)):03d}/r"
            path = f"src/f{int(rng.integers(0, 200)):04d}.py"
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(f"c{seq}")
        rows["lang"].append("py")
        rows["content"].append(f"content of {repo}/{path} at {seq} " * 10)
        rows["commit_seq"].append(seq)
        rows["op"].append("upsert")
    return pa.table(rows)


def test_partial_combine_bounds_hot_key_shuffle_volume():
    t = _hot_key_events()
    out = partial_lww(Normalize(16, [])(t))
    counts = collections.Counter(
        zip(out.column("repo").to_pylist(), out.column("path").to_pylist())
    )
    # the hot key (~10k events) ships exactly ONE combined row per block
    assert counts[("org-hot/repo-hot", "src/hot.py")] == 1


def test_skewed_stream_replays_correctly(tmp_path):
    """End-to-end on a Zipf-skewed generated stream (gen.py already
    draws repos Zipf(1.1), so the hottest repo dominates)."""
    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=3000, seed=11)
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8)
    assert tables_equal(lake_table(lake), oracle_fold(stream))


def test_salted_replay_matches_oracle(tmp_path):
    """salt_buckets splits each partition's spool into salt shards and
    the merge folds incrementally — converged state must be identical
    to the unsalted replay and to the oracle."""
    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=3000, seed=11)
    lake = str(tmp_path / "lake_salted")
    m = replay(stream, lake, num_partitions=8, salt_buckets=4)
    assert tables_equal(lake_table(lake), oracle_fold(stream))
    assert m.totals()["events_rolled_back"] > 0  # counters survive salting


def test_partition_key_balance_under_repo_skew(tmp_path):
    """A hot repo must NOT concentrate in one partition: (repo, path)
    hashing spreads its paths.  Verify key-count balance across
    partitions on the Zipf stream."""
    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=4000, seed=13)
    lake = str(tmp_path / "lake")
    m = replay(stream, lake, num_partitions=8)
    sizes = [e.num_rows for e in m.partitions.values()]
    assert max(sizes) <= 3 * max(1, int(np.median(sizes)))


def test_targeted_salt_hot_pids(tmp_path):
    """Salting only flagged-hot partitions: same converged state, and
    only the hot partitions' spools fan out."""
    stream = str(tmp_path / "stream")
    generate_events(stream, n_events=3000, seed=11)
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8, salt_buckets=4,
           salt_hot_pids=frozenset({0, 3}))
    assert tables_equal(lake_table(lake), oracle_fold(stream))


def test_adaptive_hot_partition_salting(tmp_path):
    """salt_hot_pids='auto': the first generation records per-partition
    event traffic in the manifest; the next tick salts partitions whose
    traffic was >4x the median — converged state stays exact."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.state.manifest import load_latest

    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    t = _hot_key_events(n=4000, hot_frac=0.6)
    pq.write_table(t.slice(0, 3000), os.path.join(stream, "events-00000.parquet"))
    lake = str(tmp_path / "lake")
    replay(stream, lake, num_partitions=8, salt_buckets=4)
    m1 = load_latest(lake)
    traffic = [e.last_gen_events for e in m1.partitions.values()]
    assert max(traffic) > 4 * sorted(traffic)[len(traffic) // 2]  # hot signal
    # tick 2: more events, auto-salting kicks in for the hot partition
    pq.write_table(t.slice(3000), os.path.join(stream, "events-00001.parquet"))
    replay(stream, lake, num_partitions=8, salt_buckets=4)
    state = {
        (r["repo"], r["path"]): r["commit_seq"]
        for r in lake_table(lake).to_pylist()
    }
    # oracle: plain python fold of the full table
    exp = {}
    for row in t.to_pylist():
        exp[(row["repo"], row["path"])] = max(
            exp.get((row["repo"], row["path"]), -1), row["commit_seq"]
        )
    assert state == exp
