"""Exactly-once under a REAL crash: SIGKILL a replay subprocess
mid-flight, then resume in a fresh process — the converged lake must
equal the oracle with no duplicate or lost applies, and the killed
generation's staged files must never become visible."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from web3research_etl_ray.pipelines.replay import replay
print("START", flush=True)
replay({stream!r}, {lake!r}, num_partitions=8)
print("DONE", flush=True)
"""


def test_sigkill_mid_replay_then_resume(tmp_path):
    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.replay import lake_table, replay
    from web3research_etl_ray.state.manifest import load_latest

    stream = ensure_stream(60_000)
    lake = str(tmp_path / "lake")

    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD.format(repo=REPO, stream=stream, lake=lake)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: killpg takes Ray too
    )
    # wait for the child's Ray session to actually start working, then
    # kill the WHOLE process group hard (driver + Ray workers)
    line = child.stdout.readline()
    assert "START" in line
    time.sleep(1.2)  # mid-flight: the full replay takes ~2.5 s here
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()

    # the lake is either empty (killed before commit) or fully
    # committed (finished early) — never half-visible
    m = load_latest(lake)
    if m is not None:
        assert m.generation == 0

    # resume in THIS process: converge and match the oracle exactly
    replay(stream, lake, num_partitions=8)
    assert tables_equal(lake_table(lake), oracle_fold(stream))
    # idempotent re-tick after the crash/resume cycle
    replay(stream, lake, num_partitions=8)
    assert tables_equal(lake_table(lake), oracle_fold(stream))


_CHILD_FANOUT = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
from web3research_etl_ray.pipelines.fanout import FanoutTable, replay_fanout
from web3research_etl_ray.schema import REPO_FILES, TableSpec
heads_schema = pa.schema([
    pa.field("repo", pa.string(), nullable=False),
    pa.field("commit", pa.string(), nullable=False),
    pa.field("commit_seq", pa.int64(), nullable=False),
])
heads = TableSpec(name="repo_heads", schema=heads_schema, key=("repo",),
                  event_schema=heads_schema.append(pa.field("op", pa.string())))
def derive_heads(t):
    return pa.table({{"repo": t.column("repo"), "commit": t.column("commit"),
                     "commit_seq": t.column("commit_seq"),
                     "op": pa.array(["upsert"] * t.num_rows, pa.string())}})
tables = [FanoutTable(REPO_FILES, None), FanoutTable(heads, derive_heads)]
print("START", flush=True)
replay_fanout({stream!r}, {lake!r}, tables, num_partitions=8)
print("DONE", flush=True)
"""


def test_sigkill_mid_fanout_then_resume(tmp_path):
    """Same hard-crash contract for the multi-table fan-out: after a
    SIGKILL the multi-manifest is all-or-nothing (no table a
    generation ahead), and a resume converges every table."""
    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.state.manifest import load_latest_multi
    from tests.test_fanout import _heads_oracle, _tables

    from web3research_etl_ray.pipelines.fanout import (
        fanout_table,
        replay_fanout,
    )

    stream = ensure_stream(60_000)
    lake = str(tmp_path / "mlake")
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_FANOUT.format(repo=REPO, stream=stream, lake=lake)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    line = child.stdout.readline()
    assert "START" in line
    time.sleep(1.2)
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()

    m = load_latest_multi(lake)
    if m is not None:
        # atomic: one generation covering BOTH tables, never a subset
        assert set(m.tables) == {"repo_files", "repo_heads"}

    tables = _tables()
    replay_fanout(stream, lake, tables, num_partitions=8)
    heads = fanout_table(lake, "repo_heads")
    want = _heads_oracle(stream)
    got = {r: c for r, c in zip(heads["repo"].to_pylist(),
                                heads["commit"].to_pylist())}
    assert got == want


_CHILD_ADDITIVE = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from web3research_etl_ray.pipelines.fanout import replay_fanout
from tests.test_fanout import _additive_tables
print("START", flush=True)
replay_fanout({stream!r}, {lake!r}, _additive_tables(), num_partitions=8)
print("DONE", flush=True)
"""


def test_sigkill_mid_additive_fanout_then_resume(tmp_path):
    """Exactly-once ACCUMULATION under a hard crash: SIGKILL mid-replay
    of the additive fan-out, resume in a fresh process — sums must
    equal the full-history oracle with nothing double-counted (the
    killed generation's partial spool/merge work must not leak into
    the totals)."""
    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.pipelines.fanout import replay_fanout
    from tests.test_fanout import (
        _activity_oracle,
        _activity_rows,
        _additive_tables,
    )

    stream = ensure_stream(60_000)
    lake = str(tmp_path / "alake")
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_ADDITIVE.format(repo=REPO, stream=stream, lake=lake)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    line = child.stdout.readline()
    assert "START" in line
    time.sleep(1.2)
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()

    tables = _additive_tables()
    replay_fanout(stream, lake, tables, num_partitions=8)
    assert _activity_rows(lake) == _activity_oracle(stream)
    # post-crash re-tick: still no double counting
    replay_fanout(stream, lake, tables, num_partitions=8)
    assert _activity_rows(lake) == _activity_oracle(stream)


_CHILD_SPLIT = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from web3research_etl_ray.pipelines.replay import replay, split_partitions
replay({stream!r}, {lake!r}, num_partitions=2)
print("SPLIT", flush=True)
split_partitions({lake!r}, [0, 1])
print("DONE", flush=True)
"""


def test_sigkill_mid_split_then_converge(tmp_path):
    """Crash safety of partition splitting: SIGKILL while a split
    generation is being staged must leave the lake readable at the
    pre-split generation (or fully split — never half), reads must be
    byte-identical to the oracle either way, and a fresh split + tick
    converges."""
    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.replay import (
        lake_table,
        replay,
        split_partitions,
    )
    from web3research_etl_ray.state.manifest import load_latest

    stream = ensure_stream(60_000)
    lake = str(tmp_path / "slake")
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_SPLIT.format(repo=REPO, stream=stream, lake=lake)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    line = child.stdout.readline()
    assert "SPLIT" in line  # gen 0 committed; split staging begins
    time.sleep(0.4)
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()

    # whatever the kill point: a committed manifest exists and the
    # lake reads exactly (split half-work must be invisible)
    m = load_latest(lake)
    assert m is not None
    oracle = oracle_fold(stream)
    assert tables_equal(lake_table(lake), oracle)

    # converge: finish the split in this process (idempotent if the
    # child already committed it), then a re-tick stays exact
    depth = max(m.split_depths.values()) if m.split_depths else 0
    if depth == 0:
        split_partitions(lake, [0, 1])
    m2 = load_latest(lake)
    assert sum(1 for e in m2.partitions.values() if e.file) == 4
    assert tables_equal(lake_table(lake), oracle)
    replay(stream, lake, num_partitions=2)
    assert tables_equal(lake_table(lake), oracle)


_CHILD_PURGE = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
from web3research_etl_ray.pipelines.replay import replay, lake_table
from web3research_etl_ray.pipelines.purge import purge
replay({stream!r}, {lake!r}, num_partitions=8)
t = lake_table({lake!r})
keys = pa.table({{"repo": t.column("repo").slice(0, 5),
                 "path": t.column("path").slice(0, 5)}})
import pyarrow.parquet as pq
pq.write_table(keys, {keys_out!r})
print("PURGE", flush=True)
purge({lake!r}, keys)
print("DONE", flush=True)
"""


def test_sigkill_mid_purge_then_converge(tmp_path):
    """Crash safety of the GDPR purge: SIGKILL while the purge
    generation is staging leaves the lake readable and exactly
    all-or-nothing; re-running the purge in a fresh process converges
    (tombstones monotone, keys gone, re-tick does not resurrect)."""
    import pyarrow.parquet as pq

    from web3research_etl_ray.gen import ensure_stream
    from web3research_etl_ray.oracle import oracle_fold, tables_equal
    from web3research_etl_ray.pipelines.purge import purge
    from web3research_etl_ray.pipelines.replay import lake_table, replay
    from web3research_etl_ray.state.manifest import load_latest

    stream = ensure_stream(60_000)
    lake = str(tmp_path / "plake")
    keys_out = str(tmp_path / "purged_keys.parquet")
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD_PURGE.format(repo=REPO, stream=stream, lake=lake,
                             keys_out=keys_out)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    line = child.stdout.readline()
    assert "PURGE" in line  # gen 0 committed; purge staging begins
    time.sleep(0.3)
    if child.poll() is None:
        try:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        child.wait()

    assert load_latest(lake) is not None  # always readable
    keys = pq.read_table(keys_out)
    key_set = set(zip(keys.column("repo").to_pylist(),
                      keys.column("path").to_pylist()))

    # lake is EITHER pre-purge exact OR post-purge exact — never mixed
    t = lake_table(lake)
    live = set(zip(t.column("repo").to_pylist(),
                   t.column("path").to_pylist()))
    assert key_set <= live or not (key_set & live)

    # converge: re-purge (idempotent if the child committed), then the
    # keys are gone and a re-tick cannot resurrect them
    purge(lake, keys)
    t = lake_table(lake)
    live = set(zip(t.column("repo").to_pylist(),
                   t.column("path").to_pylist()))
    assert not (key_set & live)
    replay(stream, lake, num_partitions=8)
    t = lake_table(lake)
    live = set(zip(t.column("repo").to_pylist(),
                   t.column("path").to_pylist()))
    assert not (key_set & live)
    # and the surviving rows still match the oracle minus purged keys
    oracle = oracle_fold(stream)
    mask = [
        (r, p) not in key_set
        for r, p in zip(oracle.column("repo").to_pylist(),
                        oracle.column("path").to_pylist())
    ]
    import pyarrow as pa

    assert tables_equal(lake_table(lake), oracle.filter(pa.array(mask)))
