"""Single-process oracle fold over the event stream (FIXTURES.md §4).

The golden reference for every replay test: a sequential, trivially-
correct fold of the same events + rollbacks that the distributed engine
replays.  Mirrors what the reference's ClickHouse ReplacingMergeTree
converges to after OPTIMIZE FINAL DEDUPLICATE (scripts/optimize_db.py:
26-28): per (repo, path), the last writer by commit_seq wins; keys whose
last effective op is delete are absent; events whose commit_seq falls in
a rollback orphan range never count (src/ch_eth/sync.rs:92-116 delete+
reinsert semantics, folded to convergence).
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import LAKE_SCHEMA, unify_to


def load_rollback_ranges(stream_dir: str) -> list[tuple[int, int]]:
    p = os.path.join(stream_dir, "rollbacks.parquet")
    if not os.path.exists(p):
        return []
    t = pq.read_table(p)
    return sorted(
        zip(t["orphan_from"].to_pylist(), t["orphan_to"].to_pylist())
    )


def in_orphan_range(seq: int, ranges: list[tuple[int, int]]) -> bool:
    return any(lo <= seq <= hi for lo, hi in ranges)


def oracle_fold(
    stream_dir: str, upto_seq: int | None = None
) -> pa.Table:
    """Sequential LWW fold → converged lake table, sorted by (repo, path)."""
    ranges = load_rollback_ranges(stream_dir)
    state: dict[tuple[str, str], dict] = {}
    for f in sorted(glob.glob(os.path.join(stream_dir, "events-*.parquet"))):
        t = unify_to(pq.read_table(f))
        for row in t.to_pylist():
            seq = row["commit_seq"]
            if upto_seq is not None and seq > upto_seq:
                continue
            if in_orphan_range(seq, ranges):
                continue
            key = (row["repo"], row["path"])
            cur = state.get(key)
            if cur is not None and cur["commit_seq"] >= seq:
                continue  # older writer loses (at-least-once tolerance)
            state[key] = row
    live = [r for r in state.values() if r["op"] != "delete"]
    live.sort(key=lambda r: (r["repo"], r["path"]))
    return pa.table(
        {
            "repo": [r["repo"] for r in live],
            "path": [r["path"] for r in live],
            "commit": [r["commit"] for r in live],
            "lang": [r["lang"] for r in live],
            "content": [r["content"] for r in live],
            "content_sha256": [
                hashlib.sha256(r["content"].encode()).digest() for r in live
            ],
            "metadata": pa.array(
                [r.get("metadata") for r in live],
                pa.map_(pa.string(), pa.string()),
            ),
            "size_bytes": pa.array(
                [r.get("size_bytes") for r in live], pa.int64()
            ),
            "commit_seq": [r["commit_seq"] for r in live],
        },
        schema=LAKE_SCHEMA,
    )


def normalize_for_compare(t: pa.Table) -> pa.Table:
    """Canonical form for equality: sorted by key, maps as sorted lists."""
    t = t.select(LAKE_SCHEMA.names)
    t = t.cast(LAKE_SCHEMA)
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


def tables_equal(a: pa.Table, b: pa.Table) -> bool:
    a, b = normalize_for_compare(a), normalize_for_compare(b)
    if a.num_rows != b.num_rows:
        return False
    return a.equals(b)


def diff_tables(a: pa.Table, b: pa.Table, limit: int = 5) -> list[str]:
    """Human-readable first differences (test diagnostics)."""
    a, b = normalize_for_compare(a), normalize_for_compare(b)
    msgs = []
    if a.num_rows != b.num_rows:
        msgs.append(f"row count {a.num_rows} != {b.num_rows}")
    ka = {(r["repo"], r["path"]): r for r in a.to_pylist()}
    kb = {(r["repo"], r["path"]): r for r in b.to_pylist()}
    for k in list(ka.keys() | kb.keys()):
        ra, rb = ka.get(k), kb.get(k)
        if ra != rb:
            msgs.append(f"key {k}: {ra} != {rb}")
            if len(msgs) >= limit:
                break
    return msgs
