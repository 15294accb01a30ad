"""Tron-width fan-out registry — 44 derived lake tables from ONE stream.

The reference's widest ingest shape is one Tron block fanning out into
44 tables inserted together (src/ch_tron/init.rs:76-214; 45 row structs
in src/ch_tron/schema.rs), including its hairiest column type — a Map
inside a Nested struct (src/ch_tron/schema.rs:1976-1984) — plus
UInt256-class big decimals (src/ch_eth/schema.rs:13-14, DDL
src/ch_eth/init.rs:153-168) and FixedString keys
(src/ch_eth/init.rs:148-157).

:func:`tron_width_tables` builds the engine's equivalent: exactly 44
:class:`~.fanout.FanoutTable` specs over the unified change-event
stream, mixing every merge semantics the engine supports —

* LWW (ReplacingMergeTree) file-grain tables, some filtered per lang /
  size bucket (tombstones apply),
* additive (SummingMergeTree) per-repo stats,
* min/max (AggregatingMergeTree) watermark tables sharded by repo hash,
* a ``decimal256(76, 0)`` payload table (UInt256 analogue),
* a ``binary(20)`` KEY table (FixedString(20) address analogue; the
  partition router hashes raw bytes),
* a ``list_<struct<name, counts: map_<string,int64>>>`` payload table
  (the Map-inside-Nested analogue) carried through spool, merge and
  split untouched.

All 44 derive from ONE shared read and commit in ONE MultiManifest
generation — the atomicity the reference's per-block insert loop
cannot give (ClickHouse has no cross-table transactions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import key_hash64, sha256_binary
from ..schema import REPO_FILES, TableSpec
from .fanout import FanoutTable

#: number of repo-hash shards for the min/max watermark tables
N_SHARDS = 10


def _ones(n: int) -> pa.Array:
    return pa.array(np.ones(n, dtype=np.int64))


def _upserts(n: int) -> pa.Array:
    return pa.array(["upsert"] * n, pa.string())


def _addr20(repo: pa.ChunkedArray, path: pa.ChunkedArray) -> pa.Array:
    """binary(20) address: first 20 bytes of sha256(repo || '/' || path)
    — the FixedString(20) Ethereum-address analogue, derived without a
    Python loop over the digest array."""
    joined = pc.binary_join_element_wise(
        repo.cast(pa.string()), path.cast(pa.string()), "/"
    )
    dig = sha256_binary(joined)  # binary(32)
    n = len(dig)
    raw = np.frombuffer(dig.buffers()[1], dtype=np.uint8)[: 32 * n]
    trunc = raw.reshape(n, 32)[:, :20].tobytes()
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(20), n, [None, pa.py_buffer(trunc)]
    )


def _refs_column(t: pa.Table) -> pa.Array:
    """One-element ``list<struct<name: string, counts: map<string,
    int64>>>`` per row: name = the row's lang, counts = {"len":
    content length, "seq": commit_seq}.  Exercises the reference's
    Map-inside-Nested shape (src/ch_tron/schema.rs:1976-1984) through
    the full spool → merge → split path."""
    n = t.num_rows
    langs = t.column("lang").cast(pa.string()).combine_chunks()
    lens = pc.utf8_length(t.column("content")).cast(pa.int64()).combine_chunks()
    seqs = t.column("commit_seq").cast(pa.int64()).combine_chunks()
    # map child: 2 entries per row, keys alternating len/seq
    keys = pa.array(["len", "seq"] * n, pa.string())
    items = np.empty(2 * n, dtype=np.int64)
    items[0::2] = lens.to_numpy(zero_copy_only=False)
    items[1::2] = seqs.to_numpy(zero_copy_only=False)
    map_offsets = pa.array(np.arange(0, 2 * n + 2, 2, dtype=np.int32))
    counts = pa.MapArray.from_arrays(map_offsets, keys, pa.array(items))
    struct = pa.StructArray.from_arrays([langs, counts], ["name", "counts"])
    list_offsets = pa.array(np.arange(0, n + 1, dtype=np.int32))
    return pa.ListArray.from_arrays(list_offsets, struct)


REFS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("name", pa.string()),
            pa.field("counts", pa.map_(pa.string(), pa.int64())),
        ]
    )
)


def tron_width_tables(langs: tuple[str, ...] | None = None) -> list[FanoutTable]:
    """The 44-table registry (see module docstring for the breakdown)."""
    from ..schema import LANGS

    langs = langs or LANGS  # 7
    tables: list[FanoutTable] = [FanoutTable(REPO_FILES, None)]

    # --- 3 repo-grain aggregates (same shapes the 3-table demo uses) --
    heads_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("commit", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_heads(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "commit": t.column("commit"),
                "lang": t.column("lang").cast(pa.string()),
                "commit_seq": t.column("commit_seq"),
                "op": _upserts(t.num_rows),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_repo_heads",
                schema=heads_schema,
                key=("repo",),
                event_schema=heads_schema.append(pa.field("op", pa.string())),
            ),
            derive_heads,
            num_partitions=4,
        )
    )

    langs_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("lang", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_langs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "lang": t.column("lang").cast(pa.string()),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": _upserts(t.num_rows),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_repo_langs",
                schema=langs_schema,
                key=("repo", "lang"),
                event_schema=langs_schema.append(pa.field("op", pa.string())),
            ),
            derive_langs,
            num_partitions=4,
        )
    )

    activity_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_activity(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "n_changes": _ones(t.num_rows),
                "content_chars": pc.utf8_length(t.column("content")).cast(
                    pa.int64()
                ),
                "commit_seq": t.column("commit_seq"),
                "op": _upserts(t.num_rows),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_repo_activity",
                schema=activity_schema,
                key=("repo",),
                event_schema=activity_schema.append(pa.field("op", pa.string())),
                sum_cols=("n_changes", "content_chars"),
            ),
            derive_activity,
            num_partitions=4,
        )
    )

    # --- 7 per-lang LWW file tables (tombstones pass through) --------
    file_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("commit", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    for lang in langs:

        def derive_files(t: pa.Table, _lang=lang) -> pa.Table:
            sub = t.filter(
                pc.equal(t.column("lang").cast(pa.string()), _lang)
            )
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "path": sub.column("path"),
                    "commit": sub.column("commit"),
                    "commit_seq": sub.column("commit_seq"),
                    "op": sub.column("op").cast(pa.string()),
                }
            )

        tables.append(
            FanoutTable(
                TableSpec(
                    name=f"w_files_{lang}",
                    schema=file_schema,
                    key=("repo", "path"),
                    event_schema=file_schema.append(
                        pa.field("op", pa.string())
                    ),
                ),
                derive_files,
            )
        )

    # --- 7 per-lang additive stats -----------------------------------
    langstat_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    for lang in langs:

        def derive_langstat(t: pa.Table, _lang=lang) -> pa.Table:
            sub = t.filter(
                pc.equal(t.column("lang").cast(pa.string()), _lang)
            )
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "n_changes": _ones(sub.num_rows),
                    "content_chars": pc.utf8_length(
                        sub.column("content")
                    ).cast(pa.int64()),
                    "commit_seq": sub.column("commit_seq"),
                    "op": _upserts(sub.num_rows),
                }
            )

        tables.append(
            FanoutTable(
                TableSpec(
                    name=f"w_langstat_{lang}",
                    schema=langstat_schema,
                    key=("repo",),
                    event_schema=langstat_schema.append(
                        pa.field("op", pa.string())
                    ),
                    sum_cols=("n_changes", "content_chars"),
                ),
                derive_langstat,
                num_partitions=4,
            )
        )

    # --- 8 size-bucket LWW tables (content length mod 8) -------------
    size_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("content_chars", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    for b in range(8):

        def derive_size(t: pa.Table, _b=b) -> pa.Table:
            lens = pc.utf8_length(t.column("content")).cast(pa.int64())
            lens_np = lens.to_numpy(zero_copy_only=False)
            keep = pa.array((lens_np % 8) == _b)
            sub = t.filter(keep)
            sub_lens = pc.utf8_length(sub.column("content")).cast(pa.int64())
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "path": sub.column("path"),
                    "content_chars": sub_lens,
                    "commit_seq": sub.column("commit_seq"),
                    "op": sub.column("op").cast(pa.string()),
                }
            )

        tables.append(
            FanoutTable(
                TableSpec(
                    name=f"w_sizebucket_{b}",
                    schema=size_schema,
                    key=("repo", "path"),
                    event_schema=size_schema.append(
                        pa.field("op", pa.string())
                    ),
                ),
                derive_size,
            )
        )

    # --- 4 path-depth additive tables --------------------------------
    depth_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("n_changes", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    for d in range(4):

        def derive_depth(t: pa.Table, _d=d) -> pa.Table:
            depth = pc.count_substring(
                t.column("path").cast(pa.string()), "/"
            ).cast(pa.int64())
            depth_np = np.minimum(
                depth.to_numpy(zero_copy_only=False), 3
            )
            sub = t.filter(pa.array(depth_np == _d))
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "n_changes": _ones(sub.num_rows),
                    "commit_seq": sub.column("commit_seq"),
                    "op": _upserts(sub.num_rows),
                }
            )

        tables.append(
            FanoutTable(
                TableSpec(
                    name=f"w_depth_{d}",
                    schema=depth_schema,
                    key=("repo",),
                    event_schema=depth_schema.append(
                        pa.field("op", pa.string())
                    ),
                    sum_cols=("n_changes",),
                ),
                derive_depth,
                num_partitions=4,
            )
        )

    # --- 10 repo-hash-sharded min/max watermark tables ----------------
    shard_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("first_seq", pa.int64(), nullable=False),
            pa.field("last_seq", pa.int64(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )
    for s in range(N_SHARDS):

        def derive_shard(t: pa.Table, _s=s) -> pa.Table:
            h = key_hash64(t.column("repo")) % np.uint64(N_SHARDS)
            sub = t.filter(pa.array(h == np.uint64(_s)))
            seq = sub.column("commit_seq")
            return pa.table(
                {
                    "repo": sub.column("repo"),
                    "first_seq": seq,
                    "last_seq": seq,
                    "commit_seq": seq,
                    "op": _upserts(sub.num_rows),
                }
            )

        tables.append(
            FanoutTable(
                TableSpec(
                    name=f"w_shard_{s}",
                    schema=shard_schema,
                    key=("repo",),
                    event_schema=shard_schema.append(
                        pa.field("op", pa.string())
                    ),
                    min_cols=("first_seq",),
                    max_cols=("last_seq",),
                ),
                derive_shard,
                num_partitions=4,
            )
        )

    # --- 1 global first/last table ------------------------------------
    def derive_firstlast(t: pa.Table) -> pa.Table:
        seq = t.column("commit_seq")
        return pa.table(
            {
                "repo": t.column("repo"),
                "first_seq": seq,
                "last_seq": seq,
                "commit_seq": seq,
                "op": _upserts(t.num_rows),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_repo_firstlast",
                schema=shard_schema,
                key=("repo",),
                event_schema=shard_schema.append(pa.field("op", pa.string())),
                min_cols=("first_seq",),
                max_cols=("last_seq",),
            ),
            derive_firstlast,
            num_partitions=4,
        )
    )

    # --- 1 decimal256 valuation table (UInt256 analogue) --------------
    val_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("value_wei", pa.decimal256(76, 0), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_valuations(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t.column("content")).cast(pa.int64())
        micro = pc.add(
            pc.multiply(lens, pa.scalar(1_000_000_000, pa.int64())),
            t.column("commit_seq").cast(pa.int64()),
        )
        return pa.table(
            {
                "repo": t.column("repo"),
                "path": t.column("path"),
                "value_wei": micro.cast(pa.decimal256(76, 0)),
                "commit_seq": t.column("commit_seq"),
                "op": t.column("op").cast(pa.string()),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_valuations",
                schema=val_schema,
                key=("repo", "path"),
                event_schema=val_schema.append(pa.field("op", pa.string())),
            ),
            derive_valuations,
        )
    )

    # --- 1 binary(20)-KEY address table (FixedString analogue) --------
    addr_schema = pa.schema(
        [
            pa.field("addr", pa.binary(20), nullable=False),
            pa.field("repo", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_addresses(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "addr": _addr20(t.column("repo"), t.column("path")),
                "repo": t.column("repo"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": t.column("op").cast(pa.string()),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_addresses",
                schema=addr_schema,
                key=("addr",),
                event_schema=addr_schema.append(pa.field("op", pa.string())),
            ),
            derive_addresses,
        )
    )

    # --- 1 Map-inside-Nested refs table -------------------------------
    refs_schema = pa.schema(
        [
            pa.field("repo", pa.string(), nullable=False),
            pa.field("path", pa.string(), nullable=False),
            pa.field("refs", REFS_TYPE, nullable=True),
            pa.field("commit_seq", pa.int64(), nullable=False),
        ]
    )

    def derive_refs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t.column("repo"),
                "path": t.column("path"),
                "refs": _refs_column(t),
                "commit_seq": t.column("commit_seq"),
                "op": t.column("op").cast(pa.string()),
            }
        )

    tables.append(
        FanoutTable(
            TableSpec(
                name="w_refs",
                schema=refs_schema,
                key=("repo", "path"),
                event_schema=refs_schema.append(pa.field("op", pa.string())),
            ),
            derive_refs,
        )
    )

    assert len(tables) == 44, len(tables)
    return tables
