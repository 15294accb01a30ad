"""Targeted key erasure (GDPR / right-to-be-forgotten) with
watermarked persistent tombstones.

The reference engine has no erase path (its deletes are stream events,
src/ch_eth/sync.rs:92-116 rollback = delete+reinsert); at lake scale a
compliance erase must hold across EVERY path that can rebuild state —
future ticks, rollback repairs, full-history rebuilds, conformance
checks — or the key silently resurrects.  So a purge here is not a
one-shot row delete; it is a small persistent tombstone table:

    (key_cols..., purge_seq)

with ``purge_seq`` = the lake's max watermark at purge time.  Events
with ``order_col <= purge_seq`` for a purged key are dropped at
NORMALIZE time (stages/normalize.py consults the list), which makes
every rebuild converge to the purged state; events PAST purge_seq
apply normally, so a later legitimate re-insert of the key is not
swallowed (the Iceberg equality-delete sequencing rule).

:func:`purge` also rewrites the affected partitions immediately and
commits a new generation, so the erased rows leave the LIVE table at
request time, not at the next tick.

Scale shape: the tombstone list is O(erase requests) — tiny — and is
broadcast by closure into the normalize stage (never shuffled); the
rewrite touches only the partitions that actually hold the keys
(hash-routed, split-layout aware).  Physical erasure of HISTORY is
explicitly compositional: older generations still hold the bytes until
``gc_generations`` drops them, and backups are the operator's problem
— both documented and tested rather than pretended away.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import REPO_FILES, TableSpec
from ..stages.normalize import depth_vector, route_pids
from ..functions.hashing import key_hash64
from ..state.manifest import (
    Manifest,
    acquire_lease,
    commit_manifest,
    load_latest,
    partition_relpath,
    release_lease,
)

#: unit separator — composes multi-column keys into one comparable
#: string for the tombstone membership probe (same role as the lake's
#: hive dirs; realistic keys never contain 0x1f)
_SEP = "\x1f"

_PURGE_FILE = "purge/keys.parquet"


def composite_key(t: pa.Table, key_cols: list[str]) -> pa.Array:
    cols = [pc.cast(t.column(k), pa.string()) for k in key_cols]
    if len(cols) == 1:
        out = cols[0]
    else:
        out = pc.binary_join_element_wise(*cols, _SEP)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def load_purge_list(
    lake_dir: str, spec: TableSpec = REPO_FILES
) -> pa.Table | None:
    """The lake's tombstone table, or None when nothing was purged.
    Columns: spec.key... + purge_seq (int64)."""
    path = os.path.join(lake_dir, _PURGE_FILE)
    if not os.path.exists(path):
        return None
    return pq.read_table(path)


def _write_purge_list(lake_dir: str, t: pa.Table) -> None:
    path = os.path.join(lake_dir, _PURGE_FILE)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def purge(
    lake_dir: str,
    keys: pa.Table,
    *,
    spec: TableSpec = REPO_FILES,
) -> dict:
    """Erase ``keys`` (a table with spec.key columns) from the live
    lake and tombstone them against every rebuild path.  Returns a
    report dict; commits one new generation.

    Single-writer: runs under the same lease as replay/sync.  Repeat
    purges of the same key keep the MAX purge_seq (monotone)."""
    created = acquire_lease(lake_dir)
    try:
        return _purge_impl(lake_dir, keys, spec)
    finally:
        if created:
            release_lease(lake_dir)


def _purge_impl(lake_dir: str, keys: pa.Table, spec: TableSpec) -> dict:
    import ray.data

    prior = load_latest(lake_dir)
    if prior is None:
        raise FileNotFoundError(
            f"purge requires an initialized lake under {lake_dir}"
        )
    key_cols = list(spec.key)
    keys = keys.select(key_cols).group_by(key_cols).aggregate([])
    purge_seq = prior.max_watermark

    # ---- 1. fold into the persistent tombstone list (max purge_seq) ----
    new = keys.append_column(
        "purge_seq",
        pa.array(np.full(keys.num_rows, purge_seq, dtype=np.int64)),
    )
    # canonical NULLABLE schema: inputs arrive with mixed not-null
    # flags (lake reads are non-null, ad-hoc key tables are not)
    canon = pa.schema(
        [pa.field(k, spec.schema.field(k).type) for k in key_cols]
        + [pa.field("purge_seq", pa.int64())]
    )
    new = new.cast(canon)
    existing = load_purge_list(lake_dir, spec)
    merged = (
        pa.concat_tables([existing.cast(canon), new])
        if existing is not None
        else new
    )
    merged = (
        merged.group_by(key_cols)
        .aggregate([("purge_seq", "max")])
        .rename_columns(key_cols + ["purge_seq"])
    )
    _write_purge_list(lake_dir, merged)

    # ---- 2. rewrite ONLY the partitions that hold the keys -------------
    h = key_hash64(*[keys.column(k) for k in key_cols])
    pids = route_pids(
        h,
        prior.num_partitions,
        depth_vector(prior.num_partitions, prior.split_depths),
    )
    affected = sorted(
        {int(p) for p in pids}
        & {pid for pid, e in prior.partitions.items() if e.file}
    )
    generation = prior.generation + 1
    comp_keys = composite_key(keys, key_cols)
    order_col = spec.order_col

    def rewrite(batch: pa.Table) -> pa.Table:
        out = {"part_id": [], "file": [], "num_rows": [], "purged": []}
        for pid, rel in zip(
            batch.column("pid").to_pylist(), batch.column("file").to_pylist()
        ):
            t = pq.read_table(os.path.join(lake_dir, rel))
            comp = composite_key(t, key_cols)
            hit = pc.is_in(comp, value_set=comp_keys).to_numpy(
                zero_copy_only=False
            )
            seqs = t.column(order_col).to_numpy(zero_copy_only=False)
            drop = hit & (seqs <= purge_seq)
            new_rel = None
            kept = int((~drop).sum())
            if kept:
                new_rel = partition_relpath(generation, int(pid))
                path = os.path.join(lake_dir, new_rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                # filter preserves key order -> the sorted-partition
                # invariant of the streaming merge survives the rewrite
                pq.write_table(
                    t.filter(pa.array(~drop)), path,
                    row_group_size=1 << 18,
                )
            out["part_id"].append(int(pid))
            out["file"].append(new_rel)
            out["num_rows"].append(kept)
            out["purged"].append(int(drop.sum()))
        return pa.table(out)

    rows: list[dict] = []
    if affected:
        items = [
            {"pid": pid, "file": prior.partitions[pid].file}
            for pid in affected
        ]
        rows = (
            ray.data.from_items(items)
            .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
            .take_all()
        )

    # ---- 3. commit: rewritten entries swap in, everything else rides ---
    from dataclasses import replace as dc_replace

    partitions = dict(prior.partitions)
    purged_rows = 0
    for r in rows:
        pid = int(r["part_id"])
        purged_rows += int(r["purged"])
        partitions[pid] = dc_replace(
            prior.partitions[pid],
            file=r["file"],
            num_rows=int(r["num_rows"]),
        )
    manifest = Manifest(
        generation=generation,
        num_partitions=prior.num_partitions,
        partitions=partitions,
        applied_rollbacks=prior.applied_rollbacks,
        schema_version=prior.schema_version,
        parent_generation=prior.generation,
        split_depths=prior.split_depths,
    )
    commit_manifest(lake_dir, manifest)
    report = {
        "generation": generation,
        "purge_seq": purge_seq,
        "keys": keys.num_rows,
        "partitions_rewritten": len(rows),
        "rows_purged": purged_rows,
        "tombstones_total": merged.num_rows,
    }
    with open(
        os.path.join(lake_dir, "purge", f"log-{generation:06d}.json"), "w"
    ) as fh:
        json.dump(report, fh, indent=1)
    return report
